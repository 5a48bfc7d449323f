"""HDR histogram percentiles (the reference's alternative percentiles method
— search/aggregations/metrics/HDRPercentileRanksAggregator.java wraps
HdrHistogram's DoubleHistogram; T-Digest is the default, HDR the
fixed-worst-case-error option).

Implements the HdrHistogram bucket layout (public algorithm, Gil Tene's
HdrHistogram): values recorded into exponentially-growing buckets of
2^k sub-buckets each, giving a guaranteed relative error of 10^-sig.
Doubles are recorded at a fixed decimal scale (`scale` decimal digits) —
the auto-ranging DoubleHistogram wrapper is simplified to a declared
fixed range, which the training-data workloads here (bounded metric
columns) satisfy.

Counts arrays merge by addition -> a Ray Data AggregateFn, same shape as
the T-Digest and HLL sketches.
"""

from __future__ import annotations

import numpy as np


class HdrSketch:
    def __init__(self, significant_digits: int = 3, scale: int = 3,
                 counts: np.ndarray | None = None):
        self.sig = int(significant_digits)
        self.scale = int(scale)           # decimal digits kept for doubles
        self.k = int(np.ceil(np.log2(2 * 10 ** self.sig)))
        self.sub_bucket_count = 1 << self.k
        self.sub_half = self.sub_bucket_count >> 1
        # enough buckets to cover int64-scaled values
        self.n_buckets = 64 - self.k + 1
        size = (self.n_buckets + 1) * self.sub_half
        self.counts = (counts if counts is not None
                       else np.zeros(size, np.int64))
        self.total = int(self.counts.sum())

    # ---- index math (HdrHistogram layout) ----

    def _indices(self, v: np.ndarray) -> np.ndarray:
        v = np.maximum(v.astype(np.int64), 0)
        mask = np.int64(self.sub_bucket_count - 1)
        # bucket = highest set bit position of (v | mask) - (k - 1)
        bl = np.zeros(v.shape, np.int64)
        x = (v | mask).astype(np.uint64)
        for shift in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(shift))
            bl += np.where(big, shift, 0)
            x = np.where(big, x >> np.uint64(shift), x)
        bucket = bl - (self.k - 1)
        sub = v >> bucket.astype(np.int64)
        return (bucket + 1) * self.sub_half + (sub - self.sub_half)

    def _value_at(self, index: int) -> int:
        bucket = index // self.sub_half - 1
        sub = index % self.sub_half + self.sub_half
        if bucket < 0:
            bucket, sub = 0, sub - self.sub_half
        return sub << bucket

    def _highest_equivalent(self, index: int) -> int:
        bucket = max(index // self.sub_half - 1, 0)
        return self._value_at(index) + (1 << bucket) - 1

    # ---- recording / merging / querying ----

    def add(self, values: np.ndarray) -> "HdrSketch":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        scaled = np.round(v * 10 ** self.scale).astype(np.int64)
        idx = self._indices(scaled)
        np.add.at(self.counts, idx, 1)
        self.total += idx.size
        return self

    def merge(self, other: "HdrSketch") -> "HdrSketch":
        self.counts += other.counts
        self.total += other.total
        return self

    def percentile(self, p: float) -> float:
        if self.total == 0:
            return float("nan")
        need = max(1, int(round(p / 100.0 * self.total)))
        cum = np.cumsum(self.counts)
        index = int(np.searchsorted(cum, need, side="left"))
        return self._highest_equivalent(index) / 10 ** self.scale

    def rank(self, value: float) -> float:
        """percentile_ranks (HDRPercentileRanksAggregator /
        HdrHistogram.getPercentileAtOrBelowValue): share of recorded
        values at or below `value`'s equivalent bucket, as a percent."""
        if self.total == 0:
            return float("nan")
        scaled = np.int64(np.round(value * 10 ** self.scale))
        idx = int(self._indices(np.array([scaled], np.int64))[0])
        cum = int(self.counts[: idx + 1].sum())
        return 100.0 * cum / self.total

    # ---- serialization for the AggregateFn ----

    def to_bytes(self) -> bytes:
        import zlib

        return zlib.compress(self.counts.tobytes())

    @classmethod
    def from_bytes(cls, b: bytes, significant_digits: int = 3,
                   scale: int = 3) -> "HdrSketch":
        import zlib

        counts = np.frombuffer(zlib.decompress(b), np.int64).copy()
        return cls(significant_digits, scale, counts)


def hdr_aggregate_fn(value_col: str, qs: list[float],
                     significant_digits: int = 3, scale: int = 3):
    """Ray Data AggregateFn: per-block HDR recording, byte-serialized counts
    merge, final percentile extraction (the partial/final reduce shape of
    the reference's aggregator)."""
    from ray.data.aggregate import AggregateFn

    def make():
        return HdrSketch(significant_digits, scale).to_bytes()

    def acc_block(state: bytes, block) -> bytes:
        s = HdrSketch.from_bytes(state, significant_digits, scale)
        col = block[value_col]
        s.add(col.to_numpy(zero_copy_only=False))
        return s.to_bytes()

    def merge(a: bytes, b: bytes) -> bytes:
        return (HdrSketch.from_bytes(a, significant_digits, scale)
                .merge(HdrSketch.from_bytes(b, significant_digits, scale))
                .to_bytes())

    def final(state: bytes):
        s = HdrSketch.from_bytes(state, significant_digits, scale)
        return [s.percentile(q * 100) for q in qs]

    return AggregateFn(
        init=lambda _: make(),
        accumulate_block=acc_block,
        merge=merge,
        finalize=final,
        name="percentiles_hdr",
    )



def hdr_ranks_aggregate_fn(value_col: str, values: list[float],
                           significant_digits: int = 3, scale: int = 3):
    """percentile_ranks, HDR method (HDRPercentileRanksAggregator):
    same mergeable bucket-count state; finalize walks the cumulative
    counts at each query value's equivalent bucket."""
    from ray.data.aggregate import AggregateFn

    def make() -> bytes:
        return HdrSketch(significant_digits, scale).to_bytes()

    def acc_block(state: bytes, block) -> bytes:
        s = HdrSketch.from_bytes(state, significant_digits, scale)
        col = block.column(value_col)
        s.add(col.to_numpy(zero_copy_only=False))
        return s.to_bytes()

    def merge(a: bytes, b: bytes) -> bytes:
        return (HdrSketch.from_bytes(a, significant_digits, scale)
                .merge(HdrSketch.from_bytes(b, significant_digits, scale))
                .to_bytes())

    def final(state: bytes):
        s = HdrSketch.from_bytes(state, significant_digits, scale)
        return [s.rank(v) for v in values]

    return AggregateFn(
        init=lambda _: make(),
        accumulate_block=acc_block,
        merge=merge,
        finalize=final,
        name="percentile_ranks_hdr",
    )
