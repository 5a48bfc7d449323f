"""T-Digest quantile sketch (`percentiles` / `percentile_ranks` aggregations).

Reference: search/aggregations/metrics/TDigestState.java (default
compression 100). From-scratch implementation of the published t-digest idea
(Dunning & Ertl, "Computing extremely accurate quantiles using t-digests",
public): centroids sized by the k1 scale function so tails stay precise;
merging = concatenate + re-cluster. Mergeable -> Ray Data AggregateFn.
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights", "_buf")

    def __init__(self, compression: float = 100.0, means=None, weights=None):
        self.compression = compression
        self.means = np.asarray(means if means is not None else [], dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [], dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # k1 scale function: k(q) = (c/2pi) * asin(2q-1)
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            self._buf.append(v)
            if sum(b.size for b in self._buf) > 32 * self.compression:
                self._compress()
        return self

    def _compress(self) -> None:
        if self._buf:
            new_m = np.concatenate(self._buf)
            new_w = np.ones(new_m.size)
            self._buf = []
            means = np.concatenate([self.means, new_m])
            weights = np.concatenate([self.weights, new_w])
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        for i in range(1, means.size):
            q0 = w_so_far / total
            q2 = (w_so_far + cur_w + weights[i]) / total
            if self._k(np.array([q2]))[0] - self._k(np.array([q0]))[0] <= 1.0:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if other.means.size:
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
            self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        m, w = self.means, self.weights
        if m.size == 0:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        cum = np.cumsum(w) - w / 2.0
        target = q * w.sum()
        if target <= cum[0]:
            return float(m[0])
        if target >= cum[-1]:
            return float(m[-1])
        i = np.searchsorted(cum, target) - 1
        t = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(m[i] + t * (m[i + 1] - m[i]))

    def to_bytes(self) -> bytes:
        self._compress()
        n = self.means.size
        return (
            np.float64(self.compression).tobytes()
            + np.int64(n).tobytes()
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @staticmethod
    def from_bytes(b: bytes) -> "TDigest":
        comp = float(np.frombuffer(b[:8], np.float64)[0])
        n = int(np.frombuffer(b[8:16], np.int64)[0])
        means = np.frombuffer(b[16 : 16 + 8 * n], np.float64).copy()
        weights = np.frombuffer(b[16 + 8 * n : 16 + 16 * n], np.float64).copy()
        return TDigest(comp, means, weights)


def tdigest_aggregate_fn(column: str, quantiles: list[float], alias: str = "percentiles",
                         compression: float = 100.0):
    """Ray Data AggregateFn: per-block t-digest partials, merged, finalized to
    the requested quantiles (returned as a list)."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(state: bytes, block) -> bytes:
        td = TDigest.from_bytes(state)
        td.add(np.asarray(block[column]))
        return td.to_bytes()

    return AggregateFn(
        init=lambda k: TDigest(compression).to_bytes(),
        accumulate_block=accumulate_block,
        merge=lambda a, b: TDigest.from_bytes(a).merge(TDigest.from_bytes(b)).to_bytes(),
        finalize=lambda s: [TDigest.from_bytes(s).quantile(q) for q in quantiles],
        name=alias,
    )


def tdigest_rank_aggregate_fn(column: str, values: list[float], alias: str = "rank_pct",
                              compression: float = 100.0):
    """Ray Data AggregateFn for `percentile_ranks`: per-block t-digest
    partials, merged across blocks, finalized to CDF(value) percent for each
    requested mark — the fully distributed twin of tdigest_aggregate_fn."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(state: bytes, block) -> bytes:
        td = TDigest.from_bytes(state)
        td.add(np.asarray(block[column]))
        return td.to_bytes()

    return AggregateFn(
        init=lambda k: TDigest(compression).to_bytes(),
        accumulate_block=accumulate_block,
        merge=lambda a, b: TDigest.from_bytes(a).merge(TDigest.from_bytes(b)).to_bytes(),
        finalize=lambda s: [percentile_rank(TDigest.from_bytes(s), v) for v in values],
        name=alias,
    )


def percentile_rank(td: "TDigest", value: float) -> float:
    """`percentile_ranks` agg: CDF(value) in percent (centroid interpolation)."""
    td._compress()
    m, w = td.means, td.weights
    if m.size == 0:
        return float("nan")
    total = w.sum()
    if value < m[0]:
        return 0.0
    if value >= m[-1]:
        return 100.0
    cum = np.cumsum(w) - w / 2.0
    i = np.searchsorted(m, value, side="right") - 1
    i = max(0, min(i, m.size - 2))
    t = (value - m[i]) / max(m[i + 1] - m[i], 1e-12)
    return float(100.0 * (cum[i] + t * (cum[i + 1] - cum[i])) / total)
