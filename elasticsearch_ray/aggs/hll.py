"""HyperLogLog++-style cardinality sketch (`cardinality` aggregation).

Reference: search/aggregations/metrics/HyperLogLogPlusPlus.java:53 (1,230 LoC,
precision_threshold default 3000, dense/sparse encodings). This is a
from-scratch NumPy implementation of the published HLL++ ideas (Heule et al.,
"HyperLogLog in Practice", Google, 2013 — public): 64-bit hashing (no large-
range correction needed), 2^p registers, harmonic-mean estimator with
linear-counting small-range correction. Simplifications vs the paper, noted:
no sparse encoding and no empirical bias-correction table — accuracy is the
standard ~1.04/sqrt(m) (±0.8% at p=14), verified in tests against exact
counts.

Mergeable by register-wise max -> usable as a Ray Data AggregateFn partial
state (one sketch per block, merged in the reduce — SURVEY.md §2.6 mapping).
"""

from __future__ import annotations

import numpy as np


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit mix (public splitmix64 constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash64(values: np.ndarray) -> np.ndarray:
    """64-bit hashes for int or string arrays (deterministic across runs)."""
    if values.dtype.kind in "iu":
        return _splitmix64(values.astype(np.uint64))
    if values.dtype.kind == "f":
        # view() only reinterprets 8-byte floats; narrower floats must be
        # widened first or pairs of values would fuse into one hash
        if values.dtype.itemsize != 8:
            values = values.astype(np.float64)
        return _splitmix64(values.view(np.uint64))
    # strings/objects: FNV-1a 64 per value (vectorized over chars is overkill
    # for grouping keys; loop is fine off the hot path)
    out = np.empty(len(values), dtype=np.uint64)
    FNV_OFF, FNV_P = np.uint64(0xCBF29CE484222325), np.uint64(0x100000001B3)
    for i, v in enumerate(values):
        h = FNV_OFF
        for byt in str(v).encode():
            h = (h ^ np.uint64(byt)) * FNV_P
        out[i] = h
    return _splitmix64(out)


class HllSketch:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HllSketch":
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p) | np.uint64(1 << (self.p - 1))  # avoid rho>64-p edge
        # rho = leading zeros of w + 1, over the remaining 64-p bits
        rho = np.zeros(h.size, dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = w.copy()
        r = np.ones(h.size, dtype=np.uint8)
        alive = np.ones(h.size, dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (cur & mask) != 0
            done = alive & top
            rho[done] = r[done]
            alive &= ~top
            if not alive.any():
                break
            cur = cur << np.uint64(1)
            r += 1
        np.maximum.at(self.registers, idx, rho)
        return self

    def add(self, values: np.ndarray) -> "HllSketch":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HllSketch") -> "HllSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int32))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)  # linear counting (small-range correction)
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HllSketch":
        p = b[0]
        return HllSketch(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


def hll_aggregate_fn(column: str, alias: str = "cardinality", p: int = 14):
    """Ray Data AggregateFn: one HLL partial per block, register-max merge."""
    from ray.data.aggregate import AggregateFn

    def accumulate_block(state: bytes, block) -> bytes:
        import pyarrow as pa

        sk = HllSketch.from_bytes(state)
        col = block[column] if isinstance(block, (pa.Table,)) else block[column]
        if isinstance(col, (pa.Array, pa.ChunkedArray)):
            col = col.drop_null()  # cardinality ignores missing values
            vals = np.asarray(col)
        else:
            vals = np.asarray(col)
            if vals.dtype.kind == "f":
                vals = vals[~np.isnan(vals)]
            elif vals.dtype.kind == "O":
                vals = np.array([v for v in vals if v is not None],
                                dtype=object)
        if vals.size:
            sk.add(vals)
        return sk.to_bytes()

    return AggregateFn(
        init=lambda k: HllSketch(p).to_bytes(),
        accumulate_block=accumulate_block,
        merge=lambda a, b: HllSketch.from_bytes(a).merge(HllSketch.from_bytes(b)).to_bytes(),
        finalize=lambda s: HllSketch.from_bytes(s).estimate(),
        name=alias,
    )
