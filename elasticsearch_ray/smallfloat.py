"""Lucene SmallFloat 1-byte norm quantization (vectorized NumPy).

[Lucene 8.5, public knowledge] Lucene 8 stores the per-document field length
(number of index terms, with position-increment-0 tokens discounted —
`discount_overlaps=true`, reference: server/src/main/java/org/elasticsearch/
index/similarity/SimilarityProviders.java:272-280) as ONE byte via
`SmallFloat.intToByte4`: values 0..23 exact, larger values lossy with a 4-bit
mantissa. BM25 decodes through a 256-entry cache. Reproducing this lossy
round-trip exactly is required for rank-identical BM25 scores (SURVEY.md §7
hard parts; engaged by the reference through its default BM25 similarity,
index/similarity/SimilarityService.java:77-80).

Scheme (SmallFloat.longToInt4 / int4ToLong / intToByte4 / byte4ToInt):
  MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 231
  NUM_FREE_VALUES = 255 - MAX_INT4 = 24
  i < 24             -> byte = i            (exact)
  i >= 24            -> byte = 24 + longToInt4(i - 24)
  longToInt4(v): if v < 8 (fewer than 4 bits): v
                 else: shift = numBits-4; ((v >>> shift) & 0x07) | ((shift+1) << 3)
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - longToInt4(2^31 - 1)


def int_to_byte4(values: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4: int lengths -> uint8 norm bytes."""
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("norm lengths must be non-negative")
    out = np.empty(v.shape, dtype=np.uint8)
    small = v < NUM_FREE_VALUES
    out[small] = v[small]
    big = ~small
    if np.any(big):
        x = v[big] - NUM_FREE_VALUES
        sub = x < 8  # subnormal: fewer than 4 significant bits
        enc = np.empty(x.shape, dtype=np.int64)
        enc[sub] = x[sub]
        xs = x[~sub]
        if xs.size:
            nbits = 64 - np.zeros_like(xs)
            # bit_length via float log2 is unsafe near powers of two; compute
            # exactly with a comparison ladder (lengths fit well under 2^62).
            nbits = np.ones_like(xs)
            for b in range(1, 63):
                nbits += xs >= (1 << b)
            shift = nbits - 4
            enc[~sub] = ((xs >> shift) & 0x07) | ((shift + 1) << 3)
        out[big] = (NUM_FREE_VALUES + enc).astype(np.uint8)
    return out


def byte4_to_int(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt: uint8 norm bytes -> decoded lengths."""
    b = np.asarray(norm_bytes, dtype=np.uint8).astype(np.int64)
    out = np.empty(b.shape, dtype=np.int64)
    small = b < NUM_FREE_VALUES
    out[small] = b[small]
    big = ~small
    if np.any(big):
        i = b[big] - NUM_FREE_VALUES
        bits = i & 0x07
        shift = (i >> 3) - 1
        dec = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
        out[big] = NUM_FREE_VALUES + dec
    return out


# the full decode table — BM25's 256-entry norm cache is built from this
DECODE_TABLE: np.ndarray = byte4_to_int(np.arange(256, dtype=np.uint8))
