"""Document routing: murmur3_x86_32 over UTF-16LE code units, floorMod shard.

Faithful to the reference's cluster/routing/Murmur3HashFunction.java:34-48
(each char emitted as two little-endian bytes, hashed with
StringHelper.murmurhash3_x86_32 at seed 0) and OperationRouting's
``Math.floorMod(hash(routing), numShards)`` shard selection, validated
against the exact known vectors in Murmur3HashFunctionTests.java:28-34.

At scale this is the partitioning primitive: custom routing co-locates all
docs sharing a routing key on one shard, so a routed search opens 1/N of
the segments. Ray-side the assignment is a vectorized map_batches column
(the 32-bit hash per distinct key is computed once per batch via a dict,
distinct routing keys being few by construction of the feature)."""

from __future__ import annotations

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Appleby's public domain reference algorithm,
    as wrapped by Lucene StringHelper). Returns a SIGNED 32-bit int, like
    the Java implementation the reference routes with."""
    h = seed & _M32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4:i * 4 + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4:]
    k1 = 0
    if len(tail) >= 3:
        k1 ^= tail[2] << 16
    if len(tail) >= 2:
        k1 ^= tail[1] << 8
    if len(tail) >= 1:
        k1 ^= tail[0]
        k1 = (k1 * _C1) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h ^= k1
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    # to signed 32-bit (Java int)
    return h - (1 << 32) if h >= (1 << 31) else h


def routing_hash(routing: str) -> int:
    """Murmur3HashFunction.hash(String): chars as UTF-16LE code-unit bytes.
    (For BMP-only strings this equals ``routing.encode('utf-16-le')``;
    supplementary-plane chars are surrogate pairs in Java, which UTF-16LE
    encoding reproduces exactly.)"""
    return murmur3_x86_32(routing.encode("utf-16-le"), 0)


def shard_for(routing: str, num_shards: int) -> int:
    """OperationRouting: Math.floorMod(hash(routing), numShards). Python's
    % on ints is already floorMod."""
    return routing_hash(routing) % num_shards


def assign_shards(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Vectorized per-row shard assignment for a string key column: hash
    each DISTINCT key once (routing keys are low-cardinality by design),
    then broadcast via factorize — no per-row Python hashing in the hot
    path."""
    codes, uniques = _factorize(keys)
    table = np.array([shard_for(str(u), num_shards) for u in uniques],
                     dtype=np.int64)
    return table[codes]


def _factorize(keys: np.ndarray):
    import pandas as pd

    codes, uniques = pd.factorize(keys)
    return codes, uniques
