"""Distributed k-means (functions/clustering.py): planted-cluster recovery,
exact parity with a single-process reference implementation, empty-cluster
rule, and assignment determinism across partition counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from elasticsearch_ray.functions import clustering as CL


def _blobs(n_per: int = 40, k: int = 4, dim: int = 8, seed: int = 7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 10.0
    pts, labels = [], []
    for c in range(k):
        pts.append(centers[c] + rng.normal(scale=0.1, size=(n_per, dim)))
        labels += [c] * n_per
    V = np.concatenate(pts).astype(np.float32)
    labels = np.array(labels)
    # deterministic-init contract: ids 0..k-1 seed the clusters — put one
    # point from each blob first, shuffle the rest
    first = np.array([c * n_per for c in range(k)])
    rest = rng.permutation(np.setdiff1d(np.arange(len(V)), first))
    order = np.concatenate([first, rest])
    V, labels = V[order], labels[order]
    df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64),
                       "embedding": list(V), "label": labels})
    return df, V


def _reference_kmeans(V: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Single-process Lloyd with the same deterministic rules."""
    V = V.astype(np.float64)
    C = V[:k].copy()
    for _ in range(iters):
        d2 = ((V[:, None, :] - C[None]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                C[c] = V[m].mean(axis=0)
    d2 = ((V[:, None, :] - C[None]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def test_kmeans_parity_with_reference():
    df, V = _blobs()
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(5)
    _, assign = CL.kmeans(ds, k=4, iters=3)
    out = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # _blobs interleaves, but vec_id order == row order in df
    ref = _reference_kmeans(V, k=4, iters=3)
    assert (out["cluster"].to_numpy() == ref).all()


def test_kmeans_recovers_planted_blobs():
    df, _ = _blobs(n_per=50, k=4)
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(3)
    _, assign = CL.kmeans(ds, k=4, iters=5)
    out = assign.to_pandas().merge(df[["vec_id", "label"]], on="vec_id")
    # every found cluster should be label-pure (blobs are tight, sigma=0.01*sep)
    purity = (out.groupby("cluster")["label"]
                 .agg(lambda s: s.value_counts().iloc[0] / len(s)))
    assert (purity > 0.95).all()


def test_kmeans_partition_invariance():
    df, _ = _blobs(n_per=30, k=3, seed=11)
    a_out = None
    for parts in (1, 7):
        ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(parts)
        _, assign = CL.kmeans(ds, k=3, iters=3)
        out = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
        if a_out is None:
            a_out = out
        else:
            assert (out == a_out).all()


def test_kmeans_empty_cluster_keeps_centroid():
    # two far blobs, k=3: seed ids 0,1,2 — id 2's centroid is captured by a
    # nearer one after iteration 1 and goes empty; its centroid must persist
    # (and the run must not crash or NaN).
    V = np.array([[0.0, 0.0], [10.0, 10.0], [0.1, 0.1],
                  [0.0, 0.1], [10.1, 10.0], [9.9, 10.1]], dtype=np.float32)
    df = pd.DataFrame({"vec_id": np.arange(6, dtype=np.int64),
                       "embedding": list(V)})
    ds = rd.from_pandas(df)
    C, assign = CL.kmeans(ds, k=3, iters=4)
    assert not np.isnan(C).any()
    out = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    ref = _reference_kmeans(V, k=3, iters=4)
    assert (out == ref).all()


def test_kmeans_fit_requires_seed_ids():
    df = pd.DataFrame({"vec_id": np.arange(5, 10, dtype=np.int64),
                       "embedding": list(np.zeros((5, 3), dtype=np.float32))})
    with pytest.raises(ValueError):
        CL.kmeans_fit(rd.from_pandas(df), k=4, iters=1)


def test_semantic_dedup_planted():
    import numpy as np
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions.clustering import semantic_dedup

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    # plant near-dups: 40 clones base[5]; 41 and 42 both clone base[3]
    vecs = np.vstack([base,
                      base[5] + 1e-4 * rng.randn(16),
                      base[3] + 1e-4 * rng.randn(16),
                      base[3] - 1e-4 * rng.randn(16)])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))}))
    kept = semantic_dedup(ds, k=4, iters=2, tau=0.95).to_pandas()
    ids = set(kept["vec_id"])
    # representatives (min id per group) survive; clones die
    assert 3 in ids and 5 in ids
    assert not {40, 41, 42} & ids
    assert len(ids) == 40


def test_semantic_dedup_no_pairs():
    import numpy as np
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions.clustering import semantic_dedup

    V = np.eye(8)  # orthogonal: zero cosine everywhere
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(8), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64()))}))
    kept = semantic_dedup(ds, k=4, iters=1, tau=0.5).to_pandas()
    assert sorted(kept["vec_id"]) == list(range(8))
