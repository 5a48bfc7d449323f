"""Similarity search over an embedding column (`list<float>`).

Baseline: brute-force cosine top-k — each map_batches task matmuls its batch
against a BROADCAST query matrix (`ray.put` once, fetched per actor/task, the
small-side-broadcast pattern), emitting per-batch partial top-k; a tiny final
reduce merges partials. Nothing materializes the full dataset.

Scale path: LSH-bucketed variant — random-hyperplane signatures route vectors
into buckets (groupby), queries probe only their own (and neighboring)
buckets. IVF would replace the hash with k-means coarse centroids; the
plumbing is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..utils import round_half_away


def _normalize(V: np.ndarray) -> np.ndarray:
    return V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)


def knn_brute_force(ds, queries: np.ndarray, k: int = 10, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns frame
    (query_id, vec_id, cosine, rank) sorted by (query_id, rank).
    dtype=float32 for speed; float64 when exact oracle comparison matters."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=dtype))
    q_ref = ray.put(Q)

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = t[id_col].to_numpy()
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        V = _normalize(V.astype(dtype))
        S = Qm @ V.T  # (nq, batch)
        nq = S.shape[0]
        kk = min(k, S.shape[1])
        top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        rows = {"query_id": [], id_col: [], "cosine": []}
        for qi in range(nq):
            for c in top[qi]:
                rows["query_id"].append(qi)
                rows[id_col].append(int(ids[c]))
                rows["cosine"].append(float(S[qi, c]))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "cosine": pa.array(rows["cosine"], pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)
    df = partials.to_pandas()
    # final reduce: per query, global top-k with (cosine desc, id asc) ties
    df = df.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = round_half_away(df["cosine"], 6)
    return df


class LshIndexStage:
    """Random-hyperplane LSH bucketing: adds a bucket column (signature of
    sign bits). Hyperplanes are deterministic (seeded) and compiled once per
    actor; queries use the same planes to probe buckets."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 99,
                 vec_col: str = "embedding", dtype=np.float32):
        rng = np.random.default_rng(seed)
        # planes are DRAWN in float64 and quantized to float32 first so the
        # constants are identical across dtypes; dtype only sets the dot
        # precision (float64 for oracle-matched gates: SQL signs agree up to
        # ~1e-15 instead of fp32's ~5e-6, which one measured margin undercut)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float32).astype(dtype)
        self.dtype = dtype
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        V = np.stack(t[self.vec_col].to_numpy(zero_copy_only=False)).astype(self.dtype)
        bits = (V @ self.planes.T) > 0
        bucket = (bits.astype(np.uint32) << np.arange(bits.shape[1], dtype=np.uint32)).sum(
            axis=1
        )
        return t.append_column("bucket", pa.array(bucket.astype(np.int64)))


def knn_lsh(ds, queries: np.ndarray, k: int = 10, *, dim: int | None = None,
            n_planes: int = 8, seed: int = 99, vec_col: str = "embedding",
            id_col: str = "vec_id", probe_hamming: int = 1,
            dtype=np.float32) -> pd.DataFrame:
    """Approximate cosine top-k: vectors bucketed by LSH signature; each query
    probes its bucket plus all buckets within `probe_hamming` bit flips."""
    Q = np.asarray(queries, dtype=np.float32)
    if dim is None:
        dim = Q.shape[1]
    stage = LshIndexStage(dim, n_planes, seed, vec_col)
    bucketed = ds.map_batches(stage, batch_format="pyarrow")

    qbits = (Q @ stage.planes.T) > 0
    qbuckets = (qbits.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    probes: dict[int, list[int]] = {}
    import itertools

    for qi, b in enumerate(qbuckets):
        cand = {int(b)}
        # all buckets within probe_hamming bit flips (multi-probe LSH)
        for r in range(1, probe_hamming + 1):
            for bits in itertools.combinations(range(n_planes), r):
                flip = 0
                for j in bits:
                    flip |= 1 << j
                cand.add(int(b) ^ flip)
        probes[qi] = sorted(cand)
    wanted = sorted({b for bs in probes.values() for b in bs})

    import pyarrow.compute as pc

    wanted_arr = pa.array(wanted, pa.int64())
    sub = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted_arr)),
        batch_format="pyarrow",
    ).select_columns([id_col, vec_col, "bucket"])
    return _bucketed_topk(sub, _normalize(Q.astype(dtype)), probes, "bucket", k,
                          vec_col, id_col, dtype)


# ---------------- IVF (coarse-quantizer ANN, the scale path) ----------------


def _kmeans(V: np.ndarray, k: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic seeded k-means (numpy, k-means++ init-lite)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(V.shape[0], size=k, replace=False)
    C = V[idx].copy()
    for _ in range(iters):
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = V[m].mean(axis=0)
    return C


class IvfIndexStage:
    """IVF coarse assignment: adds `centroid:int64` via a broadcast centroid
    matrix (the k-means runs once on a driver-side sample; at scale this is
    the classic IVF train-on-sample / assign-distributed split)."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.C = centroids.astype(np.float32)
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        V = np.stack(t[self.vec_col].to_numpy(zero_copy_only=False)).astype(np.float32)
        d = ((V[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2)
        return t.append_column("centroid", pa.array(d.argmin(axis=1).astype(np.int64)))


def knn_ivf(ds, queries: np.ndarray, k: int = 10, *, n_centroids: int = 16,
            nprobe: int = 4, seed: int = 7, vec_col: str = "embedding",
            id_col: str = "vec_id", train_sample: int = 2048) -> pd.DataFrame:
    """IVF ANN: train centroids on a sample, assign vectors (map_batches),
    probe the `nprobe` nearest centroid buckets per query."""
    import pyarrow.compute as pc

    sample = ds.limit(train_sample).to_pandas()
    Vs = np.stack(sample[vec_col].to_numpy()).astype(np.float32)
    C = _kmeans(Vs, min(n_centroids, Vs.shape[0]), seed=seed)
    stage = IvfIndexStage(C, vec_col)
    assigned = ds.map_batches(stage, batch_format="pyarrow")

    Q = np.asarray(queries, dtype=np.float32)
    dq = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(dq, axis=1)[:, :nprobe]
    wanted = pa.array(sorted(set(probes.flatten().tolist())), pa.int64())
    sub = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["centroid"], value_set=wanted)),
        batch_format="pyarrow",
    ).select_columns([id_col, vec_col, "centroid"])
    probe_map = {qi: [int(b) for b in probes[qi]] for qi in range(Q.shape[0])}
    return _bucketed_topk(sub, _normalize(Q.astype(np.float64)), probe_map,
                          "centroid", k, vec_col, id_col, np.float64)


def _bucketed_topk(sub_ds, Qn: np.ndarray, probes: dict[int, list[int]],
                   bucket_col: str, k: int, vec_col: str, id_col: str,
                   dtype) -> pd.DataFrame:
    """Dataset-side scoring of probed candidates: every batch scores ALL
    queries against its rows, masks out rows whose bucket the query does not
    probe, and emits a per-batch partial top-k — the driver only merges the
    tiny (n_batches x n_queries x k) partial set. Nothing collects the
    candidate vectors."""
    import ray

    inv: dict[int, list[int]] = {}
    for qi, bs in probes.items():
        for b in bs:
            inv.setdefault(int(b), []).append(qi)
    nq = Qn.shape[0]
    shared = ray.put((Qn.astype(dtype), inv))

    def partial(t: pa.Table) -> pa.Table:
        Qm, inv_m = ray.get(shared)
        ids = t[id_col].to_numpy()
        buckets = t[bucket_col].to_numpy()
        V = _normalize(np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(dtype))
        S = Qm @ V.T  # (nq, batch)
        mask = np.zeros((nq, ids.size), dtype=bool)
        for b in np.unique(buckets):
            for qi in inv_m.get(int(b), ()):
                mask[qi, buckets == b] = True
        S = np.where(mask, S, -np.inf)
        rows = {"query_id": [], id_col: [], "cosine": []}
        kk = min(k, ids.size)
        top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        for qi in range(nq):
            for c in top[qi]:
                if mask[qi, c]:
                    rows["query_id"].append(qi)
                    rows[id_col].append(int(ids[c]))
                    rows["cosine"].append(
                        float(round_half_away(float(S[qi, c]), 6)))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            id_col: pa.array(rows[id_col], pa.int64()),
            "cosine": pa.array(rows["cosine"], pa.float64()),
        })

    df = sub_ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=4096).to_pandas()
    if df.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "cosine": pd.Series([], dtype=np.float64),
                             "rank": pd.Series([], dtype=np.int64)})
    df = df.sort_values(["query_id", "cosine", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df
