"""Distributed k-means (Lloyd) over an embedding column (`list<float>`).

The domain-clustering primitive of training-data pipelines: cluster a corpus
by embedding, then sample/weight per cluster (data mixing), route near-dup
search (this is exactly the coarse-quantizer training step of the IVF index
in functions/similarity.py), or audit corpus composition.

Shape (the part that must hold at 100 TB):
  - every Lloyd iteration is ONE streaming pass over the Dataset — centroids
    are broadcast once per iteration via `ray.put`, each `map_batches` task
    assigns its batch with a vectorized argmin over squared distances and
    emits exactly k partial rows (cluster, count, per-dimension sums);
  - the partials are reduced by a tiny `groupby("cluster").sum(...)` — the
    driver only ever sees k rows per iteration, never the data;
  - the final assignment is one more streaming `map_batches` returning
    (id, cluster) — consumable as a Dataset (write_parquet / further stages).

Determinism: init = the embeddings of the k smallest ids (a pushed-down row
filter, no sort); assignment ties break to the lowest cluster id (np.argmin);
all arithmetic in float64 so the DuckDB oracle twin (unrolled-iteration CTEs
with list_distance) reproduces assignments exactly.

Reference analog: Elasticsearch has no clustering, but the reference's own
scale story for ANN (and this engine's IVF stage) requires exactly this
trainer; SURVEY.md lists clustering under the LLM-pipeline operator set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack(t: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)


def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    # squared euclidean via the expansion trick; argmin ties -> lowest cluster
    d2 = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + (C * C).sum(axis=1)
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, k: int = 8, iters: int = 3, *, vec_col: str = "embedding",
               id_col: str = "vec_id") -> np.ndarray:
    """Lloyd's algorithm; returns the (k, dim) float64 centroid matrix.

    One streaming pass per iteration; driver state is k×(dim+1) floats.
    Empty clusters keep their previous centroid (same rule in the oracle).
    """
    import ray
    import pyarrow.compute as pc

    seed = (ds.map_batches(lambda t: t.filter(pc.less(t[id_col], k)),
                           batch_format="pyarrow")
              .select_columns([id_col, vec_col]).take_all())
    seed.sort(key=lambda r: r[id_col])
    if len(seed) != k:
        raise ValueError(f"need ids 0..{k-1} present for deterministic init, got {len(seed)}")
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed])
    dim = C.shape[1]
    s_cols = [f"s{j}" for j in range(dim)]

    for _ in range(iters):
        c_ref = ray.put(C)

        def partials(t: pa.Table) -> pa.Table:
            Cm = ray.get(c_ref)
            V = _stack(t, vec_col)
            a = _assign(V, Cm)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, V)
            cols = {"cluster": pa.array(np.arange(k), pa.int64()),
                    "n": pa.array(counts, pa.int64())}
            for j, name in enumerate(s_cols):
                cols[name] = pa.array(sums[:, j], pa.float64())
            return pa.table(cols)

        red = (ds.select_columns([vec_col])
                 .map_batches(partials, batch_format="pyarrow", batch_size=4096)
                 .groupby("cluster").sum(["n"] + s_cols))
        rows = red.take_all()  # exactly k tiny rows
        newC = C.copy()
        for r in rows:
            c = int(r["cluster"])
            n = int(r["sum(n)"])
            if n > 0:
                newC[c] = np.array([r[f"sum({s})"] for s in s_cols]) / n
        C = newC
    return C


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Streaming assignment: Dataset of (id_col, cluster)."""
    import ray

    C = np.asarray(centroids, dtype=np.float64)
    c_ref = ray.put(C)

    def fn(t: pa.Table) -> pa.Table:
        a = _assign(_stack(t, vec_col), ray.get(c_ref))
        return pa.table({id_col: t[id_col], "cluster": pa.array(a, pa.int64())})

    return ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)


def kmeans(ds, k: int = 8, iters: int = 3, *, vec_col: str = "embedding",
           id_col: str = "vec_id"):
    """fit + assign; returns (centroids, assignment Dataset)."""
    C = kmeans_fit(ds, k, iters, vec_col=vec_col, id_col=id_col)
    return C, kmeans_assign(ds, C, vec_col=vec_col, id_col=id_col)


def semantic_dedup(ds, *, k: int = 8, iters: int = 3, tau: float = 0.5,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """SemDeDup (Abbas et al. 2023, public): k-means the embedding space,
    generate near-dup pairs ONLY within clusters (intra-cluster cosine >=
    tau), resolve duplicate groups with distributed connected components,
    keep each group's lowest-id representative.

    Scale shape: the O(n^2) cosine join of the naive path collapses to
    sum over clusters of O(|c|^2) — with k sized so |c| ~ n/k is
    batch-bounded; clusters too big for one group must be sub-bucketed
    (the LSH trick in dedup.embedding_dedup_lsh composes here unchanged).
    Pairs (bounded by the duplicate count) are the only materialized
    intermediate; components + anti-join are the same bucketed exchanges
    as dedup_keep_one. Returns a Dataset of kept (id, cluster)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from .dedup import _norm_block
    from .graph import anti_join_ids, connected_components

    C = kmeans_fit(ds, k, iters, vec_col=vec_col, id_col=id_col)
    c_ref = ray.put(C)

    def tag(t: pa.Table) -> pa.Table:
        a = _assign(_stack(t, vec_col), ray.get(c_ref))
        return (_norm_block(t, id_col, vec_col, np.float64)
                .append_column("cluster", pa.array(a, pa.int64())))

    tagged = (ds.select_columns([id_col, vec_col])
              .map_batches(tag, batch_format="pyarrow", batch_size=4096))

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        V = np.stack(g[vec_col].to_numpy())
        S = V @ V.T
        ii, jj = np.nonzero(np.triu(S >= tau, k=1))
        return pd.DataFrame({
            "doc_a": np.minimum(ids[ii], ids[jj]).astype(np.int64),
            "doc_b": np.maximum(ids[ii], ids[jj]).astype(np.int64)})

    pairs = tagged.groupby("cluster").map_groups(pairs_fn).materialize()
    assign = tagged.select_columns([id_col, "cluster"])
    if pairs.count() == 0:
        return assign
    comps = connected_components(pairs, a_col="doc_a", b_col="doc_b")
    drops = comps.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"].filter(
                pc.not_equal(t["doc_id"], t["component"]))}),
        batch_format="pyarrow")
    return anti_join_ids(assign, drops, id_col=id_col, ids_col="doc_id")


def embedding_second_moments(ds, *, vec_col: str = "embedding",
                             scale: int = 10_000) -> "pd.DataFrame":
    """Distributed EXACT second moments for PCA / whitening: embeddings are
    snapped to an integer grid (floor(v*scale + 0.5)), each batch emits one
    (count, sum-vector, sum-of-products matrix) partial — all int64 — and
    the driver folds them in arbitrary-precision Python ints. Output is the
    upper triangle of the population-covariance NUMERATOR
    ``n*S_xy - S_x*S_y`` per dimension pair (i <= j, 1-based): integers, so
    the distributed fold is bit-identical under any partitioning, unlike a
    float covariance whose summation order drifts. The eigen step that
    turns this into PCA axes runs on the driver over the tiny d x d matrix
    (see tests/test_session3.py) — only the moment accumulation touches
    the data and it is one streaming pass."""
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.int64())),
                             "sxy": pa.array([], pa.list_(pa.int64()))})
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        X = np.floor(V * scale + 0.5).astype(np.int64)
        sxy = X.T @ X  # (d, d) int64
        return pa.table({
            "n": pa.array([X.shape[0]], pa.int64()),
            "sx": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.int64())),
            "sxy": pa.array([sxy.reshape(-1).tolist()], pa.list_(pa.int64())),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    n = int(parts["n"].sum())
    d = len(parts["sx"].iloc[0])
    sx = [0] * d
    sxy = [[0] * d for _ in range(d)]
    for _, row in parts.iterrows():
        rx = row["sx"]
        rxy = row["sxy"]
        for i in range(d):
            sx[i] += int(rx[i])
            base = i * d
            ri = sxy[i]
            for j in range(d):
                ri[j] += int(rxy[base + j])
    rows_i, rows_j, nums = [], [], []
    for i in range(d):
        for j in range(i, d):
            rows_i.append(i + 1)
            rows_j.append(j + 1)
            nums.append(n * sxy[i][j] - sx[i] * sx[j])
    # the python-int FOLD is exact at any size, but the int64 OUTPUT bounds
    # n: cov_num ~ n^2 * (scale*x)^2 passes 2^63 around a few million rows
    # at scale=1e4 — fail loudly rather than wrap, and advise the knob
    if nums and max(abs(v) for v in nums) >= (1 << 63):
        raise OverflowError(
            "covariance numerator exceeds int64 — lower `scale` (the grid "
            "is exact at any resolution) or shard the moment pass")
    return pd.DataFrame({
        "i": pd.array(rows_i, dtype="int64"),
        "j": pd.array(rows_j, dtype="int64"),
        "cov_num": pd.array(nums, dtype="int64"),
    })
