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


# ---------------- int8 scalar quantization (vector scale path) --------------


def _partial_topk_table(S: np.ndarray, ids: np.ndarray, k: int,
                        id_col: str, score_name: str) -> pa.Table:
    """Per-batch partial top-k that KEEPS TIES at the k boundary: integer
    scores tie often, and argpartition alone would drop an arbitrary tied
    candidate before the driver's deterministic (score desc, id asc) merge
    — the kept set must be a superset of every possible global top-k."""
    out_q: list[int] = []
    out_i: list[int] = []
    out_s: list[int] = []
    kk = min(k, S.shape[1])
    if kk == 0:  # empty block (repartition can produce them)
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            score_name: pa.array([], pa.int64()),
        })
    for qi in range(S.shape[0]):
        row = S[qi]
        thresh = np.partition(row, -kk)[-kk]
        keep = np.flatnonzero(row >= thresh)
        out_q.extend([qi] * len(keep))
        out_i.extend(int(ids[c]) for c in keep)
        out_s.extend(int(row[c]) for c in keep)
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        id_col: pa.array(out_i, pa.int64()),
        score_name: pa.array(out_s, pa.int64()),
    })


def embedding_max_abs(ds, *, vec_col: str = "embedding") -> float:
    """Global max absolute component over an embedding column: each batch
    reduces to ONE scalar, the driver folds the tiny partials. Max is
    order-independent, so the distributed fold is exact regardless of
    block boundaries."""
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.float64())})
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({"m": pa.array([float(np.abs(V).max())], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192).to_pandas()
    return float(parts["m"].max())


def _quantize(V: np.ndarray, scale: float, qmax: int) -> np.ndarray:
    """floor(v / scale * qmax + 0.5) clamped to [-qmax, qmax] — a SYMMETRIC
    signed grid (like Lucene ScalarQuantizer's confidence-interval grid with
    a symmetric interval), computed identically in IEEE double by numpy and
    the DuckDB oracle. Symmetry keeps the integer dot product proportional
    to the float dot product (no per-vector offset term), so ranking by the
    int64 dot IS max-inner-product ranking on the grid."""
    q = np.floor(V.astype(np.float64) / (scale if scale != 0 else 1.0)
                 * qmax + 0.5)
    return np.clip(q, -qmax, qmax).astype(np.int64)


def knn_scalar_quantized(ds, queries: np.ndarray, k: int = 5, *, bits: int = 8,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> pd.DataFrame:
    """Scalar-quantized top-k (the int8 vector-search scale path, after
    Lucene's ScalarQuantizer / the ES dense_vector int8 index option, in
    `max_inner_product` similarity mode): a symmetric signed-int8 grid
    scaled by the global max |component|, candidates ranked by INTEGER dot
    product — 4 bytes/dim shrinks to 1, and the per-batch kernel is an
    int64 matmul.

    Two passes, both streaming: (1) `embedding_max_abs` folds per-batch
    scalar partials, (2) the quantized query matrix + grid scale are
    broadcast once via ray.put and every batch emits a per-batch partial
    top-k; the driver merges (num_batches x num_queries x k) rows. Integer
    scores make the result exactly reproducible across any partitioning."""
    import ray

    qmax = (1 << (bits - 1)) - 1
    m = embedding_max_abs(ds, vec_col=vec_col)
    Qq = _quantize(np.asarray(queries, dtype=np.float64), m, qmax)
    b_ref = ray.put((m, Qq))

    def partial_topk(t: pa.Table) -> pa.Table:
        m_, Qm = ray.get(b_ref)
        if t.num_rows == 0:
            return _partial_topk_table(
                np.zeros((1, 0), np.int64), np.zeros(0, np.int64), k,
                id_col, "qdot")
        ids = t[id_col].to_numpy()
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        Vq = _quantize(V, m_, qmax)
        S = Qm @ Vq.T  # int64 (nq, batch)
        return _partial_topk_table(S, ids, k, id_col, "qdot")

    df = ds.map_batches(partial_topk, batch_format="pyarrow",
                        batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "qdot", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df


# ---------------- reciprocal rank fusion ------------------------------------


def rrf_fuse(rankings: list[pd.DataFrame], *, id_col: str, k: int = 10,
             rank_constant: int = 60) -> pd.DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher 2009 — the
    published hybrid-retrieval combiner): score(d) = sum over result lists
    of 1/(rank_constant + rank_d). Each input frame carries (id_col, rank)
    with rank starting at 1; fusion itself is O(sum of list lengths) on the
    driver — the retrievers it combines are the distributed stages."""
    acc: dict[int, float] = {}
    for fr in rankings:
        for i, r in zip(fr[id_col].to_numpy(), fr["rank"].to_numpy()):
            acc[int(i)] = acc.get(int(i), 0.0) + 1.0 / (rank_constant + int(r))
    rows = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame({
        id_col: pd.array([r[0] for r in rows], dtype="int64"),
        "rrf_score": [float(round_half_away(r[1], 6)) for r in rows],
    })


# ---------------- binary quantization (1-bit vector scale path) -------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def knn_binary_quantized(ds, queries: np.ndarray, k: int = 5, *,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id") -> pd.DataFrame:
    """1-bit binary quantization (the BBQ-style extreme of the quantization
    ladder: 32x smaller than float32): each component collapses to its sign
    bit, candidates ranked by BIT AGREEMENT = dims - hamming(q, v). Bits
    pack into uint64 words; the per-batch kernel is XOR + byte-popcount-LUT
    (same kernel as the SimHash dedup stage). Integer scores are exactly
    reproducible under any partitioning, and the only broadcast is the
    packed query matrix. One streaming pass, no training."""
    import ray

    Qb = np.asarray(queries, dtype=np.float64) > 0
    dims = Qb.shape[1]
    q_ref = ray.put(np.packbits(Qb, axis=1))

    def partial_topk(t: pa.Table) -> pa.Table:
        Qp = ray.get(q_ref)
        if t.num_rows == 0:
            return _partial_topk_table(
                np.zeros((1, 0), np.int64), np.zeros(0, np.int64), k,
                id_col, "agree")
        ids = t[id_col].to_numpy()
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        Vp = np.packbits(V.astype(np.float64) > 0, axis=1)
        # hamming via XOR outer product: (nq, batch, bytes)
        x = Qp[:, None, :] ^ Vp[None, :, :]
        ham = _POP8[x].sum(axis=2).astype(np.int64)
        S = dims - ham  # bit agreement
        return _partial_topk_table(S, ids, k, id_col, "agree")

    df = ds.map_batches(partial_topk, batch_format="pyarrow",
                        batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "agree", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df


# ---------------- product quantization (PQ, the memory scale path) ----------


def train_pq(ds, *, m_subspaces: int = 8, k_centroids: int = 16,
             iters: int = 3, sample_cap: int = 4096,
             vec_col: str = "embedding", id_col: str = "vec_id",
             grid: int = 10_000) -> np.ndarray:
    """Train PQ codebooks (Jegou et al. 2011, 'Product Quantization for
    Nearest Neighbor Search'): split dims into m subspaces, k-means each on
    a BOUNDED deterministic sample (Knuth-hash draw on the id column, like
    the IVF trainer), fixed iterations, deterministic stride init. The
    returned codebooks are SNAPPED to an integer grid (floor(c*grid + 0.5))
    so downstream code assignment and ADC scoring are all-integer —
    bit-identical under any partitioning. Codebook size is tiny
    (m * k * dim/m floats) and ships by value."""
    # size the draw to the dataset: expected ~sample_cap survivors, so the
    # driver collect is BOUNDED at any corpus size (n // m keeps it O(cap))
    n_rows = ds.count()
    m = np.uint64(max(1, n_rows // sample_cap))

    def take_sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        # multiplicative hash, HIGH bits: the Knuth constant is 1 (mod 4),
        # so taking the product mod a small power of two degenerates to a
        # stride sample (ids % m) — shift the mixed bits down first
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) >> np.uint64(16)
        return t.filter(pa.array(h % m == 0))

    # sort the sample by id: Ray's streaming executor does not preserve
    # block order (preserve_order=False default), and codebook training
    # must be deterministic for the differential twin / reproducible builds
    sample = (ds.map_batches(take_sample, batch_format="pyarrow")
              .to_pandas().sort_values(id_col).reset_index(drop=True))
    V = np.stack(sample[vec_col].to_numpy())[:sample_cap].astype(np.float64)
    d = V.shape[1]
    assert d % m_subspaces == 0, "dims must divide into subspaces"
    sub = d // m_subspaces
    books = np.zeros((m_subspaces, k_centroids, sub))
    for mi in range(m_subspaces):
        X = V[:, mi * sub:(mi + 1) * sub]
        # deterministic stride init over the sample
        idx = (np.arange(k_centroids) * max(1, len(X) // k_centroids)) % len(X)
        C = X[idx].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(k_centroids):
                mask = assign == ci
                if mask.any():
                    C[ci] = X[mask].mean(axis=0)
        books[mi] = C
    return np.floor(books * grid + 0.5).astype(np.int64)


def knn_pq(ds, queries: np.ndarray, codebooks: np.ndarray, k: int = 5, *,
           vec_col: str = "embedding", id_col: str = "vec_id",
           grid: int = 10_000) -> pd.DataFrame:
    """PQ asymmetric-distance top-k: each batch snaps its vectors to the integer
    grid, assigns each subspace to its nearest (squared-L2, ties lowest
    code) centroid — m uint8 codes replace dim floats — then scores every
    query via ADC table lookups: dot(q, v) ~ sum_m table[m, code_m] where
    table = integer query-subvector x codebook dots. All arithmetic int64,
    so the gate result is partition-invariant; the codebooks + query tables
    are one small ray.put broadcast."""
    import ray

    Qi = np.floor(np.asarray(queries, dtype=np.float64) * grid + 0.5).astype(np.int64)
    m_sub, k_cent, sub = codebooks.shape
    # ADC tables: (nq, m, k) integer dots
    tables = np.einsum("qmd,mkd->qmk", Qi.reshape(Qi.shape[0], m_sub, sub),
                       codebooks)
    b_ref = ray.put((codebooks, tables))

    def partial_topk(t: pa.Table) -> pa.Table:
        books, tabs = ray.get(b_ref)
        if t.num_rows == 0:
            return _partial_topk_table(
                np.zeros((1, 0), np.int64), np.zeros(0, np.int64), k,
                id_col, "adc")
        ids = t[id_col].to_numpy()
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vi = np.floor(V * grid + 0.5).astype(np.int64)
        n = Vi.shape[0]
        codes = np.zeros((n, m_sub), dtype=np.int64)
        for mi in range(m_sub):
            X = Vi[:, mi * sub:(mi + 1) * sub]
            d2 = ((X[:, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d2.argmin(axis=1)  # argmin takes lowest index tie
        # ADC: S[q, v] = sum_m tabs[q, m, codes[v, m]]
        S = np.zeros((tabs.shape[0], n), dtype=np.int64)
        for mi in range(m_sub):
            S += tabs[:, mi, :][:, codes[:, mi]]
        return _partial_topk_table(S, ids, k, id_col, "adc")

    df = ds.map_batches(partial_topk, batch_format="pyarrow",
                        batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "adc", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df


def knn_ivf_pq(ds, queries: np.ndarray, k: int = 5, *, n_centroids: int = 16,
               nprobe: int = 4, seed: int = 7, m_subspaces: int = 8,
               k_centroids: int = 16, pq_iters: int = 3,
               vec_col: str = "embedding", id_col: str = "vec_id",
               grid: int = 10_000) -> pd.DataFrame:
    """IVF-PQ (the composed production ANN shape, Jegou 2011 §IV): a coarse
    k-means quantizer routes vectors into inverted lists (IvfIndexStage),
    each query probes only its `nprobe` nearest lists, and candidates are
    scored by the integer ADC dot against broadcast PQ codebooks — the
    scan touches m bytes per probed vector instead of 4*dim. Both trainers
    run on bounded samples; the per-batch kernel masks out rows whose list
    the query does not probe, so one pass serves every query."""
    import ray

    import pyarrow.compute as pc

    sample = ds.limit(2048).to_pandas()
    Vs = np.stack(sample[vec_col].to_numpy()).astype(np.float32)
    C = _kmeans(Vs, min(n_centroids, Vs.shape[0]), seed=seed)
    stage = IvfIndexStage(C, vec_col)
    assigned = ds.map_batches(stage, batch_format="pyarrow")

    Q = np.asarray(queries, dtype=np.float64)
    dq = ((Q.astype(np.float32)[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(dq, axis=1)[:, :nprobe]
    wanted = pa.array(sorted(set(probes.flatten().tolist())), pa.int64())
    sub = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["centroid"], value_set=wanted)),
        batch_format="pyarrow",
    ).select_columns([id_col, vec_col, "centroid"])

    books = train_pq(ds, m_subspaces=m_subspaces, k_centroids=k_centroids,
                     iters=pq_iters, vec_col=vec_col, id_col=id_col,
                     grid=grid)
    m_sub, k_cent, sub_d = books.shape
    Qi = np.floor(Q * grid + 0.5).astype(np.int64)
    tables = np.einsum("qmd,mkd->qmk", Qi.reshape(Qi.shape[0], m_sub, sub_d),
                       books)
    probe_sets = [set(int(b) for b in probes[qi]) for qi in range(Q.shape[0])]
    b_ref = ray.put((books, tables, probe_sets))

    def partial_topk(t: pa.Table) -> pa.Table:
        books_, tabs, psets = ray.get(b_ref)
        if t.num_rows == 0:
            return _partial_topk_table(np.zeros((1, 0), np.int64),
                                       np.zeros(0, np.int64), k, id_col,
                                       "adc")
        ids = t[id_col].to_numpy()
        cents = t["centroid"].to_numpy()
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vi = np.floor(V * grid + 0.5).astype(np.int64)
        n = Vi.shape[0]
        codes = np.zeros((n, m_sub), dtype=np.int64)
        for mi in range(m_sub):
            X = Vi[:, mi * sub_d:(mi + 1) * sub_d]
            d2 = ((X[:, None, :] - books_[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d2.argmin(axis=1)
        S = np.zeros((len(psets), n), dtype=np.int64)
        for mi in range(m_sub):
            S += tabs[:, mi, :][:, codes[:, mi]]
        # mask rows whose inverted list this query does not probe
        LOW = np.int64(-(1 << 62))
        for qi, ps in enumerate(psets):
            mask = np.array([int(c) not in ps for c in cents])
            S[qi, mask] = LOW
        out = _partial_topk_table(S, ids, k, id_col, "adc")
        import pyarrow.compute as _pc

        return out.filter(_pc.greater(out["adc"], LOW))

    df = sub.map_batches(partial_topk, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    df = df.sort_values(["query_id", "adc", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df


# ---------------- HNSW (per-segment graphs, the reference's kNN engine) ----


def _hash_u01(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-id uniform in (0,1) (Knuth multiplicative hash) —
    replaces the RNG in HNSW level assignment so builds are reproducible
    and partition-invariant."""
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    return (h.astype(np.float64) + 0.5) / float(1 << 32)


class _HnswSegment:
    """One segment's HNSW graph (Malkov & Yashunin 2016, the structure
    behind Lucene's Lucene90HnswVectorsFormat / ES dense_vector kNN):
    hierarchical layers, greedy descent above the base layer, beam search
    (efConstruction / efSearch) at each target layer, M-degree neighbor
    lists pruned by similarity. Cosine on pre-normalized vectors."""

    def __init__(self, ids: np.ndarray, V: np.ndarray, *, M: int = 8,
                 ef_construction: int = 64):
        self.ids = ids
        self.V = V  # normalized (n, d)
        self.M = M
        self.m0 = 2 * M
        n = len(ids)
        mL = 1.0 / np.log(M)
        self.levels = np.floor(-np.log(_hash_u01(ids)) * mL).astype(np.int64)
        self.max_level = int(self.levels.max()) if n else 0
        # adjacency per layer: list of dict node -> np.ndarray of neighbors
        self.adj: list[dict[int, list[int]]] = [
            {} for _ in range(self.max_level + 1)]
        self.entry = 0
        order = np.argsort(ids)  # deterministic insertion order
        first = True
        for i in order:
            self._insert(int(i), ef_construction, first)
            first = False

    def _beam(self, q: np.ndarray, entry: int, ef: int, layer: int,
              allowed_max_level: int | None = None) -> list[int]:
        """Best-first beam search on one layer; returns candidate nodes
        sorted by similarity desc (at most ef)."""
        import heapq

        sims = {entry: float(self.V[entry] @ q)}
        visited = {entry}
        cand = [(-sims[entry], entry)]          # max-heap by sim
        best: list[tuple[float, int]] = [(sims[entry], entry)]  # min-heap
        while cand:
            negs, u = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            for v in self.adj[layer].get(u, ()):
                if v in visited:
                    continue
                visited.add(v)
                s = float(self.V[v] @ q)
                sims[v] = s
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, v))
                    heapq.heappush(best, (s, v))
                    if len(best) > ef:
                        heapq.heappop(best)
        return [v for _, v in sorted(best, key=lambda t: (-t[0],
                                                          self.ids[t[1]]))]

    def _insert(self, i: int, ef: int, first: bool) -> None:
        if first:
            for lv in range(int(self.levels[i]) + 1):
                self.adj[lv][i] = []
            self.entry = i
            self.entry_level = int(self.levels[i])
            return
        q = self.V[i]
        lv_i = int(self.levels[i])
        ep = self.entry
        # greedy descent through layers above the node's top level
        for lv in range(self.entry_level, lv_i, -1):
            ep = self._beam(q, ep, 1, lv)[0]
        for lv in range(min(lv_i, self.entry_level), -1, -1):
            cands = self._beam(q, ep, ef, lv)
            mmax = self.m0 if lv == 0 else self.M
            nbrs = cands[:self.M]
            self.adj[lv][i] = list(nbrs)
            for v in nbrs:
                lst = self.adj[lv].setdefault(v, [])
                lst.append(i)
                if len(lst) > mmax:
                    # prune to the mmax most similar (diversity heuristic
                    # simplified to plain top-by-sim, as Lucene's
                    # NeighborArray does on overflow)
                    s = self.V[lst] @ self.V[v]
                    keep = np.argsort(-s, kind="stable")[:mmax]
                    self.adj[lv][v] = [lst[j] for j in keep]
            ep = cands[0]
        if lv_i > self.entry_level:
            for lv in range(self.entry_level + 1, lv_i + 1):
                self.adj[lv][i] = []
            self.entry = i
            self.entry_level = lv_i

    def search(self, q: np.ndarray, k: int, ef_search: int = 50):
        ep = self.entry
        for lv in range(self.entry_level, 0, -1):
            ep = self._beam(q, ep, 1, lv)[0]
        found = self._beam(q, ep, max(ef_search, k), 0)[:k]
        sims = self.V[found] @ q
        return self.ids[found], sims


def knn_hnsw(ds, queries: np.ndarray, k: int = 5, *, seg_rows: int = 1000,
             M: int = 8, ef_construction: int = 64, ef_search: int = 50,
             vec_col: str = "embedding", id_col: str = "vec_id"
             ) -> pd.DataFrame:
    """Approximate kNN through per-segment HNSW graphs — the reference's
    exact architecture (each Lucene segment holds its own HNSW; the shard
    searches every segment graph and merges top-k, see
    KnnVectorQuery / Lucene90HnswVectorsReader). Scale shape: vectors
    co-partition into bounded segments via ONE groupby; each group builds
    its graph and answers the broadcast query matrix; the driver merges
    (segments x queries x k) candidate rows. Graph build cost is bounded
    per segment (seg_rows), never global."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(Q)

    def seg_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "seg", pa.array(t[id_col].to_numpy() // seg_rows))

    def build_and_search(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        Qm = _ray.get(q_ref)
        ids = df[id_col].to_numpy().astype(np.int64)
        V = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        g = _HnswSegment(ids, V, M=M, ef_construction=ef_construction)
        rows = {"query_id": [], id_col: [], "cosine": []}
        for qi in range(Qm.shape[0]):
            got_ids, sims = g.search(Qm[qi], k, ef_search)
            rows["query_id"].extend([qi] * len(got_ids))
            rows[id_col].extend(got_ids.tolist())
            rows["cosine"].extend(sims.tolist())
        return pd.DataFrame(rows)

    parts = (ds.map_batches(seg_key, batch_format="pyarrow")
             .groupby("seg").map_groups(build_and_search,
                                        batch_format="pandas")
             .to_pandas())
    parts = parts.sort_values(["query_id", "cosine", id_col],
                              ascending=[True, False, True])
    out = parts.groupby("query_id", as_index=False).head(k)
    out = out.reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out["cosine"] = round_half_away(out["cosine"], 6)
    out["query_id"] = out["query_id"].astype("int64")
    out[id_col] = out[id_col].astype("int64")
    return out[["query_id", id_col, "cosine", "rank"]]


def knn_l2(ds, queries: np.ndarray, k: int = 5, *,
           vec_col: str = "embedding", id_col: str = "vec_id"
           ) -> pd.DataFrame:
    """Exact kNN under euclidean distance (dense_vector
    similarity=l2_norm — DenseVectorFieldMapper.VectorSimilarity.L2_NORM).
    Same broadcast-queries / per-batch-partial-top-k shape as the cosine
    path; candidates ranked by distance asc, vec_id asc."""
    import ray

    Q = np.asarray(queries, dtype=np.float64)
    q_ref = ray.put(Q)

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = t[id_col].to_numpy()
        if ids.size == 0:  # zero-row block
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64)
        # (nq, batch) squared distances via the norm expansion
        d2 = (np.sum(Qm * Qm, axis=1)[:, None]
              - 2.0 * (Qm @ V.T) + np.sum(V * V, axis=1)[None, :])
        nq = d2.shape[0]
        kk = min(k, d2.shape[1])
        top = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        qids, vids, dist = [], [], []
        for qi in range(nq):
            for c in top[qi]:
                qids.append(qi)
                vids.append(int(ids[c]))
                # sqrt of the directly-accumulated sum of squares (matches
                # the SQL twin's list_distance evaluation order)
                dist.append(float(np.sqrt(
                    ((Qm[qi] - V[c]) ** 2).sum())))
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         id_col: pa.array(vids, pa.int64()),
                         "dist": pa.array(dist, pa.float64())})

    df = (ds.map_batches(partial_topk, batch_format="pyarrow",
                         batch_size=4096).to_pandas())
    df = df.sort_values(["query_id", "dist", id_col],
                        ascending=[True, True, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["dist"] = round_half_away(df["dist"], 6)
    return df


def knn_dot(ds, queries: np.ndarray, k: int = 5, *,
            vec_col: str = "embedding", id_col: str = "vec_id"
            ) -> pd.DataFrame:
    """Exact kNN under max inner product (dense_vector
    similarity=max_inner_product — VectorSimilarity.MAXIMUM_INNER_PRODUCT).
    Broadcast queries / per-batch partial top-k; ranked score desc, id asc."""
    import ray

    Q = np.asarray(queries, dtype=np.float64)
    q_ref = ray.put(Q)

    def partial_topk(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        ids = t[id_col].to_numpy()
        if ids.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64)
        S = Qm @ V.T
        kk = min(k, S.shape[1])
        top = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
        qids, vids, sc = [], [], []
        for qi in range(S.shape[0]):
            for c in top[qi]:
                qids.append(qi)
                vids.append(int(ids[c]))
                # per-candidate re-evaluation in index order (matches the
                # SQL twin's list_inner_product accumulation)
                sc.append(float((Qm[qi] * V[c]).sum()))
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         id_col: pa.array(vids, pa.int64()),
                         "score": pa.array(sc, pa.float64())})

    df = (ds.map_batches(partial_topk, batch_format="pyarrow",
                         batch_size=4096).to_pandas())
    df = df.sort_values(["query_id", "score", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["score"] = round_half_away(df["score"], 6)
    return df
