"""Retriever tree executor (the 8.16 retrievers framework: a
RetrieverBuilder tree in the `_search` body — `standard`, `knn`, `rrf`,
`linear`, `text_similarity_reranker`).

Each leaf runs its existing retrieval primitive (the inverted-index
searcher for `standard`, the streaming float64 cosine top-k for `knn`);
compound nodes fuse the rank_window_size-bounded child lists on the
driver — result-list-sized work only, never corpus-sized. The reranker
uses the deterministic `overlap` mock inference (|distinct query tokens
∩ doc tokens|, same contract as ES|QL RERANK) with the candidate texts
fetched through ONE doc-id-filtered pruned read.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..utils import round_half_away

DEFAULT_WINDOW = 100


def execute_retriever(sf_dir: str, tree: dict, k: int = 10) -> pd.DataFrame:
    """Run a retriever tree; returns the top-k (doc_id, _score) frame
    ordered by (_score desc, doc_id asc), scores rounded to 4dp."""
    out = _node(sf_dir, tree, k)
    out = out.sort_values(["_score", "doc_id"],
                          ascending=[False, True]).head(k)
    out["_score"] = round_half_away(out["_score"].to_numpy(np.float64), 4)
    return out.reset_index(drop=True)


def _ranked(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["_score", "doc_id"],
                        ascending=[False, True]).reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df


def _node(sf_dir: str, tree: dict, k: int) -> pd.DataFrame:
    (kind, body), = tree.items()
    if kind == "standard":
        return _standard(sf_dir, body, k)
    if kind == "knn":
        return _knn(sf_dir, body)
    if kind == "rrf":
        return _rrf(sf_dir, body, k)
    if kind == "linear":
        return _linear(sf_dir, body, k)
    if kind == "text_similarity_reranker":
        return _reranker(sf_dir, body, k)
    raise ValueError(f"unsupported retriever kind: {kind}")


def _standard(sf_dir: str, body: dict, k: int) -> pd.DataFrame:
    """StandardRetrieverBuilder: the query runs once on the index; scores
    rounded to 4dp BEFORE ranking (reproducible rank order vs the SQL
    oracle's double arithmetic, the ft_rrf_hybrid convention)."""
    from ..pipelines.fulltext import documents_searcher

    window = int(body.get("rank_window_size", DEFAULT_WINDOW))
    ids, sc = documents_searcher(sf_dir)._eval(body["query"])
    df = pd.DataFrame({"doc_id": ids.astype(np.int64),
                       "_score": round_half_away(sc.astype(np.float64), 4)})
    return _ranked(df).head(window)


def _knn(sf_dir: str, body: dict) -> pd.DataFrame:
    """KnnRetrieverBuilder: exact float64 cosine top-k over the vector
    column (per-batch partial top-k, driver merges batches x k rows);
    _score is the dense_vector cosine convention (1 + cos) / 2."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    field = body.get("field", "embedding")
    q = np.asarray(body["query_vector"], np.float64)
    kk = int(body.get("k", 10))
    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = pq.read_schema(path).remove_metadata()
    cols = ["vec_id", field]
    ds = rd.read_parquet(path, columns=cols,
                         schema=pa.schema([schema.field(c) for c in cols]))

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.esql_expr import _vec_matrix

        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        V = _vec_matrix(t[field])
        cos = (V @ q) / (np.sqrt((V * V).sum(axis=1))
                         * np.sqrt((q * q).sum()))
        n = min(kk, cos.size)
        top = np.argpartition(-cos, n - 1)[:n] if n else np.arange(0)
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "cos": pa.array(cos[top], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", "vec_id"],
                              ascending=[False, True]).head(kk)
    # doc_id and vec_id spaces align by corpus construction (both dense
    # from 0) — the hybrid-retrieval convention of ft_rrf_hybrid
    df = pd.DataFrame({
        "doc_id": parts["vec_id"].to_numpy(np.int64),
        "_score": round_half_away(
            (1.0 + parts["cos"].to_numpy(np.float64)) / 2.0, 6)})
    return _ranked(df)


def _rrf(sf_dir: str, body: dict, k: int) -> pd.DataFrame:
    """RRFRetrieverBuilder: fused = sum over children of
    1 / (rank_constant + rank)."""
    k0 = int(body.get("rank_constant", 60))
    window = int(body.get("rank_window_size", DEFAULT_WINDOW))
    fused: dict[int, float] = {}
    for child in body["retrievers"]:
        r = _ranked(_node(sf_dir, child, window)).head(window)
        for doc, rank in zip(r["doc_id"], r["rank"]):
            fused[int(doc)] = fused.get(int(doc), 0.0) + 1.0 / (k0 + rank)
    return pd.DataFrame({"doc_id": list(fused), "_score": list(fused.values())})


def _linear(sf_dir: str, body: dict, k: int) -> pd.DataFrame:
    """LinearRetrieverBuilder (8.18): weighted sum of per-child scores,
    each minmax-normalized over its rank window ('none' keeps raw)."""
    window = int(body.get("rank_window_size", DEFAULT_WINDOW))
    fused: dict[int, float] = {}
    for item in body["retrievers"]:
        child = item["retriever"]
        w = float(item.get("weight", 1.0))
        norm = item.get("normalizer", "none")
        r = _ranked(_node(sf_dir, child, window)).head(window)
        s = r["_score"].to_numpy(np.float64)
        if norm == "minmax" and len(s):
            lo, hi = s.min(), s.max()
            s = np.zeros_like(s) if hi == lo else (s - lo) / (hi - lo)
        elif norm not in ("none", "minmax"):
            raise ValueError(f"unsupported normalizer: {norm}")
        for doc, v in zip(r["doc_id"], s):
            fused[int(doc)] = fused.get(int(doc), 0.0) + w * float(v)
    return pd.DataFrame({"doc_id": list(fused), "_score": list(fused.values())})


def _reranker(sf_dir: str, body: dict, k: int) -> pd.DataFrame:
    """TextSimilarityRankRetrieverBuilder (8.15): rescore the child's top
    window with the deterministic `overlap` mock inference — candidate
    texts arrive through one doc-id-filtered pruned read, scoring is a
    vectorized distinct-token intersection per batch."""
    import pyarrow.compute as pc

    window = int(body.get("rank_window_size", DEFAULT_WINDOW))
    child = _ranked(_node(sf_dir, body["retriever"], window)).head(window)
    ids = np.sort(child["doc_id"].to_numpy(np.int64))
    qtoks = sorted(set(
        w for w in re.split(r"[^a-z0-9]+", body["inference_text"].lower())
        if w))
    qset = pa.array(qtoks, pa.string())
    field = body.get("field", "text")

    from ..pipelines.ops import _ds

    ds = _ds(sf_dir, "documents", ["doc_id", field],
             flt=pc.field("doc_id").isin(ids.tolist()))

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[field]), "[^a-z0-9]+")
        flat = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        parents = pc.list_parent_indices(flat).to_numpy(
            zero_copy_only=False)
        hit = pc.is_in(flat.flatten(), value_set=qset).to_numpy(
            zero_copy_only=False)
        vals = flat.flatten().to_numpy(zero_copy_only=False)
        n = len(t)
        counts = np.zeros(n, np.int64)
        if parents.size:
            codes = pd.factorize(vals)[0]
            key = parents.astype(np.int64) * (codes.max() + 1) + codes
            keep = hit
            uniq = np.unique(key[keep])
            counts = np.bincount((uniq // (codes.max() + 1)).astype(int),
                                 minlength=n)
        return pa.table({"doc_id": t["doc_id"],
                         "_score": pa.array(counts.astype(np.float64),
                                            pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow").to_pandas()
