"""Inference-ingest stage (the reference's semantic_text field /
inference processor shape: an ML model embeds text at ingest, kNN serves
it): the model here is a STUB — a deterministic hashed bag-of-words
projection (feature hashing, Weinberger 2009) — because no real encoder
ships in this container, but the Ray plumbing is the real pattern:
the "model" (projection seed, dim, tokenizer regex) loads ONCE per actor
in __init__, batches embed vectorized in __call__, and the output schema
is the dense_vector list<float> the kNN family consumes."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash_tokens(toks: list[str], dim: int) -> np.ndarray:
    """Deterministic signed feature hashing into R^dim, L2-normalized."""
    v = np.zeros(dim)
    for t in toks:
        h = 2166136261
        for ch in t.encode():
            h = ((h ^ ch) * 16777619) % (1 << 32)  # FNV-1a
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    n = np.sqrt((v * v).sum())
    return v / n if n else v


class TextEmbedStage:
    """Callable-class actor stage: pass to map_batches(TextEmbedStage,
    concurrency=N). At scale the __init__ body is the model load."""

    def __init__(self, dim: int = 32):
        self.dim = dim
        self.pat = re.compile(r"[^a-z0-9]+")  # compiled once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        embs = [
            _hash_tokens([w for w in self.pat.split(s.lower()) if w],
                         self.dim).astype(np.float32)
            for s in t["text"].to_pylist()
        ]
        return pa.table({
            "doc_id": t["doc_id"],
            "embedding": pa.array([e.tolist() for e in embs],
                                  pa.list_(pa.float32())),
        })


def semantic_search(ds, query_text: str, k: int = 10, *,
                    dim: int = 32, concurrency: int = 2) -> pd.DataFrame:
    """semantic_text end-to-end: embed the corpus through the actor pool,
    embed the query with the same stub model, cosine top-k with partial
    per-batch top-k (same merge as knn_brute_force)."""
    import ray

    pat = re.compile(r"[^a-z0-9]+")
    q = _hash_tokens([w for w in pat.split(query_text.lower()) if w], dim)
    q_ref = ray.put(q.astype(np.float64))

    embedded = ds.map_batches(TextEmbedStage, batch_size=256,
                              concurrency=concurrency,
                              max_restarts=0,
                              fn_constructor_kwargs={"dim": dim},
                              batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        if len(t) == 0:  # zero-row block
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64)
        s = V @ qv
        ids = t["doc_id"].to_numpy()
        kk = min(k, len(ids))
        top = np.argpartition(-s, kk - 1)[:kk]
        return pa.table({"doc_id": pa.array(ids[top], pa.int64()),
                         "cosine": pa.array(s[top], pa.float64())})

    out = (embedded.map_batches(partial_topk, batch_format="pyarrow")
           .to_pandas())
    out = out.sort_values(["cosine", "doc_id"],
                          ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1)
    from ..utils import round_half_away

    out["cosine"] = round_half_away(out["cosine"], 6)
    out["rank"] = out["rank"].astype("int64")
    return out[["rank", "doc_id", "cosine"]]
