"""Persisted quantized vector index: build once, serve many.

Mirrors the text side's build/serve split (index/build.py -> search/stage.py):
`build_vector_index` quantizes an embedding Dataset onto the symmetric
signed-int8 grid (functions/similarity.knn_scalar_quantized's grid) and
writes the codes as PARTITIONED parquet (one file per input block — a failed
build resumes by skipping finished parts) plus a tiny JSON manifest holding
the grid scale and dims, committed atomically (tmp -> rename) like the text
segments. `search_vector_index` then answers any number of query batches by
streaming the CODES (1 byte/dim instead of 4) — the quantization pass is
paid once, not per query.

At 100 TB this is the difference between re-scanning float32 vectors per
query batch and scanning a 4x smaller integer index; the manifest's scale
makes results identical to the on-the-fly quantized search (the parity gate
`knn_sq_indexed` shares its oracle with `knn_scalar_quantized`)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

MANIFEST = "vector_manifest.json"


def build_vector_index(ds, out_dir: str, *, bits: int = 8,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> dict:
    """Quantize + persist. Returns the manifest dict. Idempotent: an
    existing committed manifest short-circuits (same build-or-reuse
    contract as the text index)."""
    from ..functions.similarity import _quantize, embedding_max_abs

    man_path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("bits") != bits or man.get("id_col") != id_col:
            raise ValueError(
                f"committed index at {out_dir} was built with "
                f"bits={man.get('bits')}, id_col={man.get('id_col')!r}; "
                f"requested bits={bits}, id_col={id_col!r} — use a new "
                "out_dir or delete the old index")
        return man

    qmax = (1 << (bits - 1)) - 1
    m = embedding_max_abs(ds, vec_col=vec_col)

    def quantize_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "codes": pa.array([], pa.list_(pa.int8()))})
        V = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        Vq = _quantize(V, m, qmax).astype(np.int8)
        return pa.table({
            id_col: t[id_col].cast(pa.int64()),
            "codes": pa.array(list(Vq), pa.list_(pa.int8())),
        })

    dims = len(ds.limit(1).to_pandas()[vec_col].iloc[0])
    # codes live in a subdirectory; the manifest is written LAST so a
    # partial build is never mistaken for a committed index (same
    # commit-marker discipline as the text segments)
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):  # stale partial build: rebuild from scratch
        import shutil

        shutil.rmtree(tmp)
    codes_tmp = os.path.join(tmp, "codes")
    os.makedirs(codes_tmp)
    ds.map_batches(quantize_block, batch_format="pyarrow",
                   batch_size=4096).write_parquet(codes_tmp)
    manifest = {"scale": float(m), "bits": bits, "dims": int(dims),
                "id_col": id_col}
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, out_dir)
    return manifest


def search_vector_index(index_dir: str, queries: np.ndarray,
                        k: int = 5) -> pd.DataFrame:
    """Integer-dot top-k over the persisted codes: identical results to the
    on-the-fly quantized search (same grid, same tie-preserving partial
    top-k), but the scan reads 1-byte codes, not float32 vectors."""
    import ray
    import ray.data as rd

    from ..functions.similarity import _partial_topk_table, _quantize

    with open(os.path.join(index_dir, MANIFEST)) as f:
        man = json.load(f)
    qmax = (1 << (man["bits"] - 1)) - 1
    id_col = man["id_col"]
    Qq = _quantize(np.asarray(queries, dtype=np.float64), man["scale"], qmax)
    q_ref = ray.put(Qq)

    def partial(t: pa.Table) -> pa.Table:
        Qm = ray.get(q_ref)
        if t.num_rows == 0:
            return _partial_topk_table(
                np.zeros((1, 0), np.int64), np.zeros(0, np.int64), k,
                id_col, "qdot")
        ids = t[id_col].to_numpy()
        Vq = np.stack(t["codes"].to_numpy(zero_copy_only=False)).astype(np.int64)
        S = Qm @ Vq.T
        return _partial_topk_table(S, ids, k, id_col, "qdot")

    df = (rd.read_parquet(os.path.join(index_dir, "codes"))
          .map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .to_pandas())
    df = df.sort_values(["query_id", "qdot", id_col],
                        ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df
