"""Posting-list encode stage: one shuffle bucket of triples -> encoded rows.

Consumes the groupby("bucket") shuffle output (the reference analog: Lucene's
per-segment hash->postings build inside IndexWriter, engaged at
index/engine/InternalEngine.java:1167). One call receives ALL triples of one
bucket; the table is sorted once with Arrow's native multi-key sort and group
boundaries found with vectorized numpy — no per-term pandas overhead, so
millions of terms per bucket stay cheap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codec import encode_postings

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("chunk", pa.int32()),
        ("df", pa.int64()),
        ("sum_tf", pa.int64()),
        ("doc_bytes", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("pos_bytes", pa.binary()),
        ("skip_last_doc", pa.list_(pa.int64())),
        ("skip_doc_off", pa.list_(pa.int32())),
        ("skip_tf_off", pa.list_(pa.int32())),
        ("skip_pos_off", pa.list_(pa.int32())),
        ("skip_max_tf", pa.list_(pa.int32())),
        ("skip_min_norm", pa.list_(pa.int32())),
    ]
)


def encode_bucket(group: pa.Table) -> pa.Table:
    """Encode every (term, chunk) posting list in this bucket."""
    if len(group) == 0:
        return POSTINGS_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[("term", "ascending"), ("chunk", "ascending"), ("doc_id", "ascending")],
    )
    g = group.take(order).combine_chunks()
    terms = np.asarray(g["term"])  # object ndarray, only for boundary detection
    chunks = g["chunk"].to_numpy()
    doc_ids = g["doc_id"].to_numpy()
    tfs = g["tf"].to_numpy()
    norms = g["norm_len"].to_numpy()

    has_pos = "positions" in g.column_names
    if has_pos:
        pos_col = g["positions"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pos_flat = pos_col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        pos_offsets = pos_col.offsets.to_numpy()

    key_change = np.empty(len(g), dtype=bool)
    key_change[0] = True
    if len(g) > 1:
        key_change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(key_change)
    ends = np.append(starts[1:], len(g))

    rows: dict[str, list] = {name: [] for name in POSTINGS_SCHEMA.names}
    for s, e in zip(starts, ends):
        positions = None
        if has_pos:
            p = pos_flat[pos_offsets[s] : pos_offsets[e]]
            positions = p if p.size else None
        enc = encode_postings(
            doc_ids[s:e].astype(np.int64),
            tfs[s:e].astype(np.int64),
            norms=norms[s:e].astype(np.int64),
            positions=positions,
        )
        rows["term"].append(str(terms[s]))
        rows["chunk"].append(int(chunks[s]))
        rows["df"].append(enc.df)
        rows["sum_tf"].append(enc.sum_tf)
        rows["doc_bytes"].append(enc.doc_bytes)
        rows["tf_bytes"].append(enc.tf_bytes)
        rows["pos_bytes"].append(enc.pos_bytes)
        rows["skip_last_doc"].append(enc.skip_last_doc.tolist())
        rows["skip_doc_off"].append(enc.skip_doc_off.tolist())
        rows["skip_tf_off"].append(enc.skip_tf_off.tolist())
        rows["skip_pos_off"].append(enc.skip_pos_off.tolist())
        rows["skip_max_tf"].append(enc.skip_max_tf.tolist())
        rows["skip_min_norm"].append(enc.skip_min_norm.tolist())
    return pa.table(rows, schema=POSTINGS_SCHEMA)
