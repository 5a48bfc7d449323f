"""Corpus reader with deterministic doc_id assignment (SURVEY.md §7 step 3).

The reference collapses (per-segment Lucene docid, `_id` term) into doc ids;
we need one dense, *deterministic* global `doc_id:int64` independent of task
scheduling order so that index builds are reproducible and resumable
(reference analog: sequence numbers, index/seqno/LocalCheckpointTracker.java).

Scheme: enumerate the input Parquet files in sorted path order, read only the
footers (cheap metadata), and plan one **fragment per row group**. A fragment
knows its global row offset, so `doc_id = fragment.offset + row_index` — exact
regardless of which worker reads which fragment or in which order. Fragments
are also the unit of build partitioning and checkpoint/resume.

At 100 TB this planning step reads only footers (KBs per file) on the driver;
fragments (≈ row groups, 64-512 MB each) are the natural distribution unit.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass

import pyarrow.dataset as pads
import pyarrow.parquet as pq


@dataclass(frozen=True)
class Fragment:
    path: str
    row_group: int
    offset: int  # global doc_id of this fragment's first row
    num_rows: int

    def to_dict(self) -> dict:
        return asdict(self)


def list_parquet_files(path_or_dir: str | list[str]) -> list[str]:
    if isinstance(path_or_dir, list):
        return sorted(path_or_dir)
    if os.path.isdir(path_or_dir):
        return sorted(
            os.path.join(path_or_dir, f)
            for f in os.listdir(path_or_dir)
            if f.endswith(".parquet")
        )
    return [path_or_dir]


def plan_fragments(path_or_dir: str | list[str]) -> list[Fragment]:
    """Footer-only scan -> row-group fragments with global doc_id offsets."""
    frags: list[Fragment] = []
    offset = 0
    for p in list_parquet_files(path_or_dir):
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            frags.append(Fragment(p, rg, offset, n))
            offset += n
    return frags


def read_fragment(frag: Fragment | dict, columns: list[str] | None = None):
    """Read one row-group fragment -> pyarrow Table with a doc_id column."""
    import numpy as np
    import pyarrow as pa

    if isinstance(frag, dict):
        frag = Fragment(**{k: frag[k] for k in ("path", "row_group", "offset", "num_rows")})
    t = pq.ParquetFile(frag.path).read_row_group(frag.row_group, columns=columns)
    doc_ids = pa.array(np.arange(frag.offset, frag.offset + len(t), dtype=np.int64))
    if "doc_id" in t.column_names:
        # input already carries a doc_id column: replace it with the
        # deterministic fragment-offset ids (they must agree for tables like
        # the driver's `documents`, whose doc_id IS the row index)
        t = t.drop_columns(["doc_id"])
    return t.append_column("doc_id", doc_ids)


def infer_mapping(path_or_dir: str | list[str], *, sample_rows: int = 1024,
                  keyword_max_distinct_ratio: float = 0.5):
    """Dynamic mapping inference (DocumentParser.java:511-514 dynamic-type
    analog over Arrow schemas): Arrow type -> ES field type, with the
    text/keyword split decided by a sampled distinct ratio (low-cardinality
    strings map to keyword like dynamic string mapping's keyword sub-field
    dominant use). Footer + one sampled row-group read only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    files = list_parquet_files(path_or_dir)
    pf = pq.ParquetFile(files[0])
    t = pf.read_row_group(0)
    if len(t) > sample_rows:
        t = t.slice(0, sample_rows)
    out: dict[str, str] = {}
    for fld in t.schema:
        typ = fld.type
        if pa.types.is_integer(typ):
            es = "long"
        elif pa.types.is_floating(typ):
            es = "double"
        elif pa.types.is_boolean(typ):
            es = "boolean"
        elif pa.types.is_timestamp(typ) or pa.types.is_date(typ):
            es = "date"
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
            n = len(t)
            distinct = pc.count_distinct(t[fld.name]).as_py() if n else 0
            es = "keyword" if n and distinct / n <= keyword_max_distinct_ratio \
                else "text"
        elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            es = "binary"
        elif pa.types.is_list(typ) and pa.types.is_floating(typ.value_type):
            es = "dense_vector"
        elif pa.types.is_list(typ):
            es = "array"
        elif pa.types.is_struct(typ):
            es = "object"
        else:
            es = "keyword"
        out[fld.name] = es
    return out


def fetch_rows_by_doc_id(path_or_dir: str | list[str], doc_ids,
                         columns: list[str] | None = None):
    """Row-group-pruned point lookups for the fetch phase: doc_id = fragment
    offset + row-within-fragment by construction, so each wanted id maps to
    exactly one row group — only the covering row groups are read (footer scan
    + k row-group reads, never the whole table). Returns rows sorted by
    doc_id (FetchPhase.java stored-field lookup analog)."""
    import collections

    import numpy as np
    import pyarrow as pa

    frags = plan_fragments(path_or_dir)
    offsets = np.array([f.offset for f in frags], dtype=np.int64)
    ids = np.array(sorted({int(i) for i in doc_ids}), dtype=np.int64)
    fi = np.searchsorted(offsets, ids, side="right") - 1
    by_frag: dict[int, list[int]] = collections.defaultdict(list)
    for i, f in zip(ids, fi):
        if 0 <= f < len(frags) and i < frags[f].offset + frags[f].num_rows:
            by_frag[int(f)].append(int(i))
    cols = None if columns is None else [c for c in columns if c != "doc_id"]
    parts = []
    for f, want in sorted(by_frag.items()):
        frag = frags[f]
        t = read_fragment(frag, columns=cols)
        parts.append(t.take(pa.array([w - frag.offset for w in want])))
    if not parts:
        return None
    out = pa.concat_tables(parts)
    return out.select(columns) if columns is not None else out


def read_corpus(path_or_dir: str | list[str], columns: list[str] | None = None):
    """Dataset over the corpus with deterministic doc_id, one read task per
    row-group fragment (column-pruned at the read)."""
    import ray.data as rd

    frags = plan_fragments(path_or_dir)

    def _read(batch) -> "pads.Iterator":
        for i in range(len(batch["path"])):
            yield read_fragment(
                {k: batch[k][i] for k in ("path", "row_group", "offset", "num_rows")},
                columns=columns,
            )

    # one block per fragment -> one read task per fragment (map_batches
    # parallelism follows blocks, not batch_size)
    items = rd.from_items([f.to_dict() for f in frags], override_num_blocks=len(frags))
    return items.map_batches(_read, batch_format="numpy", batch_size=1)
