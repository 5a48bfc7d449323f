"""_bulk wire format (action/bulk/BulkRequestParser.java + TransportBulkAction):
NDJSON alternating action lines ({"index"|"create"|"delete"|"update":
{"_id": ...}}) and document/update lines. Ordering semantics follow the
reference's per-shard sequence numbers (index/seqno/LocalCheckpointTracker):
actions on DIFFERENT ids are independent; actions on the SAME id apply in
stream order. That maps exactly onto a groupby(_id).map_groups(apply in seq
order) — the only ordering the engine must preserve is within an id group.

The output is FINAL-STATE oriented (one row per live doc): ids whose
last action deletes them produce no row, so per-op failures on such ids
are not reported — the reference's per-op response items would carry
them; this table is the index-state view.

Op semantics (TransportShardBulkAction):
- index:  upsert (create or replace)
- create: insert; FAILS (recorded, state unchanged) if the id already exists
- update: partial-doc merge into the existing doc; fails if missing
- delete: remove; fails if missing
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

_OPS = ("index", "create", "delete", "update")


def parse_bulk(lines: list[str]) -> list[dict]:
    """NDJSON lines -> [{seq, op, _id, doc}] (doc None for delete)."""
    out: list[dict] = []
    i = 0
    seq = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        action = json.loads(line)
        (op, meta), = action.items()
        if op not in _OPS:
            raise ValueError(f"unknown bulk op {op!r}")
        doc = None
        if op != "delete":
            if i >= len(lines):
                raise ValueError(f"bulk op {op!r} missing its source line")
            doc = json.loads(lines[i])
            i += 1
            if op == "update":
                doc = doc.get("doc", doc)
        out.append({"seq": seq, "op": op, "_id": meta["_id"], "doc": doc})
        seq += 1
    return out


def _apply_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("seq")
    state: dict | None = None
    errors = 0
    for r in g.itertuples():
        doc = json.loads(r.doc) if isinstance(r.doc, str) and r.doc else None
        if r.op == "index":
            state = dict(doc)
        elif r.op == "create":
            if state is None:
                state = dict(doc)
            else:
                errors += 1  # version_conflict_engine_exception
        elif r.op == "update":
            if state is None:
                errors += 1  # document_missing_exception
            else:
                state.update(doc)
        elif r.op == "delete":
            if state is None:
                errors += 1
            else:
                state = None
    if state is None:
        return pd.DataFrame({"_id": pd.Series([], dtype="int64"),
                             "doc": pd.Series([], dtype="object"),
                             "errors": pd.Series([], dtype="int64")})
    return pd.DataFrame({"_id": [g["_id"].iloc[0]],
                         "doc": [json.dumps(state, sort_keys=True)],
                         "errors": [errors]})


def apply_bulk(records: list[dict], *, parallelism: int = 8) -> pd.DataFrame:
    """Apply parsed bulk records distributed: per-id groups apply their ops
    in seq order (map_groups); different ids are independent — the
    reference's per-shard checkpoint semantics with ids as the unit."""
    import ray.data as rd

    rows = [{"seq": r["seq"], "op": r["op"], "_id": r["_id"],
             "doc": json.dumps(r["doc"]) if r["doc"] is not None else ""}
            for r in records]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (ds.groupby("_id")
           .map_groups(_apply_group, batch_format="pandas")
           .to_pandas())
    return out.sort_values("_id").reset_index(drop=True)
