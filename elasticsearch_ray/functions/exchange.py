"""Bucketed-exchange aggregation helper.

Ray Data's sort-based `groupby(keys).sum(...)` pays per-GROUP plumbing
cost, which dominates when group cardinality approaches row cardinality
(vocabularies, n-gram keys, candidate pairs — measured in round 4:
~250k distinct keys took 8-33 s where a 64-bucket exchange takes <1 s;
see SCALE.md "Round-4"). `bucketed_sum` keeps the same exchange volume
(one all-to-all of the pre-aggregated rows) but bounds the group count
at `num_buckets`, doing the real aggregation vectorized in pandas inside
each bucket. Output schema and values are identical to
`groupby(keys).sum(val)`; row order (never guaranteed by either) may
differ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bucketed_sum", "bucketed_agg"]


def bucketed_agg(ds, keys, val: str, how: str = "sum", *,
                 out_name: str | None = None, num_buckets: int = 64):
    """groupby(keys).<how>(val) via a `num_buckets`-way hash exchange.

    `keys`: list of key column names (string or integer columns).
    `how`: "sum" | "min" | "max" | "count" (count ignores val's values).
    `out_name`: output column (default `<how>(<val>)`, matching Ray's
    native names so call sites swap in without renames)."""
    keys = list(keys)
    out_col = out_name or f"{how}({val})"
    nb = np.uint64(num_buckets)

    def _bucket(t: pa.Table) -> pa.Table:
        n = t.num_rows
        hb = np.zeros(n, np.uint64)
        for k in keys:
            col = t[k]
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                # pd.util.hash_array is cython-vectorized over object
                # arrays (SipHash in C) — no Python-level per-row loop.
                h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
            else:
                h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            hb = hb * np.uint64(1000003) + h
        return t.append_column("_xb", pa.array((hb % nb).astype(np.int64)))

    def _merge(g: pd.DataFrame) -> pa.Table:
        gb = g.groupby(keys, as_index=False, sort=False)
        if how == "count":
            out = gb.size().rename(columns={"size": out_col})
        else:
            out = gb[val].agg(how).rename(columns={val: out_col})
        # clean Arrow out (pandas schema metadata breaks downstream
        # hash-shuffle schema dedup and spams warnings)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return (ds.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_xb")
            .map_groups(_merge, batch_format="pandas"))


def bucketed_sum(ds, keys, val: str, *, out_name: str | None = None,
                 num_buckets: int = 64):
    """groupby(keys).sum(val) — see bucketed_agg."""
    return bucketed_agg(ds, keys, val, "sum", out_name=out_name,
                        num_buckets=num_buckets)
