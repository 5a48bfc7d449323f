"""Temporal operators Ray Data has no primitive for: sessionization
(gaps-and-islands) and as-of join (latest right row at-or-before each left
row's time, per key).

Both are expressed as ONE bucketed exchange: rows route by `key % B` so every
group handed to map_groups is a whole hash bucket containing every row of its
keys, and the per-bucket work is vectorized pandas (groupby/shift/cumsum for
sessions, pandas.merge_asof for the as-of join — no per-key Python).

Partitioning assumption (documented per the north rule): all rows of one key
fit in one bucket's memory. At 100 TB that holds when B is scaled so each
bucket is ~Dataset/B; a pathologically hot key (one user with billions of
events) would need range-salting within the key, same as the index build's
hot-term salting (stages/tokenize.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sessionize(ds, *, gap_minutes: int = 30, time_col: str = "ts",
               user_col: str = "user_id", id_col: str = "event_id",
               num_buckets: int = 64):
    """Split each user's event stream into sessions: a new session starts
    when the gap to the previous event exceeds `gap_minutes` (strictly).
    Ordering within a user is (time, id). Returns a Dataset of
    (user_col, session_idx, n_events, start_ts, end_ts)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def bucket(t: pa.Table) -> pa.Table:
        b = t[user_col].to_numpy() % num_buckets
        return t.append_column("bkt", pa.array(b.astype(np.int64)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, time_col, id_col], kind="stable")
        prev = g.groupby(user_col)[time_col].shift(1)
        brk = (prev.isna() | ((g[time_col] - prev) > gap)).astype("int64")
        g["session_idx"] = brk.groupby(g[user_col]).cumsum() - 1
        agg = (g.groupby([user_col, "session_idx"])
                .agg(n_events=(id_col, "size"),
                     start_ts=(time_col, "min"),
                     end_ts=(time_col, "max"))
                .reset_index())
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    return (ds.select_columns([user_col, time_col, id_col])
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("bkt").map_groups(per_bucket, batch_format="pandas"))


def asof_join(left, right, *, left_key: str, right_key: str,
              left_time: str, right_time: str, left_id: str,
              right_payload: str, num_buckets: int = 64):
    """As-of join (backward): for each left row, the single right row of the
    same key with right_time <= left_time and maximal (right_time,
    right_payload) — ties on time break to the larger payload value.
    Inner semantics: unmatched left rows are dropped. Keys must be integers
    (bucketed by key % B). Returns a Dataset of
    (left_id, left_key, right_payload, right_time).

    Per bucket the match runs as one pandas.merge_asof (sorted-merge, no
    key-pair blowup — the reason this is not expressible as Dataset.join +
    filter at scale)."""

    def lrows(t: pa.Table) -> pa.Table:
        k = t[left_key].to_numpy().astype(np.int64)
        return pa.table({
            "bkt": pa.array(k % num_buckets),
            "key": pa.array(k),
            "t": t[left_time].cast(pa.timestamp("us")),
            "lid": t[left_id].cast(pa.int64()),
            "payload": pa.nulls(t.num_rows, pa.int64()),
            "rt": pa.nulls(t.num_rows, pa.timestamp("us")),
            "is_left": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        })

    def rrows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        k = t[right_key].to_numpy().astype(np.int64)
        rt = t[right_time].cast(pa.timestamp("us"))
        return pa.table({
            "bkt": pa.array(k % num_buckets),
            "key": pa.array(k),
            "t": rt,
            "lid": pa.nulls(t.num_rows, pa.int64()),
            "payload": t[right_payload].cast(pa.int64()),
            "rt": rt,
            "is_left": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["is_left"] == 1][["key", "t", "lid"]]
        rf = g[g["is_left"] == 0][["key", "t", "payload", "rt"]]
        if lf.empty or rf.empty:
            return pd.DataFrame({left_id: pd.array([], dtype="int64"),
                                 left_key: pd.array([], dtype="int64"),
                                 right_payload: pd.array([], dtype="int64"),
                                 right_time: pd.Series([], dtype="datetime64[us]")})
        # ties on t: merge_asof(backward) takes the LAST right row <= t,
        # so secondary-sort by payload puts the max payload last
        lf = lf.sort_values(["t", "lid"], kind="stable")
        rf = rf.sort_values(["t", "payload"], kind="stable")
        m = pd.merge_asof(lf, rf, on="t", by="key", direction="backward")
        m = m[m["payload"].notna()]
        out = pd.DataFrame({
            left_id: m["lid"].astype("int64"),
            left_key: m["key"].astype("int64"),
            right_payload: m["payload"].astype("int64"),
            right_time: m["rt"].astype("datetime64[us]"),
        })
        return out.reset_index(drop=True)

    lds = left.map_batches(lrows, batch_format="pyarrow")
    rds = right.map_batches(rrows, batch_format="pyarrow")
    return (lds.union(rds)
               .groupby("bkt").map_groups(per_bucket, batch_format="pandas"))
