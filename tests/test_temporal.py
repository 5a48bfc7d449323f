"""Temporal ops (functions/temporal.py): session gap boundary (strict >),
as-of backward match with tie-breaks, inner semantics, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from elasticsearch_ray.functions.temporal import asof_join, sessionize

T0 = pd.Timestamp("2024-01-01 00:00:00")


def test_sessionize_gap_boundary_strict():
    # gaps: exactly 30min (same session), 30min+1us (new session)
    ts = [T0, T0 + pd.Timedelta(minutes=30),
          T0 + pd.Timedelta(minutes=60, microseconds=1)]
    df = pd.DataFrame({"event_id": [1, 2, 3], "ts": ts, "user_id": [5, 5, 5]})
    out = (sessionize(rd.from_pandas(df), gap_minutes=30).to_pandas()
           .sort_values(["user_id", "session_idx"]).reset_index(drop=True))
    assert list(out["session_idx"]) == [0, 1]
    assert list(out["n_events"]) == [2, 1]
    assert out.loc[0, "start_ts"] == ts[0] and out.loc[0, "end_ts"] == ts[1]


def test_sessionize_orders_by_ts_then_id_and_multiuser():
    rows = []
    for u in range(9):
        for i in range(6):
            rows.append({"event_id": u * 10 + i,
                         "ts": T0 + pd.Timedelta(hours=i * (1 if u % 2 else 0)),
                         "user_id": u})
    df = pd.DataFrame(rows)
    outs = []
    for p in (1, 4):
        o = (sessionize(rd.from_pandas(df).repartition(p), gap_minutes=30)
             .to_pandas().sort_values(["user_id", "session_idx"])
             .reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # even users: all events same ts -> 1 session of 6; odd: 6 sessions of 1
    even = outs[0][outs[0].user_id % 2 == 0]
    odd = outs[0][outs[0].user_id % 2 == 1]
    assert (even.groupby("user_id").size() == 1).all()
    assert (even["n_events"] == 6).all()
    assert (odd.groupby("user_id").size() == 6).all()


def test_asof_join_backward_and_ties():
    ev = pd.DataFrame({"event_id": [1, 2, 3, 4],
                       "user_id": [7, 7, 7, 8],
                       "as_of_ts": [T0, T0 + pd.Timedelta(days=5),
                                    T0 - pd.Timedelta(days=1), T0]})
    orders = pd.DataFrame({
        "o_custkey": [7, 7, 7, 9],
        "o_orderkey": [100, 101, 102, 999],
        # two orders at the SAME date (T0): tie -> larger orderkey (101)
        "o_orderdate": [T0, T0, T0 + pd.Timedelta(days=3), T0],
    })
    out = (asof_join(rd.from_pandas(ev), rd.from_pandas(orders),
                     left_key="user_id", right_key="o_custkey",
                     left_time="as_of_ts", right_time="o_orderdate",
                     left_id="event_id", right_payload="o_orderkey")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # event 1 at T0: tie between 100/101 -> 101; event 2: order 102 (day 3)
    # event 3 precedes all orders -> dropped; event 4: user 8 has none -> dropped
    assert list(out["event_id"]) == [1, 2]
    assert list(out["o_orderkey"]) == [101, 102]


def test_asof_join_partition_invariance():
    rng = np.random.default_rng(42)
    ev = pd.DataFrame({
        "event_id": np.arange(80, dtype=np.int64),
        "user_id": rng.integers(0, 10, 80),
        "as_of_ts": [T0 + pd.Timedelta(hours=int(h))
                     for h in rng.integers(0, 500, 80)]})
    orders = pd.DataFrame({
        "o_custkey": rng.integers(0, 10, 40),
        "o_orderkey": np.arange(40, dtype=np.int64),
        "o_orderdate": [T0 + pd.Timedelta(hours=int(h))
                        for h in rng.integers(0, 500, 40)]})
    outs = []
    for p in (1, 5):
        o = (asof_join(rd.from_pandas(ev).repartition(p),
                       rd.from_pandas(orders).repartition(p),
                       left_key="user_id", right_key="o_custkey",
                       left_time="as_of_ts", right_time="o_orderdate",
                       left_id="event_id", right_payload="o_orderkey")
             .to_pandas().sort_values("event_id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
