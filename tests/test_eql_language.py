"""EQL language executor (x-pack eql EqlParser): parser shapes, pipes,
multi-step sequences, until semantics — beyond the gate pipelines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from elasticsearch_ray.functions import eql

SF = "/root/testdata/sf0.001"


def test_parse_single_event():
    p = eql.parse('purchase where value > 40 | head 5 | count')
    assert p["kind"] == "event"
    assert p["predicate"] == 'event_type == "purchase" AND (value > 40)'
    assert p["pipes"] == [("head", "5"), ("count", "")]


def test_parse_sequence_with_until():
    p = eql.parse('''
      sequence by user_id with maxspan=10m
        [ click where true ] [ purchase where value > 1 ]
      until [ error where true ]
    ''')
    assert p["kind"] == "sequence" and p["by"] == "user_id"
    assert p["maxspan_us"] == 600_000_000
    assert len(p["steps"]) == 2
    assert p["until"] == 'event_type == "error" AND (true)'


def test_parse_rejects_single_step():
    with pytest.raises(ValueError, match="two"):
        eql.parse("sequence [ click where true ]")


def test_any_category_places_no_constraint():
    p = eql.parse("any where value > 49")
    assert p["predicate"] == "value > 49"


def test_count_pipe(ray_session):
    out = eql.run(SF, "purchase where value > 40 | count")
    import duckdb

    want = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{SF}/events.parquet')
        WHERE event_type = 'purchase' AND value > 40""").fetchone()[0]
    assert out["count"].iloc[0] == want


def test_tail_pipe_returns_latest(ray_session):
    out = eql.run(SF, "click where true | tail 3")
    import duckdb

    want = duckdb.sql(f"""
        SELECT event_id FROM read_parquet('{SF}/events.parquet')
        WHERE event_type = 'click'
        ORDER BY ts DESC, event_id DESC LIMIT 3""").df()
    assert sorted(out["event_id"]) == sorted(want["event_id"])


def test_sequence_until_drops_broken_chains(ray_session):
    base = eql.run(SF, '''
      sequence by user_id with maxspan=2d
        [ click where true ] [ purchase where true ]
    ''')
    cut = eql.run(SF, '''
      sequence by user_id with maxspan=2d
        [ click where true ] [ purchase where true ]
      until [ error where true ]
    ''')
    assert cut["seqs"].sum() <= base["seqs"].sum()


def test_sequence_brute_force_parity(ray_session):
    """Vectorized cascade == per-user brute force over raw pandas."""
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "ts"]).to_pandas()
    span = 2 * 86400 * 1_000_000
    want = {}
    for u, g in df.groupby("user_id"):
        g = g.copy()
        g["us"] = g["ts"].astype("datetime64[us]").astype(np.int64)
        a = np.sort(g.loc[g.event_type == "click", "us"].to_numpy())
        b = np.sort(g.loc[g.event_type == "view", "us"].to_numpy())
        c = np.sort(g.loc[g.event_type == "purchase", "us"].to_numpy())
        n = 0
        for t1 in a:
            t2 = b[b > t1]
            if not t2.size:
                continue
            t3 = c[c > t2[0]]
            if t3.size and t3[0] - t1 <= span:
                n += 1
        if n:
            want[int(u)] = n
    out = eql.run(SF, '''
      sequence by user_id with maxspan=2d
        [ click where true ] [ view where true ] [ purchase where true ]
    ''')
    got = dict(zip(out["user_id"].astype(int), out["seqs"].astype(int)))
    assert got == want
