"""ES|QL pipe-language executor: grammar coverage beyond the gate's
pipeline — LIMIT/KEEP/post-STATS WHERE, AVG/MIN merge correctness across
partials, and parser rejection of unsupported commands."""

from __future__ import annotations

import pandas as pd
import pytest

from elasticsearch_ray.functions import esql

SF = "/root/testdata/sf0.001"


def test_stats_avg_min_across_blocks(ray_session):
    out = esql.run(SF, """
        FROM events
        | STATS a = AVG(value), mn = MIN(value), c = COUNT(*) BY event_type
        | SORT event_type
    """)
    import duckdb

    want = duckdb.sql(f"""
        SELECT event_type, avg(value) a, min(value) mn, count(*) c
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False, atol=1e-9)


def test_limit_keep_and_having(ray_session):
    out = esql.run(SF, """
        FROM events
        | STATS c = COUNT(*) BY event_type
        | WHERE c > 0
        | SORT c DESC, event_type
        | LIMIT 2
        | KEEP event_type
    """)
    assert list(out.columns) == ["event_type"]
    assert len(out) == 2


def test_global_stats_no_by(ray_session):
    out = esql.run(SF, "FROM events | STATS c = COUNT(*), s = SUM(value)")
    assert len(out) == 1 and out["c"].iloc[0] > 0


def test_parser_rejects_unknown():
    with pytest.raises(ValueError):
        esql.parse("WHERE x > 1")
    with pytest.raises(ValueError):
        esql.run(SF, "FROM events | FROBNICATE x")
