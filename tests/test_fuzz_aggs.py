"""Seeded randomized aggregation fuzz vs DuckDB.

Random agg parameters (histogram widths, range filters, terms sizes,
date_histogram intervals, composite cursors) are drawn per seed and the
Ray Data aggregation result is compared to a DuckDB query generated from
the SAME parameters over the same parquet — a differential harness for the
agg layer's bucketing arithmetic and groupby plumbing, complementing the
fixed oracle gates (which only ever see one parameterization).
"""

from __future__ import annotations

import duckdb
import numpy as np
import os as _os

# fresh-seed sweeps: GRAFT_SEED_OFFSET=N shifts every inline seed
_SEED_OFF = int(_os.environ.get("GRAFT_SEED_OFFSET", "0"))
import pandas as pd
import pytest

from elasticsearch_ray.aggs import aggregations as A
from elasticsearch_ray.pipelines.ops import _ds

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')")
    return c


@pytest.fixture(scope="module")
def events(ray_session):
    return _ds(SF_DIR, "events")


def _cmp(got: pd.DataFrame, want: pd.DataFrame, sort_cols, msg):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = want.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(want), f"{msg}: {len(got)} vs {len(want)} rows"
    for c in want.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(g.astype(float), w.astype(float),
                                       rtol=1e-9, atol=1e-12, err_msg=f"{msg}:{c}")
        else:
            assert (g == w).all(), f"{msg}:{c}"


def test_fuzz_histogram_widths(events, con):
    rng = np.random.default_rng(7 + _SEED_OFF)
    for _ in range(8):
        w = round(float(rng.uniform(2.5, 95.0)), 2)
        got = A.histogram(events, "value", w)
        want = con.execute(
            f"SELECT floor(value/{w})*{w} AS bucket, count(*) AS doc_count "
            f"FROM events GROUP BY 1 ORDER BY 1").fetchdf()
        _cmp(got, want, ["bucket"], f"histogram width={w}")


def test_fuzz_terms_sizes_and_range_filters(events, con):
    rng = np.random.default_rng(11 + _SEED_OFF)
    import pyarrow.compute as pc

    for i in range(8):
        lo = float(rng.uniform(-20, 120))
        hi = lo + float(rng.uniform(5, 150))
        size = int(rng.integers(1, 6)) if rng.random() < 0.5 else None
        filtered = events.map_batches(
            lambda t, lo=lo, hi=hi: t.filter(
                (pc.field("value") >= lo) & (pc.field("value") < hi)),
            batch_format="pyarrow")
        got = A.terms_agg(filtered, "event_type", value="value", size=size)
        limit = f"LIMIT {size}" if size else ""
        want = con.execute(
            f"SELECT event_type, count(*) AS doc_count, sum(value) AS sum_value "
            f"FROM events WHERE value >= {lo} AND value < {hi} "
            f"GROUP BY 1 ORDER BY doc_count DESC, event_type {limit}").fetchdf()
        # compare in ranked order (that IS the semantics under a size cut)
        got = got.reset_index(drop=True)
        want = want.reset_index(drop=True)
        assert got["event_type"].tolist() == want["event_type"].tolist(), i
        assert got["doc_count"].tolist() == want["doc_count"].tolist(), i
        np.testing.assert_allclose(got["sum_value"], want["sum_value"], rtol=1e-9)


def test_fuzz_date_histogram_intervals(events, con):
    rng = np.random.default_rng(13 + _SEED_OFF)
    for _ in range(6):
        interval = str(rng.choice(["hour", "day", "week", "month"]))
        with_sum = bool(rng.random() < 0.5)
        got = A.date_histogram(events, "ts", interval=interval,
                               value="value" if with_sum else None)
        sum_sql = ", sum(value) AS sum_value" if with_sum else ""
        want = con.execute(
            f"SELECT date_trunc('{interval}', ts) AS bucket, "
            f"count(*) AS doc_count{sum_sql} "
            f"FROM events GROUP BY 1 ORDER BY 1").fetchdf()
        got = got.copy()
        got["bucket"] = pd.to_datetime(got["bucket"])
        want["bucket"] = pd.to_datetime(want["bucket"])
        _cmp(got, want, ["bucket"], f"date_histogram {interval}")


def test_fuzz_composite_cursors(events, con):
    rng = np.random.default_rng(17 + _SEED_OFF)
    all_rows = con.execute(
        "SELECT event_type, user_id, count(*) AS doc_count FROM events "
        "GROUP BY 1,2 ORDER BY 1,2").fetchdf()
    for i in range(6):
        size = int(rng.integers(2, 20))
        if rng.random() < 0.7 and len(all_rows) > 2:
            j = int(rng.integers(len(all_rows) - 1))
            after = (all_rows.event_type.iloc[j], int(all_rows.user_id.iloc[j]))
        else:
            after = None
        got = A.composite_agg(events, ["event_type", "user_id"],
                              size=size, after=after)
        want = all_rows
        if after is not None:
            et, uid = after
            mask = (want.event_type > et) | ((want.event_type == et) &
                                             (want.user_id > uid))
            want = want[mask]
        want = want.head(size).reset_index(drop=True)
        _cmp(got, want, ["event_type", "user_id"], f"composite #{i} after={after}")


def test_fuzz_stats_on_filtered_slices(events, con):
    rng = np.random.default_rng(19 + _SEED_OFF)
    import pyarrow.compute as pc

    for i in range(5):
        lo = float(rng.uniform(-10, 200))
        filtered = events.map_batches(
            lambda t, lo=lo: t.filter(pc.field("value") >= lo),
            batch_format="pyarrow")
        got = A.stats_agg(filtered, "event_type", "value")
        want = con.execute(
            f"SELECT event_type, count(*) AS cnt, min(value) AS min_v, "
            f"max(value) AS max_v, sum(value) AS sum_v, avg(value) AS avg_v "
            f"FROM events WHERE value >= {lo} GROUP BY 1 ORDER BY 1").fetchdf()
        _cmp(got, want, ["event_type"], f"stats slice lo={lo}")
