"""Round-3 session-14 operators.

- ES|QL SCALB / COPY_SIGN / ROUND_TO (8.18): x-pack/plugin/esql/.../
  expression/function/scalar/math/{Scalb,CopySign,RoundTo}.java.
- weighted_tokens query + TokenPruningConfig (8.13): x-pack/plugin/core/
  .../ml/search/WeightedTokensUtils.java shouldKeepToken.
- rule_query / query rules (8.10): x-pack/plugin/ent-search/.../rules/
  RuleQueryBuilder.java (pinned/excluded actions, criteria match).
- _sql cursor pagination: x-pack/plugin/sql RestSqlQueryAction
  fetch_size + cursor continuation (keyset analog).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.functions.esql_expr import evaluate, parse_expr
from elasticsearch_ray.functions.sql import _split_and
from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def _ev(expr: str, t: pa.Table):
    return evaluate(parse_expr(expr), t)


def test_scalb_exact_power_of_two():
    t = pa.table({"v": [1.5, -3.25, 0.0, 1e-3]})
    out = _ev("SCALB(v, 4)", t).to_pylist()
    assert out == [v * 16.0 for v in [1.5, -3.25, 0.0, 1e-3]]
    # column scale factor, including negative exponents
    t2 = pa.table({"v": [8.0, 8.0, 8.0], "k": [-3, 0, 10]})
    assert _ev("SCALB(v, k)", t2).to_pylist() == [1.0, 8.0, 8192.0]


def test_copy_sign_java_semantics():
    t = pa.table({"m": [3.0, -3.0, 2.5, 0.0], "s": [-1.0, 5.0, 0.0, -2.0]})
    out = _ev("COPY_SIGN(m, s)", t).to_pylist()
    # sign of +0.0 is positive (Math.copySign)
    assert out == [-3.0, 3.0, 2.5, -0.0]
    assert math.copysign(1.0, out[3]) == -1.0


def test_round_to_points():
    t = pa.table({"v": [-7.0, 0.0, 49.9, 50.0, 99.0, 777.0]})
    out = _ev("ROUND_TO(v, 0, 50, 100, 500)", t).to_pylist()
    # below the smallest point -> smallest point; otherwise round down
    assert out == [0.0, 0.0, 0.0, 50.0, 50.0, 500.0]
    # single point: everything collapses onto it
    assert _ev("ROUND_TO(v, 100)", t).to_pylist() == [100.0] * 6


def test_round_to_unsorted_points_and_null():
    t = pa.table({"v": [250.0, None, 10.0]})
    out = _ev("ROUND_TO(v, 500, 0, 100)", t).to_pylist()
    assert out[0] == 100.0 and out[2] == 0.0
    assert out[1] is None or (isinstance(out[1], float) and math.isnan(out[1]))


def test_split_and_paren_aware():
    # keyset predicate: the inner AND must not split the OR branch
    parts = _split_and("a < 5 OR (a == 5 AND b > 3)")
    assert parts == ["a < 5 OR (a == 5 AND b > 3)"]
    parts = _split_and("x = 1 AND (y = 2 AND z = 3) AND w = 4")
    assert parts == ["x = 1", "(y = 2 AND z = 3)", "w = 4"]
    # string literals still shield AND
    parts = _split_and("q = 'a AND b' AND r = 2")
    assert parts == ["q = 'a AND b'", "r = 2"]


def test_weighted_tokens_pruning(ray_session):
    out = ops.ft_weighted_tokens(SF)
    # 'slow' must be pruned (high df ratio, weight 0.1 <= 0.4*0.9);
    # docs containing ONLY 'slow' (of the query tokens) score nothing.
    assert (out["score"] > 0).all()
    # 'dup' survives via the freq-ratio branch: rare term, low weight.
    # A doc with 'dup' but neither data nor merge must still match.
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    dup_only = con.execute("""
        WITH tok AS (SELECT doc_id, t AS term FROM (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                '[^a-z0-9]+')) AS t FROM documents) u WHERE t <> '')
        SELECT DISTINCT doc_id FROM tok WHERE term = 'dup'
        AND doc_id NOT IN (SELECT doc_id FROM tok
                           WHERE term IN ('data', 'merge'))
    """).df()
    if len(dup_only):
        assert set(dup_only["doc_id"]).issubset(set(out["doc_id"]))


def test_rule_query_pin_exclude(ray_session):
    out = ops.ft_rule_query(SF)
    # doc 7 pinned at rank 1; 23 pinned-then-excluded -> absent;
    # 41 excluded -> absent
    assert out.iloc[0]["doc_id"] == 7 and out.iloc[0]["pinned"] == 1
    assert 23 not in set(out["doc_id"]) and 41 not in set(out["doc_id"])
    # organic portion is score-descending
    org = out[out["pinned"] == 0]["score"].to_numpy()
    assert (np.diff(org) <= 1e-12).all()


def test_sql_cursor_page_keyset(ray_session):
    from elasticsearch_ray.functions.sql import run_sql
    from elasticsearch_ray.pipelines.ops import _ds

    page2 = ops.sql_cursor_page(SF)
    both = run_sql(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 30",
        SF, ds_factory=_ds)
    # keyset continuation == rows 15..29 of the single-shot ordering
    expect = both.iloc[15:30].reset_index(drop=True)
    pd.testing.assert_frame_equal(page2, expect)


def test_geo_grid_query_cell_membership(ray_session):
    from elasticsearch_ray.geo import geohash_encode, geotile_cell

    out = ops.geo_grid_query(SF)
    assert set(out["grid"]) <= {"geohash:zj", "geotile:3/1/0"}
    assert len(out) > 0
    # every returned event's user coordinate really encodes to the cell
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ev = con.execute("SELECT event_id, user_id FROM events").df()
    uid = ev.set_index("event_id")["user_id"]
    gh_rows = out[out["grid"] == "geohash:zj"]["event_id"]
    u = uid.loc[gh_rows].to_numpy()
    lat = (((u * 7919) % 180) - 90 + 0.5).astype(float)
    lon = (((u * 104729) % 360) - 180 + 0.5).astype(float)
    assert all(c == "zj" for c in geohash_encode(lat, lon, 2))
    gt_rows = out[out["grid"] == "geotile:3/1/0"]["event_id"]
    u = uid.loc[gt_rows].to_numpy()
    lat = (((u * 7919) % 180) - 90 + 0.5).astype(float)
    lon = (((u * 104729) % 360) - 180 + 0.5).astype(float)
    assert all(c == "3/1/0" for c in geotile_cell(lat, lon, 3))


def test_text_expansion_superset_of_plain_match(ray_session):
    # expansion adds neighbor tokens -> matches a superset of the plain
    # OR-match over the raw query tokens
    from elasticsearch_ray.pipelines.fulltext import all_matches

    exp = ops.ft_text_expansion(SF)
    plain = all_matches(SF, {"kind": "match", "text": "data merge"}).to_pandas()
    assert set(plain["doc_id"]).issubset(set(exp["doc_id"]))
    assert len(exp) >= len(plain)


def test_ingest_reroute_partition(ray_session):
    out = ops.ingest_reroute(SF)
    # metrics stream siphons value>=400; totals conserve the event count
    import pyarrow.parquet as pq

    total = pq.read_table(f"{SF}/events.parquet", columns=["event_id"]).num_rows
    assert int(out["doc_count"].sum()) == total
    assert "metrics-high-default" in set(out["dest"])
    assert all(d.startswith(("logs-", "metrics-")) for d in out["dest"])


def test_st_envelope_scalar_units():
    # polygon literal: bbox over the outer ring
    assert _ev('ST_XMIN(TO_GEOSHAPE("POLYGON ((10 20, 50 5, 30 40, 10 20))"))',
               pa.table({"x": [1]})) == 10.0
    assert _ev('ST_YMAX(TO_GEOSHAPE("POLYGON ((10 20, 50 5, 30 40, 10 20))"))',
               pa.table({"x": [1]})) == 40.0
    # ENVELOPE literal (ES WKT extension: minLon maxLon maxLat minLat)
    assert _ev('ST_XMAX(TO_GEOSHAPE("ENVELOPE (-10, 25, 60, -5)"))',
               pa.table({"x": [1]})) == 25.0
    assert _ev('ST_YMIN(TO_GEOSHAPE("ENVELOPE (-10, 25, 60, -5)"))',
               pa.table({"x": [1]})) == -5.0
    # point column -> degenerate envelope, fields recoverable
    t = pa.table({"p": ["POINT (3.5 -7.25)", "POINT (-1.5 2.5)"]})
    env = _ev("ST_ENVELOPE(p)", t).to_pylist()
    assert env == ["BBOX (3.5, 3.5, -7.25, -7.25)",
                   "BBOX (-1.5, -1.5, 2.5, 2.5)"]
    t2 = pa.table({"b": env})
    assert _ev("ST_XMIN(b)", t2).to_pylist() == [3.5, -1.5]
    assert _ev("ST_YMAX(b)", t2).to_pylist() == [-7.25, 2.5]


def test_st_extent_agg_partition_invariant(ray_session):
    # the extent must not depend on block boundaries
    from elasticsearch_ray.functions import esql

    q = ('FROM events | EVAL lat = ((user_id * 7919) % 180) - 90 + 0.5, '
         'lon = ((user_id * 104729) % 360) - 180 + 0.5 '
         '| EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ", '
         'TO_STRING(lat), ")")) '
         '| STATS ext = ST_EXTENT_AGG(p) BY event_type | SORT event_type')
    a = esql.run(SF, q)

    def reader(table):
        import ray.data as rd

        return rd.read_parquet(f"{SF}/{table}.parquet").repartition(7)

    b = esql.run(SF, q, reader=reader)
    pd.testing.assert_frame_equal(a, b)


def test_geo_grid_processor_roundtrip(ray_session):
    # decoded cell bbox must contain every point that encoded to the cell
    from elasticsearch_ray.geo import geohash_encode, parse_wkt

    out = ops.ingest_geo_grid(SF)
    by_cell = dict(zip(out["cell"], out["shape"]))
    rng = np.arange(1, 200)
    lat = (((rng * 7919) % 180) - 90 + 0.5).astype(float)
    lon = (((rng * 104729) % 360) - 180 + 0.5).astype(float)
    gh = geohash_encode(lat, lon, 2)
    for la, lo, c in zip(lat, lon, gh):
        if c not in by_cell:
            continue
        kind, rings = parse_wkt(by_cell[c])
        pts = rings[0]
        w, e = pts[:, 0].min(), pts[:, 0].max()
        s, n = pts[:, 1].min(), pts[:, 1].max()
        assert w <= lo <= e and s <= la <= n, (c, la, lo)


def test_mtermvectors_field_statistics(ray_session):
    out = ops.mtermvectors(SF)
    assert set(out["doc_id"]) == {11, 42, 77}
    # ttf >= df >= 1 and ttf >= tf for every row
    assert (out["ttf"] >= out["df"]).all()
    assert (out["ttf"] >= out["tf"]).all()
    assert (out["df"] >= 1).all()
    # stats are per-term constants: same term in two docs -> same df/ttf
    g = out.groupby("term")[["df", "ttf"]].nunique()
    assert (g == 1).all().all()


def test_cat_recovery_matches_segments(ray_session):
    rec = ops.cat_recovery(SF)
    seg = ops.cat_segments(SF)
    assert (rec["docs_recovered"].to_numpy()
            == seg["doc_count"].to_numpy()).all()
    assert (rec["stage"] == "done").all()


def test_cartesian_vs_geo_distance_dispatch():
    # same coordinates: cartesian is planar, geo is haversine
    t = pa.table({"p": ["POINT (3 4)"]})
    cart = _ev('ST_DISTANCE(TO_CARTESIANPOINT(p), '
               'TO_CARTESIANPOINT("POINT (0 0)"))', t).to_pylist()[0]
    assert cart == 5.0
    geo = _ev('ST_DISTANCE(TO_GEOPOINT(p), TO_GEOPOINT("POINT (0 0)"))',
              t).to_pylist()[0]
    assert abs(geo - 556000) < 1500  # ~5 degrees of arc in meters


def test_to_date_nanos_and_unsigned_long():
    import datetime

    t = pa.table({"ts": pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5,
                                                    123456)],
                                 pa.timestamp("us")),
                  "n": [1_700_000_000_000_000_000],
                  "i": [-1]})
    tn = _ev("TO_DATE_NANOS(ts)", t)
    assert tn.type == pa.timestamp("ns")
    assert tn.to_pylist()[0].microsecond == 123456
    # numeric input is nanos-since-epoch
    tn2 = _ev("TO_DATE_NANOS(n)", t).to_pylist()[0]
    assert tn2.year == 2023 and tn2.month == 11
    u = _ev("TO_UNSIGNED_LONG(i)", t)
    assert u.type == pa.uint64()
    # negative -> null (ES|QL conversion-failure semantics)
    assert u.to_pylist() == [None]
    ok = _ev("TO_UNSIGNED_LONG(n)", t)
    assert ok.to_pylist() == [1_700_000_000_000_000_000]


def test_script_score_vector_functions(ray_session):
    out = ops.ft_script_score_vectors(SF)
    assert len(out) == 20
    # score = cosine + 1 in [0, 2]; descending
    assert ((out["score"] >= 0) & (out["score"] <= 2)).all()
    assert (np.diff(out["score"].to_numpy()) <= 1e-12).all()
    # hamming bounded by dims (64)
    assert ((out["hamming"] >= 0) & (out["hamming"] <= 64)).all()
    # l2^2 consistency spot check: l2 <= sqrt(l1 * max|diff|) is loose;
    # instead verify l1 >= l2 (holds for any vector) and both positive
    assert (out["l1"].to_numpy() >= out["l2"].to_numpy() - 1e-9).all()


def test_dedup_task_twin_equivalence(ray_session):
    # the num_returns task-exchange path must keep exactly the same
    # min-id-per-content-hash survivors as the Dataset-groupby twin
    from elasticsearch_ray.functions.dedup import exact_dedup, exact_dedup_tasks
    from elasticsearch_ray.pipelines.ops import _ds

    a = sorted(exact_dedup(_ds(SF, "documents", ["doc_id", "text"]))
               .select_columns(["doc_id"]).to_pandas()["doc_id"])
    b = sorted(exact_dedup_tasks(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"], num_buckets=5)
               .select_columns(["doc_id"]).to_pandas()["doc_id"])
    assert a == b and len(a) > 0


def test_dedup_tasks_single_bucket(ray_session):
    from elasticsearch_ray.functions.dedup import exact_dedup_tasks

    out = exact_dedup_tasks(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"], num_buckets=1)
    df = out.to_pandas()
    assert df["doc_id"].is_unique and len(df) > 0


def test_index_phrases_equals_position_phrase(ray_session):
    # the 2-shingle single-term lookup must equal the position-verified
    # phrase query doc set
    from elasticsearch_ray.pipelines.fulltext import all_matches

    fast = set(ops.ft_index_phrases(SF)["doc_id"])
    slow = set(all_matches(SF, {"kind": "match_phrase", "text": "data query"},
                           with_score=False)["doc_id"].to_pylist())
    assert fast == slow and len(fast) > 0


def test_wildcard_field_prefilter_is_superset(ray_session):
    # every verified doc passed the gram prefilter; prefilter is a
    # superset of the LIKE-verified set
    import duckdb

    out = set(ops.wildcard_field_query(SF)["doc_id"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    cand = set(con.execute(
        "SELECT doc_id FROM documents WHERE text LIKE '%dat%' AND "
        "text LIKE '%erg%'").df()["doc_id"])
    assert out.issubset(cand) and len(out) > 0


def test_esql_term_and_multimatch(ray_session):
    from elasticsearch_ray.functions import esql

    out = ops.esql_term_multimatch(SF)
    assert len(out) == 12
    assert (np.diff(out["_score"].to_numpy()) <= 1e-12).all()
    # TERM is exact/unanalyzed: doc count equals the source equality count
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM read_parquet("
                   f"'{SF}/documents.parquet') WHERE source='src3'"
                   ).fetchone()[0]
    assert out["term_src3_n"].iloc[0] == n
    # MULTI_MATCH best_fields with operator option parses too
    r = esql.run(SF, 'FROM documents METADATA _score '
                     '| WHERE MULTI_MATCH("data src3", text, source, '
                     '{"type": "best_fields", "tie_breaker": 0.3}) '
                     '| STATS n = COUNT(*)')
    assert int(r["n"].iloc[0]) > 0


def test_esql_stats_mad_partition_invariant(ray_session):
    from elasticsearch_ray.functions import esql

    q = ('FROM events | STATS mad = MEDIAN_ABSOLUTE_DEVIATION(value) '
         'BY event_type | SORT event_type')
    a = esql.run(SF, q)

    def reader(table):
        import ray.data as rd

        return rd.read_parquet(f"{SF}/{table}.parquet").repartition(9)

    b = esql.run(SF, q, reader=reader)
    pd.testing.assert_frame_equal(a, b)


def test_eql_unique_and_sort_pipes(ray_session):
    from elasticsearch_ray.functions import eql

    out = ops.eql_unique_pipe(SF)
    assert out["user_id"].is_unique and len(out) == 15
    # sort pipe on the bounded frame
    srt = eql.run(SF, 'any where value > 100 | head 20 | sort value')
    assert (np.diff(srt["value"].to_numpy()) >= 0).all()
    # unique after head operates on the bounded frame
    u2 = eql.run(SF, 'any where value > 100 | head 20 | unique event_type')
    assert u2["event_type"].is_unique


def test_dls_scores_equal_unrestricted(ray_session):
    from elasticsearch_ray.pipelines.fulltext import all_matches

    dls = ops.dls_filtered_search(SF).set_index("doc_id")["score"]
    full = all_matches(SF, {"kind": "match", "text": "data merge"}
                       ).to_pandas().set_index("doc_id")["score"]
    # filter context: visible docs keep the unrestricted scores
    assert set(dls.index).issubset(set(full.index))
    assert (full.loc[dls.index] == dls).all()
