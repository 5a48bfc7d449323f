"""ES|QL pipe-language executor: grammar coverage beyond the gate's
pipeline — LIMIT/KEEP/post-STATS WHERE, AVG/MIN merge correctness across
partials, and parser rejection of unsupported commands."""

from __future__ import annotations

import duckdb
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


def test_dissect_extracts_and_casts(ray_session):
    out = esql.run(SF, '''
        FROM events
        | DISSECT props {"k": %{kv}}
        | EVAL k = TO_INTEGER(kv)
        | STATS mx = MAX(k), mn = MIN(k) BY event_type
        | SORT event_type
    ''')
    assert (out["mx"] >= out["mn"]).all() and len(out) > 0


def test_mv_expand_token_counts_match_split(ray_session):
    out = esql.run(SF, '''
        FROM documents
        | EVAL toks = SPLIT(text, " ")
        | MV_EXPAND toks
        | STATS n = COUNT(*) BY toks
        | SORT n DESC, toks
        | LIMIT 5
    ''')
    want = duckdb.sql(f"""
        SELECT unnest(string_split(text, ' ')) AS t
        FROM read_parquet('{SF}/documents.parquet')""").df()
    top = want.groupby("t").size().sort_values(ascending=False)
    assert int(out["n"].iloc[0]) == int(top.iloc[0])


def test_lookup_join_broadcasts_dimension(ray_session):
    out = esql.run(SF, '''
        FROM customer
        | LOOKUP JOIN nation ON c_nationkey == n_nationkey
        | STATS cnt = COUNT(*) BY n_name
        | SORT n_name
    ''')
    ncust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert out["cnt"].sum() == ncust


def test_row_mode_topk_matches_sql(ray_session):
    out = esql.run(SF, '''
        FROM events
        | WHERE event_type == "purchase"
        | SORT value DESC, event_id
        | LIMIT 5
        | KEEP event_id, value
    ''')
    want = duckdb.sql(f"""
        SELECT event_id, value FROM read_parquet('{SF}/events.parquet')
        WHERE event_type = 'purchase'
        ORDER BY value DESC, event_id LIMIT 5""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_row_mode_implicit_limit_1000(ray_session):
    # no LIMIT -> the reference's implicit result-truncation default of
    # 1000 rows (EsqlPlugin QUERY_RESULT_TRUNCATION_DEFAULT_SIZE)
    out = esql.run(SF, "FROM events | WHERE value >= 0")
    assert len(out) == 1000


def test_count_distinct_exact_and_mixed(ray_session):
    out = esql.run(SF, '''
        FROM events
        | STATS u = COUNT_DISTINCT(user_id), c = COUNT(*) BY event_type
        | SORT event_type
    ''')
    want = duckdb.sql(f"""
        SELECT event_type, count(DISTINCT user_id) AS u, count(*) AS c
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_count_distinct_global_no_by(ray_session):
    out = esql.run(SF, "FROM events | STATS u = COUNT_DISTINCT(user_id)")
    want = duckdb.sql(f"""
        SELECT count(DISTINCT user_id) AS u
        FROM read_parquet('{SF}/events.parquet')""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_rename_and_drop_commands(ray_session):
    out = esql.run(SF, '''
        FROM events
        | RENAME event_type AS kind
        | DROP ts, props
        | STATS c = COUNT(*) BY kind
        | SORT kind
    ''')
    want = duckdb.sql(f"""
        SELECT event_type AS kind, count(*) AS c
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_stats_extended_family(ray_session):
    """MEDIAN/PERCENTILE exact pair exchange + fixed-point STD_DEV and
    WEIGHTED_AVG match DuckDB with atol=0 (bit-identical folds)."""
    import duckdb

    out = esql.run(SF, """
        FROM lineitem
        | STATS med = MEDIAN(l_extendedprice),
                p95 = PERCENTILE(l_extendedprice, 95),
                sd = STD_DEV(l_discount),
                w = WEIGHTED_AVG(l_extendedprice, l_quantity)
          BY l_returnflag
        | SORT l_returnflag
    """)
    want = duckdb.sql(f"""
        SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.5) med,
          quantile_cont(l_extendedprice, 0.95) p95,
          sqrt((sum(round(l_discount*100)::BIGINT*round(l_discount*100)::BIGINT)::DOUBLE
               - (sum(round(l_discount*100)::BIGINT)::DOUBLE)^2 / count(*))
               / (count(*)-1)) / 100.0 sd,
          sum(round(l_extendedprice*100)::BIGINT * round(l_quantity*100)::BIGINT)::DOUBLE
            / (100 * sum(round(l_quantity*100)::BIGINT))::DOUBLE w
        FROM read_parquet('{SF}/lineitem.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False, atol=0)


def test_enrich_broadcast_join(ray_session):
    out = esql.run(SF, """
        FROM events
        | ENRICH customer ON user_id == c_custkey WITH c_name, c_nationkey
        | WHERE c_nationkey IS NOT NULL
        | STATS n = COUNT(*) BY c_nationkey
        | SORT c_nationkey
    """)
    import duckdb

    want = duckdb.sql(f"""
        SELECT c_nationkey, count(*) n
        FROM read_parquet('{SF}/events.parquet') e
        JOIN read_parquet('{SF}/customer.parquet') c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False)


def test_values_multivalue(ray_session):
    out = esql.run(SF, """
        FROM orders
        | STATS kinds = VALUES(o_orderstatus) BY o_orderpriority
        | SORT o_orderpriority
    """)
    assert all(isinstance(v, list) and v == sorted(v) for v in out["kinds"])


def test_bucket_grouping(ray_session):
    """BUCKET calendar + numeric grouping vs DuckDB."""
    import duckdb

    out = esql.run(SF, """
        FROM events
        | STATS n = COUNT(*) BY d = BUCKET(ts, 1 day), b = BUCKET(value, 50)
        | SORT d, b
    """)
    out["d"] = out["d"].dt.strftime("%Y-%m-%d")
    want = duckdb.sql(f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') d,
               floor(value/50)*50 b, count(*) n
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False)


def test_inlinestats_join_back(ray_session):
    """INLINESTATS = window aggregate joined back onto rows."""
    import duckdb

    out = esql.run(SF, """
        FROM orders
        | INLINESTATS avg_price = AVG(o_totalprice) BY o_orderstatus
        | WHERE o_totalprice > avg_price
        | STATS n = COUNT(*) BY o_orderstatus
        | SORT o_orderstatus
    """)
    want = duckdb.sql(f"""
        WITH w AS (SELECT o_orderstatus, o_totalprice,
                     AVG(o_totalprice) OVER (PARTITION BY o_orderstatus) a
                   FROM read_parquet('{SF}/orders.parquet'))
        SELECT o_orderstatus, count(*) n FROM w
        WHERE o_totalprice > a GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False)


def test_inlinestats_no_by(ray_session):
    out = esql.run(SF, """
        FROM orders
        | INLINESTATS m = MAX(o_totalprice)
        | WHERE o_totalprice == m
        | KEEP o_orderkey, o_totalprice, m
        | SORT o_orderkey
        | LIMIT 5
    """)
    assert len(out) >= 1
    assert (out["o_totalprice"] == out["m"]).all()


def test_sample_deterministic_and_invariant(ray_session):
    a = esql.run(SF, """
        FROM orders | SAMPLE 0.25 3
        | STATS n = COUNT(*) | SORT n
    """)
    b = esql.run(SF, """
        FROM orders | SAMPLE 0.25 3
        | STATS n = COUNT(*) | SORT n
    """)
    assert a["n"].iloc[0] == b["n"].iloc[0]
    total = esql.run(SF, "FROM orders | STATS n = COUNT(*)")["n"].iloc[0]
    frac = a["n"].iloc[0] / total
    assert 0.15 < frac < 0.35  # hash-uniformity sanity band
    # different seed -> different sample (with overwhelming probability)
    c = esql.run(SF, """
        FROM orders | SAMPLE 0.25 4
        | STATS n = COUNT(*) | SORT n
    """)
    assert 0.15 < c["n"].iloc[0] / total < 0.35


def test_row_literal_source(ray_session):
    out = esql.run(SF, 'ROW a = 1, b = "two" | EVAL c = a * 10')
    assert out.to_dict("records") == [{"a": 1, "b": "two", "c": 10}]


def test_fork_branches_union(ray_session):
    import duckdb

    out = esql.run(SF, """
        FROM events
        | FORK ( WHERE value > 50 | STATS n = COUNT(*) BY event_type )
               ( STATS m = MAX(value) BY event_type )
        | SORT _fork, event_type
    """)
    assert set(out["_fork"]) == {"fork1", "fork2"}
    # branch 2 carries m, branch 1 carries n (union of schemas)
    f1 = out[out["_fork"] == "fork1"]
    want = duckdb.sql(f"""
        SELECT count(*) n FROM read_parquet('{SF}/events.parquet')
        WHERE value > 50 GROUP BY event_type ORDER BY event_type""").df()
    assert f1["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()


def test_categorize_by(ray_session):
    out = esql.run(SF, """
        FROM events
        | EVAL msg = CONCAT(event_type, " #", TO_STRING(user_id))
        | STATS n = COUNT(*) BY cat = CATEGORIZE(msg)
        | SORT cat
    """)
    assert all(c.endswith("##") or "#" in c for c in out["cat"])
    assert out["n"].sum() > 0


def test_rerank_overlap_and_cosine(ray_session):
    out = esql.run(SF, """
        FROM documents
        | RERANK "data batch spark" ON text
        | SORT _score DESC, doc_id
        | KEEP doc_id, _score
        | LIMIT 5
    """)
    assert (out["_score"].iloc[0] >= out["_score"]).all()
    assert out["_score"].iloc[0] <= 3  # at most |query token set|
    cos = esql.run(SF, """
        FROM documents
        | RERANK "data batch spark" ON text WITH hash-cosine
        | SORT _score DESC, doc_id
        | KEEP doc_id, _score
        | LIMIT 5
    """)
    assert ((cos["_score"] <= 1.0) & (cos["_score"] >= -1.0)).all()


def test_completion_echo_mock(ray_session):
    out = esql.run(SF, """
        FROM documents
        | WHERE doc_id < 5
        | COMPLETION c = text WITH echo-5
        | KEEP doc_id, c
        | SORT doc_id
        | LIMIT 5
    """)
    assert all(c.startswith("OK: ") for c in out["c"])
    assert all(len(c[4:].split(" ")) <= 5 for c in out["c"])


def test_stats_where_filtered_aggregates(ray_session):
    """Per-aggregate WHERE (FilteredExpression, 8.16): masks apply per
    aggregate, groups form over ALL rows, no-match groups give 0/null."""
    out = esql.run(SF, '''
        FROM events
        | STATS n = COUNT(*),
                none = COUNT(*) WHERE value > 1000000,
                s = SUM(value) WHERE value > 1000000
          BY event_type
        | SORT event_type
    ''')
    assert (out["none"] == 0).all()
    assert out["s"].isna().all()
    assert (out["n"] > 0).all()


def test_stats_where_no_by_null_sum(ray_session):
    out = esql.run(SF, '''
        FROM events
        | STATS s = SUM(value) WHERE value > 1000000,
                c = COUNT(*) WHERE value > 1000000
    ''')
    assert out["s"].isna().all()
    assert int(out["c"].iloc[0]) == 0


def test_change_point_planted_step(ray_session):
    """CUSUM mean-shift finds the boundary of a planted step series and
    the z-test pvalue is tiny for a clean shift."""
    from elasticsearch_ray.functions.esql import _change_point

    df = pd.DataFrame({"k": range(20),
                       "v": [10.0] * 10 + [50.0] * 10})
    # tiny jitter keeps segment variance nonzero without moving the argmax
    df.loc[3, "v"] += 0.5
    df.loc[15, "v"] -= 0.5
    out = _change_point(df, "v ON k")
    hit = out[out["type"].notna()]
    assert len(hit) == 1
    assert int(hit["k"].iloc[0]) == 9  # last point of the low segment
    assert float(hit["pvalue"].iloc[0]) < 1e-6


def test_change_point_requires_stats(ray_session):
    with pytest.raises(ValueError, match="CHANGE_POINT requires"):
        esql.run(SF, "FROM events | CHANGE_POINT value ON ts | LIMIT 5")


def test_ip_function_family(ray_session):
    """CIDR_MATCH boundary inclusion, IP_PREFIX masking, TO_IP checks."""
    import pyarrow as pa

    from elasticsearch_ray.functions.esql_expr import evaluate, parse_expr

    t = pa.table({"ip": ["10.0.0.0", "10.255.255.255", "11.0.0.0",
                         "192.168.1.130", "0.0.0.0"]})
    got = evaluate(parse_expr('CIDR_MATCH(ip, "10.0.0.0/8")'), t).to_pylist()
    assert got == [True, True, False, False, False]
    got = evaluate(parse_expr('CIDR_MATCH(ip, "10.0.0.0/8", '
                              '"192.168.1.128/25")'), t).to_pylist()
    assert got == [True, True, False, True, False]
    pfx = evaluate(parse_expr("IP_PREFIX(ip, 25, 0)"), t).to_pylist()
    assert pfx == ["10.0.0.0", "10.255.255.128", "11.0.0.0",
                   "192.168.1.128", "0.0.0.0"]
    # /32 and /0 edges
    assert evaluate(parse_expr("IP_PREFIX(ip, 32, 0)"), t).to_pylist() \
        == t["ip"].to_pylist()
    assert set(evaluate(parse_expr("IP_PREFIX(ip, 0, 0)"), t).to_pylist()) \
        == {"0.0.0.0"}
    with pytest.raises(ValueError, match="TO_IP"):
        evaluate(parse_expr("TO_IP(ip)"),
                 pa.table({"ip": ["300.1.2.3"]}))
    with pytest.raises(ValueError, match="TO_IP"):
        evaluate(parse_expr("TO_IP(ip)"), pa.table({"ip": ["1.2.3"]}))


def test_ts_rate_counter_semantics(ray_session):
    """RATE: positive increments sum, resets contribute the new value,
    single-sample / zero-span series give null."""
    import duckdb

    out = esql.run(SF, '''
        TS events
        | STATS r = RATE(value)
          BY user_id, day = DATE_FORMAT("yyyy-MM-dd", DATE_TRUNC("day", ts))
        | SORT user_id, day
        | LIMIT 40
    ''')
    want = duckdb.sql(f"""
        WITH x AS (SELECT user_id,
                          strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                          ts, CAST(round(value*100) AS BIGINT) AS cents
                   FROM read_parquet('{SF}/events.parquet')),
        y AS (SELECT *, lag(cents) OVER
                  (PARTITION BY user_id, day ORDER BY ts) AS pc FROM x),
        g AS (SELECT user_id, day,
                     SUM(CASE WHEN pc IS NULL THEN 0
                              WHEN cents >= pc THEN cents - pc
                              ELSE cents END) AS inc,
                     epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us,
                     COUNT(*) AS n
              FROM y GROUP BY 1, 2)
        SELECT user_id, day,
               CASE WHEN n < 2 OR span_us = 0 THEN NULL
                    ELSE (inc / 100.0) / (span_us / 1000000.0) END AS r
        FROM g ORDER BY user_id, day LIMIT 40""").df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False)


def test_ts_rate_requires_by(ray_session):
    with pytest.raises(ValueError, match="RATE requires BY"):
        esql.run(SF, "TS events | STATS r = RATE(value)")


def test_rrf_fusion(ray_session):
    """RRF: per-branch rank by (_score desc, key), fused = sum 1/(60+r);
    a doc in both branches outranks singles of similar rank."""
    from elasticsearch_ray.functions.esql import _rrf

    frame = pd.DataFrame({
        "_fork": ["fork1", "fork1", "fork2", "fork2"],
        "doc_id": [1, 2, 2, 3],
        "_score": [9.0, 5.0, 7.0, 6.0],
    })
    out = _rrf(frame, "")
    assert out["doc_id"].tolist() == [2, 1, 3]
    got2 = out.loc[out.doc_id == 2, "_score"].iloc[0]
    assert abs(got2 - (1 / 62 + 1 / 61)) < 1e-12
    # custom key and rank constant
    out = _rrf(frame, "ON doc_id WITH 10")
    assert abs(out.loc[out.doc_id == 2, "_score"].iloc[0]
               - (1 / 12 + 1 / 11)) < 1e-12


def test_rrf_requires_fork(ray_session):
    from elasticsearch_ray.functions.esql import _rrf

    with pytest.raises(ValueError, match="requires FORK"):
        _rrf(pd.DataFrame({"doc_id": [1], "_score": [1.0]}), "")


def test_sort_nulls_default_and_override(ray_session):
    # ES|QL treats null as larger than any value: DESC -> nulls first
    q = '''
        FROM events
        | EVAL v = CASE(event_type == "error", NULL, value)
        | SORT v DESC{nulls}, event_id
        | LIMIT 5 | KEEP event_id, v
    '''
    first = esql.run(SF, q.format(nulls=""))
    assert first["v"].isna().all()
    last = esql.run(SF, q.format(nulls=" NULLS LAST"))
    assert last["v"].notna().all()


def test_keep_drop_wildcards(ray_session):
    out = esql.run(SF, "FROM events | KEEP event*, user* | LIMIT 3")
    assert list(out.columns) == ["event_id", "event_type", "user_id"]
    out2 = esql.run(SF, "FROM events | DROP prop*, ts | LIMIT 3")
    assert list(out2.columns) == ["event_id", "user_id", "event_type",
                                  "value"]


def test_over_time_nested_aggregates(ray_session):
    """OUTER(INNER_OVER_TIME(col)) == two-level SQL group (series = the
    user_id dimension + BY bucket), bit-identical in integer cents."""
    out = esql.run(SF, '''
        TS events
        | STATS s = SUM(AVG_OVER_TIME(value)), mn = MIN(MIN_OVER_TIME(value)),
                f = AVG(FIRST_OVER_TIME(value))
          BY day = DATE_FORMAT("yyyy-MM-dd", DATE_TRUNC("day", ts))
        | SORT day
    ''')
    want = duckdb.sql(f"""
        WITH i AS (
          SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                 sum(round(value*100)) AS cents, count(value) AS cnt,
                 min(round(value*100)) AS mnc,
                 arg_min(round(value*100), ts) AS firstc
          FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2)
        SELECT day, sum(cents/100.0/cnt) AS s, min(mnc)/100.0 AS mn,
               avg(firstc/100.0) AS f
        FROM i GROUP BY day ORDER BY day""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-9)


def test_over_time_rejects_unknown_combo():
    from elasticsearch_ray.functions.esql import _parse_stats

    with pytest.raises(ValueError, match="OVER_TIME"):
        _parse_stats("x = MEDIAN(AVG_OVER_TIME(value)) BY user_id")


def test_like_rlike_pattern_lists(ray_session):
    out = esql.run(SF, '''
        FROM events
        | WHERE event_type LIKE ("c*", "v*") AND NOT props RLIKE (".*9.*")
        | STATS n = COUNT(*) BY event_type
        | SORT event_type
    ''')
    want = duckdb.sql(f"""
        SELECT event_type, count(*) AS n
        FROM read_parquet('{SF}/events.parquet')
        WHERE (event_type LIKE 'c%' OR event_type LIKE 'v%')
          AND NOT regexp_matches(props, '9')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_top_aggregate_asc_and_filtered(ray_session):
    out = esql.run(SF, '''
        FROM events
        | EVAL v = TO_INTEGER(ROUND(value * 100, 0))
        | STATS lo = TOP(v, 2, "asc"),
                hi = TOP(v, 2, "desc") WHERE event_type == "purchase"
          BY event_type
        | SORT event_type
    ''')
    want = duckdb.sql(f"""
        SELECT event_type,
          list_slice(list(round(value*100)::BIGINT
                          ORDER BY round(value*100)::BIGINT), 1, 2) AS lo
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    assert [list(map(int, x)) for x in out["lo"]] == \
        [list(map(int, x)) for x in want["lo"]]
    # the filtered TOP only has values for the purchase group
    mask = out["event_type"] == "purchase"
    assert all(isinstance(x, list) and len(x) == 2 for x in out.loc[mask, "hi"])


def test_fuse_linear_vs_rrf_methods(ray_session):
    q = '''
        FROM documents
        | FORK ( RERANK "the data batch" ON text
                 | SORT _score DESC, doc_id | KEEP doc_id, _score | LIMIT 10 )
               ( RERANK "error count" ON text
                 | SORT _score DESC, doc_id | KEEP doc_id, _score | LIMIT 10 )
        | FUSE {m}
        | LIMIT 5
    '''
    lin = esql.run(SF, q.format(m="linear"))
    rrf = esql.run(SF, q.format(m="rrf"))
    assert list(lin.columns) == list(rrf.columns) == ["doc_id", "_score"]
    assert (lin["_score"] <= 2.0).all()  # two minmax-normalized branches


def test_multi_index_wildcard_and_tag(ray_session):
    out = esql.run(SF, '''
        FROM nation,remote:nation METADATA _index
        | STATS c = COUNT(*) BY _index
        | SORT _index
    ''')
    assert list(out["_index"]) == ["nation", "remote:nation"]
    assert out["c"].iloc[0] == out["c"].iloc[1] == 25
    wild = esql.run(SF, "FROM region* | STATS c = COUNT(*)")
    assert wild["c"].iloc[0] == 5


def test_metadata_score_rejects_multi_index(ray_session):
    with pytest.raises(ValueError, match="single indexed source"):
        esql.run(SF, '''
            FROM documents,remote:documents METADATA _score
            | WHERE MATCH(text, "data")
            | SORT doc_id | LIMIT 5 | KEEP doc_id
        ''')


def test_stats_expression_arguments(ray_session):
    out = esql.run(SF, '''
        FROM events
        | STATS s = SUM(value * 2 + 1), m = MAX(value * value),
                c = COUNT_DISTINCT(user_id + 0)
        BY event_type
        | SORT event_type
    ''')
    want = duckdb.sql(f"""
        SELECT event_type, sum(value * 2 + 1) s, max(value * value) m,
               count(DISTINCT user_id + 0) c
        FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-6)


def test_grok_type_suffix(ray_session):
    out = esql.run(SF, '''
        FROM events
        | GROK props "%{INT:kv:int}"
        | STATS mx = MAX(kv), s = SUM(kv) BY event_type
        | SORT event_type
    ''')
    assert out["mx"].dtype.kind in "if" and (out["mx"] >= 0).all()
