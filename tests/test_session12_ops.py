"""Round-3 session-12 operators: the last three x-pack analytics/ML
pipeline aggs (bucket_correlation, bucket_count_ks_test, inference) —
completing the x-pack aggregation surface.

Reference: x-pack/plugin/ml/.../aggs/correlation/
BucketCorrelationAggregationBuilder.java, aggs/kstest/
BucketCountKSTestAggregationBuilder.java, .../inference/aggs/
InferencePipelineAggregationBuilder.java."""

from __future__ import annotations

import duckdb
import numpy as np

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def _oracle(name: str):
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def test_bucket_correlation_matches_oracle(ray_session):
    got = ops.agg_bucket_correlation(SF).reset_index(drop=True)
    exp = _oracle("agg_bucket_correlation")
    assert int(got["n_buckets"][0]) == int(exp["n_buckets"][0])
    assert got["correlation"][0] == exp["correlation"][0]
    assert -1.0 <= got["correlation"][0] <= 1.0


def test_ks_test_matches_oracle_and_bounds(ray_session):
    got = ops.agg_bucket_count_ks_test(SF).reset_index(drop=True)
    exp = _oracle("agg_bucket_count_ks_test")
    for c in ("d_two_sided", "d_less", "d_greater"):
        assert got[c][0] == exp[c][0]
        assert 0.0 <= got[c][0] <= 1.0
    # two-sided dominates each one-sided statistic
    assert got["d_two_sided"][0] >= max(got["d_less"][0],
                                        got["d_greater"][0]) - 1e-12


def test_inference_regression_matches_oracle(ray_session):
    got = ops.agg_inference_regression(SF).reset_index(drop=True)
    exp = _oracle("agg_inference_regression")
    assert list(got["source"]) == list(exp["source"])
    np.testing.assert_array_equal(got["doc_count"], exp["doc_count"])
    np.testing.assert_array_equal(got["avg_chars"], exp["avg_chars"])
    np.testing.assert_array_equal(got["predicted"], exp["predicted"])
    # the linear model is what it says it is
    manual = (12.5 + 0.75 * got["avg_chars"].to_numpy()
              - 3.25 * np.log(got["doc_count"].to_numpy(np.float64)))
    np.testing.assert_allclose(got["predicted"], manual, atol=5e-7)


def test_painless_execute_contexts(ray_session):
    got = ops.painless_execute(SF).reset_index(drop=True)
    assert list(got["context"]) == ["filter", "painless_test", "score"]
    assert got.loc[got["context"] == "painless_test", "value"].iloc[0] == 32.0
    assert got.loc[got["context"] == "filter", "value"].iloc[0] in (0.0, 1.0)


def test_painless_execute_rejects_attribute_access(ray_session):
    import pytest

    from elasticsearch_ray.scripting import ScriptError, safe_eval_expr

    with pytest.raises(ScriptError):
        safe_eval_expr("().__class__", {})


def test_reload_search_analyzers_expands_query(ray_session):
    got = ops.reload_search_analyzers(SF)
    before = set(got.loc[got["phase"] == "before", "doc_id"])
    after = set(got.loc[got["phase"] == "after", "doc_id"])
    # reload only widens the query expansion: before ⊆ after
    assert before <= after
    exp = _oracle("reload_search_analyzers")
    assert got.reset_index(drop=True).equals(
        exp[["phase", "doc_id"]].reset_index(drop=True))


def test_esql_show_info(ray_session):
    got = ops.esql_show_info(SF)
    assert list(got.columns) == ["version", "hash"]
    assert got["version"][0] == "0.1.0"


def test_shape_cartesian_points_oracle(ray_session):
    got = ops.shape_cartesian_points(SF).reset_index(drop=True)
    exp = _oracle("shape_cartesian_points")
    assert got[["p_partkey", "x", "y"]].equals(exp[["p_partkey", "x", "y"]])
    # every surviving point really satisfies the quad's half-planes
    quad = [(100.0, 100.0), (800.0, 200.0), (700.0, 800.0), (150.0, 700.0)]
    for i in range(4):
        (x1, y1), (x2, y2) = quad[i], quad[(i + 1) % 4]
        a, b = y2 - y1, -(x2 - x1)
        c = a * x1 + b * y1
        assert (a * got["x"] + b * got["y"] <= c + 1e-9).all()


def test_shape_cartesian_disjoint_excludes_intersecting(ray_session):
    pts = set(ops.shape_cartesian_points(SF)["p_partkey"])
    dis = set(ops.shape_cartesian_disjoint(SF)["p_partkey"])
    # a part whose point is inside cannot have a disjoint box around it
    assert not (pts & dis)
    exp = _oracle("shape_cartesian_disjoint")
    assert sorted(dis) == list(exp["p_partkey"])


def test_ingest_circle_geometry(ray_session):
    got = ops.ingest_circle(SF)
    exp = _oracle("ingest_circle")
    assert got[["s_suppkey", "n_sides", "vertex", "vx", "vy"]].equals(
        exp[["s_suppkey", "n_sides", "vertex", "vx", "vy"]])
    # per circle: n_sides vertices, all at distance r from the center,
    # and n_sides respects the error-distance formula clamp
    for key, g in got.groupby("s_suppkey"):
        n = int(g["n_sides"].iloc[0])
        assert len(g) == n
        r = 5 + key % 5
        cx = ((key * 13) % 200) - 100 + 0.5
        cy = ((key * 29) % 200) - 100 + 0.5
        d = np.hypot(g["vx"] - cx, g["vy"] - cy)
        np.testing.assert_allclose(d, r, atol=1e-5)
        assert n == max(4, min(1000, int(np.ceil(
            np.pi / np.arccos(1 - 1.0 / r)))))


def test_eql_sample_semantics(ray_session):
    got = ops.eql_sample(SF)
    exp = _oracle("eql_sample")
    assert got.reset_index(drop=True).astype("int64").equals(
        exp.astype("int64").reset_index(drop=True))
    # every qualifying user contributes exactly one event per filter,
    # and order between filters is irrelevant (steps 0..2 all present)
    for uid, g in got.groupby("user_id"):
        assert sorted(g["step"]) == [0, 1, 2]


def test_eql_sample_order_irrelevant_vs_sequence():
    # sample must accept keys whose step events are out of time order —
    # build a tiny in-memory case where the sequence would fail
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions import eql

    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([3_000_000, 2_000_000, 1_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "event_type": pa.array(["click", "view", "purchase"]),
        "value": pa.array([1.0, 1.0, 1.0]),
    })
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = eql.run(d, "sample by user_id [ click where true ] "
                     "[ view where true ] [ purchase where true ]")
    assert list(out["user_id"]) == [7, 7, 7]
    seq = eql.run(d, "sequence by user_id [ click where true ] "
                     "[ view where true ] [ purchase where true ]")
    assert len(seq) == 0  # time-ordered join finds nothing


def test_indices_resize_split_invariant(ray_session):
    got = ops.indices_resize(SF)
    # ES resize guarantee: child shard // factor == parent shard
    assert (got["shard_6"] // 2 == got["shard_3"]).all()
    # shrink(6 -> 3) reverses split: summing children equals the parent
    parents = got.groupby("shard_3")["doc_count"].sum()
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert parents.sum() == n
    exp = _oracle("indices_resize")
    assert got.astype("int64").equals(exp.astype("int64"))


def test_sql_pivot_matches_oracle(ray_session):
    got = ops.sql_pivot(SF).reset_index(drop=True)
    exp = _oracle("sql_pivot")
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        np.testing.assert_array_equal(
            got[c].to_numpy(), exp[c].to_numpy(),
            err_msg=f"pivot column {c}")


def test_sql_pivot_count_missing_is_zero(ray_session):
    from elasticsearch_ray.pipelines.ops import _ds
    from elasticsearch_ray.functions.sql import run_sql

    out = run_sql(
        "SELECT * FROM (SELECT lang, source, n_chars FROM documents "
        "WHERE lang = 'en') PIVOT (COUNT(n_chars) FOR source IN "
        "('src0', 'nosuch'))", SF, ds_factory=_ds)
    assert list(out.columns) == ["lang", "src0", "nosuch"]
    assert (out["nosuch"] == 0).all()
    assert out["src0"].dtype == np.int64


def test_mv_percentile_and_pseries(ray_session):
    got = ops.esql_mv_functions2(SF).reset_index(drop=True)
    exp = _oracle("esql_mv_functions2")
    for c in ("p90", "med", "decay"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())
    # med is the true median of each embedding
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    v0 = np.asarray(emb["embedding"][0].as_py(), np.float64)
    assert abs(got["med"][0] - round(float(np.median(v0)), 6)) <= 1e-6


def test_mv_zip_tail_passthrough(ray_session):
    got = ops.esql_mv_zip(SF)
    assert got["zipped"][0] == "x+p|y+q|z"
    assert got["rev"][0] == "p+x|q+y|z"


def test_corpus_kl_drift_properties(ray_session):
    got = ops.corpus_kl_drift(SF)
    exp = _oracle("corpus_kl_drift")
    np.testing.assert_array_equal(got["kl"].to_numpy(),
                                  exp["kl"].to_numpy())
    # KL is non-negative and finite for every source
    assert (got["kl"] >= 0).all() and np.isfinite(got["kl"]).all()


def test_corpus_zipf_slope_is_negative(ray_session):
    got = ops.corpus_zipf_slope(SF)
    exp = _oracle("corpus_zipf_slope")
    assert got["slope"][0] == exp["slope"][0]
    assert got["intercept"][0] == exp["intercept"][0]
    assert got["slope"][0] < 0  # frequency decays with rank


def test_ingest_inference_logistic(ray_session):
    got = ops.ingest_inference(SF)
    exp = _oracle("ingest_inference")
    np.testing.assert_array_equal(got["ml_score"].to_numpy(),
                                  exp["ml_score"].to_numpy())
    assert list(got["ml_class"]) == list(exp["ml_class"])
    # scores are valid probabilities; class is the 0.5 threshold
    assert ((got["ml_score"] >= 0) & (got["ml_score"] <= 1)).all()
    assert ((got["ml_score"] >= 0.5) ==
            (got["ml_class"] == "positive")).all()


def test_cluster_reroute_moves_only_commanded(ray_session):
    base = ops.allocation_explain(SF)
    got = ops.cluster_reroute(SF)
    for _, r in got.iterrows():
        orig = base.loc[base["shard"] == r["shard"], "node"].iloc[0]
        if r["moved"]:
            assert r["shard"] in (2, 3)
            assert r["node"] == {2: "node-2", 3: "node-0"}[r["shard"]]
        else:
            assert r["node"] == orig


def test_transform_continuous_equals_full_recompute(ray_session):
    got = ops.transform_continuous(SF).reset_index(drop=True)
    exp = _oracle("transform_continuous")
    assert list(got["event_type"]) == list(exp["event_type"])
    np.testing.assert_array_equal(got["doc_count"], exp["doc_count"])
    np.testing.assert_array_equal(got["sum_value"], exp["sum_value"])


def test_field_usage_sections(ray_session):
    got = ops.field_usage_stats(SF)
    # phrase queries touch positions; pure filters never touch norms
    sec = dict(zip(zip(got["field"], got["section"]), got["count"]))
    assert sec[("text", "positions")] < sec[("text", "postings")]
    assert ("lang", "norms") not in sec
    assert ("n_chars", "points") in sec


def test_rank_vectors_maxsim(ray_session):
    got = ops.rank_vectors_maxsim(SF).reset_index(drop=True)
    exp = _oracle("rank_vectors_maxsim")
    np.testing.assert_array_equal(got["vec_id"], exp["vec_id"])
    np.testing.assert_array_equal(got["score"], exp["score"])
    # the two query vectors score highest against themselves; the score
    # sums max-cos over 2 queries x 4 query tokens, so it is bounded by 8
    assert set(got["vec_id"].head(2)) == {0, 1}
    assert (got["score"] <= 8.0 + 1e-9).all()


def test_percolate_ranges_semantics(ray_session):
    got = ops.percolate_ranges(SF)
    exp = _oracle("percolate_ranges")
    assert got.reset_index(drop=True).astype("int64").equals(
        exp.astype("int64").reset_index(drop=True))
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM "
        f"read_parquet('{SF}/documents.parquet')").df().set_index("doc_id")
    # every q11 hit is a pure-range hit: n_chars >= 400 and no term needed
    q11 = got.loc[got["query_id"] == 11, "doc_id"]
    assert (docs.loc[q11, "n_chars"] >= 400).all()
    # q10 hits satisfy BOTH the term and the range
    q10 = got.loc[got["query_id"] == 10, "doc_id"]
    assert (docs.loc[q10, "n_chars"] <= 150).all()


def test_percolator_range_only_query_no_terms():
    import pyarrow as pa

    from elasticsearch_ray.functions.percolate import Percolator

    p = Percolator([(5, {"ranges": [{"field": "x", "gte": 10}]})])
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a", "b", "c"]),
                  "x": pa.array([5, 10, 50], pa.int64())})
    out = p(t).to_pandas()
    assert list(out["doc_id"]) == [2, 3]
    assert (out["query_id"] == 5).all()


def test_geo_shape_indexed_polygons(ray_session):
    got = ops.geo_shape_indexed_polygons(SF)
    exp = _oracle("geo_shape_indexed_polygons")
    assert got.reset_index(drop=True).astype("int64").equals(
        exp.astype("int64").reset_index(drop=True))
    assert len(got) > 0
    # every hit's true circle really contains its query point with the
    # polygon-approximation margin (n-gon lies inside the circle)
    pts = {0: (-61.5, -17.5), 1: (-0.5, -70.5), 2: (93.5, -29.5)}
    for _, r in got.iterrows():
        k = int(r["s_suppkey"])
        cx = ((k * 13) % 200) - 100 + 0.5
        cy = ((k * 29) % 200) - 100 + 0.5
        rad = 5 + k % 5
        px, py = pts[int(r["pid"])]
        assert np.hypot(px - cx, py - cy) <= rad


def test_semantic_chunked_search(ray_session):
    got = ops.semantic_chunked_search(SF).reset_index(drop=True)
    exp = _oracle("semantic_chunked_search")
    assert got.astype("int64").equals(exp.astype("int64"))
    # chunk-max never exceeds whole-doc coverage, and is at most |query|
    assert (got["score"] <= 4).all() and (got["score"] >= 1).all()
    import duckdb

    whole = duckdb.sql(f"""
        SELECT doc_id, len(list_intersect(list_distinct(
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                        x -> x <> '')),
            ['slow','merge','batch','window'])) AS c
        FROM read_parquet('{SF}/documents.parquet')""").df() \
        .set_index("doc_id")["c"]
    for _, r in got.iterrows():
        assert r["score"] <= whole[r["doc_id"]]


def test_autoscaling_capacity(ray_session):
    got = ops.autoscaling_capacity(SF)
    exp = _oracle("autoscaling_capacity")
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
    tot = got[got["node"] == "__total__"].iloc[0]
    nodes = got[got["node"] != "__total__"]
    assert tot["node_docs"] == nodes["node_docs"].sum()
    # headroom: required bytes = docs * 8 * 1.25 exactly
    assert (nodes["required_bytes"] == nodes["node_docs"] * 10).all()


def test_ft_constant_keyword_short_circuit(ray_session):
    import duckdb

    got = ops.ft_constant_keyword(SF)
    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/documents.parquet')").fetchone()[0]
    assert got.loc[got["query_value"] == "code-corpus", "hits"].iloc[0] == n
    assert got.loc[got["query_value"] == "web-corpus", "hits"].iloc[0] == 0


def test_polish_ukrainian_analyzers(ray_session):
    from elasticsearch_ray.analyzer import get_analyzer

    # golden vectors pin the condensed rule lists
    assert get_analyzer("polish")("pięknych domach wielkich") == \
        ["piękn", "dom", "wielk"]
    assert get_analyzer("polish")("domek kotek") == ["dom", "kot"]
    assert get_analyzer("ukrainian")("гралися будинках") == \
        ["грал", "будинк"]
    for name in ("ft_analyze_polish", "ft_analyze_ukrainian"):
        got = getattr(ops, name)(SF).reset_index(drop=True)
        exp = _oracle(name)
        assert list(got["token"]) == list(exp["token"]), name


def test_korean_japanese_analyzers(ray_session):
    from elasticsearch_ray.analyzer import get_analyzer

    # nori substitute: josa strip off eojeol
    assert get_analyzer("korean")("아이들은 집에서") == ["아이", "집"]
    # kuromoji substitute: Han unigrams, katakana run as one token,
    # hiragana particles stopped
    assert get_analyzer("japanese")("東京のテスト") == ["東", "京", "テスト"]
    for name in ("ft_analyze_korean", "ft_analyze_japanese"):
        got = getattr(ops, name)(SF).reset_index(drop=True)
        exp = _oracle(name)
        assert list(got["token"]) == list(exp["token"]), name


def test_esql_mv_mad(ray_session):
    got = ops.esql_mv_mad(SF).reset_index(drop=True)
    exp = _oracle("esql_mv_mad")
    np.testing.assert_array_equal(got["mad"].to_numpy(),
                                  exp["mad"].to_numpy())
    # cross-check one row against numpy's definition
    import pyarrow.parquet as pq

    v = np.asarray(pq.read_table(f"{SF}/embeddings.parquet")
                   ["embedding"][0].as_py(), np.float64)
    manual = np.median(np.abs(v - np.median(v)))
    assert abs(got["mad"][0] - round(float(manual), 6)) <= 1e-6


def test_agg_geohex_grid(ray_session):
    got = ops.agg_geohex_grid(SF)
    exp = _oracle("agg_geohex_grid")
    assert got.astype("int64").reset_index(drop=True).equals(
        exp.astype("int64").reset_index(drop=True))
    import duckdb

    n = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                   f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    # hex cells partition the users: counts add up, no empty cells
    assert got["doc_count"].sum() == n
    assert (got["doc_count"] >= 1).all()


def test_simulate_index_template(ray_session):
    got = ops.simulate_index_template(SF).reset_index(drop=True)
    exp = _oracle("simulate_index_template")
    assert got.equals(exp)
    from elasticsearch_ray.index import templates as TP

    # highest priority wins; component order respected; own settings last
    sim = TP.simulate_index("logs-code-x")
    assert sim["winner"] == "logs-code"
    assert sim["template"]["analyzer"] == "code"        # later component
    assert sim["template"]["number_of_shards"] == "4"   # own settings win
    assert sim["overlapping"] == ["logs-low"]
    # an index matching only the low-priority template
    sim2 = TP.simulate_index("logs-app")
    assert sim2["winner"] == "logs-low"
    assert sim2["template"]["number_of_shards"] == "2"


def test_ltr_rescore(ray_session):
    got = ops.ltr_rescore(SF).reset_index(drop=True)
    exp = _oracle("ltr_rescore")
    np.testing.assert_array_equal(got["doc_id"], exp["doc_id"])
    np.testing.assert_array_equal(got["ltr"], exp["ltr"])
    # rescoring changes the order vs raw BM25 for at least one doc
    from elasticsearch_ray.pipelines.fulltext import topk_matches

    bm25 = topk_matches(SF, {"kind": "match", "text": "slow merge batch",
                             "k": 10})
    assert list(got["doc_id"]) != list(bm25["doc_id"].to_pylist()) or \
        len(got) != len(bm25)


def test_eql_sequence_runs(ray_session):
    got = ops.eql_sequence_runs(SF).reset_index(drop=True)
    exp = _oracle("eql_sequence_runs")
    assert got.astype("int64").equals(exp.astype("int64"))
    # runs=2 is strictly harder than the plain 2-step chain
    from elasticsearch_ray.functions import eql

    plain = eql.run(SF, "sequence by user_id with maxspan=2d "
                        "[ click where true ] [ purchase where true ]")
    m = got.merge(plain, on="user_id", suffixes=("_runs", "_plain"))
    assert (m["seqs_runs"] <= m["seqs_plain"]).all()


def test_corpus_ngram_novelty(ray_session):
    got = ops.corpus_ngram_novelty(SF).reset_index(drop=True)
    exp = _oracle("corpus_ngram_novelty")
    for c in ("doc_id", "total", "shared"):
        np.testing.assert_array_equal(got[c], exp[c])
    np.testing.assert_array_equal(got["novelty"], exp["novelty"])
    assert ((got["novelty"] >= 0) & (got["novelty"] <= 1)).all()
    assert (got["shared"] <= got["total"]).all()


def test_sql_scalar_projection(ray_session):
    got = ops.sql_scalar_projection(SF).reset_index(drop=True)
    exp = _oracle("sql_scalar_projection")
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      exp[c].to_numpy(), err_msg=c)


def test_sql_scalars_reject_mix_with_aggs(ray_session):
    import pytest

    from elasticsearch_ray.functions.sql import SqlParseError, run_sql
    from elasticsearch_ray.pipelines.ops import _ds

    with pytest.raises(SqlParseError):
        run_sql("SELECT ABS(n_chars) AS a, COUNT(*) AS c FROM documents",
                SF, ds_factory=_ds)


def test_sql_where_expression(ray_session):
    got = ops.sql_where_expression(SF).reset_index(drop=True)
    exp = _oracle("sql_where_expression")
    assert got.astype("int64").equals(exp.astype("int64"))
    assert (got["n_chars"] % 7 == 3).all()


def test_esql_modulo_operator(ray_session):
    from elasticsearch_ray.functions import esql

    out = esql.run(SF, "FROM documents | WHERE doc_id % 10 == 3 "
                       "| STATS c = COUNT(*)")
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/documents.parquet') "
                   f"WHERE doc_id % 10 = 3").fetchone()[0]
    assert int(out["c"][0]) == n


def test_sql_like_predicate(ray_session):
    got = ops.sql_like_predicate(SF).reset_index(drop=True)
    exp = _oracle("sql_like_predicate")
    assert got.astype(str).equals(exp.astype(str))
    assert got["source"].str.startswith("src1").all()


def test_ingest_conditional(ray_session):
    got = ops.ingest_conditional(SF).reset_index(drop=True)
    exp = _oracle("ingest_conditional")
    assert got.astype(str).equals(exp.astype(str))


def test_ingest_when_preserves_order_and_ignore_failure():
    import pyarrow as pa
    import pyarrow.compute as pc

    from elasticsearch_ray.functions import ingest as I

    t = pa.table({"x": pa.array([1, 5, 2, 8], pa.int64()),
                  "s": pa.array(["a", "b", "c", "d"])})
    out = I.when(lambda tt: pc.greater(tt["x"], 3).to_numpy(),
                 I.uppercase("s"))(t)
    assert out["s"].to_pylist() == ["a", "B", "c", "D"]  # order preserved
    assert out["x"].to_pylist() == [1, 5, 2, 8]
    # a processor that adds a column: untouched rows get nulls
    out2 = I.when(lambda tt: pc.greater(tt["x"], 3).to_numpy(),
                  I.set_value("hit", "y"))(t)
    assert out2["hit"].to_pylist() == [None, "y", None, "y"]

    def boom(_):
        raise RuntimeError("nope")

    assert I.ignore_failure(boom)(t).equals(t)


def test_sql_group_by_expression(ray_session):
    got = ops.sql_group_by_expression(SF).reset_index(drop=True)
    exp = _oracle("sql_group_by_expression")
    assert got.astype(str).equals(exp.astype(str))
    import pytest

    from elasticsearch_ray.functions.sql import SqlParseError, run_sql
    from elasticsearch_ray.pipelines.ops import _ds

    # a scalar projection that is NOT a group key stays rejected
    with pytest.raises(SqlParseError):
        run_sql("SELECT ABS(n_chars) AS a, COUNT(*) AS c FROM documents "
                "GROUP BY lang", SF, ds_factory=_ds)


def test_eql_insensitive_operator(ray_session):
    got = ops.eql_insensitive_match(SF).reset_index(drop=True)
    exp = _oracle("eql_insensitive_match")
    assert list(got["event_id"]) == list(exp["event_id"])
    assert got["event_type"].str.lower().str.startswith("cli").all()
    # the rewrite itself
    from elasticsearch_ray.functions.eql import _rewrite_insensitive

    assert _rewrite_insensitive('x : "AbC*"') == 'TO_LOWER(x) LIKE "abc*"'
    assert _rewrite_insensitive("x > 3") == "x > 3"


def test_analysis_wrapper_filters(ray_session):
    from elasticsearch_ray.filters import (condition_filter,
                                           multiplexer_filter,
                                           predicate_filter)

    # multiplexer dedupes same-position duplicates (palindromes)
    assert multiplexer_filter(["level"], [lambda t: t,
                                          lambda t: t[::-1]]) == ["level"]
    assert multiplexer_filter(["ab"], [lambda t: t,
                                       lambda t: t[::-1]]) == ["ab", "ba"]
    assert condition_filter(["go", "window"], lambda t: len(t) > 5,
                            lambda t: t.upper()) == ["go", "WINDOW"]
    assert predicate_filter(["go", "window"],
                            lambda t: len(t) >= 5) == ["window"]
    for name in ("ft_analyze_multiplexer", "ft_analyze_condition",
                 "ft_analyze_predicate"):
        got = getattr(ops, name)(SF).reset_index(drop=True)
        exp = _oracle(name)
        assert got.astype(str).equals(exp.astype(str)), name


def test_eql_sequence_by_multi(ray_session):
    got = ops.eql_sequence_by_multi(SF).reset_index(drop=True)
    exp = _oracle("eql_sequence_by_multi")
    assert list(got.columns) == list(exp.columns)
    assert got.astype(str).equals(exp.astype(str))
    # composite key partitions more finely than the single key: total
    # chains can only go down vs `by user_id` alone
    from elasticsearch_ray.functions import eql

    single = eql.run(SF, "sequence by user_id with maxspan=2d "
                         "[ any where value > 60 ] "
                         "[ any where value < 40 ]")
    assert got["seqs"].sum() <= single["seqs"].sum()


def test_agg_percentile_ranks_hdr(ray_session):
    got = ops.agg_percentile_ranks_hdr(SF).reset_index(drop=True)
    exp = _oracle("agg_percentile_ranks_hdr")
    assert got.astype(str).equals(exp.astype(str))
    # monotone in the query value, and close to the exact empirical rank
    assert got["rank_pct"].is_monotonic_increasing
    import duckdb

    for _, r in got.iterrows():
        exact = duckdb.sql(
            f"SELECT 100.0 * count(*) FILTER (value <= {r['value']}) "
            f"/ count(*) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        assert abs(r["rank_pct"] - exact) < 0.5  # 3-sig-digit sketch


def test_sql_select_star(ray_session):
    got = ops.sql_select_star(SF).reset_index(drop=True)
    exp = _oracle("sql_select_star")
    assert list(got.columns) == list(exp.columns)
    assert got.astype(str).equals(exp.astype(str))


def test_esql_chained_stats(ray_session):
    got = ops.esql_chained_stats(SF).reset_index(drop=True)
    exp = _oracle("esql_chained_stats")
    assert got.astype(str).equals(exp.astype(str))
    # intermediate SORT/LIMIT between two STATS applies before the second
    from elasticsearch_ray.functions import esql

    out = esql.run(SF, "FROM events "
                       "| STATS c = COUNT(*) BY event_type "
                       "| SORT c DESC | LIMIT 2 "
                       "| STATS total = SUM(c)")
    import duckdb

    want = duckdb.sql(f"""
        WITH p AS (SELECT event_type, count(*) AS c
                   FROM read_parquet('{SF}/events.parquet') GROUP BY 1
                   ORDER BY c DESC LIMIT 2)
        SELECT sum(c) FROM p""").fetchone()[0]
    assert int(out["total"][0]) == int(want)


def test_agg_filters_other_bucket(ray_session):
    got = ops.agg_filters_other_bucket(SF).reset_index(drop=True)
    exp = _oracle("agg_filters_other_bucket")
    assert got.astype(str).equals(exp.astype(str))
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM "
                   f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    # named buckets + other partition the docs exactly
    assert got["doc_count"].sum() == n


def test_agg_terms_missing(ray_session):
    got = ops.agg_terms_missing(SF).reset_index(drop=True)
    exp = _oracle("agg_terms_missing")
    assert got.astype(str).equals(exp.astype(str))
    assert "(missing)" in set(got["key"])


def test_agg_date_histogram_bounds(ray_session):
    got = ops.agg_date_histogram_bounds(SF).reset_index(drop=True)
    exp = _oracle("agg_date_histogram_bounds")
    assert got.astype(str).equals(exp.astype(str))
    # extended_bounds past the data's max(ts) materialize as zero rows
    assert len(got) == 35
    assert (got.tail(4)["doc_count"] == 0).all()


def test_agg_significant_bg_filter(ray_session):
    got = ops.agg_significant_bg_filter(SF).reset_index(drop=True)
    exp = _oracle("agg_significant_bg_filter")
    assert got.astype(str).equals(exp.astype(str))
    # foreground dfs can never exceed the filtered background dfs
    assert (got["fg_df"] <= got["bg_df"]).all()


def test_agg_composite_missing_bucket(ray_session):
    got = ops.agg_composite_missing_bucket(SF).reset_index(drop=True)
    exp = _oracle("agg_composite_missing_bucket")
    assert got.astype(str).equals(exp.astype(str))
    assert "__missing__" in set(got["lang"])


def test_ft_highlight_no_match(ray_session):
    got = ops.ft_highlight_no_match(SF).reset_index(drop=True)
    exp = _oracle("ft_highlight_no_match")
    assert got.astype(str).equals(exp.astype(str))
    # non-matching docs still return a snippet (the no_match_size slice)
    misses = got[~got["matched"]]
    if len(misses):
        assert (misses["snippet"].str.len() > 0).all()
        assert not misses["snippet"].str.contains("<em>").any()


def test_agg_histogram_hard_bounds(ray_session):
    got = ops.agg_histogram_hard_bounds(SF).reset_index(drop=True)
    exp = _oracle("agg_histogram_hard_bounds")
    assert got.astype(str).equals(exp.astype(str))
    assert got["bucket"].min() >= 20.0 and got["bucket"].max() < 120.0


def test_range_date_math(ray_session):
    got = ops.range_date_math(SF).reset_index(drop=True)
    exp = _oracle("range_date_math")
    assert got.astype(str).equals(exp.astype(str))


def test_date_math_parser_vectors():
    from elasticsearch_ray.datemath import parse_date_math as pdm
    import pandas as pd
    import pytest

    now = "2024-01-25T13:45:00"
    assert pdm("now/d", now) == pd.Timestamp("2024-01-25")
    assert pdm("now-20d/d", now) == pd.Timestamp("2024-01-05")
    assert pdm("now-1M/M", now) == pd.Timestamp("2023-12-01")
    assert pdm("now/w", now) == pd.Timestamp("2024-01-22")  # ISO Monday
    assert pdm("2024-01-10||+2w/w", now) == pd.Timestamp("2024-01-22")
    assert pdm("now+3h/h", now) == pd.Timestamp("2024-01-25 16:00:00")
    assert pdm("2024-02-29||+1y/M", now) == pd.Timestamp("2025-02-01")
    with pytest.raises(ValueError):
        pdm("now-3q", now)  # unknown unit
