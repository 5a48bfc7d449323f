"""Round-3 session-15 operators.

- `type` query (server/.../index/query/TypeQueryBuilder.java, deprecated
  in 7.x): match-all for the index's single mapping type `_doc`,
  match-none otherwise.
- _clone resize (7.4): server/.../admin/indices/shrink/ResizeRequest
  ResizeType.CLONE — same shard count, per-shard doc sets identical.
- _cluster/state / _settings: rest/action/admin/cluster/
  RestClusterStateAction, admin/indices/RestGetSettingsAction.
- _forcemerge: rest/action/admin/indices/RestForceMergeAction over the
  tiered-merge machinery; search results must be merge-invariant.
- EQL tail/count pipes: x-pack/plugin/eql LimitWithOffset tail form.
- DSIR importance weighting: Xie et al. 2023 (public), hashed-unigram
  log-likelihood-ratio data selection.
- keep-best dedup: canonical selection by quality inside exact-dup
  clusters (argmax composes over batch partials).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_ray.pipelines import ops
from elasticsearch_ray.pipelines.fulltext import all_matches

SF = "/root/testdata/sf0.001"


def test_type_query_doc_is_noop_filter():
    plain = all_matches(SF, {"kind": "term", "term": "window"}).to_pandas()
    out = ops.ft_type_query(SF)
    p0 = out[out["phase"] == 0].drop(columns=["phase"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(p0, plain)
    assert (out["phase"] == 1).sum() == 0


def test_type_query_other_type_matches_nothing():
    got = all_matches(SF, {"kind": "type", "value": "legacy"}).to_pandas()
    assert len(got) == 0
    everything = all_matches(SF, {"kind": "type", "value": "_doc"},
                             with_score=False).to_pandas()
    assert len(everything) == 500


def test_indices_clone_checksums_agree():
    out = ops.indices_clone(SF)
    assert (out["docs_source"] == out["docs_clone"]).all()
    assert (out["checksum_source"] == out["checksum_clone"]).all()
    assert out["docs_source"].sum() == 500
    assert set(out["shard"]) <= set(range(6))


def test_cluster_state_and_settings_consistent():
    cs = ops.cluster_state(SF)
    assert cs.loc[0, "docs"] == 500
    st = ops.indices_get_settings(SF)
    shards = st.set_index("setting").loc["index.number_of_shards", "value"]
    assert int(shards) == cs.loc[0, "shards"]


def test_force_merge_single_segment_and_scores():
    out = ops.force_merge_api(SF)
    assert (out["segments_after"] == 1).all()
    assert (out["segments_before"] == 1).all()  # 500 docs, 600-doc groups
    # merge-invariance: scores equal the live documents index's scores
    ref = all_matches(SF, {"kind": "match", "text": "merge vector"}).to_pandas()
    got = out[["doc_id", "score"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_eql_tail_pipe_is_latest_ascending():
    out = ops.eql_tail_pipe(SF)
    assert len(out) == 5
    ts = out["ts"].to_numpy()
    assert (ts[:-1] <= ts[1:]).all()


def test_eql_count_pipe():
    out = ops.eql_count_pipe(SF)
    assert list(out.columns) == ["count"]
    assert out.loc[0, "count"] > 0


def test_dsir_weights_favor_target_language():
    out = ops.dsir_importance(SF)
    assert len(out) == 15
    w = out["weight"].to_numpy()
    assert (w[:-1] >= w[1:]).all()


def test_dedup_keep_best_champion_rule():
    out = ops.dedup_keep_best(SF)
    # every cluster keeps exactly one doc; totals add up
    assert out["dups"].sum() == 500
    # planted duplicates: three docs, one normalized key -> the champion
    # is max n_chars with ties to smallest doc_id
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": ["a b", "a  b", "a b "],
            "n_chars": pa.array([3, 4, 4], pa.int64())}),
            f"{d}/documents.parquet")
        got = ops.dedup_keep_best(d)
        assert got["doc_id"].tolist() == [1]
        assert got["dups"].tolist() == [3]


def test_qtf_local_stats_differ_from_dfs():
    out = ops.search_type_qtf(SF)
    modes = set(out["mode"])
    assert modes == {"query_then_fetch", "dfs"}
    q = out[out["mode"] == "query_then_fetch"].set_index("doc_id")["score"]
    d = out[out["mode"] == "dfs"].set_index("doc_id")["score"]
    # same doc sets (scoring mode never changes matching)
    assert set(q.index) == set(d.index)


def test_on_failure_routes_rows_not_pipeline():
    out = ops.ingest_on_failure(SF)
    assert len(out) == 1000  # no rows dropped, pipeline never aborted
    failed = out[out["tag"] == "failed"]
    assert (failed["failure_reason"] == "fail condition met").all()
    ok = out[out["tag"] == "ok"]
    assert ok["failure_reason"].isna().all()


def test_terms_partitions_filter_before_shuffle():
    out = ops.agg_terms_partitions(SF)
    assert set(out["event_type"]) == {"purchase", "signup", "view"}


def test_sql_distinct():
    out = ops.sql_select_distinct(SF)
    assert not out.duplicated(["o_orderstatus", "o_orderpriority"]).any()


def test_outlier_scores_are_knn_distances():
    out = ops.ml_outlier_detection(SF)
    assert len(out) == 10
    s = out["knn_dist"].to_numpy()
    assert (s[:-1] >= s[1:]).all() and (s > 0).all()


def test_substring_runs_union_is_bounded():
    out = ops.dedup_substring_runs(SF)
    assert (out["dup_tokens"] >= 8).all()  # at least one full window
    # a doc's covered span can't exceed its token count
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ntok = {d: len(s.split()) for d, s in
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    assert all(row.dup_tokens <= ntok[row.doc_id]
               for row in out.itertuples())


def test_holt_winters_reference_quirks():
    from elasticsearch_ray.aggs.aggregations import holt_winters_forecast
    import pytest as _pytest

    # too few points -> the reference's IllegalArgumentException analog
    with _pytest.raises(ValueError):
        holt_winters_forecast([1.0] * 13, 0.3, 0.1, 0.3, 7)
    # hand-rolled replay of MovingFunctions.holtWinters for a small series
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    p = 2
    s0 = (3.0 + 1.0) / 2
    b0 = ((4.0 - 3.0) / 2 + (1.0 - 1.0) / 2) / 2
    seas = [3.0 / s0, 1.0 / s0] + [0.0] * 6
    ls, lb = s0, b0
    for i in range(2, 8):
        s = 0.3 * (vals[i] - seas[i - 2]) + 0.7 * (ls + lb)
        b = 0.1 * (s - ls) + 0.9 * lb
        seas[i] = 0.3 * (vals[i] - (ls - lb)) + 0.7 * seas[i - 2]
        ls, lb = s, b
    want = ls + lb + seas[8 - 2]
    got, lvl, tr = holt_winters_forecast(vals, 0.3, 0.1, 0.3, 2)
    assert got == want and lvl == ls and tr == lb


def test_holt_winters_op_shape():
    out = ops.agg_moving_fn_holt_winters(SF)
    assert out.loc[0, "buckets"] == 30
    assert np.isfinite(out.loc[0, "forecast"])


def test_keyword_repeat_counts_dominate_plain_stems():
    out = ops.ft_analyze_keyword_repeat(SF)
    assert len(out) == 10 and (out["cnt"] > 0).all()


def test_substring_cut_consistent_with_runs():
    runs = ops.dedup_substring_runs(SF)
    cut = ops.dedup_substring_cut(SF)
    # same affected docs; kept + cut == total tokens
    assert set(runs["doc_id"]) == set(cut["doc_id"])
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ntok = {d: len(s.split()) for d, s in
            zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    m = runs.merge(cut, on="doc_id")
    for row in m.itertuples():
        assert row.kept_tokens + row.dup_tokens == ntok[row.doc_id]
        assert len(row.clean_text.split()) == row.kept_tokens


def test_suggest_collate_flags_real_phrases():
    out = ops.ft_suggest_collate(SF)
    assert set(out.columns) == {"phrase", "score", "collate_match"}
    assert set(out["collate_match"]) <= {0, 1}


def test_t_test_paired_matches_scipy_form():
    out = ops.agg_t_test_paired(SF)
    # recompute directly from the raw table
    import json

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/events.parquet", columns=["value", "props"])
    v = np.rint(np.array(t["value"].to_pylist()) * 100)
    k = np.array([json.loads(s)["k"] for s in t["props"].to_pylist()]) * 100
    d = v - k
    mean = d.mean()
    var = d.var(ddof=1)
    t_stat = mean / np.sqrt(var / d.size)
    assert abs(out.loc[0, "t_stat"] - t_stat) < 1e-4
    assert out.loc[0, "n"] == d.size


def test_k_anonymity_flags_small_classes():
    out = ops.k_anonymity_suppress(SF)
    assert len(out) == 54
    # every flagged row's class is genuinely below the mean class size
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cls = t.groupby(["c_nationkey", "c_mktsegment"]).size()
    import math

    k = math.ceil(cls.sum() / len(cls))
    assert (out["class_size"] < k).all()


def test_synthetic_source_is_canonical_json():
    import json

    out = ops.synthetic_source(SF)
    assert len(out) == 5
    for s in out["synthetic"]:
        d = json.loads(s)
        assert list(d.keys()) == sorted(d.keys())  # alphabetical leaves


def test_snapshot_clone_is_metadata_only():
    import json
    import tempfile

    from elasticsearch_ray.index.snapshot import (clone_snapshot,
                                                  create_snapshot,
                                                  restore_snapshot)
    from elasticsearch_ray.pipelines.fulltext import documents_index

    idx = documents_index(SF)
    with tempfile.TemporaryDirectory() as repo:
        create_snapshot(idx, repo, "a")
        m = clone_snapshot(repo, "a", "b")
        assert m["copied"] == [] and m["cloned_from"] == "a"
        with tempfile.TemporaryDirectory() as dest:
            segs = restore_snapshot(repo, "b", dest)
            assert segs
        import pytest as _pytest

        with _pytest.raises(ValueError):
            clone_snapshot(repo, "a", "b")  # clone name collision


def test_enrich_range_partitions_all_events():
    out = ops.esql_enrich_range(SF)
    assert out["events"].sum() == 1000
    assert set(out["band"]) <= {"low", "mid", "high", "extreme"}


def test_dissect_modifiers_unit():
    import pyarrow as pa

    from elasticsearch_ray.functions import ingest as I

    t = pa.table({"s": ["a-b-c", "x-y-z"]})
    # ordered append: explicit /n order wins over appearance order
    out = I.dissect_advanced("s", "%{+k/3}-%{+k/1}-%{+k/2}",
                             append_separator=".")(t)
    assert out["k"].to_pylist() == ["b.c.a", "y.z.x"]
    # named skip + padding
    t2 = pa.table({"s": ["INFO    msg here"]})
    out2 = I.dissect_advanced("s", "%{level->} %{rest}")(t2)
    assert out2["level"].to_pylist() == ["INFO"]
    assert out2["rest"].to_pylist() == ["msg here"]
    # non-matching row -> nulls
    out3 = I.dissect_advanced("s", "%{a}|%{b}")(t)
    assert out3["a"].to_pylist() == [None, None]


def test_dissect_modifiers_op():
    out = ops.ingest_dissect_modifiers(SF)
    assert (out["okey"] == out["o_orderkey"].astype(str)).all()


def test_dissect_reference_keys():
    import pyarrow as pa

    from elasticsearch_ray.functions import ingest as I

    t = pa.table({"s": ["host=web1 port=9200", "host=db2 port=5432"]})
    out = I.dissect_advanced("s", "%{*a}=%{&a} %{*b}=%{&b}")(t)
    assert out["host"].to_pylist() == ["web1", "db2"]
    assert out["port"].to_pylist() == ["9200", "5432"]
    # heterogeneous keys: missing dynamic columns backfill with null
    t2 = pa.table({"s": ["x=1", "y=2"]})
    out2 = I.dissect_advanced("s", "%{*a}=%{&a}")(t2)
    assert out2["x"].to_pylist() == ["1", None]
    assert out2["y"].to_pylist() == [None, "2"]


def test_fuzz_dissect_roundtrip():
    """Seeded fuzz: random layouts render -> dissect_advanced parses back."""
    import random

    import pyarrow as pa

    from elasticsearch_ray.functions import ingest as I

    rng = random.Random(150815)
    seps = ["-", ":", "|", "/", ",", " "]
    for _ in range(60):
        nf = rng.randint(2, 5)
        sep = rng.choice(seps)
        names = [f"f{i}" for i in range(nf)]
        pattern = sep.join("%{" + n + "}" for n in names)
        rows = []
        want = {n: [] for n in names}
        for _r in range(8):
            vals = ["".join(rng.choices("abcdefgh123", k=rng.randint(1, 6)))
                    for _ in range(nf)]
            rows.append(sep.join(vals))
            for n, v in zip(names, vals):
                want[n].append(v)
        out = I.dissect_advanced("s", pattern)(pa.table({"s": rows}))
        for n in names:
            assert out[n].to_pylist() == want[n], (pattern, rows)


def test_substring_dedup_planted_span():
    """A 12-token span planted into k docs is flagged in every one."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    span = " ".join(rng.choices(vocab, k=12))
    docs = []
    for i in range(40):
        body = " ".join(rng.choices(vocab, k=60))
        if i % 8 == 0:  # plant into docs 0, 8, 16, 24, 32
            body = body + " " + span
        docs.append(body)
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": docs,
            "n_chars": pa.array([len(s) for s in docs], pa.int64())}),
            f"{d}/documents.parquet")
        out = ops.dedup_substring_runs(d)
        flagged = set(out["doc_id"])
        assert {0, 8, 16, 24, 32} <= flagged
        m = out.set_index("doc_id")["dup_tokens"]
        assert all(m[i] >= 12 for i in (0, 8, 16, 24, 32))


def test_lucene_regexp_interval_translate():
    from elasticsearch_ray.search.engine import IndexSearcher

    tr = IndexSearcher._lucene_regexp_translate
    import re

    rx = re.compile("^" + tr("src<5-12>") + "$")
    assert rx.match("src10") and rx.match("src5") and rx.match("src12")
    assert not rx.match("src2") and not rx.match("src13")
    assert tr("a@b") == "a.*b"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tr("<1-99999>")


def test_case_insensitive_option():
    out = ops.ft_case_insensitive(SF)
    p0 = set(out[out["phase"] == 0]["doc_id"])
    p2 = set(out[out["phase"] == 2]["doc_id"])
    assert p0 and not p2  # folded query matches; unfolded 'DATA' does not


def test_mlt_unlike_removes_negative_terms():
    from elasticsearch_ray.pipelines.fulltext import documents_searcher
    from elasticsearch_ray.sources.reader import fetch_rows_by_doc_id

    rows = fetch_rows_by_doc_id(f"{SF}/documents.parquet", [7, 42],
                                columns=["doc_id", "text"])
    by_id = {r["doc_id"]: r["text"] for r in rows.to_pylist()}
    s = documents_searcher(SF)
    with_unlike, _ = s._eval({"kind": "more_like_this", "like": by_id[42],
                              "unlike": by_id[7], "max_query_terms": 8,
                              "min_term_freq": 2})
    plain, _ = s._eval({"kind": "more_like_this", "like": by_id[42],
                        "max_query_terms": 8, "min_term_freq": 2})
    # negative example can only shrink (or shift) the matched set
    assert set(with_unlike) != set(plain) or len(with_unlike) <= len(plain)


def test_cluster_size_histogram_sums():
    out = ops.dedup_cluster_sizes(SF)
    comp = ops.dedup_components(SF)
    assert (out["csize"] * out["clusters"]).sum() == len(comp)


def test_matryoshka_overlap_bounds():
    out = ops.knn_matryoshka_overlap(SF)
    assert len(out) == 3
    assert ((out["overlap"] >= 1) & (out["overlap"] <= 5)).all()


def test_incremental_dedup_only_crosses_batches():
    out = ops.dedup_minhash_incremental(SF)
    assert (out["new_doc"] % 10 == 0).all()
    assert (out["dup_of"] % 10 != 0).all()
    assert (out["jaccard"] >= 0.8).all()


def test_significant_text_dedup_vs_plain():
    plain = ops.agg_significant_text(SF)
    dd = ops.agg_significant_text_dedup(SF)
    assert set(dd.columns) == set(plain.columns)
    # deduped bg_df can never exceed the raw bg_df for a shared term
    m = plain.merge(dd, on="term", suffixes=("_p", "_d"))
    assert (m["bg_df_d"] <= m["bg_df_p"]).all()


def test_annotated_text_same_position_semantics():
    from elasticsearch_ray.analyzer import annotated_text_positions

    toks = annotated_text_positions("a [big data](concept:bd&topic:x) win")
    d = {}
    for t, p in toks:
        d.setdefault(t, p)
    # annotation keys anchor at the FIRST surface token's position
    assert d["concept:bd"] == d["big"]
    assert d["topic:x"] == d["big"]
    assert d["data"] == d["big"] + 1
    assert d["win"] == d["data"] + 1


def test_mapper_size_and_murmur3_ops():
    sz = ops.mapper_size_field(SF)
    assert (sz["min_size"] <= sz["max_size"]).all()
    mh = ops.murmur3_field_cardinality(SF)
    assert (mh["distinct_hashes"] <= 20).all()


def test_annotated_analyzer_registered_and_indexable():
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.analyzer import get_analyzer
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import IndexSearcher

    assert get_analyzer("annotated")("a [b c](k:1) d") == \
        ["a", "b", "c", "k:1", "d"]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["plain words here",
                     "see [big data](concept:bd) inside"]}),
            f"{d}/c.parquet")
        idx = f"{d}/idx"
        build_index(f"{d}/c.parquet", idx, analyzer="annotated",
                    index_positions=True, content_column="text",
                    meta_columns=(), num_buckets=4)
        s = IndexSearcher(idx, main_field="text", analyzer="annotated")
        ids, _ = s._eval({"kind": "term", "term": "concept:bd"})
        assert list(ids) == [1]
        # same-position semantics: phrase across annotation + next token
        ids2, _ = s._eval({"kind": "match_phrase", "text": "big data"})
        assert list(ids2) == [1]


def test_mustache_sections_renderer():
    from elasticsearch_ray.pipelines.ops import render_search_template as r

    # iteration binds {{.}}; inverted sections render on falsy
    q = r('{"kind":"terms","terms":[{{#v}}"{{.}}",{{/v}}"z"]}',
          {"v": ["a", "b"]})
    assert q["terms"] == ["a", "b", "z"]
    q2 = r('{"kind":"term","term":"{{#x}}yes{{/x}}{{^x}}no{{/x}}"}',
           {"x": None})
    assert q2["term"] == "no"
    # plain placeholders unchanged (back-compat)
    assert r('{"kind":"term","term":"{{t}}"}', {"t": "d"})["term"] == "d"


def test_fuzz_porter_python_vs_sql():
    """Differential fuzz: random words (random letters + rule-exercising
    suffixes) through the Python Porter stemmer AND the Porter-in-SQL
    pipeline the oracles use — the two implementations must agree on
    every word."""
    import random

    import duckdb

    from elasticsearch_ray.filters import porter_stem
    from elasticsearch_ray.lang.sql_oracle import porter_pipeline_ctes

    rng = random.Random(424242)
    sufs = ["", "s", "es", "ies", "ing", "ed", "ation", "ational", "izer",
            "fulness", "ousness", "iviti", "alism", "ement", "ness", "ly",
            "e", "ement", "ies", "sses"]
    words = []
    for _ in range(120):
        stem = "".join(rng.choices("abcdefghijklmnopqrstuvwxyz",
                                   k=rng.randint(2, 8)))
        words.append(stem + rng.choice(sufs))
    want = [porter_stem(w) for w in words]
    ctes, last = porter_pipeline_ctes()
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    sql = (f"WITH tok0(position, w) AS (VALUES {vals}), "
           + ",\n".join(ctes)
           + f" SELECT w FROM {last} ORDER BY position")
    got = [r[0] for r in duckdb.sql(sql).fetchall()]
    mism = [(w, a, b) for w, a, b in zip(words, want, got) if a != b]
    assert not mism, mism[:5]


def test_fuzz_geo_kernels_vs_sql():
    """Differential fuzz: 300 random coordinates through the Python
    geohash (precision 2) and geotile (z=3) kernels vs the inline SQL
    formulations the oracles use (10-bit interleave; web-mercator with
    the 85.05112878 clamp)."""
    import duckdb
    import numpy as np

    from elasticsearch_ray.geo import geohash_encode, geotile_cell

    rng = np.random.default_rng(31337)
    lat = rng.uniform(-89.9, 89.9, 300)
    lon = rng.uniform(-179.9, 179.9, 300)
    gh = geohash_encode(lat, lon, 2)
    gt = geotile_cell(lat, lon, 3)
    vals = ", ".join(f"({i}, {la!r}, {lo!r})"
                     for i, (la, lo) in enumerate(zip(lat, lon)))
    sql = f"""
WITH e(i, lat, lon) AS (VALUES {vals}),
b AS (SELECT i,
        least(CAST(floor((lon + 180.0) / 360.0 * 32) AS INTEGER), 31) AS lx,
        least(CAST(floor((lat + 90.0) / 180.0 * 32) AS INTEGER), 31) AS ly
      FROM e),
ghv AS (SELECT i,
        ((lx // 16) % 2) * 512 + ((ly // 16) % 2) * 256
        + ((lx // 8) % 2) * 128 + ((ly // 8) % 2) * 64
        + ((lx // 4) % 2) * 32 + ((ly // 4) % 2) * 16
        + ((lx // 2) % 2) * 8 + ((ly // 2) % 2) * 4
        + (lx % 2) * 2 + (ly % 2) AS v
      FROM b),
gh AS (SELECT i,
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (v // 32) + 1, 1) ||
        substr('0123456789bcdefghjkmnpqrstuvwxyz', (v % 32) + 1, 1) AS cell
       FROM ghv),
gt AS (SELECT i,
        least(greatest(CAST(floor((lon + 180.0) / 360.0 * 8)
                            AS BIGINT), 0), 7) AS tx,
        least(greatest(CAST(floor((1.0 - ln(
              tan(radians(greatest(least(lat, 85.05112878), -85.05112878)))
              + sqrt(tan(radians(greatest(least(lat, 85.05112878),
                                          -85.05112878)))
                * tan(radians(greatest(least(lat, 85.05112878),
                                       -85.05112878))) + 1.0)) / pi())
              / 2.0 * 8) AS BIGINT), 0), 7) AS ty
      FROM e)
SELECT gh.cell, '3/' || gt.tx || '/' || gt.ty
FROM gh JOIN gt USING (i) ORDER BY i"""
    rows = duckdb.sql(sql).fetchall()
    mism = [(i, gh[i], rows[i][0], gt[i], rows[i][1])
            for i in range(300)
            if gh[i] != rows[i][0] or gt[i] != rows[i][1]]
    assert not mism, mism[:5]
