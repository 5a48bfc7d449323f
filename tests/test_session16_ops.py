"""Round-3 session-16 operators.

- ES|QL SAMPLE gate (x-pack esql Sample command, 8.18): deterministic
  multiplicative-hash sampling, partition-invariant.
- cartesian_centroid / cartesian_bounds (x-pack spatial
  CartesianCentroidAggregator / CartesianBoundsAggregator): planar
  twins of geo_centroid/geo_bounds over the indexed `shape` points.
- _bulk update merge (action/update/UpdateHelper.java): partial-doc
  merge + detect_noop + doc_as_upsert result counters.
- if_seq_no optimistic concurrency (index/engine
  VersionConflictEngineException; BulkByScrollResponse
  version_conflicts counter under conflicts=proceed).
"""

from __future__ import annotations

import numpy as np

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def test_esql_sample_deterministic_and_subset():
    a = ops.esql_sample(SF)
    b = ops.esql_sample(SF)
    assert a.equals(b)
    # ~20% of 1,000 events, grouped over 5 types
    assert 100 < a["n"].sum() < 300


def test_cartesian_centroid_matches_direct_mean():
    import pyarrow.parquet as pq

    out = ops.agg_cartesian_centroid(SF)
    k = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])[
        "p_partkey"].to_numpy()
    x = (k * 7919) % 1000 + 0.5
    y = (k * 104729) % 1000 + 0.5
    assert out["count"].iloc[0] == len(k)
    assert abs(out["x"].iloc[0] - x.mean()) < 1e-3
    assert abs(out["y"].iloc[0] - y.mean()) < 1e-3


def test_cartesian_bounds_contains_centroid():
    b = ops.agg_cartesian_bounds(SF)
    c = ops.agg_cartesian_centroid(SF)
    assert b["min_x"].iloc[0] <= c["x"].iloc[0] <= b["max_x"].iloc[0]
    assert b["min_y"].iloc[0] <= c["y"].iloc[0] <= b["max_y"].iloc[0]


def test_bulk_update_merge_counters_consistent():
    import pyarrow.parquet as pq

    out = ops.bulk_update_merge(SF).set_index("key")["n"]
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert out["result:created"] == 7
    # updated + noop + skipped = base table size
    assert (out["result:updated"] + out["result:noop"]
            + out["result:skipped"]) == n_docs
    # every source:* count sums to base + upserts
    src = out[out.index.str.startswith("source:")]
    assert src.sum() == n_docs + 7
    # edited bucket = updated + created
    assert out["source:edited"] == out["result:updated"] + 7


def test_seq_no_conflicts_partition_invariant():
    import pyarrow.parquet as pq

    out = ops.update_conflicts_seq_no(SF)
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # every doc is either updated or conflicted
    assert int((out["updated"] + out["version_conflicts"]).sum()) == n_docs
    did = np.arange(n_docs, dtype=np.int64)
    ok = ((did * 40503) % 13 == (did * 24036583) % 13).sum()
    assert int(out["updated"].sum()) == int(ok)


def test_match_only_text_phrase_subset_of_and_match():
    from elasticsearch_ray.pipelines.fulltext import all_matches

    out = ops.ft_match_only_text(SF)
    assert (out["score"] == 1.0).all()
    p1 = set(out[out["phase"] == 1]["doc_id"])
    # source-confirmed phrase docs must equal the positional engine's
    # match_phrase doc set (two independent position sources)
    engine = set(all_matches(
        SF, {"kind": "match_phrase", "text": "data query"},
        with_score=False)["doc_id"].to_pylist())
    assert p1 == engine


def test_copy_to_hits_union_of_source_fields():
    import duckdb

    out = ops.ft_copy_to(SF)
    got = set(out["doc_id"])
    want = set(duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet') "
        "WHERE lang = 'en' OR source = 'src3'").df()["doc_id"])
    assert got == want


def test_position_increment_gap_blocks_cross_value_phrase():
    out = ops.ft_position_increment_gap(SF).set_index(["gap", "phrase"])
    assert out.loc[(100, "cross"), "hits"] == 0
    assert out.loc[(0, "cross"), "hits"] > 0
    assert out.loc[(0, "within"), "hits"] == out.loc[(100, "within"), "hits"]


def test_dynamic_templates_types():
    out = ops.mapping_dynamic_templates(SF).set_index("field")["type"]
    assert out["ts_str"] == "date"
    assert out["clicks_count"] == "long"
    assert out["user_id"] == "long"
    assert out["note"] == "text_keyword"


def test_histogram_min_doc_count_and_extended_bounds():
    out = ops.agg_histogram_min_doc_count(SF)
    p0 = out[out["phase"] == 0]
    p1 = out[out["phase"] == 1]
    assert (p0["doc_count"] >= 20).all()
    # extended bounds materialize the full padded grid
    assert len(p1) == 30
    assert (p1["doc_count"] == 0).any()


def test_date_histogram_timezone_shifts_boundary():
    out = ops.agg_date_histogram_timezone(SF)
    # every bucket key sits at 19:00 UTC (day boundary in UTC+5)
    hours = out["bucket"].dt.hour.unique()
    assert list(hours) == [19]
    base = ops.agg_date_histogram(SF)
    assert out["doc_count"].sum() == base["doc_count"].sum()


def test_terms_order_subagg_is_avg_ordered():
    out = ops.agg_terms_order_subagg(SF)
    assert (out["avg_value"].diff().dropna() <= 0).all()
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_script_sort_keys_monotone():
    out = ops.ft_script_sort(SF)
    assert (out["key"].diff().dropna() >= 0).all()
    assert len(out) == 25


def test_count_api_matches_direct_counts():
    out = ops.count_api(SF).set_index("query")["count"]
    assert out["match_all"] == 500
    from elasticsearch_ray.pipelines.fulltext import all_matches

    term = all_matches(SF, {"kind": "term", "term": "data"},
                       with_score=False)
    assert out["term_data"] == len(term)


def test_unimax_waterfill_invariants():
    out = ops.corpus_unimax_sample(SF)
    total = out["size"].sum()
    # allocation never exceeds size, respects the budget, and caps only
    # the largest language(s)
    assert (out["alloc"] <= out["size"]).all()
    assert out["alloc"].sum() <= int(total * 0.9)
    capped = out[out["alloc"] < out["size"]]
    if len(capped):
        assert capped["size"].min() >= out[out["alloc"] == out["size"]]["size"].max()


def test_collapse_inner_hits_rank_and_groups():
    out = ops.ft_collapse_inner_hits(SF)
    assert set(out["inner_rank"]) == {1, 2, 3}
    top = ops.agg_top_hits(SF)
    # rank-1 rows reproduce the plain collapse (top_hits) result
    r1 = out[out["inner_rank"] == 1][["lang", "doc_id", "n_chars"]]
    assert r1.reset_index(drop=True).equals(top)


def test_readability_formula_bounds():
    out = ops.text_readability(SF)
    assert len(out) == 500
    # recompute one row by hand
    r = out.iloc[0]
    f = (206.835 - 1.015 * (r.n_words / r.n_sentences)
         - 84.6 * (r.n_syllables / max(1, r.n_words)))
    assert abs(f - r.flesch) < 1e-3


def test_length_buckets_power_of_two_and_waste():
    out = ops.training_length_buckets(SF)
    b = out["bucket"].to_numpy()
    assert ((b & (b - 1)) == 0).all()
    assert ((out["pad_waste"] >= 0) & (out["pad_waste"] < 1)).all()
    assert out["doc_count"].sum() == 500


def test_dedup_url_collapses_tracking_variants():
    out = ops.dedup_url(SF)
    # 37*111 possible urls but only doc_id%111 * %37 combos realized via CRT
    assert out["n_dups"].sum() == 500
    # keeper is the min doc_id of its cluster: keepers are unique
    assert out["keeper"].is_unique


def test_indices_stats_consistent_with_segments():
    st = ops.indices_stats(SF).set_index("stat")["value"]
    seg = ops.indices_segments(SF)
    assert st["segments_count"] == len(seg)
    assert st["docs_count"] == seg["doc_count"].sum()


def test_parse_min_should_match_grammar():
    from elasticsearch_ray.search.engine import IndexSearcher

    p = IndexSearcher.parse_min_should_match
    assert p("3", 5) == 3
    assert p("-2", 5) == 3
    assert p("75%", 4) == 3
    assert p("-25%", 4) == 3
    assert p("75%", 5) == 3          # truncation, not rounding
    assert p("3<75%", 2) == 2        # n <= cond -> all required
    assert p("3<75%", 8) == 6
    assert p("2<75% 9<-3", 12) == 9  # both conds pass, last part wins
    assert p("2<75% 9<-3", 5) == 3
    # sequential early-return (Lucene Queries.calculateMinShouldMatch):
    # an unsorted chain stops at the first cond >= n with the result so
    # far, NOT at the largest cond < n
    assert p("9<-3 2<75%", 5) == 5
    assert p("10", 4) == 10          # over-count kept: matches nothing


def test_bool_msm_phases_nest():
    out = ops.ft_bool_msm_forms(SF)
    p0 = set(out[out["phase"] == 0]["doc_id"])
    p1 = set(out[out["phase"] == 1]["doc_id"])
    assert p0 <= p1  # 3-of-4 is a subset of 2-of-4
    # phase 2 = both of two terms = bool must equivalent
    from elasticsearch_ray.pipelines.fulltext import all_matches

    both = set(all_matches(SF, {"kind": "bool", "must": [
        {"kind": "term", "term": "data"}, {"kind": "term", "term": "merge"},
    ]}, with_score=False)["doc_id"].to_pylist())
    assert set(out[out["phase"] == 2]["doc_id"]) == both


def test_match_fuzziness_scores_are_clause_counts():
    out = ops.ft_match_fuzziness(SF)
    assert set(out["score"]) <= {1.0, 2.0}


def test_completion_skip_duplicates_unique_inputs():
    out = ops.completion_skip_duplicates(SF)
    p1 = out[out["phase"] == 1]
    assert p1["input"].is_unique
    p0 = out[out["phase"] == 0]
    # dedup keeps each text's best weight
    for txt in p1["input"]:
        assert p1[p1["input"] == txt]["weight"].iloc[0] == \
            p0[p0["input"] == txt]["weight"].max()


def test_ignore_malformed_counters():
    out = ops.mapping_ignore_malformed(SF).set_index("stat")["value"]
    assert out["indexed_true"] == 500
    assert out["ignored_true"] == out["rejected_false"]
    assert out["indexed_false"] + out["rejected_false"] == 500


def test_date_multi_format_equals_plain_histogram():
    multi = ops.date_multi_format(SF)
    base = ops.agg_date_histogram(SF)
    assert multi["doc_count"].sum() == base["doc_count"].sum()
    # both formats parse back to identical day buckets
    assert len(multi) == len(base)


def test_index_prefixes_paths_agree():
    out = ops.ft_index_prefixes(SF)
    da = set(out[out["prefix"] == "da"]["doc_id"])
    d = set(out[out["prefix"] == "d"]["doc_id"])
    assert da <= d


def test_doc_count_field_weighted_totals():
    out = ops.agg_doc_count_field(SF)
    # sum over langs = sum of (1 + doc_id % 3) over all 500 docs
    did = np.arange(500)
    assert out["doc_count"].sum() == (1 + did % 3).sum()


def test_incremental_append_matches_rebuild():
    # the op itself asserts segment growth AND score equality with a
    # from-scratch rebuild; here we additionally pin the doc set to the
    # plain term query through the standard documents index
    from elasticsearch_ray.pipelines.fulltext import all_matches

    out = ops.index_incremental_append(SF)
    want = all_matches(SF, {"kind": "term", "term": "data"}).to_pandas()
    assert set(out["doc_id"]) == set(want["doc_id"])


def test_shard_writer_resume_and_partition_files():
    import os

    out = ops.corpus_shard_writer(SF)
    assert out["rows"].sum() == 500
    assert len(out) == 8
    # data files really exist, one per shard directory
    import glob as g

    dirs = g.glob("/tmp/esray_cache/shardout_*/shard=*/data.parquet")
    assert len([d for d in dirs if os.path.getsize(d) > 0]) >= 8


def test_norms_disabled_length_independent():
    out = ops.ft_norms_disabled(SF)
    from elasticsearch_ray.pipelines.fulltext import all_matches

    base = all_matches(SF, {"kind": "match", "text": "data merge"}).to_pandas()
    # same doc set as normed BM25, different scores
    assert set(out["doc_id"]) == set(base["doc_id"])
    assert not np.allclose(
        out.sort_values("doc_id")["score"].to_numpy(),
        base.sort_values("doc_id")["score"].to_numpy())


def test_enrich_geo_match_partitions_all_users():
    out = ops.enrich_geo_match(SF)
    import duckdb

    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    assert out["n_users"].sum() == n_users
    assert set(out["zone"]) <= {"north_east", "north_west",
                                "south_east", "south_west"}


def test_t_test_unpaired_welch_vs_pooled():
    out = ops.agg_t_test_unpaired(SF).set_index("type")
    # equal-ish group sizes: Welch and pooled agree to first decimal
    assert abs(out.loc["heteroscedastic", "t_stat"]
               - out.loc["homoscedastic", "t_stat"]) < 0.1
    assert out["n_a"].iloc[0] + out["n_b"].iloc[0] > 0


def test_refresh_visibility_phases():
    out = ops.index_refresh_visibility(SF)
    p0 = set(out[out["phase"] == 0]["doc_id"])
    p1 = set(out[out["phase"] == 1]["doc_id"])
    assert p0 < p1  # uncommitted delta invisible, then published
    # phase 0 scores equal a standalone base index: every phase-0 doc
    # is below the cut
    assert max(p0) < 300 or max(p0) < max(p1)


def test_training_shuffle_deterministic_and_epoch_varies():
    a = ops.training_shuffle_order(SF)
    b = ops.training_shuffle_order(SF)
    assert a.equals(b)
    e0 = a[a["epoch"] == 0]["doc_id"].tolist()
    e1 = a[a["epoch"] == 1]["doc_id"].tolist()
    assert e0 != e1  # epoch reshuffle changes the order


def test_external_versioning_totals():
    out = ops.bulk_external_versioning(SF)
    assert out["docs"].sum() == 500
    # create always conflicts on existing docs
    assert out["create_conflicts"].sum() == 500
    # final version can only be one of the wave versions
    assert set(out["final_version"]) <= {2, 3, 4}


def test_script_update_counters():
    out = ops.bulk_script_update(SF)
    did = np.arange(500)
    want = (did % 10 + did % 4 + did % 7 + 5).sum()
    assert out["sum_counter"].sum() == want


def test_simulate_verbose_stage_progression():
    out = ops.ingest_simulate_verbose(SF)
    s0 = out[out["step"] == 0]
    s2 = out[out["step"] == 2]
    # uppercase applied only from step 1; gsub only at step 2
    assert (s0["lang"].str.islower()).all()
    assert (s2["lang"].str.isupper()).all()
    assert s2["source"].str.startswith("S").all()
    assert not s0["source"].str.startswith("S").any()


def test_reindex_script_noop_accounting():
    out = ops.reindex_script(SF)
    assert out["created"].sum() + out["noops_total"].iloc[0] == 500
    assert out["lang"].str.isupper().all()


def test_termvectors_filtered_subset_of_full_vector():
    filt = ops.termvectors_filtered(SF)
    full = ops.ft_termvectors(SF).set_index("term")["tf"]
    assert len(filt) <= 5
    for _, r in filt.iterrows():
        assert full[r["term"]] == r["tf"]
        assert r["tf"] >= 2
    assert (filt["weight"].diff().dropna() <= 1e-12).all()


def test_datacard_shares_and_totals():
    out = ops.corpus_datacard(SF)
    assert out["docs"].sum() == 500
    assert ((out["top_lang_share"] > 0) & (out["top_lang_share"] <= 1)).all()
    assert (out["lang_entropy"] >= 0).all()


def test_no_match_size_fragments():
    out = ops.ft_highlight_no_match_size(SF)
    m = out[out["matched"] == 1]
    u = out[out["matched"] == 0]
    assert len(m) == 3 and len(u) == 3
    assert m["fragment"].str.contains("<em>merge</em>").all()
    assert (~u["fragment"].str.contains("<em>")).all()
    assert (u["fragment"].str.len() <= 40).all()


def test_knn_similarity_threshold_subset():
    filt = ops.knn_similarity_threshold(SF)
    full = ops.knn_bruteforce(SF)
    assert (filt["cosine"] >= 0.2).all()
    assert len(filt) <= len(full)
    merged = filt.merge(full, on=["query_id", "vec_id"], suffixes=("", "_f"))
    assert len(merged) == len(filt)  # strictly a filtered subset


def test_rank_feature_negative_inverts_preference():
    import duckdb
    import pandas as pd

    def frame(x):
        return x if isinstance(x, pd.DataFrame) else x.to_pandas()

    neg = frame(ops.ft_rank_feature_negative(SF))
    pos = frame(ops.ft_rank_feature(SF))
    chars = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).df().set_index("doc_id")["n_chars"]
    df = neg.merge(pos, on="doc_id", suffixes=("_neg", "_pos"))
    df["n"] = df["doc_id"].map(chars)
    # among equal-tf docs the feature part moves opposite directions;
    # check the correlation signs of the feature contribution
    short = df[df["n"] < df["n"].median()]
    long_ = df[df["n"] >= df["n"].median()]
    assert (short["score_neg"] - short["score_pos"]).mean() > \
           (long_["score_neg"] - long_["score_pos"]).mean()


def test_regexp_complement_and_intersection():
    from elasticsearch_ray.search.engine import IndexSearcher

    conj = IndexSearcher._split_lucene_conjuncts
    assert conj("abc") == [(False, "abc")]
    assert conj(".*a.*&~(data)") == [(False, ".*a.*"), (True, "data")]
    assert conj("s.*&.*w") == [(False, "s.*"), (False, ".*w")]
    # & inside a class or group is literal/nested, not an operator
    assert conj("[a&b]x") == [(False, "[a&b]x")]
    assert conj("(a&b)x")[0][1] == "(a&b)x"
    out = ops.ft_regexp_ops(SF)
    assert set(out["phase"]) == {0, 1}


def test_sqs_operator_grammar_shapes():
    from elasticsearch_ray.search.engine import parse_simple_query_string as p

    t = p("data + merge | slow")
    # left-assoc equal precedence: (data AND merge) OR slow
    assert t["should"][0]["must"][0]["text"] == "data"
    assert t["should"][1]["text"] == "slow"
    t2 = p("(data | merge) + window")
    assert t2["must"][0]["should"][0]["text"] == "data"
    # flags degradation: '+' literal
    t3 = p("data + merge", flags="PHRASE|NOT")
    assert [c.get("text") for c in t3["should"]] == ["data", "+", "merge"]
    # legacy flat form unchanged
    t4 = p("data merge -slow")
    assert len(t4["should"]) == 2 and len(t4["must_not"]) == 1
    # unterminated quote: Lucene-lenient — the rest of the input is the
    # phrase; must terminate (regression: used to loop forever)
    t5 = p('"abc')
    assert t5["should"][0] == {"kind": "match_phrase", "text": "abc"}
    t6 = p('foo "bar baz')
    assert t6["should"][1]["text"] == "bar baz"
    for fuzz in ['"', 'a"', '"a"b"', '+"x | -"', '"""', 'a "b" "c']:
        p(fuzz)  # all must terminate without raising


def test_sqs_operators_doc_sets_nest():
    out = ops.ft_sqs_operators(SF)
    p0 = set(out[out["phase"] == 0]["doc_id"])
    p2 = set(out[out["phase"] == 2]["doc_id"])
    assert p0 <= p2  # AND form is a subset of the degraded OR form


def test_histogram_offset_boundaries():
    out = ops.agg_histogram_offset(SF)
    # every bucket key is congruent to the offset mod width
    assert np.allclose((out["bucket"] - 13.5) % 50.0, 0)
    assert out["doc_count"].sum() == 1000


def test_mv_functions_invariants():
    out = ops.esql_mv_functions(SF)
    assert (out["uniq"] <= out["n"]).all()
    assert (out["first"] <= out["last"]).all()
