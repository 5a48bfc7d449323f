"""ES|QL full-text functions (x-pack esql fulltext: Match.java,
MatchPhrase.java, QueryString.java, Kql.java; 8.16-8.18) — MATCH / QSTR /
KQL / MATCH_PHRASE pushed down to the search index, METADATA _score
exposure, residual scalar predicates, and the KQL mini-parser."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_ray.functions import esql
from elasticsearch_ray.functions.esql import (_kql_to_query, _parse_ft_where)

SF = "/root/testdata/sf0.001"


# ---------------- parser-level (no ray needed) ----------------


def test_kql_and_not_folds_into_one_bool():
    q = _kql_to_query("data and not window")
    assert q["kind"] == "bool"
    assert [c["text"] for c in q["must"]] == ["data"]
    assert [c["text"] for c in q["must_not"]] == ["window"]


def test_kql_field_phrase_and_wildcard():
    q = _kql_to_query('source:src3 and text:"batch query" and da*')
    must = q["must"]
    assert must[0] == {"kind": "match", "text": "src3", "operator": "and",
                       "field": "source"}
    assert must[1]["kind"] == "match_phrase" and must[1]["field"] == "text"
    assert must[2] == {"kind": "wildcard", "pattern": "da*"}


def test_kql_or_precedence():
    q = _kql_to_query("a or b and c")
    assert q["kind"] == "bool" and len(q["should"]) == 2
    assert q["should"][1]["kind"] == "bool"  # (b AND c)


def test_ft_where_splits_residual_scalar():
    q, residual = _parse_ft_where(
        'MATCH(text, "data query") AND n_chars > 150')
    assert q == {"kind": "match", "field": "text", "text": "data query"}
    assert residual == "n_chars > 150"


def test_ft_where_options_map():
    q, _ = _parse_ft_where(
        'MATCH(text, "data query", {"operator": "AND", '
        '"minimum_should_match": 2})')
    assert q["operator"] == "and" and q["minimum_should_match"] == 2


def test_ft_where_or_combination_of_ft_calls():
    q, residual = _parse_ft_where(
        'MATCH(text, "data") OR MATCH_PHRASE(text, "batch query")')
    assert residual is None
    assert q["kind"] == "bool" and len(q["should"]) == 2


def test_scalar_under_or_with_ft_rejected():
    with pytest.raises(ValueError, match="pushable"):
        _parse_ft_where('MATCH(text, "data") OR n_chars > 10')


# ---------------- end-to-end vs the engine ----------------


def test_match_score_equals_engine(ray_session):
    from elasticsearch_ray.pipelines.fulltext import documents_searcher

    out = esql.run(SF, """
        FROM documents METADATA _score
        | WHERE MATCH(text, "data query window")
        | SORT doc_id
        | LIMIT 100000
        | KEEP doc_id, _score
    """)
    ids, sc = documents_searcher(SF)._eval(
        {"kind": "match", "text": "data query window", "field": "text"})
    order = np.argsort(ids)
    assert np.array_equal(out["doc_id"].to_numpy(), ids[order])
    np.testing.assert_allclose(out["_score"].to_numpy(), sc[order],
                               rtol=1e-12)


def test_metadata_score_without_ft_where_rejected(ray_session):
    with pytest.raises(ValueError, match="METADATA _score"):
        esql.run(SF, """
            FROM documents METADATA _score
            | WHERE n_chars > 10
            | SORT doc_id | LIMIT 5 | KEEP doc_id
        """)


def test_qstr_residual_filter_applied(ray_session):
    out = esql.run(SF, """
        FROM documents
        | WHERE QSTR("data AND query") AND n_chars > 150
        | SORT doc_id | LIMIT 100000 | KEEP doc_id, n_chars
    """)
    assert (out["n_chars"] > 150).all()
    # residual dropped some rows vs the unfiltered run
    full = esql.run(SF, """
        FROM documents
        | WHERE QSTR("data AND query")
        | SORT doc_id | LIMIT 100000 | KEEP doc_id
    """)
    assert 0 < len(out) < len(full)
    assert set(out["doc_id"]) <= set(full["doc_id"])


def test_ft_on_unindexed_table_rejected(ray_session):
    with pytest.raises(ValueError, match="indexed source"):
        esql.run(SF, """
            FROM events
            | WHERE MATCH(event_type, "purchase")
            | SORT event_id | LIMIT 5 | KEEP event_id
        """)


# ---------------- vector family (KNN + V_* scalars) ----------------


def test_vector_scalars_match_numpy(ray_session):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    V = np.asarray(tbl["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(tbl), -1)
    q = np.sin((np.arange(64) + 1) * 0.37).round(3)
    qs = ", ".join(str(x) for x in q)
    out = esql.run(SF, f"""
        FROM embeddings
        | EVAL cos = V_COSINE(embedding, [{qs}]),
               l1 = V_L1_NORM(embedding, [{qs}]),
               mag = V_MAGNITUDE(embedding)
        | SORT vec_id
        | LIMIT 100000
        | KEEP vec_id, cos, l1, mag
    """)
    want_cos = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    np.testing.assert_allclose(out["cos"].to_numpy(), want_cos, rtol=1e-12)
    np.testing.assert_allclose(out["l1"].to_numpy(),
                               np.abs(V - q).sum(axis=1), rtol=1e-12)
    np.testing.assert_allclose(out["mag"].to_numpy(),
                               np.linalg.norm(V, axis=1), rtol=1e-12)


def test_knn_topk_matches_exact(ray_session):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    V = np.asarray(tbl["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(tbl), -1)
    ids = tbl["vec_id"].to_numpy()
    q = np.sin((np.arange(64) + 1) * 0.37).round(3)
    qs = ", ".join(str(x) for x in q)
    out = esql.run(SF, f"""
        FROM embeddings METADATA _score
        | WHERE KNN(embedding, [{qs}], {{"k": 7}})
        | SORT _score DESC, vec_id
        | LIMIT 7
        | KEEP vec_id, _score
    """)
    cos = (V @ q) / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:7]
    assert list(out["vec_id"]) == list(ids[order])
    np.testing.assert_allclose(out["_score"].to_numpy(),
                               (1 + cos[order]) / 2, rtol=1e-12)


def test_knn_residual_conjunct(ray_session):
    q = np.sin((np.arange(64) + 1) * 0.37).round(3)
    qs = ", ".join(str(x) for x in q)
    out = esql.run(SF, f"""
        FROM embeddings
        | WHERE KNN(embedding, [{qs}], {{"k": 50}}) AND label == 1
        | SORT vec_id | LIMIT 100 | KEEP vec_id, label
    """)
    assert (out["label"] == 1).all() and 0 < len(out) <= 50


# ---------------- SQL translator full-text predicates ----------------


def test_sql_match_score_equals_engine(ray_session):
    from elasticsearch_ray.functions.sql import run_sql
    from elasticsearch_ray.pipelines.fulltext import documents_searcher
    from elasticsearch_ray.pipelines.ops import _ds

    out = run_sql(
        "SELECT doc_id, SCORE() AS score FROM documents "
        "WHERE MATCH(text, 'data query') ORDER BY doc_id LIMIT 100000",
        SF, ds_factory=_ds)
    ids, sc = documents_searcher(SF)._eval(
        {"kind": "match", "field": "text", "text": "data query"})
    order = np.argsort(ids)
    assert np.array_equal(out["doc_id"].to_numpy(), ids[order])
    np.testing.assert_allclose(out["score"].to_numpy(), sc[order],
                               rtol=1e-12)


def test_sql_match_operator_option(ray_session):
    from elasticsearch_ray.functions.sql import run_sql
    from elasticsearch_ray.pipelines.ops import _ds

    both = run_sql("SELECT doc_id FROM documents "
                   "WHERE MATCH(text, 'data query', 'operator=and') "
                   "ORDER BY doc_id LIMIT 100000", SF, ds_factory=_ds)
    either = run_sql("SELECT doc_id FROM documents "
                     "WHERE MATCH(text, 'data query') "
                     "ORDER BY doc_id LIMIT 100000", SF, ds_factory=_ds)
    assert 0 < len(both) < len(either)
    assert set(both["doc_id"]) <= set(either["doc_id"])


def test_sql_score_requires_fulltext():
    from elasticsearch_ray.functions.sql import SqlParseError, parse_sql

    with pytest.raises(SqlParseError, match="SCORE"):
        parse_sql("SELECT doc_id, SCORE() AS s FROM documents "
                  "WHERE n_chars > 10")


def test_sql_query_string_and_split_respects_quotes():
    from elasticsearch_ray.functions.sql import parse_sql

    p = parse_sql("SELECT lang, COUNT(*) AS n FROM documents "
                  "WHERE QUERY('data AND NOT window') AND n_chars > 5 "
                  "GROUP BY lang")
    assert p["ft"] == [("__query_string__", "data AND NOT window")]
    assert p["preds"] == [("n_chars", ">", 5)]
