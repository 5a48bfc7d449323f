"""Retriever tree executor (8.16 retrievers framework): node composition,
window semantics, normalizers, and reranker behavior."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_ray.search.retriever import execute_retriever

SF = "/root/testdata/sf0.001"


def test_rrf_nested_inside_linear(ray_session):
    """Arbitrary nesting: linear over (rrf over two standards) + standard."""
    tree = {"linear": {"rank_window_size": 30, "retrievers": [
        {"retriever": {"rrf": {"rank_window_size": 30, "retrievers": [
            {"standard": {"query": {"kind": "term", "term": "data"}}},
            {"standard": {"query": {"kind": "term", "term": "query"}}},
        ]}}, "weight": 1.0, "normalizer": "minmax"},
        {"retriever": {"standard": {"query": {
            "kind": "match", "text": "slow merge"}}},
         "weight": 0.5, "normalizer": "minmax"},
    ]}}
    out = execute_retriever(SF, tree, k=10)
    assert len(out) == 10
    assert (out["_score"].to_numpy()[:-1]
            >= out["_score"].to_numpy()[1:]).all()


def test_rrf_fused_score_formula(ray_session):
    out = execute_retriever(SF, {"rrf": {
        "rank_constant": 10, "rank_window_size": 5,
        "retrievers": [
            {"standard": {"query": {"kind": "term", "term": "data"}}},
            {"standard": {"query": {"kind": "term", "term": "data"}}},
        ]}}, k=3)
    # identical children -> every fused score is 2/(10+rank)
    want = [round(2.0 / (10 + r), 4) for r in (1, 2, 3)]
    assert out["_score"].tolist() == want


def test_window_bounds_candidates(ray_session):
    small = execute_retriever(SF, {"rrf": {
        "rank_window_size": 3,
        "retrievers": [
            {"standard": {"query": {"kind": "term", "term": "data"}}},
            {"standard": {"query": {"kind": "term", "term": "merge"}}},
        ]}}, k=100)
    assert len(small) <= 6  # at most window per child


def test_linear_none_normalizer_keeps_raw(ray_session):
    tree = {"linear": {"rank_window_size": 10, "retrievers": [
        {"retriever": {"standard": {"query": {
            "kind": "term", "term": "data"}}}, "weight": 2.0,
         "normalizer": "none"}]}}
    out = execute_retriever(SF, tree, k=5)
    single = execute_retriever(
        SF, {"standard": {"query": {"kind": "term", "term": "data"},
                          "rank_window_size": 10}}, k=5)
    np.testing.assert_allclose(out["_score"].to_numpy(),
                               2.0 * single["_score"].to_numpy(), atol=2e-4)


def test_unknown_kind_rejected(ray_session):
    with pytest.raises(ValueError, match="unsupported retriever"):
        execute_retriever(SF, {"frobnicator": {}})


def test_reranker_scores_are_overlap_counts(ray_session):
    out = execute_retriever(SF, {"text_similarity_reranker": {
        "retriever": {"standard": {"query": {
            "kind": "match", "text": "data query window"}}},
        "inference_text": "the data batch query window",
        "rank_window_size": 15}}, k=15)
    assert ((out["_score"] >= 0) & (out["_score"] <= 5)).all()
    assert out["_score"].iloc[0] >= out["_score"].iloc[-1]
