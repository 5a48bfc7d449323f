"""Intervals `filter` rule conformance (IntervalsSourceProvider.IntervalFilter,
server/src/main/java/org/elasticsearch/index/query/IntervalsSourceProvider.java).
Expected doc sets are HAND-DERIVED from Lucene minimal-interval semantics:
sources yield only minimal intervals (no interval containing another match),
then the filter keeps/drops source intervals by their geometric relation to
the filter source's intervals; a doc matches if any interval survives.

Corpus (code analyzer; positions):
  0: alpha beta gamma               alpha@0 beta@1 gamma@2
  1: alpha gamma                    alpha@0 gamma@1
  2: alpha beta beta gamma          alpha@0 beta@1,2 gamma@3
  3: gamma alpha                    gamma@0 alpha@1
  4: alpha delta gamma zeta alpha gamma
                                    alpha@0,4 delta@1 gamma@2,5 zeta@3
  5: beta gamma                     beta@0 gamma@1
  6: alpha alpha gamma              alpha@0,1 gamma@2
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.search.engine import IndexSearcher

DOCS = [
    "alpha beta gamma",
    "alpha gamma",
    "alpha beta beta gamma",
    "gamma alpha",
    "alpha delta gamma zeta alpha gamma",
    "beta gamma",
    "alpha alpha gamma",
]


def iv(rule):
    return {"kind": "intervals", "rule": rule}


def m(query, **kw):
    return {"match": {"query": query, **kw}}


CASES = [
    # ordered match with one allowed gap: intervals exist in 0, 1, 4, 6
    ("ordered_gap1", iv(m("alpha gamma", max_gaps=1)), [0, 1, 4, 6]),
    # doc 2 needs 2 gaps; doc 3 is out of order
    ("ordered_gap0_minimality", iv(m("alpha gamma", max_gaps=0)), [1, 4, 6]),
    # ^ doc 6: [0,3) is pruned as it contains [1,3); [1,3) has 0 gaps
    ("unordered_adjacent", iv(m("alpha gamma", ordered=False, max_gaps=0)),
     [1, 3, 4, 6]),
    ("not_containing",
     iv(m("alpha gamma", max_gaps=1,
          filter={"not_containing": m("beta")})), [1, 4, 6]),
    ("containing",
     iv(m("alpha gamma", max_gaps=1,
          filter={"containing": m("beta")})), [0]),
    ("containing_delta",
     iv(m("alpha gamma", max_gaps=1,
          filter={"containing": m("delta")})), [4]),
    ("contained_by",
     iv(m("beta", filter={"contained_by": m("alpha gamma", max_gaps=1)})),
     [0]),
    ("not_contained_by",
     iv(m("beta", filter={"not_contained_by": m("alpha gamma", max_gaps=1)})),
     [2, 5]),
    ("overlapping",
     iv(m("alpha beta", filter={"overlapping": m("beta gamma")})), [0]),
    ("not_overlapping",
     iv(m("alpha beta", filter={"not_overlapping": m("beta gamma")})), [2]),
    ("before",
     iv(m("alpha", filter={"before": m("gamma")})), [0, 1, 2, 4, 6]),
    ("after",
     iv(m("alpha", filter={"after": m("gamma")})), [3, 4]),
]


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ivf")
    src = str(d / "docs.parquet")
    t = pa.table({
        "repo": ["r"] * len(DOCS),
        "path": [f"f{i}.py" for i in range(len(DOCS))],
        "commit": ["c"] * len(DOCS),
        "lang": ["python"] * len(DOCS),
        "content": DOCS,
    })
    pq.write_table(t, src)
    idx = str(d / "idx")
    build_index(src, idx, analyzer="code", num_buckets=2,
                hot_terms=frozenset())
    return IndexSearcher(idx)


@pytest.mark.parametrize("name,query,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_intervals_filter(searcher, name, query, expected):
    ids, _ = searcher._eval(query)
    assert sorted(ids.tolist()) == expected


CASES_SOURCES = [
    # any_of union of two single-term sources, filtered to those positions
    # contained by an (alpha gamma) window
    ("any_of_contained_by",
     iv({"any_of": {"terms": [{"match": {"query": "beta"}},
                              {"match": {"query": "delta"}}],
                    "filter": {"contained_by": m("alpha gamma",
                                                 max_gaps=1)}}}),
     [0, 4]),
    # prefix source (expands to gamma) with a before-filter: gamma intervals
    # that end before some alpha position
    ("prefix_before",
     iv({"prefix": {"prefix": "gam",
                    "filter": {"before": m("alpha")}}}),
     [3, 4]),
]


@pytest.mark.parametrize("name,query,expected", CASES_SOURCES,
                         ids=[c[0] for c in CASES_SOURCES])
def test_intervals_filter_sources(searcher, name, query, expected):
    ids, _ = searcher._eval(query)
    assert sorted(ids.tolist()) == expected


def test_nested_filter_routes_to_spans_path(searcher):
    """A filter nested inside an any_of SUB-source must route to the
    interval-geometry path (the legacy path can't evaluate dict
    sub-sources) — regression for the routing check that only looked at
    the top level."""
    q = iv({"any_of": {"terms": [
        {"match": {"query": "beta",
                   "filter": {"contained_by": m("alpha gamma",
                                                max_gaps=1)}}}]}})
    ids, _ = searcher._eval(q)
    assert sorted(ids.tolist()) == [0]


def test_span_near_three_clauses_in_algebra(searcher):
    """n-clause span_near inside the span algebra (SpanNearQueryBuilder
    allows any clause count): 3-term near wrapped in span_first / span_or."""
    near3 = {"kind": "span_near", "terms": ["alpha", "beta", "gamma"],
             "slop": 0, "in_order": True}
    # doc 0 = alpha beta gamma: the only contiguous ordered triple
    ids, _ = searcher._eval({"kind": "span_first",
                             "match": near3, "end": 3})
    assert sorted(ids.tolist()) == [0]
    # slop 0 via span_or: still only the contiguous doc 0
    ids2, _ = searcher._eval({"kind": "span_or", "clauses": [near3]})
    assert sorted(ids2.tolist()) == [0]
    # slop 1 admits doc 2 (alpha@0 beta@1 gamma@3: width 4, gaps 1)
    near_s1 = dict(near3, slop=1)
    ids3, _ = searcher._eval({"kind": "span_or", "clauses": [near_s1]})
    assert sorted(ids3.tolist()) == [0, 2]


def test_unordered_duplicate_term_needs_distinct_positions(searcher):
    """Fuzz-found: unordered intervals with a repeated term must cover each
    repetition with a DISTINCT position (doc 6 = alpha alpha gamma)."""
    q = iv(m("alpha alpha", ordered=False, max_gaps=0))
    ids, _ = searcher._eval(q)
    assert sorted(ids.tolist()) == [6]
    # spans path (vacuous filter) agrees
    q2 = iv(m("alpha alpha", ordered=False, max_gaps=0,
              filter={"not_containing": m("zzz")}))
    ids2, _ = searcher._eval(q2)
    assert sorted(ids2.tolist()) == [6]
