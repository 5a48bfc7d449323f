"""Differential fuzz for the minimum_should_match grammar + bool-should
enforcement (session 16): random term subsets and random msm specs vs a
brute-force oracle computed from raw per-term doc sets.

Two layers:
- grammar: parse_min_should_match vs an independent reimplementation of
  Lucene Queries.calculateMinShouldMatch written against the published
  spec (not the engine's code path).
- engine: bool(should, minimum_should_match=spec) doc sets vs a
  set-algebra oracle counting per-doc matched clauses.
"""

from __future__ import annotations

import random

import numpy as np

from elasticsearch_ray.pipelines.fulltext import documents_searcher
from elasticsearch_ray.search.engine import IndexSearcher

SF = "/root/testdata/sf0.001"

TERMS = ["data", "merge", "window", "slow", "fast", "query", "table",
         "spark", "join", "dup"]


def oracle_msm(spec: str, n: int) -> int:
    """Independent spec reimplementation following the structure of
    Lucene's Queries.calculateMinShouldMatch: the conditional chain is
    scanned left-to-right and RETURNS EARLY at the first part whose
    cond >= n; each passed part's sub-spec is evaluated by recursion
    (this recursive shape is Lucene's, not the engine's single-pass
    loop). Negative results floor at 0; over-counts (> n) are kept."""
    spec = spec.strip()
    if "<" in spec:
        result = n
        for part in spec.split():
            cond, sub = part.split("<", 1)
            if n <= int(cond):
                break
            result = oracle_msm(sub, n)
        return result if result > 0 else 0
    if spec.endswith("%"):
        p = float(spec[:-1])
        v = int(abs(p) * n / 100.0)
        result = (n - v) if p < 0 else v
    else:
        result = int(spec)
        if result < 0:
            result = n + result
    return result if result > 0 else 0


def random_spec(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return str(rng.randrange(-4, 5))
    if kind == 1:
        return f"{rng.choice([-90, -75, -50, -25, 25, 50, 75, 90])}%"
    if kind == 2:
        return f"{rng.randrange(1, 5)}<{rng.choice(['50%', '75%', '-1', '2'])}"
    # two-part chains, deliberately UNSORTED half the time — sequential
    # early-return diverges from largest-cond-wins exactly there
    c1, c2 = rng.randrange(1, 3), rng.randrange(3, 6)
    if rng.random() < 0.5:
        c1, c2 = c2, c1
    return (f"{c1}<{rng.choice(['25%', '-2'])} "
            f"{c2}<{rng.choice(['75%', '-1'])}")


def test_grammar_fuzz():
    rng = random.Random(160816)
    for _ in range(300):
        spec = random_spec(rng)
        n = rng.randrange(1, 9)
        assert IndexSearcher.parse_min_should_match(spec, n) == \
            oracle_msm(spec, n), (spec, n)


def test_bool_msm_engine_fuzz():
    s = documents_searcher(SF)
    per_term = {t: set(s._eval({"kind": "term", "term": t})[0].tolist())
                for t in TERMS}
    rng = random.Random(424242)
    for _ in range(60):
        k = rng.randrange(2, 6)
        terms = rng.sample(TERMS, k)
        spec = random_spec(rng)
        msm = oracle_msm(spec, k)
        ids, _ = s._eval({
            "kind": "bool",
            "should": [{"kind": "term", "term": t} for t in terms],
            "minimum_should_match": spec,
        })
        got = set(ids.tolist())
        # oracle: docs matching >= msm clauses (candidates = union)
        from collections import Counter

        cnt = Counter()
        for t in terms:
            for d in per_term[t]:
                cnt[d] += 1
        want = {d for d, c in cnt.items() if c >= max(msm, 0)}
        if msm <= 0:
            want = {d for d in cnt}  # union candidacy unchanged
        assert got == want, (terms, spec, msm,
                             len(got), len(want))
