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
    """Independent spec reimplementation (Lucene Queries javadoc)."""
    def one(s: str) -> int:
        s = s.strip()
        if s.endswith("%"):
            p = float(s[:-1])
            v = int(n * abs(p) / 100.0)
            return n - v if p < 0 else v
        v = int(s)
        return n + v if v < 0 else v

    spec = spec.strip()
    if "<" not in spec:
        return max(0, min(n, one(spec)))
    result = n
    best = -1
    for part in spec.split():
        c, _, sub = part.partition("<")
        c = int(c)
        if n > c and c > best:
            best, result = c, one(sub)
    return max(0, min(n, result))


def random_spec(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return str(rng.randrange(-4, 5))
    if kind == 1:
        return f"{rng.choice([-90, -75, -50, -25, 25, 50, 75, 90])}%"
    if kind == 2:
        return f"{rng.randrange(1, 5)}<{rng.choice(['50%', '75%', '-1', '2'])}"
    return (f"{rng.randrange(1, 3)}<{rng.choice(['25%', '-2'])} "
            f"{rng.randrange(3, 6)}<{rng.choice(['75%', '-1'])}")


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
