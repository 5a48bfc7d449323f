"""Seeded random query-tree fuzz: engine vs the independent brute-force
oracle (tests/oracle_bm25.py) over randomly composed bool trees of
term/match/match_phrase(+slop)/prefix/match_all leaves.

Complements the fixed-query parity suite (test_index_search.py): the fuzz
explores CLAUSE INTERACTIONS — nested bools, filter-vs-must scoring, boosts
compounding through levels, must_not under should — that enumerated gates
cannot cover. Comparison is on the FULL doc->score map (k = corpus size),
so float-tie reordering in top-k cannot mask or fake a mismatch.

Phrases are sampled from real document windows (guaranteed-plausible
position patterns), INCLUDING windows with repeated tokens: repeated-term
sloppy phrases run the full SloppyPhraseMatcher repeats machinery and are
compared score-exact like every other leaf.
"""

from __future__ import annotations

import numpy as np
import pyarrow.dataset as pads
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.search.engine import IndexSearcher
from elasticsearch_ray.sources.corpus import write_corpus
from tests.oracle_bm25 import BruteForceBM25

N_DOCS = 1000


@pytest.fixture(scope="module")
def fuzz_env(tmp_path_factory, ray_session):
    cdir = str(tmp_path_factory.mktemp("fuzz_corpus"))
    write_corpus(cdir, N_DOCS, rows_per_file=1000, row_group_size=200, use_ray=True)
    idir = str(tmp_path_factory.mktemp("fuzz_index"))
    build_index(cdir, idir, docs_per_partition=500, num_buckets=8, salt_chunks=4)
    t = pads.dataset(cdir).to_table(columns=["content"])
    texts = t["content"].to_pylist()
    oracle = BruteForceBM25([(i, c) for i, c in enumerate(texts)], analyzer="code")
    return IndexSearcher(idir), oracle, texts, idir


def _vocab_pools(oracle):
    """terms bucketed by df so the fuzz mixes rare, mid and stop-like terms."""
    by_df = sorted(oracle.tf.items(), key=lambda kv: len(kv[1]))
    terms = [t for t, _ in by_df]
    n = len(terms)
    return terms[: n // 4], terms[n // 4 : 3 * n // 4], terms[3 * n // 4 :]


def _phrase_from_doc(rng, oracle, texts, max_len=3):
    """a window of consecutive tokens from a random real doc (repeated
    tokens allowed — exercises the repeats machinery)."""
    for _ in range(20):
        doc = texts[int(rng.integers(len(texts)))]
        toks = oracle.an(doc)
        if len(toks) < max_len:
            continue
        i = int(rng.integers(len(toks) - max_len))
        w = toks[i : i + int(rng.integers(2, max_len + 1))]
        return " ".join(w)
    return "query scan"


def _rand_leaf(rng, pools, oracle, texts):
    rare, mid, common = pools
    pick = lambda pool: pool[int(rng.integers(len(pool)))] if pool else "query"
    kind = int(rng.integers(7))
    boost = float(rng.choice([1.0, 1.0, 0.5, 2.0, 3.7]))
    if kind == 6:  # intervals: ordered/unordered match, optional filter
        # draw the two terms from a real doc window so they co-occur
        w = _phrase_from_doc(rng, oracle, texts).split()
        terms = [w[0], w[-1]] if len(w) >= 2 else [w[0], pick(mid)]
        spec = {"query": " ".join(terms),
                "max_gaps": int(rng.integers(0, 4)),
                "ordered": bool(rng.integers(0, 2))}
        if rng.random() < 0.4:
            fk = str(rng.choice(["not_containing", "containing",
                                 "overlapping", "before", "after"]))
            spec["filter"] = {fk: {"match": {"query": pick(common)}}}
        return {"kind": "intervals", "rule": {"match": spec},
                "boost": boost}
    if kind == 0:
        return {"kind": "term", "term": pick(mid), "boost": boost}
    if kind == 1:  # term that may not exist
        return {"kind": "term", "term": rng.choice([pick(rare), "zzznope"]),
                "boost": boost}
    if kind == 2:
        words = [pick(mid) for _ in range(int(rng.integers(1, 4)))]
        return {"kind": "match", "text": " ".join(words),
                "operator": str(rng.choice(["or", "and"])), "boost": boost}
    if kind == 3:
        return {"kind": "match_phrase", "text": _phrase_from_doc(rng, oracle, texts),
                "slop": int(rng.integers(0, 3)), "boost": boost}
    if kind == 4:
        base = pick(mid)
        return {"kind": "prefix", "prefix": base[: max(1, int(rng.integers(2, 5)))],
                "boost": boost}
    return {"kind": "match_all", "boost": boost}


def _rand_query(rng, pools, oracle, texts, depth=0):
    if depth >= 2 or rng.random() < 0.45:
        return _rand_leaf(rng, pools, oracle, texts)
    q = {"kind": "bool"}
    # always at least one positive clause: a pure-negative bool means
    # match-all-minus in ES semantics, which the brute oracle does not model
    n_must = int(rng.integers(0, 3))
    n_should = int(rng.integers(0 if n_must else 1, 3))
    n_filter = int(rng.integers(0, 2))
    n_not = int(rng.integers(0, 2))
    if n_must:
        q["must"] = [_rand_query(rng, pools, oracle, texts, depth + 1)
                     for _ in range(n_must)]
    if n_should:
        q["should"] = [_rand_query(rng, pools, oracle, texts, depth + 1)
                       for _ in range(n_should)]
    if n_filter:
        q["filter"] = [_rand_query(rng, pools, oracle, texts, depth + 1)
                       for _ in range(n_filter)]
    if n_not:
        q["must_not"] = [_rand_leaf(rng, pools, oracle, texts)
                         for _ in range(n_not)]
    if rng.random() < 0.3:
        q["boost"] = float(rng.choice([0.5, 2.0]))
    return q


def test_fuzz_query_trees_match_oracle(fuzz_env):
    searcher, oracle, texts, _ = fuzz_env
    pools = _vocab_pools(oracle)
    rng = np.random.default_rng(20260817)
    n_queries, n_nonempty = 250, 0
    for qi in range(n_queries):
        q = _rand_query(rng, pools, oracle, texts)
        q["k"] = N_DOCS  # full result set: tie order cannot hide mismatches
        ids, scores = searcher.search(q)
        o_ids, o_scores = oracle.search(q)
        got = dict(zip((int(i) for i in ids), (float(s) for s in scores)))
        want = dict(zip(o_ids, o_scores))
        assert set(got) == set(want), f"doc set mismatch, query #{qi}: {q}"
        if want:
            n_nonempty += 1
            g = np.array([got[d] for d in sorted(got)])
            w = np.array([want[d] for d in sorted(want)])
            np.testing.assert_allclose(
                g, w, rtol=1e-5, atol=1e-7,
                err_msg=f"score mismatch, query #{qi}: {q}")
    # the generator must actually exercise matching queries
    assert n_nonempty > n_queries * 0.6, n_nonempty


def test_fuzz_distributed_partition_invariance(fuzz_env):
    """Random query trees must score IDENTICALLY through the partitioned
    DistributedSearcher (DFS global stats) and the single searcher — the
    round-2 advisory bug class (per-field df/avgdl falling back to local
    stats under some clause shapes) generalized to arbitrary compositions."""
    from elasticsearch_ray.search.distributed import DistributedSearcher

    searcher, oracle, texts, idir = fuzz_env
    dist = DistributedSearcher(idir, num_searchers=3)
    pools = _vocab_pools(oracle)
    rng = np.random.default_rng(424242)
    for qi in range(80):
        q = _rand_query(rng, pools, oracle, texts)
        q["k"] = N_DOCS
        ids_s, sc_s = searcher.search(q)
        ids_d, sc_d = dist.search(q)
        got = dict(zip((int(i) for i in ids_d), (float(s) for s in sc_d)))
        want = dict(zip((int(i) for i in ids_s), (float(s) for s in sc_s)))
        assert set(got) == set(want), f"doc set mismatch, query #{qi}: {q}"
        if want:
            g = np.array([got[d] for d in sorted(got)])
            w = np.array([want[d] for d in sorted(want)])
            np.testing.assert_allclose(
                g, w, rtol=1e-6, atol=1e-9,
                err_msg=f"distributed score mismatch, query #{qi}: {q}")


# ---------------- span-family fuzz ----------------


def _naive_spans(oracle, doc, q):
    """independent span algebra over the oracle's position maps: plain
    Python sets of (start, end) — no shared mechanics with the engine's
    vectorized _span_eval."""
    kind = q["kind"]
    if kind == "span_term":
        ps = oracle.pos.get(q["term"], {}).get(doc, [])
        return {(p, p + 1) for p in ps}
    if kind == "span_or":
        out = set()
        for c in q["clauses"]:
            out |= _naive_spans(oracle, doc, c)
        return out
    if kind == "span_not":
        inc = _naive_spans(oracle, doc, q["include"])
        exc = _naive_spans(oracle, doc, q["exclude"])
        return {(s, e) for (s, e) in inc
                if not any(s < xe and xs < e for (xs, xe) in exc)}
    if kind == "span_first":
        return {(s, e) for (s, e) in _naive_spans(oracle, doc, q["match"])
                if e <= int(q["end"])}
    raise ValueError(kind)


def _naive_near_match(oracle, doc, terms, slop, in_order):
    plists = [sorted(oracle.pos.get(t, {}).get(doc, [])) for t in terms]
    if any(not p for p in plists):
        return False
    window = slop + len(terms) - 1
    if in_order:
        for p0 in plists[0]:
            # strictly increasing chain within the window
            def chain(ti, prev):
                if ti == len(plists):
                    return True
                for p in plists[ti]:
                    if p > prev and p - p0 <= window:
                        if chain(ti + 1, p):
                            return True
                return False

            if chain(1, p0):
                return True
        return False
    starts = sorted({p for pl in plists for p in pl})
    for s in starts:
        if all(any(s <= p <= s + window for p in pl) for pl in plists):
            return True
    return False


def _rand_span_tree(rng, pools, depth=0):
    rare, mid, common = pools
    pick = lambda pool: pool[int(rng.integers(len(pool)))]
    if depth >= 2 or rng.random() < 0.5:
        return {"kind": "span_term", "term": pick(mid)}
    kind = int(rng.integers(3))
    if kind == 0:
        return {"kind": "span_or",
                "clauses": [_rand_span_tree(rng, pools, depth + 1)
                            for _ in range(int(rng.integers(2, 4)))]}
    if kind == 1:
        return {"kind": "span_not",
                "include": _rand_span_tree(rng, pools, depth + 1),
                "exclude": _rand_span_tree(rng, pools, depth + 1)}
    return {"kind": "span_first",
            "match": _rand_span_tree(rng, pools, depth + 1),
            "end": int(rng.integers(1, 40))}


def test_fuzz_span_near_vs_bruteforce(fuzz_env):
    """span_near over random term pairs/triples, both orders, random slop:
    engine doc set == brute-force enumeration of position combinations."""
    searcher, oracle, texts, _ = fuzz_env
    pools = _vocab_pools(oracle)
    rng = np.random.default_rng(31)
    rare, mid, common = pools
    for qi in range(40):
        n_terms = int(rng.integers(2, 4))
        terms = list(rng.choice(mid + common, size=n_terms, replace=False))
        slop = int(rng.integers(0, 5))
        in_order = bool(rng.random() < 0.5)
        q = {"kind": "span_near", "terms": terms, "slop": slop,
             "in_order": in_order, "k": N_DOCS}
        ids, _ = searcher.search(q)
        got = set(int(i) for i in ids)
        want = {d for d in range(N_DOCS)
                if _naive_near_match(oracle, d, terms, slop, in_order)}
        assert got == want, f"#{qi} {q}: extra={got-want} missing={want-got}"


def test_fuzz_span_trees_vs_naive_algebra(fuzz_env):
    """random or/not/first span trees: engine doc set == docs where the
    naive span algebra yields a non-empty span set."""
    searcher, oracle, texts, _ = fuzz_env
    pools = _vocab_pools(oracle)
    rng = np.random.default_rng(37)
    n_nonempty = 0
    for qi in range(60):
        q = _rand_span_tree(rng, pools)
        if q["kind"] == "span_term":
            q = {"kind": "span_or", "clauses": [q]}
        q["k"] = N_DOCS
        ids, _ = searcher.search(q)
        got = set(int(i) for i in ids)
        want = {d for d in range(N_DOCS) if _naive_spans(oracle, d, q)}
        assert got == want, f"#{qi} {q}: extra={got-want} missing={want-got}"
        n_nonempty += bool(want)
    assert n_nonempty > 30, n_nonempty
