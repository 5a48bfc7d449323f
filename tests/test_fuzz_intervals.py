"""Differential fuzz for the intervals source + filter algebra: the engine's
vectorized minimal-interval evaluation (greedy chain / two-pointer windows +
pruning + relation filters) vs an independent brute-force enumerator that
materializes EVERY candidate tuple of positions per doc.
"""

from __future__ import annotations

import itertools

import numpy as np
import os as _os

# fresh-seed sweeps: GRAFT_SEED_OFFSET=N shifts every inline seed
_SEED_OFF = int(_os.environ.get("GRAFT_SEED_OFFSET", "0"))
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.search.engine import IndexSearcher

VOCAB = ["alpha", "beta", "gamma", "delta", "zeta"]


def _brute_minimal(intervals: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out = []
    s = set(intervals)
    for a in s:
        if not any(b != a and a[0] <= b[0] and b[1] <= a[1] for b in s):
            out.append(a)
    return sorted(out)


def _brute_terms_intervals(toks: list[str], terms: list[str], max_gaps: int,
                           ordered: bool) -> list[tuple[int, int]]:
    """Enumerate every assignment of one position per term; keep windows
    within the gap budget (and in order when ordered); minimal-prune."""
    pls = [[i for i, t in enumerate(toks) if t == term] for term in terms]
    if any(not pl for pl in pls):
        return []
    cands = []
    for combo in itertools.product(*pls):
        if len(set(combo)) != len(combo):
            continue
        if ordered and list(combo) != sorted(combo):
            continue
        s, e = min(combo), max(combo) + 1
        if (e - s) - len(terms) <= max_gaps:
            cands.append((s, e))
    return _brute_minimal(cands)


def _brute_filter(src: list[tuple[int, int]], flt: list[tuple[int, int]],
                  kind: str) -> list[tuple[int, int]]:
    neg = kind.startswith("not_")
    base = kind[4:] if neg else kind

    def hit(iv):
        s, e = iv
        for fs, fe in flt:
            if base == "containing" and s <= fs and fe <= e:
                return True
            if base == "contained_by" and fs <= s and e <= fe:
                return True
            if base == "overlapping" and s < fe and fs < e:
                return True
            if base == "before" and e <= fs:
                return True
            if base == "after" and s >= fe:
                return True
        return False

    return [iv for iv in src if hit(iv) != neg]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    rng = np.random.default_rng(20260818 + _SEED_OFF)
    docs = [" ".join(rng.choice(VOCAB, size=rng.integers(2, 14)))
            for _ in range(120)]
    d = tmp_path_factory.mktemp("ivfuzz")
    src = str(d / "docs.parquet")
    pq.write_table(pa.table({
        "repo": ["r"] * len(docs),
        "path": [f"f{i}.py" for i in range(len(docs))],
        "commit": ["c"] * len(docs),
        "lang": ["python"] * len(docs),
        "content": docs,
    }), src)
    idx = str(d / "idx")
    build_index(src, idx, analyzer="code", num_buckets=2,
                hot_terms=frozenset())
    return docs, IndexSearcher(idx)


FILTER_KINDS = ["containing", "not_containing", "contained_by",
                "not_contained_by", "overlapping", "not_overlapping",
                "before", "after"]


def test_fuzz_intervals_filter_vs_brute(corpus):
    docs, searcher = corpus
    rng = np.random.default_rng(4242 + _SEED_OFF)
    toks_per_doc = [d.split() for d in docs]
    n_cases = 120
    for case in range(n_cases):
        k = int(rng.integers(1, 4))
        terms = list(rng.choice(VOCAB, size=k, replace=False))
        max_gaps = int(rng.integers(0, 4))
        ordered = bool(rng.integers(0, 2))
        use_filter = bool(rng.integers(0, 2))
        rule: dict = {"match": {"query": " ".join(terms),
                                "max_gaps": max_gaps, "ordered": ordered}}
        fkind = fterm = None
        if use_filter:
            fkind = FILTER_KINDS[int(rng.integers(0, len(FILTER_KINDS)))]
            fterm = str(rng.choice(VOCAB))
            rule["match"]["filter"] = {fkind: {"match": {"query": fterm}}}
        ids, _ = searcher._eval({"kind": "intervals", "rule": rule})
        expected = []
        for did, toks in enumerate(toks_per_doc):
            ivs = _brute_terms_intervals(toks, terms, max_gaps, ordered)
            if use_filter:
                fivs = [(i, i + 1) for i, t in enumerate(toks) if t == fterm]
                ivs = _brute_filter(ivs, fivs, fkind)
            if ivs:
                expected.append(did)
        assert sorted(ids.tolist()) == expected, \
            f"case {case}: terms={terms} gaps={max_gaps} ordered={ordered} " \
            f"filter={fkind}:{fterm}"
