"""Property tests for the round-3-continuation primitives: minimal-interval
pruning, phonetic encoders, murmur3, bulk ordering."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(1, 8)),
                min_size=0, max_size=20))
def test_minimal_intervals_property(pairs):
    """After pruning: no kept interval strictly contains another kept one,
    and every dropped interval contains some kept interval (soundness)."""
    from elasticsearch_ray.search.engine import IndexSearcher

    s = np.array([p[0] for p in pairs], np.int64)
    e = np.array([p[0] + p[1] for p in pairs], np.int64)
    ks, ke = IndexSearcher._minimal_intervals(s, e)
    kept = set(zip(ks.tolist(), ke.tolist()))
    # 1. pairwise non-containment among kept
    for a in kept:
        for b in kept:
            if a != b:
                assert not (a[0] <= b[0] and b[1] <= a[1]), (a, b)
    # 2. every input interval contains at least one kept interval
    for a, b in zip(s.tolist(), e.tolist()):
        assert any(a <= x and y <= b for x, y in kept), (a, b)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_phonetic_encoders_total(s):
    """soundex/metaphone are total functions: never raise, deterministic,
    soundex is '' or letter+3 digits."""
    from elasticsearch_ray.filters import metaphone, soundex

    c1, c2 = soundex(s), soundex(s)
    assert c1 == c2
    assert c1 == "" or (len(c1) == 4 and c1[0].isalpha()
                        and c1[1:].isdigit())
    assert metaphone(s) == metaphone(s)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64), st.binary(max_size=64))
def test_murmur3_collision_free_on_distinct(a, b):
    from elasticsearch_ray.functions.text import murmur3_x64_128

    if a != b:
        assert murmur3_x64_128(a) != murmur3_x64_128(b)
    else:
        assert murmur3_x64_128(a) == murmur3_x64_128(b)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(["index", "delete", "update", "create"]),
                min_size=1, max_size=12))
def test_bulk_group_apply_matches_sequential(ops):
    """The per-group apply must equal a straight sequential interpreter."""
    import json

    import pandas as pd

    from elasticsearch_ray.sources.bulk import _apply_group

    rows = []
    for i, op in enumerate(ops):
        doc = {"v": i} if op in ("index", "create") else \
            ({"w": i} if op == "update" else None)
        rows.append({"seq": i, "op": op, "_id": 1,
                     "doc": json.dumps(doc) if doc is not None else ""})
    # independent sequential interpreter
    state, errors = None, 0
    for i, op in enumerate(ops):
        if op == "index":
            state = {"v": i}
        elif op == "create":
            if state is None:
                state = {"v": i}
            else:
                errors += 1
        elif op == "update":
            if state is None:
                errors += 1
            else:
                state.update({"w": i})
        else:
            if state is None:
                errors += 1
            else:
                state = None
    out = _apply_group(pd.DataFrame(rows))
    if state is None:
        assert len(out) == 0
    else:
        assert json.loads(out["doc"].iloc[0]) == state
        assert int(out["errors"].iloc[0]) == errors
