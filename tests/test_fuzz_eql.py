"""Differential fuzz for the EQL executor (functions/eql.py).

Single-event queries fuzz random predicates against a pandas brute-force
oracle; 2-step sequences fuzz random (category, threshold, maxspan)
combinations against an independent per-user first-match chain matcher
written directly in Python (no searchsorted — the slow-but-obvious
formulation the vectorized cascade must agree with).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
CATS = ["click", "view", "purchase", "signup", "error"]


@pytest.fixture(scope="module")
def events():
    t = pq.read_table(f"{SF}/events.parquet").to_pandas()
    t["ts"] = pd.to_datetime(t["ts"], unit="us")
    return t.sort_values(["ts", "event_id"]).reset_index(drop=True)


def test_fuzz_eql_single(events):
    from elasticsearch_ray.functions import eql

    rng = random.Random(90210)
    ops_ = [("value > {v}", lambda df, v: df["value"] > v),
            ("value <= {v}", lambda df, v: df["value"] <= v),
            ("value >= {v} and value < {w}",
             lambda df, v, w=None: (df["value"] >= v) & (df["value"] < w)),
            ("user_id == {u}", lambda df, u: df["user_id"] == u)]
    for i in range(40):
        cat = rng.choice(CATS + ["any"])
        kind = rng.randrange(len(ops_))
        v = round(rng.uniform(0, 150), 2)
        w = round(v + rng.uniform(1, 50), 2)
        u = rng.randrange(0, 200)
        if kind == 0:
            q, mask = f"value > {v}", events["value"] > v
        elif kind == 1:
            q, mask = f"value <= {v}", events["value"] <= v
        elif kind == 2:
            q = f"value >= {v} and value < {w}"
            mask = (events["value"] >= v) & (events["value"] < w)
        else:
            q, mask = f"user_id == {u}", events["user_id"] == u
        if cat != "any":
            mask = mask & (events["event_type"] == cat)
        n = rng.choice([3, 5, 10])
        want = events[mask].sort_values(["ts", "event_id"]).head(n)
        got = eql.run(SF, f"{cat} where {q} | head {n}")
        assert got["event_id"].tolist() == want["event_id"].tolist(), (
            cat, q, n)


def _brute_sequence(events: pd.DataFrame, cat1, cat2, thr, maxspan_us):
    """Obvious per-key matcher with the engine's documented semantics:
    every step-1 event anchors independently (non-consuming); the chain
    is the earliest strictly-later step-2 event of the same user; valid
    when it exists and fits in maxspan. Returns {user_id: count}."""
    out = {}
    e1 = events[(events["event_type"] == cat1) & (events["value"] > thr)]
    e2all = events[events["event_type"] == cat2]
    for r in e1.itertuples():
        cand = e2all[(e2all["user_id"] == r.user_id) & (e2all["ts"] > r.ts)]
        if len(cand):
            c = cand.sort_values("ts").iloc[0]
            if (c["ts"] - r.ts) <= pd.Timedelta(microseconds=maxspan_us):
                out[r.user_id] = out.get(r.user_id, 0) + 1
    return out


def test_fuzz_eql_sequence(events):
    from elasticsearch_ray.functions import eql

    rng = random.Random(2468)
    for i in range(12):
        cat1, cat2 = rng.sample(CATS, 2)
        thr = round(rng.uniform(0, 80), 2)
        days = rng.choice([1, 2, 5])
        q = (f"sequence by user_id with maxspan={days}d "
             f"[ {cat1} where value > {thr} ] [ {cat2} where true ]")
        got = eql.run(SF, q)
        want = _brute_sequence(events, cat1, cat2, thr,
                               days * 24 * 3600 * 1_000_000)
        got_map = dict(zip(got["user_id"], got["seqs"]))
        assert got_map == want, (q, len(got_map), len(want))
