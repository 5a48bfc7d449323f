"""Round-4 operator gates: ES|QL grammar depth, Painless surface,
Brazilian RSLP, fvh offsets, and the minhash two-pass invariants."""

from __future__ import annotations

import numpy as np

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def test_esql_where_boolean_tree(ray_session):
    out = ops.esql_where_boolean(SF)
    assert set(out["event_type"]) <= {"click", "view"}
    # NOT (value < 20): per-group sum must be >= 20 * n
    assert (out["s"] >= 20 * out["n"]).all()


def test_esql_where_functions_disjunction(ray_session):
    out = ops.esql_where_functions(SF)
    for et in out["event_type"]:
        assert et.startswith("c") or len(et) == 4


def test_esql_eval_case_bands(ray_session):
    out = ops.esql_eval_case(SF)
    got = dict(zip(out["band"], out["m"]))
    if "low" in got:
        assert got["low"] < 25
    if "mid" in got:
        assert 25 <= got["mid"] < 75


def test_esql_where_in_like(ray_session):
    out = ops.esql_where_in_like(SF)
    assert set(out["lang"]) <= {"en", "de"}
    assert not any(s.startswith("src1") for s in out["source"])


def test_esql_eval_string_keys(ray_session):
    out = ops.esql_eval_string(SF)
    assert all(s.startswith("SRC") and len(s) <= 4 for s in out["s"])
    assert (out["wmax"] > 0).all()


def test_esql_where_date_buckets(ray_session):
    out = ops.esql_where_date(SF)
    # every bucket is a midnight timestamp
    assert (out["day"].dt.hour == 0).all()
    assert (out["n"] > 0).all()
