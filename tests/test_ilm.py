"""ILM phase state machine (index/ilm.py): policy arithmetic for
(phase, action, step) explain rows, and REAL phase execution — the warm
phase's readonly -> shrink -> forcemerge pipeline runs the actual
reshape/merge ops and must preserve search results exactly."""

from __future__ import annotations

import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.index.ilm import (
    DEFAULT_POLICY,
    execute_phase,
    explain_index,
    is_frozen,
    is_readonly,
    phase_of,
)
from elasticsearch_ray.search.engine import IndexSearcher
from elasticsearch_ray.sources.corpus import write_corpus
from elasticsearch_ray.sources.queries import reference_queries


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    c = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(c, 1000, rows_per_file=1000, row_group_size=100, use_ray=True)
    i = str(tmp_path_factory.mktemp("index"))
    build_index(c, i, docs_per_partition=250, num_buckets=8, salt_chunks=4)
    return i


def _results(index_dir):
    s = IndexSearcher(index_dir)
    out = {}
    for q in reference_queries():
        ids, sc = s.search(q)
        out[q["qid"]] = (list(ids), [float(x) for x in sc])
    return out


def test_phase_of_and_explain_progression():
    assert [phase_of(a) for a in (0, 2, 3, 7, 8, 14, 15, 40)] == [
        "hot", "hot", "warm", "warm", "cold", "cold", "delete", "delete"]
    # warm action sequencing: one action per day of phase age, then done
    assert explain_index(3) == {"phase": "warm", "action": "readonly",
                                "step": "in_progress"}
    assert explain_index(4)["action"] == "shrink"
    assert explain_index(5)["action"] == "forcemerge"
    assert explain_index(6) == {"phase": "warm", "action": "complete",
                                "step": "complete"}
    assert explain_index(15)["action"] == "wait_for_snapshot"
    assert explain_index(16)["action"] == "delete"


def test_warm_phase_execution_search_parity(idx, tmp_path):
    before = _results(idx)
    dst = str(tmp_path / "warm")
    res = execute_phase(idx, "warm", dst_dir=dst, shrink_factor=2)
    # readonly marker landed on the source, shrink+forcemerge on dst
    assert is_readonly(idx)
    assert res["_final_dir"] == dst
    assert res["shrink"] and res["forcemerge"] is not None
    after = _results(dst)
    assert before == after  # the reference's shrunken-index parity bar
    # cold phase on the shrunken copy: freeze marker only, still searchable
    execute_phase(dst, "cold")
    assert is_frozen(dst)
    assert _results(dst) == before


def test_delete_phase_removes_index(idx, tmp_path):
    import os

    from elasticsearch_ray.index.reshape import clone_index

    victim = str(tmp_path / "victim")
    clone_index(idx, victim)
    res = execute_phase(victim, "delete")
    assert res["wait_for_snapshot"] == "awaiting_slm"
    assert res["delete"] is True and not os.path.exists(victim)


def test_unknown_action_rejected(tmp_path):
    with pytest.raises(ValueError):
        execute_phase(str(tmp_path), "warm",
                      policy={"warm": {"min_age_days": 0,
                                       "actions": ["bogus"]}})
