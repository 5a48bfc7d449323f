"""Merge correctness (SURVEY.md §5c): search results over merged segments are
identical to results over the originals; force_merge + gc leave one live
segment; merged manifests carry lineage."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from elasticsearch_ray.index.build import build_index
from elasticsearch_ray.index.manifest import committed_segments, live_segments
from elasticsearch_ray.index.merge import force_merge, gc_merged, merge_segments
from elasticsearch_ray.search.engine import IndexSearcher
from elasticsearch_ray.sources.corpus import write_corpus
from elasticsearch_ray.sources.queries import reference_queries


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    c = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(c, 1000, rows_per_file=1000, row_group_size=100, use_ray=True)
    i = str(tmp_path_factory.mktemp("index"))
    build_index(c, i, docs_per_partition=250, num_buckets=8, salt_chunks=4)
    return c, i


def _all_results(index_dir):
    s = IndexSearcher(index_dir)
    out = {}
    for q in reference_queries():
        ids, sc = s.search(q)
        out[q["qid"]] = (list(ids), [float(x) for x in sc])
    return out, s


def test_merge_preserves_results(dirs, tmp_path):
    _, index_dir = dirs
    before, s0 = _all_results(index_dir)
    n_before = len(live_segments(committed_segments(index_dir)))
    assert n_before == 4

    d2 = str(tmp_path / "copy")
    shutil.copytree(index_dir, d2)
    new_id = merge_segments(d2, max_merge_at_once=2)
    assert new_id is not None
    live = live_segments(committed_segments(d2))
    assert n_before - 1 == len(live)
    assert new_id in live

    after, s1 = _all_results(d2)
    assert before == after
    assert s0.n_docs == s1.n_docs and s0.sum_doc_len == s1.sum_doc_len

    # merge everything down to one segment, gc the leftovers
    force_merge(d2, max_num_segments=1)
    live = live_segments(committed_segments(d2))
    assert len(live) == 1
    m = next(iter(live.values()))
    assert m.merged_from, "merged manifest must record lineage"
    assert len(m.fragments) == 10  # full input lineage union
    removed = gc_merged(d2)
    assert removed
    final, _ = _all_results(d2)
    assert before == final


def test_searcher_stage_dataset(dirs):
    """Actor-pool query serving over a queries dataset."""
    from elasticsearch_ray.search.stage import search_dataset

    _, index_dir = dirs
    qs = reference_queries()[:8]
    res = search_dataset(index_dir, qs, concurrency=2).to_pandas()
    s = IndexSearcher(index_dir)
    for q in qs:
        ids, sc = s.search(q)
        got = res[res.qid == q["qid"]].sort_values("rank")
        assert list(got.doc_id) == list(ids), q
        np.testing.assert_allclose(got.score.to_numpy(), sc.astype(np.float64), rtol=1e-7)


def test_snapshot_restore(dirs, tmp_path):
    """snapshot/restore analog (§2.1): the segment-dir layout IS the
    snapshot — copy the index directory wholesale, restored searcher is
    identical."""
    import shutil

    _, index_dir = dirs
    snap = str(tmp_path / "snapshot")
    shutil.copytree(index_dir, snap)
    a = IndexSearcher(index_dir)
    b = IndexSearcher(snap)
    for q in reference_queries()[:10]:
        ai, asc = a.search(q)
        bi, bsc = b.search(q)
        assert list(ai) == list(bi)
        np.testing.assert_array_equal(asc, bsc)


def test_snapshot_repository_incremental(dirs, tmp_path):
    """Incremental snapshot repo: second snapshot copies only new segments;
    restore is search-identical; delete GCs unreferenced segments."""
    from elasticsearch_ray.index.snapshot import (
        create_snapshot,
        delete_snapshot,
        list_snapshots,
        restore_snapshot,
    )
    from elasticsearch_ray.search.engine import IndexSearcher

    _, idx = dirs
    repo = str(tmp_path / "repo")
    m1 = create_snapshot(idx, repo, "snap1")
    assert m1["copied"] == m1["segments"]  # first snapshot copies everything
    m2 = create_snapshot(idx, repo, "snap2")
    assert m2["copied"] == []  # unchanged index -> fully incremental
    assert [s["name"] for s in list_snapshots(repo)] == ["snap1", "snap2"]

    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "snap1", dest)
    q = {"kind": "match", "text": "data query", "k": 10}
    a = IndexSearcher(idx).search(q)
    b = IndexSearcher(dest).search(q)
    assert list(a[0]) == list(b[0])
    assert [float(x) for x in a[1]] == [float(x) for x in b[1]]

    assert delete_snapshot(repo, "snap1") == []  # snap2 still references all
    removed = delete_snapshot(repo, "snap2")
    assert sorted(removed) == sorted(m1["segments"])  # GC after last ref


def test_url_repository_read_only(dirs, tmp_path):
    """repository-url: file:// read-only view — list/restore identical to the
    backing repo, create/delete refused."""
    import pytest

    from elasticsearch_ray.index.snapshot import (
        ReadOnlyRepository,
        create_snapshot,
    )
    from elasticsearch_ray.search.engine import IndexSearcher

    _, idx = dirs
    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "snap1")
    url = ReadOnlyRepository(f"file://{repo}")
    assert [s["name"] for s in url.list()] == ["snap1"]
    dest = str(tmp_path / "restored_url")
    url.restore("snap1", dest)
    q = {"kind": "match", "text": "data query", "k": 10}
    assert list(IndexSearcher(idx).search(q)[0]) == \
        list(IndexSearcher(dest).search(q)[0])
    with pytest.raises(PermissionError):
        url.create(idx, "snap2")
    with pytest.raises(PermissionError):
        url.delete("snap1")
    with pytest.raises(ValueError):
        ReadOnlyRepository("s3://bucket/path")


def test_merge_rejects_mixed_flags(dirs, tmp_path):
    """Segments with different analyzer/index_positions settings must not
    merge (the codec would mis-attribute position streams)."""
    import json

    import pytest

    from elasticsearch_ray.index.merge import merge_segments
    from elasticsearch_ray.index.reshape import clone_index, split_index

    _, idx = dirs
    work = str(tmp_path / "mixed")
    split_index(idx, work, parts=2)
    # forge one manifest's flag
    import os

    from elasticsearch_ray.index.manifest import committed_segments, live_segments

    live = live_segments(committed_segments(work))
    sid = sorted(live)[0]
    mp = os.path.join(work, sid, "manifest.json")
    m = json.load(open(mp))
    m["index_positions"] = not m["index_positions"]
    json.dump(m, open(mp, "w"))
    with pytest.raises(ValueError, match="mixed analyzer/index_positions"):
        merge_segments(work, sorted(live))


def test_merge_max_merged_docs_gate(dirs, tmp_path):
    """max_merged_docs (MergePolicyConfig max-merged-segment analog): when
    the widest window exceeds the budget, a narrower one merges instead;
    when every window exceeds it, nothing merges."""
    from elasticsearch_ray.index.manifest import committed_segments, live_segments
    from elasticsearch_ray.index.merge import merge_segments
    from elasticsearch_ray.index.reshape import split_index

    _, idx = dirs
    work = str(tmp_path / "gated")
    split_index(idx, work, parts=4)
    live = live_segments(committed_segments(work))
    total = sum(m.doc_count for m in live.values())
    assert merge_segments(work, max_merged_docs=0) is None
    # budget that admits pairs but not the full window
    pair_budget = total - 1
    new = merge_segments(work, max_merged_docs=pair_budget)
    assert new is not None
    merged = committed_segments(work)[new]
    assert merged.doc_count <= pair_budget


def test_shrink_resume_skips_merged_groups(dirs, tmp_path):
    """Re-running shrink_index over a completed shrink is a no-op instead of
    a KeyError (resume contract)."""
    from elasticsearch_ray.index.manifest import committed_segments, live_segments
    from elasticsearch_ray.index.reshape import shrink_index, split_index
    from elasticsearch_ray.search.engine import IndexSearcher

    _, idx = dirs
    work = str(tmp_path / "shr")
    split_index(idx, work, parts=4)
    n_live = len(live_segments(committed_segments(work)))
    dst = str(tmp_path / "shr_out")
    first = shrink_index(work, dst, 2)
    assert len(first) == n_live // 2
    again = shrink_index(work, dst, 2)  # must not raise
    assert again == [] or all(a is not None for a in again)
    q = {"kind": "match", "text": "data query", "k": 10}
    assert list(IndexSearcher(idx).search(q)[0]) == \
        list(IndexSearcher(dst).search(q)[0])
