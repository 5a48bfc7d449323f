"""Connected components over edge Datasets (functions/graph.py) — the
clustering step after near-dup pair generation. Oracle: a tiny driver-side
union-find over the same edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from elasticsearch_ray.functions.graph import (anti_join_ids,
                                               connected_components,
                                               dedup_keep_representatives)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min vertex id in the component
    comp: dict[int, list[int]] = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    return {v: min(members + [root])
            for root, members in comp.items() for v in members}


def _run(edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    kw.setdefault("num_buckets", 8)
    df = pd.DataFrame(edges, columns=["a", "b"])
    out = connected_components(rd.from_pandas(df), **kw).to_pandas()
    return dict(zip(out["doc_id"].astype(int), out["component"].astype(int)))


def test_two_components_and_chain():
    edges = [(1, 2), (2, 3), (10, 11), (3, 4)]
    got = _run(edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges():
    # a path graph needs several label-propagation rounds
    edges = [(i, i + 1) for i in range(12)]
    got = _run(edges)
    assert got == {i: 0 for i in range(13)}


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    edges = [tuple(sorted((int(rng.integers(0, 90)),
                           int(rng.integers(0, 90)))))
             for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(edges)
    got = _run(edges)
    assert got == want


def test_partition_invariance():
    rng = np.random.default_rng(11)
    edges = [(int(rng.integers(0, 60)), int(rng.integers(0, 60)))
             for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = pd.DataFrame(edges, columns=["a", "b"])
    one = connected_components(rd.from_pandas(df), num_buckets=8).to_pandas()
    many = connected_components(
        rd.from_pandas(df).repartition(7), num_buckets=8).to_pandas()
    one = one.sort_values("doc_id").reset_index(drop=True)
    many = many.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_anti_join_ids():
    corpus = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                           "text": [f"t{i}" for i in range(20)]})
    drops = pd.DataFrame({"doc_id": np.array([3, 7, 7, 19], dtype=np.int64)})
    out = anti_join_ids(rd.from_pandas(corpus), rd.from_pandas(drops),
                        num_buckets=8).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    want = corpus[~corpus.doc_id.isin([3, 7, 19])].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)


def test_anti_join_empty_drop_list():
    corpus = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                           "text": list("abcde")})
    drops = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64)})
    out = anti_join_ids(rd.from_pandas(corpus), rd.from_pandas(drops),
                        num_buckets=4).to_pandas()
    assert sorted(out["doc_id"]) == list(range(5))


def test_dedup_keep_representatives():
    # clusters {0,1,2} and {5,6}; 3,4 isolated -> keep 0, 3, 4, 5
    corpus = pd.DataFrame({"doc_id": np.arange(7, dtype=np.int64),
                           "text": [f"t{i}" for i in range(7)]})
    pairs = pd.DataFrame({"doc_a": np.array([0, 1, 5], dtype=np.int64),
                          "doc_b": np.array([1, 2, 6], dtype=np.int64)})
    out = dedup_keep_representatives(
        rd.from_pandas(corpus), rd.from_pandas(pairs),
        num_buckets=8).to_pandas()
    assert sorted(out["doc_id"]) == [0, 3, 4, 5]


def test_pagerank_fixed_point_matches_serial(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.functions.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (4, 0), (5, 6)]
    # 6 is dangling (no out-edges)
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    out = (pagerank(ds, iters=3, num_buckets=4).to_pandas()
           .sort_values("v").reset_index(drop=True))

    # serial twin in the same fixed-point arithmetic
    S = 1 << 40
    verts = sorted({x for e in edges for x in e})
    n = len(verts)
    deg = {v: sum(1 for a, _ in edges if a == v) for v in verts}
    R = {v: S // n for v in verts}
    base = int(np.floor((1 - 0.85) * S / float(n)))
    for _ in range(3):
        dm = sum(R[v] for v in verts if deg[v] == 0)
        C = {v: 0 for v in verts}
        for a, b in edges:
            C[b] += R[a] // deg[a]
        R = {v: base + int(np.floor(0.85 * (C[v] + dm // n)))
             for v in verts}
    want = np.array([R[v] / S for v in verts])
    assert np.array_equal(out["r"].to_numpy(), want)
    # leaf feeders rank below every cycle member; mass is conserved
    assert out.loc[out["v"] == 3, "r"].iloc[0] < out["r"].max()
    assert abs(out["r"].sum() - 1.0) < 1e-6


def test_hits_fixed_point_matches_serial(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from elasticsearch_ray.functions.graph import hits

    edges = [(0, 2), (1, 2), (3, 2), (2, 4), (0, 4), (4, 0)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))
    out = hits(ds, iters=2, num_buckets=4)

    S = 1 << 20
    verts = sorted({x for e in edges for x in e})
    h = {v: S for v in verts}
    a = {}
    for _ in range(2):
        a = {v: sum(h[s] for s, d in edges if d == v) for v in verts}
        mx = max(max(a.values()), 1)
        a = {v: x * S // mx for v, x in a.items()}
        h = {v: sum(a[d] for s, d in edges if s == v) for v in verts}
        mx = max(max(h.values()), 1)
        h = {v: x * S // mx for v, x in h.items()}
    want_h = np.array([h[v] / S for v in verts])
    want_a = np.array([a[v] / S for v in verts])
    assert np.array_equal(out["hub"].to_numpy(), want_h)
    assert np.array_equal(out["authority"].to_numpy(), want_a)
    # node 2 collects three hubs -> top authority
    assert out.loc[out["v"] == 2, "authority"].iloc[0] == 1.0
