"""Distributed connected components over an edge Dataset — the clustering
step after near-dup pair generation (MinHash/SimHash/Jaccard pairs →
duplicate CLUSTERS → keep one representative per cluster).

Algorithm: min-label propagation with pointer jumping. labels start as
vertex ids; each round (a) co-groups the (static) adjacency with the
current labels in ONE bucketed exchange (`v % num_buckets`, the repo's
standard exchange idiom — see functions/temporal.py), sends each vertex's
label to its neighbours with a vectorized in-bucket lookup, and reduces
per vertex with a native groupby-min; then (b) compresses the label
forest one step, l(v) <- l(l(v)), with a second vertex-sized exchange
(route the row to l(v)'s bucket, look the label up there). Step (b) is
classic parallel pointer jumping: it halves label-tree depth every round,
so convergence is O(log diameter) rounds instead of O(diameter) — a
pathological 1M-vertex chain converges in ~20 rounds, and near-dup
clusters (near-cliques) in 2-3. Labels are monotonically non-increasing
(l(x) <= x always), so the global label SUM is a convergence certificate:
the loop stops when it stops decreasing (the driver sees ONE scalar per
round, never the data).

Deliberately avoids `Dataset.join`: Ray's hash-join finalize builds empty
partitions as zero-column tables, which crashes the pyarrow join whenever a
partition receives no rows (small inputs / skewed hashing). The bucketed
map_groups exchange has no such failure mode and is partition-invariant.

Each round's label Dataset is materialize()d: it is vertex-sized (small
relative to the corpus), is consumed twice (messages + convergence sum),
and without pinning, Ray's lazy graph would re-execute the whole chain
every iteration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 10, num_buckets: int = 32):
    """Returns a Dataset of (doc_id, component) — component = min vertex id
    of the connected component. Vertices are the edge endpoints (isolated
    docs are not edges and keep themselves, trivially)."""

    def adjacency(t: pa.Table) -> pa.Table:
        a = t[a_col].cast(pa.int64()).to_numpy()
        b = t[b_col].cast(pa.int64()).to_numpy()
        v = np.concatenate([a, b])
        u = np.concatenate([b, a])
        return pa.table({"bkt": v % num_buckets, "v": v, "u": u,
                         "l": np.full(v.shape, -1, dtype=np.int64)})

    # static: both edge directions, routed by source vertex
    adj = edges.map_batches(adjacency, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["v"], "l": t["v"]})

    labels = (adj.map_batches(seed, batch_format="pyarrow")
              .groupby("v").min("l").materialize())
    labels = labels.map_batches(
        lambda t: pa.table({"v": t["v"], "l": t["min(l)"]}),
        batch_format="pyarrow").materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        return pa.table({"bkt": v % num_buckets, "v": v,
                         "u": np.full(v.shape, -1, dtype=np.int64),
                         "l": t["l"]})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["u"] == -1]
        nbr = g[g["u"] != -1]
        # every adjacency source vertex has a seeded label
        lut = pd.Series(lab["l"].to_numpy(), index=lab["v"].to_numpy())
        out_v = np.concatenate([nbr["u"].to_numpy(), lab["v"].to_numpy()])
        out_l = np.concatenate([lut.reindex(nbr["v"].to_numpy()).to_numpy(),
                                lab["l"].to_numpy()])
        return pd.DataFrame({"v": out_v.astype(np.int64),
                             "l": out_l.astype(np.int64)})

    def tag_lookup(t: pa.Table) -> pa.Table:
        # label rows parked in their own vertex's bucket, serving lookups
        v = t["v"].to_numpy()
        return pa.table({"bkt": v % num_buckets, "v": v,
                         "u": np.full(v.shape, -1, dtype=np.int64),
                         "l": t["l"]})

    def tag_query(t: pa.Table) -> pa.Table:
        # row (v, l) routed to l's bucket to fetch l(l)
        lv = t["l"].to_numpy()
        return pa.table({"bkt": lv % num_buckets, "v": t["v"], "u": lv,
                         "l": np.full(lv.shape, -1, dtype=np.int64)})

    def per_bucket_jump(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["u"] == -1]
        q = g[g["u"] != -1]
        lut = pd.Series(lab["l"].to_numpy(), index=lab["v"].to_numpy())
        return pd.DataFrame({
            "v": q["v"].to_numpy().astype(np.int64),
            "l": lut.reindex(q["u"].to_numpy()).to_numpy().astype(np.int64)})

    prev_sum = None
    for _ in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        msgs = adj.union(tagged).groupby("bkt").map_groups(
            per_bucket, batch_format="pandas")
        mins = msgs.groupby("v").min("l").map_batches(
            lambda t: pa.table({"v": t["v"], "l": t["min(l)"]}),
            batch_format="pyarrow").materialize()  # consumed twice below
        # pointer jump: l(v) <- l(l(v)); every l(v) is a vertex, so the
        # lookup always hits
        new_labels = (mins.map_batches(tag_lookup, batch_format="pyarrow")
                      .union(mins.map_batches(tag_query,
                                              batch_format="pyarrow"))
                      .groupby("bkt").map_groups(per_bucket_jump,
                                                 batch_format="pandas")
                      .materialize())
        s = new_labels.sum("l")  # one scalar to the driver
        labels = new_labels
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["v"], "component": t["l"]}),
        batch_format="pyarrow")
