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
import pyarrow as pa


def _vb_agg(ds, val: str, how: str, num_buckets: int = 64):
    """groupby("v").<how>(val) through the bucketed exchange — vertex
    cardinality ~ row cardinality, exactly the per-GROUP-cost regime
    Ray's sort groupby mishandles (exchange.py; SCALE.md Round-4).
    Output columns (v, <how>(<val>)) match Ray's native naming."""
    from .exchange import bucketed_agg

    return bucketed_agg(ds, ["v"], val, how, num_buckets=num_buckets)


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

    labels = _vb_agg(adj.map_batches(seed, batch_format="pyarrow"),
                     "l", "min", num_buckets).materialize()
    labels = labels.map_batches(
        lambda t: pa.table({"v": t["v"], "l": t["min(l)"]}),
        batch_format="pyarrow").materialize()

    def tag_labels(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        return pa.table({"bkt": v % num_buckets, "v": v,
                         "u": np.full(v.shape, -1, dtype=np.int64),
                         "l": t["l"]})

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        l = g["l"].to_numpy()
        is_lab = u == -1
        lv, ll = v[is_lab], l[is_lab]
        order = np.argsort(lv, kind="stable")
        lv, ll = lv[order], ll[order]
        nv, nu = v[~is_lab], u[~is_lab]
        # every adjacency source vertex has a seeded label
        nl = ll[np.searchsorted(lv, nv)]
        return pa.table({"v": np.concatenate([nu, lv]).astype(np.int64),
                         "l": np.concatenate([nl, ll]).astype(np.int64)})

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

    def per_bucket_jump(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        l = g["l"].to_numpy()
        is_lab = u == -1
        lv, ll = v[is_lab], l[is_lab]
        order = np.argsort(lv, kind="stable")
        lv, ll = lv[order], ll[order]
        qv, qu = v[~is_lab], u[~is_lab]
        return pa.table({"v": qv.astype(np.int64),
                         "l": ll[np.searchsorted(lv, qu)].astype(np.int64)})

    prev_sum = None
    for _ in range(max_iters):
        tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        msgs = adj.union(tagged).groupby("bkt").map_groups(
            per_bucket, batch_format="pyarrow")
        mins = _vb_agg(msgs, "l", "min", num_buckets).map_batches(
            lambda t: pa.table({"v": t["v"], "l": t["min(l)"]}),
            batch_format="pyarrow").materialize()  # consumed twice below
        # pointer jump: l(v) <- l(l(v)); every l(v) is a vertex, so the
        # lookup always hits
        new_labels = (mins.map_batches(tag_lookup, batch_format="pyarrow")
                      .union(mins.map_batches(tag_query,
                                              batch_format="pyarrow"))
                      .groupby("bkt").map_groups(per_bucket_jump,
                                                 batch_format="pyarrow")
                      .materialize())
        s = new_labels.sum("l")  # one scalar to the driver
        labels = new_labels
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["v"], "component": t["l"]}),
        batch_format="pyarrow")


def anti_join_ids(ds, ids, *, id_col: str = "doc_id",
                  ids_col: str = "doc_id", num_buckets: int = 32):
    """Distributed anti-join: keep `ds` rows whose `id_col` does NOT appear
    in the `ids` Dataset's `ids_col`. ONE bucketed exchange on the corpus
    (the scale-canonical shape when the drop list is too big to broadcast —
    at web dup rates the drop list is ~40% of the corpus). The drop side
    ships as bare int64 rows padded with typed nulls so both sides union
    into one exchange; payload columns shuffle exactly once."""
    import pyarrow.compute as pc

    # need a true Arrow schema to type the null padding; pandas-block
    # datasets (from_pandas) report Python/numpy types, so coerce through
    # a no-op pyarrow map_batches before probing
    base = getattr(ds.schema(), "base_schema", None)
    if not isinstance(base, pa.Schema):
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        base = ds.schema().base_schema
    names = list(base.names)
    types = dict(zip(base.names, base.types))

    def tag_left(t: pa.Table) -> pa.Table:
        v = t[id_col].cast(pa.int64()).to_numpy()
        cols = {n: t[n] for n in names}
        cols["bkt"] = pa.array(v % num_buckets)
        cols["__drop"] = pa.array(np.zeros(len(v), dtype=np.int8))
        return pa.table(cols)

    def tag_drop(t: pa.Table) -> pa.Table:
        v = t[ids_col].cast(pa.int64()).to_numpy()
        cols = {n: (pa.array(v, types[n]) if n == id_col
                    else pa.nulls(len(v), types[n])) for n in names}
        cols["bkt"] = pa.array(v % num_buckets)
        cols["__drop"] = pa.array(np.ones(len(v), dtype=np.int8))
        return pa.table(cols)

    left = ds.map_batches(tag_left, batch_format="pyarrow")
    right = ids.map_batches(tag_drop, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        is_drop = pc.equal(g["__drop"], pa.scalar(1, pa.int8()))
        drop_ids = g.filter(is_drop)[id_col]
        keep = g.filter(pc.invert(is_drop))
        mask = pc.invert(pc.is_in(keep[id_col], value_set=drop_ids.combine_chunks()))
        return (keep.filter(mask).drop_columns(["bkt", "__drop"])
                .replace_schema_metadata(None))

    return (left.union(right).groupby("bkt")
            .map_groups(per_bucket, batch_format="pyarrow"))


def dedup_keep_representatives(ds, pairs, *, id_col: str = "doc_id",
                               a_col: str = "doc_a", b_col: str = "doc_b",
                               num_buckets: int = 32):
    """End-to-end keep-one-per-cluster: duplicate pairs -> connected
    components (distributed, above) -> drop every non-representative member
    (component != doc_id) from the corpus with one anti-join exchange. The
    driver never sees pairs, components, or texts."""
    comps = connected_components(pairs, a_col=a_col, b_col=b_col,
                                 num_buckets=num_buckets)
    def _drops(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        dup = pc.not_equal(t["doc_id"], t["component"])
        return pa.table({"doc_id": t["doc_id"].filter(dup)})

    drops = comps.map_batches(_drops, batch_format="pyarrow")
    return anti_join_ids(ds, drops, id_col=id_col, ids_col="doc_id",
                         num_buckets=num_buckets)


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, damping: float = 0.85, num_buckets: int = 16,
             scale_bits: int = 40):
    """Distributed PageRank (Brin & Page 1998, public) in FIXED-POINT
    arithmetic: ranks are int64 multiples of 2^-scale_bits, so every
    exchange sums INTEGERS — order-invariant, which makes the result
    bit-identical between Ray's per-block combiners and the SQL oracle's
    scan-order sums (float PageRank differs in the last ulp depending on
    summation order; quantized PageRank converges to the same vector to
    ~1e-12 at 40 bits).

    Exchange shape per iteration (the connected_components idiom —
    bucketed groupby co-grouping, no join operator):
      1. rank rows (bkt = v %% B) union the static edge table (bkt =
         src %% B) -> groupby(bkt).map_groups emits per-edge integer
         contributions R(src) // outdeg(src) plus one dangling partial
         per bucket;
      2. contributions union zero seeds carrying each vertex's out-degree
         -> groupby(dst) Sum/Max rebuilds the rank table.
    The dangling mass is the only driver scalar. Out-degrees ride inside
    the rank table so the degree join happens once, not per iteration.
    Returns Dataset (v, r) with r = R / 2^scale_bits."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Max, Sum

    S = 1 << scale_bits

    def route_edges(t: pa.Table) -> pa.Table:
        src = t[src_col].cast(pa.int64()).to_numpy()
        dst = t[dst_col].cast(pa.int64()).to_numpy()
        return pa.table({"bkt": pa.array(src % num_buckets, pa.int64()),
                         "src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64()),
                         "rq": pa.array(np.full(src.size, -1), pa.int64()),
                         "outdeg": pa.array(np.full(src.size, -1),
                                            pa.int64())})

    # collapse block count first: the iteration exchanges pay per-block
    # fixed costs, and upstream readers often emit many tiny blocks
    ed = (edges.map_batches(route_edges, batch_format="pyarrow")
          .repartition(num_buckets).materialize())

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": pa.array(np.concatenate([t["src"].to_numpy(),
                                          t["dst"].to_numpy()]), pa.int64()),
            "d": pa.array(np.concatenate([
                np.ones(t.num_rows, np.int64),
                np.zeros(t.num_rows, np.int64)]), pa.int64())})

    vd = _vb_agg(ed.map_batches(endpoints, batch_format="pyarrow"),
                 "d", "sum").materialize()
    n_int = vd.count()
    n = float(n_int)
    r0 = S // n_int
    ranks = vd.map_batches(
        lambda t: pa.table({"v": t["v"].cast(pa.int64()),
                            "rq": pa.array(np.full(t.num_rows, r0,
                                                   np.int64)),
                            "outdeg": t["sum(d)"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def rank_rows(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        return pa.table({"bkt": pa.array(v % num_buckets, pa.int64()),
                         "src": pa.array(v, pa.int64()),
                         "dst": pa.array(np.full(v.size, -1), pa.int64()),
                         "rq": t["rq"], "outdeg": t["outdeg"]})

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        rk = g[g["dst"] == -1]
        eg = g[g["dst"] != -1]
        rmap = dict(zip(rk["src"],
                        rk["rq"] // np.maximum(rk["outdeg"], 1)))
        dang = int(rk.loc[rk["outdeg"] == 0, "rq"].sum())
        c = eg["src"].map(rmap).to_numpy(dtype=np.int64)
        return pa.table({
            "dst": pa.array(np.concatenate([eg["dst"].to_numpy(),
                                            [-1]]).astype(np.int64)),
            "c": pa.array(np.concatenate([c, [dang]]).astype(np.int64)),
            "outdeg": pa.array(np.full(len(eg) + 1, -1, np.int64))})

    base = np.int64(np.floor((1 - damping) * S / n))
    for _ in range(iters):
        ct = (ranks.map_batches(rank_rows, batch_format="pyarrow")
              .union(ed).groupby("bkt").map_groups(contribs).materialize())
        dm = int(ct.map_batches(
            lambda t: pa.table({"dm": t.filter(
                pa.compute.equal(t["dst"], -1))["c"]}),
            batch_format="pyarrow").sum("dm") or 0)
        dm_div = dm // n_int
        seeds = ranks.map_batches(
            lambda t: pa.table({"dst": t["v"],
                                "c": pa.array(np.zeros(t.num_rows,
                                                       np.int64)),
                                "outdeg": t["outdeg"]}),
            batch_format="pyarrow")
        def _dst_bucket(t: pa.Table) -> pa.Table:
            d = t["dst"].to_numpy()
            return t.append_column(
                "_db", pa.array((d % 64).astype(np.int64)))

        def _merge_dst(g):
            out = g.groupby("dst", as_index=False).agg(
                c=("c", "sum"), outdeg=("outdeg", "max"))
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)

        # bucketed dst-cardinality merge (vertex count ~ row count:
        # the per-GROUP-cost regime — see _vb_agg)
        agg = (ct.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["dst"], -1)),
            batch_format="pyarrow")
            .union(seeds)
            .map_batches(_dst_bucket, batch_format="pyarrow")
            .groupby("_db").map_groups(_merge_dst, batch_format="pandas"))
        ranks = agg.map_batches(
            lambda t, dm_div=dm_div: pa.table({
                "v": t["dst"].cast(pa.int64()),
                "rq": pa.array(base + np.floor(damping * (
                    t["c"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) + dm_div)).astype(np.int64)),
                "outdeg": t["outdeg"].cast(pa.int64())}),
            batch_format="pyarrow").materialize()
    return ranks.map_batches(
        lambda t: pa.table({
            "v": t["v"],
            "r": pa.array(t["rq"].to_numpy().astype(np.float64) / S)}),
        batch_format="pyarrow")


def hits(edges, *, src_col: str = "src", dst_col: str = "dst",
         iters: int = 2, num_buckets: int = 16, scale_bits: int = 20):
    """HITS hubs/authorities (Kleinberg 1999, public) in fixed-point:
    scores are int64 multiples of 2^-scale_bits normalized by the current
    MAX each half-step, so every exchange sums integers (order-invariant,
    bit-identical to the SQL twin) and values stay < 2^40.

    Per iteration: authority(v) = sum of hub(u) over u->v (one bucketed
    co-group routed by src), max-normalize (driver scalar); hub(v) = sum
    of authority(w) over v->w (second co-group routed by dst),
    max-normalize. Returns Dataset (v, hub, authority) as floats of the
    final fixed-point scores."""
    import pandas as pd
    import pyarrow as pa

    S = 1 << scale_bits

    def route(t: pa.Table, key: str) -> pa.Table:
        k = t[key].cast(pa.int64()).to_numpy()
        return pa.table({"bkt": pa.array(k % num_buckets, pa.int64()),
                         "src": t[src_col].cast(pa.int64()),
                         "dst": t[dst_col].cast(pa.int64()),
                         "s": pa.array(np.full(k.size, -1), pa.int64())})

    ed_src = edges.map_batches(lambda t: route(t, src_col),
                               batch_format="pyarrow") \
        .repartition(num_buckets).materialize()
    ed_dst = edges.map_batches(lambda t: route(t, dst_col),
                               batch_format="pyarrow") \
        .repartition(num_buckets).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        v = np.unique(np.concatenate([t["src"].to_numpy(),
                                      t["dst"].to_numpy()]))
        return pa.table({"v": pa.array(v, pa.int64())})

    verts = (_vb_agg(ed_src.map_batches(endpoints,
                                        batch_format="pyarrow"),
                     "v", "count")
             .map_batches(lambda t: t.select(["v"]),
                          batch_format="pyarrow").materialize())

    def seed(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["v"],
                         "s": pa.array(np.full(t.num_rows, S, np.int64))})

    hub = verts.map_batches(seed, batch_format="pyarrow").materialize()
    auth = hub

    def score_rows(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy()
        return pa.table({"bkt": pa.array(v % num_buckets, pa.int64()),
                         "src": pa.array(v, pa.int64()),
                         "dst": pa.array(np.full(v.size, -1), pa.int64()),
                         "s": t["s"]})

    def push(g: pd.DataFrame, out_key: str) -> pd.DataFrame:
        sc = g[g["dst"] == -1]
        eg = g[g["dst"] != -1]
        smap = dict(zip(sc["src"], sc["s"]))
        tgt = eg["dst"] if out_key == "dst" else eg["src"]
        lookup = eg["src"] if out_key == "dst" else eg["dst"]
        return pa.table({
            "v": pa.array(tgt.to_numpy(dtype=np.int64)),
            "s": pa.array(lookup.map(smap).to_numpy(dtype=np.int64))})

    def half_step(scores, ed, out_key):
        # scores routed by their own vertex = the co-group's lookup side
        pushed = (scores.map_batches(score_rows, batch_format="pyarrow")
                  .union(ed).groupby("bkt")
                  .map_groups(lambda g, k=out_key: push(g, k))
                  .map_batches(lambda t: t, batch_format="pyarrow")
                  .union(verts.map_batches(
                      lambda t: pa.table({
                          "v": t["v"],
                          "s": pa.array(np.zeros(t.num_rows, np.int64))}),
                      batch_format="pyarrow")))
        agg = (_vb_agg(pushed, "s", "sum")
               .map_batches(lambda t: pa.table({
                   "v": t["v"].cast(pa.int64()),
                   "s": t["sum(s)"].cast(pa.int64())}),
                   batch_format="pyarrow").materialize())
        mx = int(agg.max("s") or 1) or 1
        return agg.map_batches(
            lambda t, mx=mx: pa.table({
                "v": t["v"],
                "s": pa.array(t["s"].to_numpy() * S // mx)}),
            batch_format="pyarrow").materialize()

    for _ in range(iters):
        # hubs routed by v == edge src bucket: authority(dst) += hub(src)
        auth = half_step(hub, ed_src, "dst")
        # auths routed by v == edge dst bucket: hub(src) += authority(dst)
        hub = half_step(auth, ed_dst, "src")

    hub_t = hub.map_batches(
        lambda t: pa.table({"v": t["v"], "hub": pa.array(
            t["s"].to_numpy().astype(np.float64) / S)}),
        batch_format="pyarrow").to_pandas()
    auth_t = auth.map_batches(
        lambda t: pa.table({"v": t["v"], "authority": pa.array(
            t["s"].to_numpy().astype(np.float64) / S)}),
        batch_format="pyarrow").to_pandas()
    return hub_t.merge(auth_t, on="v").sort_values("v").reset_index(drop=True)
