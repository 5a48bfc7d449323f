"""Tiered segment merge (SURVEY.md §7 step 5).

Policy constants mirror the reference's tiered merge policy defaults
(index/MergePolicyConfig.java:123-130,150-151): at most `segments_per_tier`
(10) live segments per size tier, merges pick up to `max_merge_at_once` (10)
smallest live segments, segments above `max_merged_docs` don't participate
(the 5GB max-merged-segment analog, expressed in docs here), with merges
scheduled like ElasticsearchConcurrentMergeScheduler but as Ray tasks.

Merging is cheap relative to a rebuild because doc ranges of input segments
are disjoint and ordered: each term's encoded rows simply concatenate in doc
order and re-encode (no re-sort of postings, no re-tokenization). Hot-term
salt chunks are preserved: rows merge per (term, chunk), so a merged segment
keeps the same bounded-row-size guarantee the build produced.

Per-doc norms needed for block-min-norm metadata are looked up from a
broadcast dense norm array (`ray.put` once, read per task). At cluster scale
the array slice is bounded by the merged segments' doc range — each merge
group only needs its own range's norms.

Output is a new committed segment whose manifest records `merged_from`;
inputs stay on disk until `gc_merged` removes superseded segments
(soft-delete analog of the reference's deletion policy,
index/engine/CombinedDeletionPolicy.java)."""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from ..codec import varbyte_decode
from ..smallfloat import DECODE_TABLE
from .manifest import (
    SegmentManifest,
    commit_segment,
    committed_segments,
    live_segments,
    tmp_segment_dir,
)

SEGMENTS_PER_TIER = 10  # MergePolicyConfig.java:150 (segments_per_tier default)
MAX_MERGE_AT_ONCE = 10  # MergePolicyConfig.java:123 (max_merge_at_once default)


def _merge_rows_table(table: pa.Table, norm_bytes: np.ndarray,
                      base: int = 0) -> pa.Table:
    """Re-encode the union of postings rows: concat per (term, chunk).

    Vectorized end to end by reusing the build path's bulk encoder
    (stages/encode.py:encode_bucket): single-source rows pass through
    unchanged as one `take`; rows needing a merge are bulk-DECODED with one
    varbyte pass over the concatenated byte streams (binary-column buffers
    are contiguous, and varbyte streams concatenate value-exactly), turned
    back into (term, chunk, doc_id, tf, positions) triples, and re-encoded in
    one encode_bucket call. No per-row Python dict work."""
    import pyarrow.compute as pc

    from ..stages.encode import POSTINGS_SCHEMA

    if len(table) == 0:
        return POSTINGS_SCHEMA.empty_table()
    # sort by (term, chunk, first-doc) — doc ranges of input segments are
    # disjoint, and skip_last_doc[-1] is each row's LAST doc id, which orders
    # rows identically to first-doc for disjoint ranges
    last_doc = np.array([v[-1] for v in table["skip_last_doc"].to_pylist()],
                        dtype=np.int64)
    table = table.append_column("_last_doc", pa.array(last_doc))
    order = pc.sort_indices(
        table, sort_keys=[("term", "ascending"), ("chunk", "ascending"),
                          ("_last_doc", "ascending")]
    )
    t = table.take(order).drop_columns(["_last_doc"]).combine_chunks()
    terms = np.asarray(t["term"])
    chunks = t["chunk"].to_numpy()
    n = len(t)
    change = np.empty(n, dtype=bool)
    change[0] = True
    if n > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    group_lens = ends - starts

    single = starts[group_lens == 1]
    passthrough = t.select(POSTINGS_SCHEMA.names).take(pa.array(single)) \
        if single.size else POSTINGS_SCHEMA.empty_table()

    multi_starts = starts[group_lens > 1]
    if multi_starts.size == 0:
        return passthrough.cast(POSTINGS_SCHEMA)
    multi_rows = np.concatenate([
        np.arange(s, e) for s, e in zip(multi_starts, ends[group_lens > 1])
    ])
    m = t.take(pa.array(multi_rows)).combine_chunks()
    dfs = m["df"].to_numpy().astype(np.int64)
    sum_tfs = m["sum_tf"].to_numpy().astype(np.int64)

    def _flat_binary(col) -> np.ndarray:
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.frombuffer(b"".join(col.to_pylist()), dtype=np.uint8)

    # one varbyte pass per stream over ALL merged rows
    doc_deltas = varbyte_decode(_flat_binary(m["doc_bytes"]), int(dfs.sum())).astype(np.int64)
    tfs_flat = varbyte_decode(_flat_binary(m["tf_bytes"]), int(dfs.sum())).astype(np.int64)
    # absolutize doc ids: delta streams restart per row (first = doc0 + 1)
    row_cuts = np.zeros(dfs.size + 1, dtype=np.int64)
    np.cumsum(dfs, out=row_cuts[1:])
    tot = np.cumsum(doc_deltas)
    corr = np.concatenate([[0], tot[row_cuts[1:-1] - 1]]) if dfs.size > 1 else np.array([0])
    doc_ids = tot - np.repeat(corr, dfs) - 1

    # positions: decode once; per-doc delta restart -> absolutize with the
    # global per-doc cuts (tf runs)
    pos_flat_abs = None
    pos_bytes_flat = _flat_binary(m["pos_bytes"])
    if pos_bytes_flat.size:
        pos_deltas = varbyte_decode(pos_bytes_flat, int(sum_tfs.sum())).astype(np.int64)
        doc_cuts = np.cumsum(tfs_flat)
        ptot = np.cumsum(pos_deltas)
        if tfs_flat.size > 1:
            pcorr = np.concatenate([[0], ptot[doc_cuts[:-1] - 1]])
            ptot = ptot - np.repeat(pcorr, tfs_flat)
        pos_flat_abs = ptot

    rep = np.repeat(np.arange(len(m)), dfs)
    triples = {
        "term": pc.take(m["term"], pa.array(rep)),
        "chunk": pc.take(m["chunk"], pa.array(rep)),
        "doc_id": pa.array(doc_ids),
        "tf": pa.array(tfs_flat.astype(np.int32)),
        "norm_len": pa.array(
            DECODE_TABLE[norm_bytes[doc_ids - base]].astype(np.int32)),
    }
    if pos_flat_abs is not None:
        offsets = np.zeros(doc_ids.size + 1, dtype=np.int64)
        np.cumsum(tfs_flat, out=offsets[1:])
        triples["positions"] = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(pos_flat_abs.astype(np.int32)))
    from ..stages.encode import encode_bucket

    merged = encode_bucket(pa.table(triples))
    return pa.concat_tables([passthrough.cast(POSTINGS_SCHEMA), merged])


def merge_segments(
    index_dir: str,
    segment_ids: list[str] | None = None,
    *,
    max_merge_at_once: int = MAX_MERGE_AT_ONCE,
    num_buckets: int | None = None,
    max_merged_docs: int | None = None,
) -> str | None:
    """Merge a group of live segments into one; returns new segment id.
    `max_merged_docs` is the MergePolicyConfig max-merged-segment analog:
    candidate windows whose combined doc_count exceeds it are skipped
    (narrower windows are then considered)."""
    import ray
    import ray.data as rd

    if num_buckets is None:
        # the re-encode is CPU-bound per bucket group: at the old fixed 16
        # buckets a 10x10k-doc merge ran 40.6 s on 32 CPUs (16-way parallel
        # ceiling); 2 buckets/CPU cut it to 11.6 s. Buckets only shape
        # parallelism — postings are re-grouped by term inside each bucket.
        num_buckets = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    segs = live_segments(committed_segments(index_dir))
    by_range = sorted(segs.items(), key=lambda kv: kv[1].doc_id_min)
    if segment_ids is None:
        if len(segs) < 2:
            return None
        # tiered policy over ADJACENT doc ranges: doc_ids are global and never
        # renumbered, so only consecutive segments may merge (keeps every
        # term's posting rows disjoint AND ordered). Pick the consecutive
        # window with the smallest total doc_count (smallest-first tiering).
        n = min(max_merge_at_once, len(by_range))
        best, best_docs = None, None
        for w in range(n, 1, -1):
            for i in range(len(by_range) - w + 1):
                window = by_range[i : i + w]
                docs = sum(m.doc_count for _, m in window)
                if max_merged_docs is not None and docs > max_merged_docs:
                    continue  # over the max-merged-segment budget
                if best_docs is None or docs < best_docs:
                    best, best_docs = [k for k, _ in window], docs
            if best is not None:
                break
        if best is None:
            return None  # every window exceeds max_merged_docs
        segment_ids = best
    else:
        # explicit group must be consecutive among live segments
        mins = sorted(segs[s].doc_id_min for s in segment_ids)
        in_span = [
            k
            for k, m in by_range
            if mins[0] <= m.doc_id_min <= mins[-1]
        ]
        if sorted(segment_ids) != sorted(in_span):
            raise ValueError(
                "merge group must be consecutive in doc_id range; "
                f"requested {sorted(segment_ids)} but span contains {sorted(in_span)}"
            )
    if segment_ids is None or len(segment_ids) < 2:
        return None
    group = {sid: segs[sid] for sid in segment_ids}
    flags = {(m.analyzer, m.index_positions) for m in group.values()}
    if len(flags) > 1:
        raise ValueError(
            "cannot merge segments with mixed analyzer/index_positions "
            f"settings: {sorted(flags)}")
    gen = max(m.generation for m in group.values()) + 1
    lo = min(m.doc_id_min for m in group.values())
    new_id = f"seg_{lo:012d}_g{gen}"
    tmp = tmp_segment_dir(index_dir, new_id)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "docmeta"), exist_ok=True)
    t0 = time.time()

    # docmeta: copy input files (content unchanged by merge)
    for sid in segment_ids:
        src = os.path.join(index_dir, sid, "docmeta")
        for f in os.listdir(src):
            shutil.copy(os.path.join(src, f), os.path.join(tmp, "docmeta", f"{sid}-{f}"))

    # dense norm array over the group's doc range (broadcast once)
    metas = [
        pads.dataset(os.path.join(index_dir, sid, "docmeta")).to_table(
            columns=["doc_id", "norm_byte"]
        )
        for sid in segment_ids
    ]
    max_doc = max(m.doc_id_max for m in group.values())
    # dense ONLY over the group's own doc range (O(group docs), offset by
    # lo) — never O(global max doc id), which at 10^12 docs would be TBs
    norm_bytes = np.zeros(max_doc - lo + 1, dtype=np.uint8)
    for mt in metas:
        norm_bytes[mt["doc_id"].to_numpy() - lo] = \
            mt["norm_byte"].to_numpy().astype(np.uint8)
    norm_ref = ray.put(norm_bytes)

    from ..sources.reader import list_parquet_files

    posting_files = [
        f
        for sid in segment_ids
        for f in list_parquet_files(os.path.join(index_dir, sid, "postings"))
    ]
    ds = rd.read_parquet(posting_files)

    def add_bucket(t: pa.Table) -> pa.Table:
        import zlib

        b = np.array(
            [zlib.crc32(s.encode()) % num_buckets for s in np.asarray(t["term"])],
            dtype=np.int32,
        )
        return t.append_column("bucket", pa.array(b))

    def merge_bucket(t: pa.Table) -> pa.Table:
        nb = ray.get(norm_ref)
        return _merge_rows_table(t.drop_columns(["bucket"]), nb, base=lo)

    merged = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
    merged.write_parquet(os.path.join(tmp, "postings"))

    frag_union = [f for sid in segment_ids for f in group[sid].fragments]
    manifest = SegmentManifest(
        segment_id=new_id,
        fragments=frag_union,
        doc_count=sum(m.doc_count for m in group.values()),
        sum_doc_len=sum(m.sum_doc_len for m in group.values()),
        term_count=0,  # filled below
        doc_id_min=lo,
        doc_id_max=max_doc,
        analyzer=next(iter(group.values())).analyzer,
        index_positions=next(iter(group.values())).index_positions,
        build_seconds=time.time() - t0,
        generation=gen,
        merged_from=sorted(segment_ids),
    )
    import pyarrow.compute as pc

    pt = pads.dataset(os.path.join(tmp, "postings")).to_table(columns=["term"])
    manifest.term_count = pc.count_distinct(pt["term"]).as_py() if len(pt) else 0
    commit_segment(index_dir, new_id, manifest)
    return new_id


def force_merge(index_dir: str, max_num_segments: int = 1, **kw) -> list[str]:
    """ES `_forcemerge` analog: merge until <= max_num_segments live."""
    out = []
    while True:
        live = live_segments(committed_segments(index_dir))
        if len(live) <= max_num_segments:
            return out
        new = merge_segments(index_dir, **kw)
        if new is None:
            return out
        out.append(new)


def maybe_merge(index_dir: str, segments_per_tier: int = SEGMENTS_PER_TIER, **kw) -> list[str]:
    """Background-merge analog: merge only when the live count exceeds the
    per-tier budget."""
    out = []
    while len(live_segments(committed_segments(index_dir))) > segments_per_tier:
        new = merge_segments(index_dir, **kw)
        if new is None:
            break
        out.append(new)
    return out


def gc_merged(index_dir: str) -> list[str]:
    """Delete segments superseded by a committed merge."""
    segs = committed_segments(index_dir)
    live = live_segments(segs)
    removed = []
    for sid in segs:
        if sid not in live:
            shutil.rmtree(os.path.join(index_dir, sid), ignore_errors=True)
            removed.append(sid)
    return removed
