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

from ..codec import encode_postings, varbyte_decode
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


def _merge_rows_table(table: pa.Table, norm_bytes: np.ndarray) -> pa.Table:
    """Re-encode the union of postings rows: concat per (term, chunk)."""
    import pyarrow.compute as pc

    from ..stages.encode import POSTINGS_SCHEMA

    if len(table) == 0:
        return POSTINGS_SCHEMA.empty_table()
    order = pc.sort_indices(
        table, sort_keys=[("term", "ascending"), ("chunk", "ascending")]
    )
    t = table.take(order).combine_chunks()
    terms = np.asarray(t["term"])
    chunks = t["chunk"].to_numpy()
    change = np.empty(len(t), dtype=bool)
    change[0] = True
    if len(t) > 1:
        change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(t))

    rows: dict[str, list] = {n: [] for n in POSTINGS_SCHEMA.names}
    cols = {c: t[c].to_pylist() for c in t.column_names}
    norms_decoded = DECODE_TABLE[norm_bytes]
    for s, e in zip(starts, ends):
        group = [
            {c: cols[c][i] for c in t.column_names} for i in range(s, e)
        ]
        if len(group) == 1:
            r = group[0]  # single row: pass through unchanged
            for n in POSTINGS_SCHEMA.names:
                rows[n].append(r[n])
            continue
        decoded = []
        has_pos = any(r["pos_bytes"] for r in group)
        for r in group:
            deltas = varbyte_decode(r["doc_bytes"], r["df"]).astype(np.int64)
            ids = np.cumsum(deltas) - 1
            tfs = varbyte_decode(r["tf_bytes"], r["df"]).astype(np.int64)
            pos = varbyte_decode(r["pos_bytes"]).astype(np.int64) if r["pos_bytes"] else None
            decoded.append((ids, tfs, pos))
        decoded.sort(key=lambda x: int(x[0][0]))
        ids = np.concatenate([d[0] for d in decoded])
        tfs = np.concatenate([d[1] for d in decoded])
        positions = None
        if has_pos:
            # pos deltas restart at each doc, so per-row delta streams can be
            # concatenated then re-absolutized per doc at encode time; decode
            # to absolutes first (cheap: cumsum within doc boundaries)
            abs_parts = []
            for d_ids, d_tfs, pd in decoded:
                # segmented cumsum: deltas restart at each doc boundary
                cuts = np.cumsum(d_tfs)
                total = np.cumsum(pd)
                corr = np.zeros(pd.size, dtype=np.int64)
                if d_tfs.size > 1:
                    corr_vals = np.concatenate([[0], total[cuts[:-1] - 1]])
                    corr = np.repeat(corr_vals, d_tfs)
                abs_parts.append(total - corr)
            positions = np.concatenate(abs_parts)
        enc = encode_postings(ids, tfs, norms=norms_decoded[ids], positions=positions)
        rows["term"].append(str(terms[s]))
        rows["chunk"].append(int(chunks[s]))
        rows["df"].append(enc.df)
        rows["sum_tf"].append(enc.sum_tf)
        rows["doc_bytes"].append(enc.doc_bytes)
        rows["tf_bytes"].append(enc.tf_bytes)
        rows["pos_bytes"].append(enc.pos_bytes)
        rows["skip_last_doc"].append(enc.skip_last_doc.tolist())
        rows["skip_doc_off"].append(enc.skip_doc_off.tolist())
        rows["skip_tf_off"].append(enc.skip_tf_off.tolist())
        rows["skip_pos_off"].append(enc.skip_pos_off.tolist())
        rows["skip_max_tf"].append(enc.skip_max_tf.tolist())
        rows["skip_min_norm"].append(enc.skip_min_norm.tolist())
    return pa.table(rows, schema=POSTINGS_SCHEMA)


def merge_segments(
    index_dir: str,
    segment_ids: list[str] | None = None,
    *,
    max_merge_at_once: int = MAX_MERGE_AT_ONCE,
    num_buckets: int = 16,
) -> str | None:
    """Merge a group of live segments into one; returns new segment id."""
    import ray
    import ray.data as rd

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
                if best_docs is None or docs < best_docs:
                    best, best_docs = [k for k, _ in window], docs
            if best is not None:
                break
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
    norm_bytes = np.zeros(max_doc + 1, dtype=np.uint8)
    for mt in metas:
        norm_bytes[mt["doc_id"].to_numpy()] = mt["norm_byte"].to_numpy().astype(np.uint8)
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
        return _merge_rows_table(t.drop_columns(["bucket"]), nb)

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
