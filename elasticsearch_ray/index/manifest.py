"""Per-segment lineage manifests + atomic commit (checkpoint/resume).

The reference's durability/resume primitive is the per-shard translog +
checkpoint file ({offset, numOps, generation, minSeqNo, maxSeqNo,
globalCheckpoint}, index/translog/Checkpoint.java:43-52) — ops beyond the
local checkpoint are replayed on restart (index/shard/IndexShard.java:1441).
A deterministic batch build replaces the WAL with *lineage*: every committed
segment records exactly which input fragments produced it, so a rerun skips
partitions whose manifest is committed and rebuilds the rest byte-identically
(SURVEY.md §4.4 / §7 step 6).

Commit protocol: build into `<out>/.tmp-<segment_id>/` (docmeta side-writes,
postings parquet, then manifest.json), then a single atomic
`os.replace(.tmp-<id>, <id>)`. A segment exists iff `<id>/manifest.json`
exists; partially-written tmp dirs from a crashed run are ignored/cleaned.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


@dataclass
class SegmentManifest:
    segment_id: str
    fragments: list[dict]  # input lineage: [{path, row_group, offset, num_rows}]
    doc_count: int
    sum_doc_len: int  # exact total indexed tokens -> global avgdl numerator
    term_count: int  # distinct terms in this segment
    doc_id_min: int
    doc_id_max: int
    analyzer: str
    index_positions: bool
    build_seconds: float
    generation: int = 0  # merge generation (0 = flush segment, like Lucene tiers)
    merged_from: list[str] = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), indent=1)

    @staticmethod
    def from_json(s: str) -> "SegmentManifest":
        return SegmentManifest(**json.loads(s))


def segment_dir(out_dir: str, segment_id: str) -> str:
    return os.path.join(out_dir, segment_id)


def tmp_segment_dir(out_dir: str, segment_id: str) -> str:
    return os.path.join(out_dir, f".tmp-{segment_id}")


def commit_segment(out_dir: str, segment_id: str, manifest: SegmentManifest) -> str:
    tmp = tmp_segment_dir(out_dir, segment_id)
    with open(os.path.join(tmp, "manifest.json.tmp"), "w") as f:
        f.write(manifest.to_json())
    os.replace(os.path.join(tmp, "manifest.json.tmp"), os.path.join(tmp, "manifest.json"))
    final = segment_dir(out_dir, segment_id)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return final


def committed_segments(out_dir: str) -> dict[str, SegmentManifest]:
    """segment_id -> manifest, for every committed (manifest-bearing) segment."""
    out: dict[str, SegmentManifest] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(".tmp-"):
            continue
        mpath = os.path.join(out_dir, name, "manifest.json")
        if os.path.isfile(mpath):
            with open(mpath) as f:
                out[name] = SegmentManifest.from_json(f.read())
    return out


def clean_tmp(out_dir: str) -> None:
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        if name.startswith(".tmp-"):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


@dataclass
class IndexStats:
    """Global collection statistics (the dfs_query_then_fetch scope —
    SURVEY.md §2.14: N, avgdl global across all segments)."""

    doc_count: int
    sum_doc_len: int

    @property
    def avgdl(self) -> float:
        return self.sum_doc_len / self.doc_count if self.doc_count else 0.0


def index_stats(out_dir: str) -> IndexStats:
    segs = committed_segments(out_dir)
    live = live_segments(segs)
    return IndexStats(
        doc_count=sum(m.doc_count for m in live.values()),
        sum_doc_len=sum(m.sum_doc_len for m in live.values()),
    )


def live_segments(segs: dict[str, SegmentManifest]) -> dict[str, SegmentManifest]:
    """Exclude segments that have been merged into a committed descendant."""
    merged_away: set[str] = set()
    for m in segs.values():
        merged_away.update(m.merged_from)
    return {k: v for k, v in segs.items() if k not in merged_away}


def write_build_log(out_dir: str, record: dict) -> None:
    """Append per-partition metrics (files/sec etc.) to the build log."""
    record = {"ts": time.time(), **record}
    with open(os.path.join(out_dir, "build_log.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


# ---- dangling segments (the _dangling_indices API analog:
# TransportListDanglingIndicesAction / ImportDanglingIndexAction —
# indices present on disk but absent from cluster state; here: segment
# dirs with postings but NO manifest, e.g. a crashed build whose encode
# finished but whose commit rename didn't run) ----


def dangling_segments(out_dir: str) -> list[dict]:
    """Segment-shaped dirs (postings present) lacking a manifest — both
    orphaned .tmp- dirs and manifest-less final dirs. Returns
    [{segment_id, path, state, postings_files}] sorted by id."""
    out: list[dict] = []
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        has_manifest = os.path.isfile(os.path.join(d, "manifest.json"))
        pdir = os.path.join(d, "postings")
        has_postings = os.path.isdir(pdir) and any(
            f.endswith(".parquet") for f in os.listdir(pdir))
        if has_manifest or not has_postings:
            continue
        seg_id = name[len(".tmp-"):] if name.startswith(".tmp-") else name
        out.append({
            "segment_id": seg_id,
            "path": d,
            "state": "tmp" if name.startswith(".tmp-") else "uncommitted",
            "postings_files": sum(1 for f in os.listdir(pdir)
                                  if f.endswith(".parquet")),
        })
    return out


def import_dangling_segment(out_dir: str, segment_id: str,
                            *, analyzer: str = "simple",
                            index_positions: bool = True) -> SegmentManifest:
    """Recover a dangling segment by re-deriving its manifest from the
    on-disk docmeta/postings (the import path of the dangling-indices
    API: accept the data as-is, rebuild only the metadata). Fragments
    lineage is unrecoverable without the original plan, recorded as
    empty with extra.recovered=True; doc/term stats recount from the
    side-written files, then the segment commits atomically through the
    normal rename path."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    cand = [tmp_segment_dir(out_dir, segment_id),
            segment_dir(out_dir, segment_id)]
    src = next((d for d in cand
                if os.path.isdir(os.path.join(d, "postings"))
                and not os.path.isfile(os.path.join(d, "manifest.json"))),
               None)
    if src is None:
        raise FileNotFoundError(
            f"no dangling segment {segment_id!r} under {out_dir}")
    meta = pads.dataset(os.path.join(src, "docmeta")).to_table(
        columns=["doc_id", "doc_len"])
    post = pads.dataset(os.path.join(src, "postings")).to_table(
        columns=["term"])
    ids = meta["doc_id"].to_numpy()
    manifest = SegmentManifest(
        segment_id=segment_id,
        fragments=[],
        doc_count=len(meta),
        sum_doc_len=int(meta["doc_len"].to_numpy().sum()),
        term_count=int(pc.count_distinct(post["term"]).as_py())
        if len(post) else 0,
        doc_id_min=int(ids.min()) if ids.size else 0,
        doc_id_max=int(ids.max()) if ids.size else 0,
        analyzer=analyzer,
        index_positions=index_positions,
        build_seconds=0.0,
        extra={"recovered": True},
    )
    if src == segment_dir(out_dir, segment_id):
        # manifest-less FINAL dir: write the manifest in place atomically
        with open(os.path.join(src, "manifest.json.tmp"), "w") as f:
            f.write(manifest.to_json())
        os.replace(os.path.join(src, "manifest.json.tmp"),
                   os.path.join(src, "manifest.json"))
        return manifest
    commit_segment(out_dir, segment_id, manifest)
    return manifest


def delete_dangling_segment(out_dir: str, segment_id: str) -> bool:
    """Drop a dangling segment's directory (the delete path of the API).
    Refuses to touch a committed (manifest-bearing) segment."""
    for d in (tmp_segment_dir(out_dir, segment_id),
              segment_dir(out_dir, segment_id)):
        if os.path.isdir(d) and not os.path.isfile(
                os.path.join(d, "manifest.json")):
            shutil.rmtree(d)
            return True
    return False
