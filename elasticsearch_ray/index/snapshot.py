"""Snapshot repository: incremental create / restore / list / delete.

Mirrors the reference's blob-store snapshot semantics
(repositories/blobstore/BlobStoreRepository.java shape): committed segments
are IMMUTABLE (commit protocol in manifest.py), so the repository stores each
segment once under `segments/<id>/` and snapshots are tiny JSON manifests
listing the segment ids they reference — a second snapshot of a mostly
unchanged index copies only the new segments (incremental), and deleting a
snapshot only removes segments no other snapshot references.

Layout:
    <repo>/segments/<segment_id>/...   shared immutable segment store
    <repo>/snapshots/<name>.json       {"segments": [...], "created": ts}
"""

from __future__ import annotations

import json
import os
import shutil
import time

from .manifest import committed_segments, live_segments


def _snap_path(repo_dir: str, name: str) -> str:
    return os.path.join(repo_dir, "snapshots", f"{name}.json")


def create_snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot the index's LIVE segments into the repository. Returns the
    snapshot manifest; segments already present in the repo are not re-copied
    (incremental)."""
    os.makedirs(os.path.join(repo_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(repo_dir, "snapshots"), exist_ok=True)
    if os.path.exists(_snap_path(repo_dir, name)):
        raise ValueError(f"snapshot {name!r} already exists")
    live = live_segments(committed_segments(index_dir))
    copied = []
    for sid in sorted(live):
        dst = os.path.join(repo_dir, "segments", sid)
        if not os.path.isdir(dst):
            tmp = dst + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(os.path.join(index_dir, sid), tmp)
            os.replace(tmp, dst)
            copied.append(sid)
    manifest = {"name": name, "segments": sorted(live), "created": time.time(),
                "copied": copied}
    tmp = _snap_path(repo_dir, name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _snap_path(repo_dir, name))
    return manifest


def list_snapshots(repo_dir: str) -> list[dict]:
    d = os.path.join(repo_dir, "snapshots")
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out


def restore_snapshot(repo_dir: str, name: str, dest_dir: str) -> list[str]:
    """Restore a snapshot into a fresh index directory. Returns segment ids."""
    with open(_snap_path(repo_dir, name)) as f:
        manifest = json.load(f)
    os.makedirs(dest_dir, exist_ok=True)
    for sid in manifest["segments"]:
        dst = os.path.join(dest_dir, sid)
        if os.path.isdir(dst):
            continue
        tmp = os.path.join(dest_dir, f".tmp-{sid}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(os.path.join(repo_dir, "segments", sid), tmp)
        os.replace(tmp, dst)
    return manifest["segments"]


def delete_snapshot(repo_dir: str, name: str) -> list[str]:
    """Remove a snapshot; garbage-collect segments no snapshot references.
    Returns the deleted segment ids."""
    path = _snap_path(repo_dir, name)
    if not os.path.isfile(path):
        raise ValueError(f"no snapshot {name!r}")
    os.remove(path)
    referenced: set[str] = set()
    for snap in list_snapshots(repo_dir):
        referenced.update(snap["segments"])
    removed = []
    seg_root = os.path.join(repo_dir, "segments")
    for sid in sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []:
        if sid not in referenced:
            shutil.rmtree(os.path.join(seg_root, sid), ignore_errors=True)
            removed.append(sid)
    return removed


class ReadOnlyRepository:
    """URL repository (modules/repository-url, URLRepository.java): a
    READ-ONLY view of an existing repository addressed by `file://` URL (the
    only scheme reachable in this build; http(s) would stream the same JSON
    manifest + segment files). list/restore work; create/delete raise, like
    the reference's UnsupportedOperationException on url repos."""

    def __init__(self, url: str):
        if url.startswith("file://"):
            self.root = url[len("file://"):]
        elif "://" in url:
            raise ValueError(f"unsupported url repository scheme: {url!r}")
        else:
            self.root = url

    def list(self) -> list[dict]:
        return list_snapshots(self.root)

    def restore(self, name: str, dest_dir: str) -> list[str]:
        return restore_snapshot(self.root, name, dest_dir)

    def create(self, *a, **kw):
        raise PermissionError("url repository is read-only")

    def delete(self, *a, **kw):
        raise PermissionError("url repository is read-only")


def restore_snapshot_renamed(repo_dir: str, name: str, dest_base: str,
                             rename_pattern: str,
                             rename_replacement: str) -> str:
    """RestoreSnapshotRequest rename_pattern/rename_replacement: restore
    under a rewritten index name (regex substitution, like the reference's
    restore-into-new-index flow). Returns the restored index path."""
    import re

    new_name = re.sub(rename_pattern, rename_replacement, name)
    dest = os.path.join(dest_base, new_name)
    restore_snapshot(repo_dir, name, dest)
    return dest


def mount_snapshot(repo_dir: str, name: str, mount_dir: str) -> list[str]:
    """Searchable-snapshot mount (x-pack searchable-snapshots
    MountSearchableSnapshotAction, 7.10): serve an index DIRECTLY from the
    repository without a restore copy. Each snapshot segment is symlinked
    into the mount directory — zero bytes copied; the searcher reads
    repository blobs lazily exactly as it would a restored index."""
    with open(_snap_path(repo_dir, name)) as f:
        manifest = json.load(f)
    os.makedirs(mount_dir, exist_ok=True)
    for sid in manifest["segments"]:
        dst = os.path.join(mount_dir, sid)
        if os.path.islink(dst) or os.path.isdir(dst):
            continue
        os.symlink(os.path.abspath(os.path.join(repo_dir, "segments", sid)),
                   dst, target_is_directory=True)
    return manifest["segments"]


def clone_snapshot(repo_dir: str, src: str, dst: str) -> dict:
    """_snapshot clone (8.0 TransportCloneSnapshotAction): a new snapshot
    manifest referencing the SAME content-addressed segment blobs — no
    data is re-copied; the clone is a metadata write. Deleting either
    snapshot later only GCs blobs no other manifest references."""
    if os.path.exists(_snap_path(repo_dir, dst)):
        raise ValueError(f"snapshot {dst!r} already exists")
    with open(_snap_path(repo_dir, src)) as f:
        m = json.load(f)
    manifest = {"name": dst, "segments": m["segments"],
                "created": time.time(), "copied": [], "cloned_from": src}
    tmp = _snap_path(repo_dir, dst) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _snap_path(repo_dir, dst))
    return manifest
