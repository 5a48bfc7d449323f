"""Cross-cluster replication (x-pack ccr): pull-based segment replication.

Mirrors the reference's follower shape (ccr ShardFollowNodeTask: the follower
polls the leader and pulls only what it is missing) at segment granularity —
our segments are immutable committed directories (manifest.py), so a follow
cycle is: copy leader live segments absent locally, prune local segments no
longer live on the leader (the merge/soft-delete catch-up), and converge.
A second cycle against an unchanged leader is a no-op (idempotent)."""

from __future__ import annotations

import os
import shutil

from .manifest import committed_segments, live_segments


def follow(leader_dir: str, follower_dir: str) -> dict:
    """One follow cycle. Returns {"copied": [...], "pruned": [...]}."""
    os.makedirs(follower_dir, exist_ok=True)
    live = live_segments(committed_segments(leader_dir))
    have = committed_segments(follower_dir)

    copied = []
    for sid in sorted(live):
        if sid in have:
            continue
        tmp = os.path.join(follower_dir, f".tmp-{sid}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(os.path.join(leader_dir, sid), tmp)
        os.replace(tmp, os.path.join(follower_dir, sid))
        copied.append(sid)

    pruned = []
    for sid in sorted(have):
        if sid not in live:
            shutil.rmtree(os.path.join(follower_dir, sid), ignore_errors=True)
            pruned.append(sid)
    return {"copied": copied, "pruned": pruned}
