"""CLI surface smoke (the `ray job submit` shape of the north rule: the
same commands a cluster submission would run, executed as real
subprocesses with their own Ray sessions — SURVEY §7's operational
surface). Covers build -> search -> merge -> search-parity end-to-end."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _run(args: list[str]) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    return subprocess.run(
        [sys.executable, "-m", "elasticsearch_ray.cli", *args],
        capture_output=True, text=True, timeout=300, env=env,
        cwd="/root/repo")


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    src = pq.read_table(f"{SF}/documents.parquet")
    corpus = str(d / "documents.parquet")
    pq.write_table(src, corpus, row_group_size=200)
    idx = str(d / "idx")
    r = _run(["build", "--input", corpus, "--out", idx,
              "--analyzer", "simple", "--content-column", "text",
              "--meta-columns", "lang,source,n_chars",
              "--docs-per-partition", "200", "--num-buckets", "4",
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    return idx


def test_cli_build_creates_segments(built):
    from elasticsearch_ray.index.manifest import (committed_segments,
                                                  live_segments)

    live = live_segments(committed_segments(built))
    assert len(live) == 3  # 500 docs / 200-row groups


def test_cli_search_and_merge_parity(built):
    q = json.dumps({"kind": "term", "term": "data"})
    r1 = _run(["search", "--index", built, "--query", q, "--k", "5",
               "--num-cpus", "4"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    out1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert out1["total"] == 5 and out1["hits"][0]["score"] > 0

    rm = _run(["merge", "--index", built, "--gc", "--num-cpus", "4"])
    assert rm.returncode == 0, rm.stderr[-2000:]
    from elasticsearch_ray.index.manifest import (committed_segments,
                                                  live_segments)

    assert len(live_segments(committed_segments(built))) == 1

    r2 = _run(["search", "--index", built, "--query", q, "--k", "5",
               "--num-cpus", "4"])
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # merge-invariant results through the CLI surface
    assert out1 == out2
