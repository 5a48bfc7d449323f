"""Round-3 session-16 operators.

- ES|QL SAMPLE gate (x-pack esql Sample command, 8.18): deterministic
  multiplicative-hash sampling, partition-invariant.
- cartesian_centroid / cartesian_bounds (x-pack spatial
  CartesianCentroidAggregator / CartesianBoundsAggregator): planar
  twins of geo_centroid/geo_bounds over the indexed `shape` points.
- _bulk update merge (action/update/UpdateHelper.java): partial-doc
  merge + detect_noop + doc_as_upsert result counters.
- if_seq_no optimistic concurrency (index/engine
  VersionConflictEngineException; BulkByScrollResponse
  version_conflicts counter under conflicts=proceed).
"""

from __future__ import annotations

import numpy as np

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def test_esql_sample_deterministic_and_subset():
    a = ops.esql_sample(SF)
    b = ops.esql_sample(SF)
    assert a.equals(b)
    # ~20% of 1,000 events, grouped over 5 types
    assert 100 < a["n"].sum() < 300


def test_cartesian_centroid_matches_direct_mean():
    import pyarrow.parquet as pq

    out = ops.agg_cartesian_centroid(SF)
    k = pq.read_table(f"{SF}/part.parquet", columns=["p_partkey"])[
        "p_partkey"].to_numpy()
    x = (k * 7919) % 1000 + 0.5
    y = (k * 104729) % 1000 + 0.5
    assert out["count"].iloc[0] == len(k)
    assert abs(out["x"].iloc[0] - x.mean()) < 1e-3
    assert abs(out["y"].iloc[0] - y.mean()) < 1e-3


def test_cartesian_bounds_contains_centroid():
    b = ops.agg_cartesian_bounds(SF)
    c = ops.agg_cartesian_centroid(SF)
    assert b["min_x"].iloc[0] <= c["x"].iloc[0] <= b["max_x"].iloc[0]
    assert b["min_y"].iloc[0] <= c["y"].iloc[0] <= b["max_y"].iloc[0]


def test_bulk_update_merge_counters_consistent():
    import pyarrow.parquet as pq

    out = ops.bulk_update_merge(SF).set_index("key")["n"]
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert out["result:created"] == 7
    # updated + noop + skipped = base table size
    assert (out["result:updated"] + out["result:noop"]
            + out["result:skipped"]) == n_docs
    # every source:* count sums to base + upserts
    src = out[out.index.str.startswith("source:")]
    assert src.sum() == n_docs + 7
    # edited bucket = updated + created
    assert out["source:edited"] == out["result:updated"] + 7


def test_seq_no_conflicts_partition_invariant():
    import pyarrow.parquet as pq

    out = ops.update_conflicts_seq_no(SF)
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # every doc is either updated or conflicted
    assert int((out["updated"] + out["version_conflicts"]).sum()) == n_docs
    did = np.arange(n_docs, dtype=np.int64)
    ok = ((did * 40503) % 13 == (did * 24036583) % 13).sum()
    assert int(out["updated"].sum()) == int(ok)
