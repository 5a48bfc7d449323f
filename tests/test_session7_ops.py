"""Round-3 session-7 operators: CCNet perplexity bucketing and friends.

Reference surface mirrored: CCNet (Wenzek et al., LREC 2020) perplexity
head/middle/tail split — the LLM-curation analog of the reference's
per-index quality gates."""

from __future__ import annotations

import numpy as np
import pandas as pd

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def test_ccnet_buckets_terciles_per_source(ray_session):
    out = ops.ccnet_buckets(SF)
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    for src, g in out.groupby("source"):
        sizes = g["bucket"].value_counts()
        # tercile sizes differ by at most one within each partition
        assert sizes.max() - sizes.min() <= 1
        # head ppl <= middle ppl <= tail ppl at the boundaries
        h = g.loc[g["bucket"] == "head", "ppl"].max()
        m = g.loc[g["bucket"] == "middle", "ppl"]
        t = g.loc[g["bucket"] == "tail", "ppl"].min()
        assert h <= m.min() + 1e-12 and m.max() <= t + 1e-12
    # every document is bucketed exactly once
    assert out["doc_id"].is_unique


def test_kn_perplexity_keep_cols_passthrough(ray_session):
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions import lm as LM

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "a c", "b"], pa.string()),
        "source": pa.array(["s1", "s2", "s1"], pa.string())}))
    m = LM.fit_kn_bigram(docs, D=0.75, alpha=0.5)
    plain = (LM.kn_perplexity(docs, m).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    kept = (LM.kn_perplexity(docs, m, keep_cols=("source",)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(kept["source"]) == ["s1", "s2", "s1"]
    np.testing.assert_allclose(kept["ppl"], plain["ppl"])
