"""Seeded randomized ingest-pipeline fuzz vs DuckDB.

Random chains of string processors (case / trim / gsub / split+join) are
composed with the `pipeline` processor, applied over the documents table
through Ray Data map_batches, and compared row-by-row against a DuckDB
expression built from the SAME random parameters — differential coverage
for processor composition that the per-processor unit tests cannot give.

Patterns are drawn from a safe alphabet (literal letters and small char
classes, never empty-matchable) so Arrow RE2 and DuckDB RE2 semantics are
directly comparable.
"""

from __future__ import annotations

import duckdb
import numpy as np
import os as _os

# fresh-seed sweeps: GRAFT_SEED_OFFSET=N shifts every inline seed
_SEED_OFF = int(_os.environ.get("GRAFT_SEED_OFFSET", "0"))
import pytest

from elasticsearch_ray.functions import ingest as I
from elasticsearch_ray.pipelines.ops import _ds

SF_DIR = "/root/testdata/sf0.001"
LETTERS = list("aeiorstnl")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    return c


def _rand_step(rng):
    """one processor + the equivalent SQL wrapper."""
    kind = int(rng.integers(5))
    if kind == 0:
        return I.lowercase("text"), lambda e: f"lower({e})"
    if kind == 1:
        return I.uppercase("text"), lambda e: f"upper({e})"
    if kind == 2:
        # \s trim via regexp so DuckDB matches Arrow's whitespace trim on
        # this ASCII corpus
        return I.trim("text"), lambda e: rf"regexp_replace({e}, '^\s+|\s+$', '', 'g')"
    if kind == 3:
        if rng.random() < 0.5:
            pat = str(rng.choice(LETTERS))
        else:
            cs = rng.choice(LETTERS, size=3, replace=False)
            pat = "[" + "".join(cs) + "]"
        rep = str(rng.choice(LETTERS + [""]))
        return (I.gsub("text", pat, rep),
                lambda e, p=pat, r=rep: f"regexp_replace({e}, '{p}', '{r}', 'g')")
    sep = str(rng.choice(["-", "_", "|", ""]))
    pat = str(rng.choice([" ", "e", "[nt]"]))
    step = I.pipeline(I.split("text", pat), I.join("text", sep))

    def sql(e, p=pat, s=sep):
        return f"array_to_string(regexp_split_to_array({e}, '{p}'), '{s}')"

    return step, sql


def test_fuzz_ingest_chains(ray_session, con):
    rng = np.random.default_rng(23 + _SEED_OFF)
    for ci in range(12):
        steps, expr = [], "text"
        for _ in range(int(rng.integers(2, 5))):
            fn, wrap = _rand_step(rng)
            steps.append(fn)
            expr = wrap(expr)
        ds = _ds(SF_DIR, "documents", ["doc_id", "text"])
        out = (ds.map_batches(I.pipeline(*steps), batch_format="pyarrow")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = con.execute(
            f"SELECT doc_id, {expr} AS text FROM documents ORDER BY doc_id"
        ).fetchdf()
        assert out["doc_id"].tolist() == want["doc_id"].tolist(), f"chain #{ci}"
        mism = (out["text"] != want["text"]).to_numpy().nonzero()[0]
        assert mism.size == 0, (
            f"chain #{ci} expr={expr}: first mismatch row {mism[:1]}: "
            f"{out['text'].iloc[mism[0]]!r} vs {want['text'].iloc[mism[0]]!r}")
