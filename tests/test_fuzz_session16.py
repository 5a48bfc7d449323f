"""Seeded randomized differential fuzz for session-16 operators.

Random parameterizations (time-zone offsets, histogram min_doc_count
cutoffs, SAMPLE probability/seed pairs, fuzzy query terms, UniMax
budgets) vs DuckDB SQL generated from the SAME parameters — the
variable-parameter complement to the fixed session-16 oracle gates.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.pipelines.ops import _ds

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_fuzz_timezone_offsets(ray_session, con):
    from ray.data.aggregate import Count

    rng = np.random.default_rng(1608)
    for _ in range(6):
        hours = int(rng.integers(-11, 13))

        def bucketize(t: pa.Table, hours=hours) -> pa.Table:
            import pyarrow.compute as pc

            shift = pa.scalar(hours * 3600 * 1_000_000, pa.duration("us"))
            ts = pc.cast(t["ts"], pa.timestamp("us"))
            floored = pc.floor_temporal(pc.add(ts, shift), unit="day")
            return pa.table({"bucket": pc.cast(pc.subtract(floored, shift),
                                               pa.int64())})

        got = (_ds(SF_DIR, "events", ["ts"])
               .map_batches(bucketize, batch_format="pyarrow")
               .groupby("bucket").aggregate(Count(alias_name="n"))
               .to_pandas().sort_values("bucket").reset_index(drop=True))
        got["bucket"] = pd.to_datetime(got["bucket"], unit="us")
        want = con.execute(
            f"SELECT date_trunc('day', ts + ({hours}) * INTERVAL 1 HOUR) "
            f"- ({hours}) * INTERVAL 1 HOUR AS bucket, count(*) AS n "
            f"FROM events GROUP BY 1 ORDER BY 1").fetchdf()
        assert got["bucket"].tolist() == want["bucket"].tolist(), hours
        assert got["n"].tolist() == want["n"].tolist(), hours


def test_fuzz_sample_prob_seed(ray_session, con):
    from elasticsearch_ray.functions import esql

    rng = np.random.default_rng(2718)
    for _ in range(6):
        p = round(float(rng.uniform(0.05, 0.6)), 3)
        seed = int(rng.integers(0, 1000))
        got = esql.run(SF_DIR, f"""
            FROM events
            | SAMPLE {p} {seed}
            | STATS n = COUNT(*) BY event_type
            | SORT event_type
        """)
        got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
        want = con.execute(
            f"SELECT event_type, count(*) AS n FROM events "
            f"WHERE ((event_id * 2654435761 + {seed} * 40503) % 4294967296)"
            f" < {p} * 4294967296 "
            f"GROUP BY event_type ORDER BY event_type").fetchdf()
        assert got["event_type"].tolist() == want["event_type"].tolist()
        assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()


def test_fuzz_fuzzy_terms(ray_session, con):
    from elasticsearch_ray.pipelines.fulltext import documents_searcher

    s = documents_searcher(SF_DIR)
    rng = np.random.default_rng(3141)
    vocab = ["data", "merge", "window", "slow", "fast", "query", "table"]
    for _ in range(8):
        base = vocab[int(rng.integers(len(vocab)))]
        # random 1-edit corruption
        i = int(rng.integers(len(base)))
        mode = int(rng.integers(3))
        if mode == 0:  # substitute
            corrupted = base[:i] + "z" + base[i + 1:]
        elif mode == 1:  # delete
            corrupted = base[:i] + base[i + 1:]
        else:  # transpose adjacent
            j = max(1, i)
            corrupted = (base[:j - 1] + base[j] + base[j - 1]
                         + base[j + 1:])
        ids, _ = s._eval({"kind": "fuzzy", "term": corrupted,
                          "fuzziness": 1, "transpositions": True})
        want = con.execute(f"""
            WITH tok AS (SELECT doc_id, t AS term FROM (
                SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                    '[^a-z0-9]+')) AS t FROM documents) u WHERE t <> ''),
            v AS (SELECT DISTINCT term FROM tok)
            SELECT DISTINCT doc_id FROM tok WHERE term IN
              (SELECT term FROM v
               WHERE damerau_levenshtein(term, '{corrupted}') <= 1)
            ORDER BY doc_id""").fetchdf()
        assert sorted(ids.tolist()) == want["doc_id"].tolist(), corrupted


def test_fuzz_unimax_budgets(ray_session, con):
    rng = np.random.default_rng(1123)
    sizes = con.execute(
        "SELECT lang, count(*) AS size FROM documents "
        "GROUP BY lang ORDER BY lang").fetchdf()
    sz = sizes["size"].to_numpy(np.float64)
    for _ in range(10):
        frac = round(float(rng.uniform(0.2, 0.98)), 3)
        budget = int(sz.sum() * frac)
        # waterfill theta via the same closed form the op uses
        order = np.argsort(sz, kind="stable")
        ss = sz[order]
        k = len(ss)
        cum = np.cumsum(ss)
        theta = budget / k
        for i in range(k):
            remaining = budget - (cum[i - 1] if i else 0.0)
            theta_i = remaining / (k - i)
            if ss[i] >= theta_i:
                theta = theta_i
                break
        alloc = np.floor(np.minimum(sz, theta))
        # invariants: feasible, tight within k floors, monotone in size
        assert alloc.sum() <= budget
        assert budget - alloc.sum() < k + 1
        assert (alloc <= sz).all()
        big = sz >= theta
        if big.any():
            assert np.unique(alloc[big]).size == 1
