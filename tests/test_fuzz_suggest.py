"""Differential fuzz for the term suggester (session 16): random 1-2
edit corruptions of corpus terms vs a DuckDB oracle that re-derives the
vocabulary, document frequencies and Levenshtein ranking (distance asc,
df desc, term asc) from the raw corpus.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from elasticsearch_ray.pipelines.fulltext import suggest_terms

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/documents.parquet')")
    return c


def oracle(con, text: str, max_edits: int = 2, size: int = 5):
    return con.execute(f"""
WITH tok AS (SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text),
        '[^a-z0-9]+')) AS t FROM documents) u WHERE t <> ''),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
cand AS (SELECT term, levenshtein(term, '{text}') AS distance, df
         FROM df
         WHERE levenshtein(term, '{text}') BETWEEN 1 AND {max_edits})
SELECT term, distance, df FROM cand
ORDER BY distance, df DESC, term LIMIT {size}""").fetchdf()


def corrupt(rng, w: str) -> str:
    ops = rng.integers(1, 3)  # 1 or 2 edits
    out = w
    for _ in range(int(ops)):
        if not out:
            break
        i = int(rng.integers(len(out)))
        mode = int(rng.integers(3))
        if mode == 0:
            out = out[:i] + chr(97 + int(rng.integers(26))) + out[i + 1:]
        elif mode == 1:
            out = out[:i] + out[i + 1:]
        else:
            out = out[:i] + chr(97 + int(rng.integers(26))) + out[i:]
    return out


def test_fuzz_term_suggester(ray_session, con):
    rng = np.random.default_rng(160901)
    vocab = ["data", "merge", "window", "slow", "fast", "query", "table",
             "spark", "join", "partition"]
    checked = 0
    for _ in range(20):
        base = vocab[int(rng.integers(len(vocab)))]
        text = corrupt(rng, base)
        if not text:
            continue
        got = suggest_terms(SF_DIR, text, max_edits=2, size=5,
                            suggest_mode="always").to_pandas()
        want = oracle(con, text)
        assert got["term"].tolist() == want["term"].tolist(), text
        assert got["distance"].astype(int).tolist() == \
            want["distance"].astype(int).tolist(), text
        assert got["df"].astype(int).tolist() == \
            want["df"].astype(int).tolist(), text
        checked += 1
    assert checked >= 15
