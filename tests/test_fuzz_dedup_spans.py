"""Randomized differential tests: paragraph_dedup and substring_dedup vs
brute-force single-process oracles over small random corpora (tiny vocab so
collisions are dense), multiple seeds and gram/chunk widths."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from elasticsearch_ray.functions.dedup import paragraph_dedup, substring_dedup


def _corpus(seed: int, n_docs: int = 30, vocab: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        n = int(rng.integers(1, 25))
        texts.append(" ".join(f"v{int(x)}" for x in rng.integers(0, vocab, n)))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                         "text": texts})


def _brute_paragraph(df: pd.DataFrame, cw: int) -> pd.DataFrame:
    seen: set[str] = set()
    rows = []
    for _, r in df.sort_values("doc_id").iterrows():
        ws = r["text"].split(" ")
        kept, total = [], 0
        for i in range(0, (len(ws) + cw - 1) // cw):
            c = " ".join(ws[i * cw:(i + 1) * cw])
            total += 1
            if c not in seen:
                seen.add(c)
                kept.append(c)
        rows.append((r["doc_id"], " ".join(kept), len(kept), total))
    return pd.DataFrame(rows, columns=["doc_id", "text_dedup",
                                       "n_kept", "n_total"])


def _brute_substring(df: pd.DataFrame, n: int) -> pd.DataFrame:
    seen: set[str] = set()
    rows = []
    for _, r in df.sort_values("doc_id").iterrows():
        ws = r["text"].split(" ")
        cov = np.zeros(len(ws), dtype=bool)
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i:i + n])
            if g in seen:
                cov[i:i + n] = True
            else:
                seen.add(g)
        kept = [w for w, c in zip(ws, cov) if not c]
        rows.append((r["doc_id"], " ".join(kept), int(cov.sum()), len(ws)))
    return pd.DataFrame(rows, columns=["doc_id", "text_clean",
                                       "n_removed", "n_words"])


def test_fuzz_paragraph_dedup():
    for seed in (3, 17, 99):
        for cw in (2, 3, 5):
            df = _corpus(seed)
            got = (paragraph_dedup(rd.from_pandas(df).repartition(4),
                                   chunk_words=cw)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            want = _brute_paragraph(df, cw)
            got["n_kept"] = got["n_kept"].astype("int64")
            got["n_total"] = got["n_total"].astype("int64")
            pd.testing.assert_frame_equal(
                got, want.astype({"n_kept": "int64", "n_total": "int64"}),
                check_dtype=False)


def test_fuzz_substring_dedup():
    for seed in (5, 23, 71):
        for n in (2, 4):
            df = _corpus(seed, vocab=5)
            got = (substring_dedup(rd.from_pandas(df).repartition(4),
                                   gram_words=n)
                   .to_pandas().sort_values("doc_id").reset_index(drop=True))
            want = _brute_substring(df, n)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_substring_dedup_hash_mode_parity():
    # 64-bit gram hashing must match exact-text mode on real-shaped corpora
    for seed in (9, 41):
        df = _corpus(seed, n_docs=40, vocab=6)
        a = (substring_dedup(rd.from_pandas(df).repartition(3), gram_words=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (substring_dedup(rd.from_pandas(df).repartition(3), gram_words=3,
                             hash_grams=True)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
