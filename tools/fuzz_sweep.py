"""Multi-seed differential fuzz sweep (beyond the fixed-seed pytest runs).

Builds a fresh 1,000-doc index and runs the random query-tree and span
fuzz generators from tests/test_fuzz_queries.py under several NEW seeds,
comparing full doc->score maps against the independent brute-force oracle.
The pytest suite pins one seed per harness for determinism; this sweep is
the repeatable "does it hold under other seeds" check (it did: 3 seeds x
(120 trees + 40 spans) = 480 cases, 0 failures, 2026-08-18).

Usage:  python tools/fuzz_sweep.py [seed ...]   (default seeds: 1 99 777)
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np


def main() -> int:
    import ray

    seeds = [int(s) for s in sys.argv[1:]] or [1, 99, 777]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pyarrow.dataset as pads

    import tests.test_fuzz_queries as F
    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import IndexSearcher
    from elasticsearch_ray.sources.corpus import write_corpus
    from tests.oracle_bm25 import BruteForceBM25

    d = tempfile.mkdtemp()
    c, i = os.path.join(d, "c"), os.path.join(d, "i")
    write_corpus(c, 1000, rows_per_file=1000, row_group_size=200, use_ray=True)
    build_index(c, i, docs_per_partition=500, num_buckets=8, salt_chunks=4)
    texts = pads.dataset(c).to_table(columns=["content"])["content"].to_pylist()
    oracle = BruteForceBM25([(j, t) for j, t in enumerate(texts)], analyzer="code")
    searcher = IndexSearcher(i)
    pools = F._vocab_pools(oracle)
    n = F.N_DOCS
    fails = 0
    for seed in seeds:
        rng = np.random.default_rng(seed)
        for qi in range(120):
            q = F._rand_query(rng, pools, oracle, texts)
            q["k"] = n
            ids, scores = searcher.search(q)
            o_ids, o_scores = oracle.search(q)
            got = dict(zip(map(int, ids), map(float, scores)))
            want = dict(zip(o_ids, o_scores))
            if set(got) != set(want):
                fails += 1
                print(f"DOCSET MISMATCH seed={seed} #{qi}: {q}")
                continue
            if want:
                g = np.array([got[x] for x in sorted(got)])
                w = np.array([want[x] for x in sorted(want)])
                if not np.allclose(g, w, rtol=1e-5, atol=1e-7):
                    fails += 1
                    print(f"SCORE MISMATCH seed={seed} #{qi}: {q}")
        mid = pools[1] + pools[2]
        for qi in range(40):
            terms = list(rng.choice(mid, size=int(rng.integers(2, 4)),
                                    replace=False))
            slop = int(rng.integers(0, 5))
            in_order = bool(rng.random() < 0.5)
            q = {"kind": "span_near", "terms": terms, "slop": slop,
                 "in_order": in_order, "k": n}
            ids, _ = searcher.search(q)
            got = set(map(int, ids))
            want = {dd for dd in range(n)
                    if F._naive_near_match(oracle, dd, terms, slop, in_order)}
            if got != want:
                fails += 1
                print(f"SPAN MISMATCH seed={seed} #{qi}: {q}")
        # vector-ladder sweep: random vectors/dims/k, repartition
        # invariance + scalar-quantized serial-twin equality per seed
        import pandas as pd
        import ray.data as rd

        from elasticsearch_ray.functions.similarity import (
            knn_binary_quantized, knn_scalar_quantized)

        for vi in range(4):
            nv = int(rng.integers(50, 300))
            dim = int(rng.choice([8, 16, 32]))
            kk = int(rng.integers(2, 7))
            V = rng.standard_normal((nv, dim)) * rng.uniform(0.1, 3.0)
            ids_v = rng.permutation(nv).astype(np.int64)
            dsv = rd.from_pandas(pd.DataFrame({"vec_id": ids_v,
                                               "embedding": list(V)}))
            Q = V[:2]
            for fn in (knn_scalar_quantized, knn_binary_quantized):
                a = fn(dsv, Q, k=kk).reset_index(drop=True)
                b = fn(dsv.repartition(int(rng.integers(2, 8))), Q,
                       k=kk).reset_index(drop=True)
                if not a.equals(b):
                    fails += 1
                    print(f"VECTOR INVARIANCE MISMATCH seed={seed} #{vi}")
            m = float(np.abs(V).max())
            Xq = np.clip(np.floor(V / m * 127 + 0.5), -127, 127).astype(np.int64)
            Qq = np.clip(np.floor(Q / m * 127 + 0.5), -127, 127).astype(np.int64)
            S = Qq @ Xq.T
            got = knn_scalar_quantized(dsv, Q, k=kk)
            for qi2 in range(2):
                order = sorted(zip(-S[qi2], ids_v))[:kk]
                sub = got[got["query_id"] == qi2].sort_values("rank")
                if sub["qdot"].tolist() != [int(-s) for s, _ in order]:
                    fails += 1
                    print(f"VECTOR TWIN MISMATCH seed={seed} #{vi}")
        # --- session-4 families ---
        from elasticsearch_ray.functions.similarity import knn_hnsw
        import ray.data as rd

        for hi in range(2):
            nv, dim = int(rng.integers(120, 320)), int(rng.integers(8, 24))
            V = rng.normal(size=(nv, dim)).astype(np.float64)
            dsv = rd.from_pandas(pd.DataFrame(
                {"vec_id": np.arange(nv, dtype=np.int64),
                 "embedding": list(V)}))
            Q = V[:2]
            a = knn_hnsw(dsv, Q, k=5, seg_rows=max(32, nv // 3))
            b = knn_hnsw(dsv.repartition(int(rng.integers(2, 7))), Q, k=5,
                         seg_rows=max(32, nv // 3))
            if not a.equals(b):
                fails += 1
                print(f"HNSW INVARIANCE MISMATCH seed={seed} #{hi}")
            if not (a[a["rank"] == 1]["vec_id"].to_numpy()
                    == np.arange(2)).all():
                fails += 1
                print(f"HNSW TOP1 MISMATCH seed={seed} #{hi}")
        for pi in range(3):
            # two-pass prefix-sum twin: bucketed offsets == serial cumsum
            nn = int(rng.integers(50, 400))
            ntok = rng.integers(1, 50, size=nn).astype(np.int64)
            ids = np.arange(nn, dtype=np.int64)
            bsz = int(rng.integers(7, 60))
            bucket = ids // bsz
            btot = {int(b): int(ntok[bucket == b].sum())
                    for b in np.unique(bucket)}
            offs, acc = {}, 0
            for b in sorted(btot):
                offs[b] = acc
                acc += btot[b]
            start = np.empty(nn, dtype=np.int64)
            for b in np.unique(bucket):
                m = bucket == b
                start[m] = offs[int(b)] + np.concatenate(
                    [[0], np.cumsum(ntok[m])[:-1]])
            serial = np.concatenate([[0], np.cumsum(ntok)[:-1]])
            if not (start == serial).all():
                fails += 1
                print(f"PREFIX-SUM TWIN MISMATCH seed={seed} #{pi}")
        for ei in range(3):
            # eql searchsorted step-join twin vs brute per-event scan
            na, nb = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            a_ts = np.sort(rng.integers(0, 10_000, size=na))
            b_ts = np.sort(rng.integers(0, 10_000, size=nb))
            span = int(rng.integers(1, 2_000))
            nxt = np.searchsorted(b_ts, a_ts, side="right")
            ok = (nxt < nb) & (b_ts[np.minimum(nxt, nb - 1)] <= a_ts + span)
            brute = sum(1 for t in a_ts
                        if ((b_ts > t) & (b_ts <= t + span)).any())
            if int(ok.sum()) != brute:
                fails += 1
                print(f"EQL TWIN MISMATCH seed={seed} #{ei}")
        print(f"seed {seed}: done (cumulative fails: {fails})")
    print(f"TOTAL: {len(seeds) * 184} cases, {fails} failures")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
