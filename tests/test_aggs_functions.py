"""Unit tests for sketches (HLL++, T-Digest), dedup operators, text analysis,
similarity search, ingest processors, and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.aggs.hll import HllSketch
from elasticsearch_ray.aggs.tdigest import TDigest


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    a = HllSketch()
    b = HllSketch()
    va = rng.integers(0, 10**12, 50_000)
    vb = rng.integers(0, 10**12, 50_000)
    a.add(va)
    b.add(vb)
    exact = len(set(va.tolist()) | set(vb.tolist()))
    merged = HllSketch.from_bytes(a.to_bytes()).merge(HllSketch.from_bytes(b.to_bytes()))
    est = merged.estimate()
    assert abs(est - exact) / exact < 0.03  # p=14 -> ~0.8% typical


def test_hll_small_range_linear_counting():
    s = HllSketch()
    s.add(np.arange(100))
    assert abs(s.estimate() - 100) < 3


def test_hll_strings():
    s = HllSketch()
    s.add(np.array([f"user-{i}" for i in range(1000)], dtype=object))
    assert abs(s.estimate() - 1000) / 1000 < 0.05


def test_tdigest_quantiles_and_merge():
    rng = np.random.default_rng(2)
    data = rng.normal(100, 15, 100_000)
    a, b = TDigest(), TDigest()
    a.add(data[:50_000])
    b.add(data[50_000:])
    m = TDigest.from_bytes(a.to_bytes()).merge(TDigest.from_bytes(b.to_bytes()))
    for q in (0.01, 0.5, 0.9, 0.99):
        exact = np.quantile(data, q)
        assert abs(m.quantile(q) - exact) < 1.0, q  # well within 1 unit of 15-std data


def test_tdigest_bounded_size():
    td = TDigest(compression=100)
    td.add(np.random.default_rng(3).uniform(0, 1, 200_000))
    td._compress()
    assert td.means.size < 250  # ~compression centroids


def test_minhash_jaccard_estimate():
    from elasticsearch_ray.functions.dedup import minhash_signature, ngram_jaccard

    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("quick", "rapid")
    sa = minhash_signature(a)
    sb = minhash_signature(b)
    est = (sa == sb).mean()
    true_j = ngram_jaccard(a, b)
    assert abs(est - true_j) < 0.15


def test_simhash_similar_docs_close():
    from elasticsearch_ray.functions.dedup import simhash64

    a = "def compute_result(scan, merge): return scan + merge " * 10
    b = a.replace("merge", "merge2")
    c = "completely different content about window aggregation pipelines " * 10
    ham_ab = bin(simhash64(a) ^ simhash64(b)).count("1")
    ham_ac = bin(simhash64(a) ^ simhash64(c)).count("1")
    assert ham_ab < ham_ac
    assert simhash64(a) == simhash64(a)  # deterministic


def test_minhash_lsh_finds_planted_dup(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import minhash_dedup

    base = "query scan filter merge batch window column vector " * 30
    rows = [{"doc_id": i, "text": f"unique doc {i} " + "x" * 17 + f" content {i*7919}"}
            for i in range(40)]
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " tiny tail"})
    out = minhash_dedup(rd.from_items(rows), threshold=0.7)
    groups = dict(zip(out.doc_id, out.kept))
    assert groups.get(101) == 100  # near-dup collapsed to min id


def test_minhash_batch_signatures_match_per_doc():
    from elasticsearch_ray.functions.dedup import (
        minhash_signature,
        minhash_signatures_batch,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "ab",  # shorter than shingle_k -> padded
        "  Mixed   CASE   and \t whitespace\nnormalization  ",
        "query scan filter merge " * 50,
    ]
    batch = minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        assert (batch[i] == minhash_signature(t)).all(), f"doc {i}"


def test_minhash_verified_pairs_match_driver_path(ray_session):
    """The distributed in-bucket verification must produce the same verified
    pair set as the old driver-side path (candidates -> driver Jaccard)."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import (
        minhash_lsh_pairs,
        minhash_verified_pairs,
        ngram_jaccard,
    )

    base = "query scan filter merge batch window column vector " * 30
    rows = [{"doc_id": i, "text": f"unique doc {i} " + "y" * 13 + f" content {i*104729}"}
            for i in range(30)]
    rows += [
        {"doc_id": 100, "text": base},
        {"doc_id": 101, "text": base + " tiny tail"},
        {"doc_id": 102, "text": base.replace("merge", "blend")},
        {"doc_id": 200, "text": rows[5]["text"]},  # exact dup of doc 5
    ]
    texts = {r["doc_id"]: r["text"] for r in rows}
    threshold = 0.7
    # same banding both paths (the verified path defaults to the
    # threshold-matched b=16/r=8 since round 4)
    cand = minhash_lsh_pairs(rd.from_items(rows), bands=16)
    driver_pairs = {
        (int(a), int(b)) for a, b in zip(cand.doc_a, cand.doc_b)
        if ngram_jaccard(texts[int(a)], texts[int(b)]) >= threshold
    }
    dist = minhash_verified_pairs(rd.from_items(rows), threshold=threshold)
    dist_pairs = {(int(a), int(b)) for a, b in zip(dist.doc_a, dist.doc_b)}
    assert dist_pairs == driver_pairs
    assert (100, 101) in dist_pairs and (5, 200) in dist_pairs


def test_ingest_pipeline(ray_session):
    from elasticsearch_ray.functions import ingest as I

    t = pa.table({
        "msg": ["  Hello <b>World</b>  ", "FOO bar  "],
        "size": ["2kb", "3mb"],
        "js": ['{"k": 5}', "not json"],
    })
    pipe = I.pipeline(
        I.trim("msg"),
        I.html_strip("msg"),
        I.lowercase("msg"),
        I.bytes_human("size", "size_bytes"),
        I.json_parse("js", "k", "k_val"),
    )
    out = pipe(t)
    assert out["msg"].to_pylist() == ["hello world", "foo bar"]
    assert out["size_bytes"].to_pylist() == [2048, 3 << 20]
    assert out["k_val"].to_pylist() == [5, None]


def test_ingest_dissect_and_split():
    from elasticsearch_ray.functions import ingest as I

    t = pa.table({"line": ["alice - 200", "bob - 404"]})
    out = I.dissect("line", "%{user} - %{code}")(t)
    assert out["user"].to_pylist() == ["alice", "bob"]
    assert out["code"].to_pylist() == ["200", "404"]
    t2 = I.split("line", r"\s+-\s+", out="parts")(t)
    assert t2["parts"].to_pylist() == [["alice", "200"], ["bob", "404"]]


def test_multimodal_stub_raises_without_fake():
    from elasticsearch_ray.functions.multimodal import ImageDecodeStage, make_fake_media_table

    t = make_fake_media_table(4)
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(fake=False)(t)
    out = ImageDecodeStage(fake=True)(t)
    assert out.column_names == ["id", "width", "height", "mean_pixel"]
    assert len(out) == 4
    # deterministic fake
    out2 = ImageDecodeStage(fake=True)(make_fake_media_table(4))
    assert out.equals(out2)


def test_video_frame_sample_one_to_many():
    from elasticsearch_ray.functions.multimodal import (
        VideoFrameSampleStage,
        make_fake_media_table,
    )

    out = VideoFrameSampleStage(n_frames=4, fake=True)(make_fake_media_table(3, "video"))
    assert len(out) == 12
    assert out["frame_index"].to_pylist()[:4] == [0, 1, 2, 3]


def test_knn_lsh_recall_vs_brute(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.similarity import knn_brute_force, knn_lsh

    rng = np.random.default_rng(5)
    V = rng.standard_normal((400, 32)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(400)]
    ds = rd.from_items(rows)
    Q = V[:2]
    exact = knn_brute_force(ds, Q, k=5)
    approx = knn_lsh(ds, Q, k=5, n_planes=4, probe_hamming=1)
    # self-hit must always be rank 1 in both
    for qi in (0, 1):
        assert exact[exact.query_id == qi].iloc[0].vec_id == qi
        assert approx[approx.query_id == qi].iloc[0].vec_id == qi
    # LSH recall vs exact top-5 should be decent on 4 planes + probing
    got = set(map(tuple, approx[["query_id", "vec_id"]].to_numpy()))
    want = set(map(tuple, exact[["query_id", "vec_id"]].to_numpy()))
    assert len(got & want) >= 4


def test_fingerprint_deterministic_and_normalized():
    from elasticsearch_ray.functions.text import fingerprint_batch

    t1 = pa.table({"text": ["hello   world  foo", "hello world foo"]})
    out = fingerprint_batch(t1)["fingerprint"].to_pylist()
    assert out[0] == out[1]  # whitespace-normalized


def test_hamming_matrix_vectorized():
    from elasticsearch_ray.functions.dedup import _hamming_matrix

    rng = np.random.default_rng(11)
    h = rng.integers(0, 2**63, size=40, dtype=np.uint64)
    got = _hamming_matrix(h)
    for i in range(0, 40, 7):
        for j in range(0, 40, 5):
            assert got[i, j] == bin(int(h[i]) ^ int(h[j])).count("1")


def test_simhash_pairs_distributed_planted(ray_session):
    """Distributed quarter-bucketed simhash finds planted near-duplicates and
    is invariant to the number of input blocks."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [f"unrelated document number {i} with words {i*7} {i*13}" for i in range(40)]
    texts[5] = base
    texts[23] = base + "x"  # hamming(simhash) == 3
    df = pd.DataFrame({"doc_id": range(40), "text": texts})
    for nblocks in (1, 4):
        ds = rd.from_pandas(df).repartition(nblocks)
        pairs = simhash_pairs(ds, max_hamming=3)
        assert [5, 23] in pairs[["doc_a", "doc_b"]].values.tolist()


def test_embedding_dedup_blocked_exact(ray_session):
    """Blocked distributed similarity join == exact brute force, regardless
    of tile size (no driver-side whole-matrix materialization)."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import embedding_dedup_pairs

    rng = np.random.default_rng(5)
    V = rng.normal(size=(120, 16))
    V[60] = V[10] + rng.normal(scale=0.01, size=16)  # planted near-dup
    df = pd.DataFrame({"vec_id": range(120), "embedding": list(V)})
    ds = rd.from_pandas(df)
    full = embedding_dedup_pairs(ds, threshold=0.9, block=200)
    tiled = embedding_dedup_pairs(rd.from_pandas(df), threshold=0.9, block=30)
    assert full.astype(str).equals(tiled.astype(str))
    assert [10, 60] in full[["doc_a", "doc_b"]].values.tolist()


def test_geohash_encode_known_vectors():
    from elasticsearch_ray.pipelines.ops import geohash_encode

    # classic public test vector: (57.64911, 10.40744) -> u4pruydqqvj
    got = geohash_encode(np.array([57.64911]), np.array([10.40744]), 11)[0]
    assert got == "u4pruydqqvj"
    # prefixes at lower precision are consistent
    for p in (1, 2, 5):
        assert geohash_encode(np.array([57.64911]), np.array([10.40744]), p)[0] == \
            "u4pruydqqvj"[:p]
    assert geohash_encode(np.array([-25.382708]), np.array([-49.265506]), 8)[0] == \
        "6gkzwgjz"


def test_bmp_roundtrip_and_resize():
    from elasticsearch_ray.functions.multimodal import (
        bmp_decode,
        bmp_encode,
        resize_nearest,
    )

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)  # odd width -> padding
    assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb)
    small = resize_nearest(rgb, 5, 7)
    assert small.shape == (7, 5, 3)
    assert np.array_equal(bmp_decode(bmp_encode(small)), small)


def test_wav_roundtrip():
    from elasticsearch_ray.functions.multimodal import wav_decode, wav_encode

    s = (np.sin(np.linspace(0, 20, 800)) * 10000).astype(np.int16)
    out, rate = wav_decode(wav_encode(s, 8000))
    assert rate == 8000
    assert np.allclose(out * 32768.0, s, atol=0.5)


def test_video_container_sampling():
    from elasticsearch_ray.functions.multimodal import (
        VideoFrameSampleStage,
        bmp_decode,
        make_media_table,
        video_frame_offsets,
    )

    t = make_media_table(3, "video", seed=1)
    blob = t["media"][0].as_py()
    offs = video_frame_offsets(blob)
    assert len(offs) >= 4
    out = VideoFrameSampleStage(n_frames=2)(t)
    assert set(out["id"].to_pylist()) == {0, 1, 2}
    for f in out["frame"].to_pylist():
        assert bmp_decode(f).shape == (12, 16, 3)


def test_ingest_round2_processors():
    from elasticsearch_ray.functions import ingest as I

    t = pa.table({
        "line": ["GET /a 200 user=bob size=12", "POST /b 404 user=eve size=9"],
        "nums": [[3, 1, 2], [9, 7, 8]],
        "a.b": ["x", "y"],
        "ts": pa.array([np.datetime64("2024-01-05T10:00:00"),
                        np.datetime64("2024-02-01T00:30:00")]),
        "csvline": ['a,"b,c",d', "e,f,g"],
    })
    # grok
    g = I.grok("line", r"%{WORD:verb} %{NOTSPACE:path} %{INT:status}")(t)
    assert g["verb"].to_pylist() == ["GET", "POST"]
    assert g["status"].to_pylist() == ["200", "404"]
    # kv
    k = I.kv("line", " ", "=", out_prefix="kv_")(t)
    assert k["kv_user"].to_pylist() == ["bob", "eve"]
    assert k["kv_size"].to_pylist() == ["12", "9"]
    # csv (quoted field)
    c = I.csv_parse("csvline", ["c1", "c2", "c3"])(t)
    assert c["c2"].to_pylist() == ["b,c", "f"]
    # foreach (vectorized over flattened elements)
    import pyarrow.compute as pc

    fe = I.foreach("nums", lambda arr: pc.multiply(arr, 10))(t)
    assert fe["nums"].to_pylist() == [[30, 10, 20], [90, 70, 80]]
    # sort (list sort)
    so = I.sort_list("nums")(t)
    assert so["nums"].to_pylist() == [[1, 2, 3], [7, 8, 9]]
    # dot_expander
    de = I.dot_expander("a.b")(t)
    assert de["a"].to_pylist() == [{"b": "x"}, {"b": "y"}]
    # date_index_name
    dn = I.date_index_name("ts", "logs", "month")(t)
    assert dn["_index"].to_pylist() == ["logs-2024-01", "logs-2024-02"]
    # fail
    with pytest.raises(I.IngestFailure):
        I.fail_if(lambda tb: pc.equal(tb["csvline"], "e,f,g"))(t)


def test_index_sorted_pruning_reads_few_row_groups(ray_session):
    """Index-sorted parquet: the range filter's covering row groups (by
    min/max stats) are a small fraction of the file."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.pipelines.ops import (
        _sorted_orders_path,
        index_sorted_pruning,
    )

    sf = "/root/testdata/sf0.01"
    out = index_sorted_pruning(sf)
    assert int(out.doc_count.iloc[0]) > 0
    md = pq.ParquetFile(_sorted_orders_path(sf)).metadata
    col = None
    needed = 0
    for rg in range(md.num_row_groups):
        for ci in range(md.row_group(rg).num_columns):
            c = md.row_group(rg).column(ci)
            if c.path_in_schema == "o_totalprice":
                if c.statistics.max > 430000.0:
                    needed += 1
    assert md.num_row_groups >= 4
    assert needed <= md.num_row_groups // 2, \
        f"{needed}/{md.num_row_groups} row groups needed - no pruning benefit"


def test_percolator_matches_naive(ray_session):
    """Inverted-map percolation == naive per-(doc,query) evaluation, and the
    candidate-pair count is far below docs x queries (the QueryAnalyzer
    prefilter actually prunes)."""
    import ray.data as rd

    from elasticsearch_ray.analyzer import analyze_simple
    from elasticsearch_ray.functions.percolate import Percolator, percolate_dataset

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    docs = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab, size=12))}
            for i in range(200)]
    # 1000+ stored queries: conjunctions and disjunctions over the vocab
    queries = []
    for qid in range(1100):
        terms = list(rng.choice(vocab, size=rng.integers(1, 4), replace=False))
        msm = 1 if qid % 3 == 0 else len(terms)
        queries.append((qid, {"terms": terms, "minimum_should_match": msm}))

    out = percolate_dataset(rd.from_items(docs), queries)
    got = set(zip(out.doc_id, out.query_id))

    expected = set()
    for d in docs:
        toks = set(analyze_simple(d["text"]))
        for qid, spec in queries:
            k = spec.get("minimum_should_match", len(spec["terms"]))
            if sum(1 for t in spec["terms"] if t in toks) >= max(1, k):
                expected.add((d["doc_id"], qid))
    assert got == expected
    assert len(expected) > 0

    # structural sub-linearity: one local percolator over all docs sees far
    # fewer candidate pairs than the naive docs x queries product
    p = Percolator(queries)
    import pyarrow as pa_

    p(pa_.table({"doc_id": [d["doc_id"] for d in docs],
                 "text": [d["text"] for d in docs]}))
    assert p.candidate_pairs < 0.25 * len(docs) * len(queries)


def test_percolator_min_should_match():
    import pyarrow as pa_

    from elasticsearch_ray.functions.percolate import Percolator

    p = Percolator([
        (0, {"terms": ["alpha", "beta"]}),                      # AND
        (1, {"terms": ["alpha", "beta"], "minimum_should_match": 1}),  # OR
        (2, {"terms": ["gamma"]}),
    ])
    t = pa_.table({"doc_id": [10, 11, 12],
                   "text": ["alpha beta now", "alpha only", "gamma ray"]})
    out = p(t).to_pandas()
    pairs = set(zip(out.doc_id, out.query_id))
    assert pairs == {(10, 0), (10, 1), (11, 1), (12, 2)}


def test_geo_wkt_and_relations():
    from elasticsearch_ray.geo import (
        boxes_intersect_convex,
        boxes_within_convex,
        parse_wkt,
        points_in_polygon,
        segments_intersect_boxes,
    )

    kind, rings = parse_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert kind == "polygon" and len(rings) == 2
    x = np.array([5.0, 5.0, 20.0, 1.0])
    y = np.array([1.0, 5.0, 5.0, 1.0])
    # (5,5) falls in the hole; (20,5) outside; others inside
    assert points_in_polygon(rings, x, y).tolist() == [True, False, False, True]

    ring = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")[1][0]
    blo = np.array([[2.0, 2.0], [8.0, 8.0], [20.0, 20.0]])
    bhi = np.array([[4.0, 4.0], [12.0, 12.0], [22.0, 22.0]])
    assert boxes_within_convex(ring, blo, bhi).tolist() == [True, False, False]
    assert boxes_intersect_convex(ring, blo, bhi).tolist() == [True, True, False]

    kind, line = parse_wkt("LINESTRING (-5 -5, 15 15)")
    hit = segments_intersect_boxes(line, blo, bhi)
    # diagonal passes through the first two boxes, misses the third
    assert hit.tolist() == [True, True, False]


def test_geo_envelope_parse():
    from elasticsearch_ray.geo import parse_wkt

    kind, box = parse_wkt("ENVELOPE (-10, 10, 20, -20)")
    assert kind == "envelope"
    assert box.tolist() == [[-10.0, -20.0], [10.0, 20.0]]


def test_ingest_append():
    from elasticsearch_ray.functions.ingest import append

    t = pa.table({"tags": [["a"], [], ["b", "c"]]})
    assert append("tags", ["x", "y"])(t)["tags"].to_pylist() == \
        [["a", "x", "y"], ["x", "y"], ["b", "c", "x", "y"]]
    t2 = pa.table({"tag": ["a", "b"]})  # scalar promoted to list
    assert append("tag", "z")(t2)["tag"].to_pylist() == [["a", "z"], ["b", "z"]]
    t3 = pa.table({"v": [1, 2]})  # absent field created
    assert append("new", 9)(t3)["new"].to_pylist() == [[9], [9]]


def test_hdr_percentiles_accuracy_and_merge():
    from elasticsearch_ray.aggs.hdr import HdrSketch

    rng = np.random.default_rng(3)
    data = rng.gamma(2.0, 100.0, 100_000)
    a, b = HdrSketch(), HdrSketch()
    a.add(data[:50_000])
    b.add(data[50_000:])
    m = HdrSketch.from_bytes(a.to_bytes()).merge(HdrSketch.from_bytes(b.to_bytes()))
    for p in (50, 90, 99, 99.9):
        exact = np.percentile(data, p)
        assert abs(m.percentile(p) - exact) / exact < 2e-3, p


def test_hdr_aggregate_fn_distributed(ray_session):
    import ray.data as rd

    from elasticsearch_ray.aggs.hdr import hdr_aggregate_fn

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 500, 20_000)
    ds = rd.from_items([{"value": float(v)} for v in vals])
    res = ds.aggregate(hdr_aggregate_fn("value", [0.5, 0.99]))
    got = res["percentiles_hdr"] if isinstance(res, dict) else res
    for q, g in zip((0.5, 0.99), got):
        exact = np.quantile(vals, q)
        assert abs(g - exact) / exact < 2e-3


def test_embedding_dedup_lsh_recall(ray_session):
    """LSH-bucketed near-dup finds the vast majority of exact over-threshold
    pairs (multi-round hyperplane bucketing), and every reported pair is a
    true positive with the exact cosine."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import (
        embedding_dedup_lsh,
        embedding_dedup_pairs,
    )

    rng = np.random.default_rng(21)
    base = rng.standard_normal((120, 24))
    rows = []
    vid = 0
    for i in range(120):
        rows.append({"vec_id": vid, "embedding": base[i].tolist()}); vid += 1
        if i % 4 == 0:  # planted near-dup
            dup = base[i] + rng.normal(0, 0.02, 24)
            rows.append({"vec_id": vid, "embedding": dup.tolist()}); vid += 1
    ds = rd.from_items(rows)
    exact = embedding_dedup_pairs(ds, threshold=0.95, block=64)
    approx = embedding_dedup_lsh(ds, threshold=0.95, n_planes=6, n_rounds=4)
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    approx_pairs = set(zip(approx.doc_a, approx.doc_b))
    assert approx_pairs <= exact_pairs  # no false positives
    recall = len(approx_pairs) / max(1, len(exact_pairs))
    assert recall >= 0.9, recall


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """Prefix-filtered distributed all-pairs must equal brute-force O(n^2)
    Jaccard over every pair — no false negatives (prefix lemma) and no
    extras, with the similarity values themselves matching."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import ngram_jaccard, ngram_jaccard_pairs
    from elasticsearch_ray.utils import round_half_away

    base = "query scan filter merge batch window column vector " * 20
    rows = [{"doc_id": i, "text": f"unique doc {i} " + "z" * 11 + f" body {i*7919}"}
            for i in range(25)]
    rows += [
        {"doc_id": 100, "text": base},
        {"doc_id": 101, "text": base + " tiny tail"},
        {"doc_id": 102, "text": base.replace("merge", "blend")},
        {"doc_id": 200, "text": rows[3]["text"]},  # exact dup
    ]
    threshold = 0.6
    out = ngram_jaccard_pairs(rd.from_items(rows), threshold=threshold)
    got = {(int(a), int(b)): j for a, b, j in zip(out.doc_a, out.doc_b, out.jaccard)}
    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            jac = ngram_jaccard(a["text"], b["text"])
            if jac >= threshold:
                key = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                want[key] = float(round_half_away(jac, 6))
    assert got == want
    assert (100, 101) in got and (3, 200) in got  # planted near-dup + exact dup


def test_parse_wkt_multi_geometries():
    """WKT multi-geometry parsing (common/geo parsers): MULTIPOINT both
    forms, MULTILINESTRING, MULTIPOLYGON with holes, GEOMETRYCOLLECTION."""
    import numpy as np

    from elasticsearch_ray.geo import parse_wkt, points_in_polygon

    k, pts = parse_wkt("MULTIPOINT (10 40, 40 30)")
    assert k == "multipoint" and pts.shape == (2, 2)
    k, pts2 = parse_wkt("MULTIPOINT ((10 40), (40 30))")
    assert np.array_equal(pts, pts2)
    k, lines = parse_wkt("MULTILINESTRING ((1 1, 2 2), (4 4, 3 3, 4 2))")
    assert k == "multilinestring" and len(lines) == 2 and lines[1].shape == (3, 2)
    k, polys = parse_wkt(
        "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)),"
        " ((10 10, 12 10, 11 12, 10 10)))")
    assert k == "multipolygon" and len(polys) == 2
    assert len(polys[0]) == 2  # outer + hole
    x = np.array([0.5, 1.5, 11.0, 20.0])
    y = np.array([0.5, 1.5, 10.5, 20.0])
    inside = np.zeros(4, bool)
    for rings in polys:
        inside |= points_in_polygon(rings, x, y)
    assert inside.tolist() == [True, False, True, False]  # hole excluded
    k, geoms = parse_wkt("GEOMETRYCOLLECTION (POINT (4 6), LINESTRING (4 6, 7 10))")
    assert k == "geometrycollection" and geoms[0][0] == "point"


def test_terms_agg_options_key_order_and_min_doc_count(ray_session):
    import elasticsearch_ray.aggs.aggregations as A
    from elasticsearch_ray.pipelines import ops

    SF = "/root/testdata/sf0.001"

    ds = ops._ds(SF, "events", ["event_type", "value"])
    out = A.terms_agg_options(ds, "event_type", order=("_key", "asc"))
    assert list(out["event_type"]) == sorted(out["event_type"])
    # a threshold above every bucket's count empties the table
    hi = int(out["doc_count"].max()) + 1
    out2 = A.terms_agg_options(ds, "event_type", min_doc_count=hi)
    assert len(out2) == 0
    # include regex keeps only the named keys
    out3 = A.terms_agg_options(ds, "event_type", include="view|click")
    assert set(out3["event_type"]) == {"view", "click"}


def test_histogram_options_offset_and_empty_fill(ray_session):
    import numpy as np

    import elasticsearch_ray.aggs.aggregations as A
    from elasticsearch_ray.pipelines import ops

    SF = "/root/testdata/sf0.001"

    ds = ops._ds(SF, "events", ["value"])
    out = A.histogram_options(ds, "value", 50.0, offset=25.0, min_doc_count=0,
                              extended_bounds=(0.0, 700.0))
    b = out["bucket"].to_numpy()
    assert np.allclose(np.diff(b), 50.0)          # contiguous buckets
    assert b[-1] == 675.0 and b[0] <= 0.0         # extended to bounds
    assert (out["doc_count"].to_numpy() == 0).any()  # empty buckets real
    # doc totals preserved by the fill
    assert int(out["doc_count"].sum()) == ds.count()


def test_ingest_user_agent():
    from elasticsearch_ray.functions.ingest import user_agent

    t = pa.table({"ua": [
        "Mozilla/5.0 (Windows NT 6.1; Win64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/96.0.4664.110 Safari/537.36",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:95.0) "
        "Gecko/20100101 Firefox/95.0",
        "Mozilla/5.0 (iPad; CPU OS 15_0 like Mac OS X) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/15.0 Mobile/15E148 Safari/604.1",
        "Mozilla/5.0 (Windows NT 10.0; WOW64; Trident/7.0; rv:11.0) "
        "like Gecko",
        "Opera/something OPR/82.0.4227.23",
        None,
    ]})
    out = user_agent("ua", ignore_missing=True)(t)
    assert out["ua_name"].to_pylist() == \
        ["Chrome", "Firefox", "Safari", "IE", "Opera", None]
    assert out["ua_major"].to_pylist() == ["96", "95", "15", "11", "82", None]
    assert out["ua_os"].to_pylist() == \
        ["Windows 7", "Windows 10", "iOS 15.0", "Windows 10", "Other", None]
    assert out["ua_device"].to_pylist() == \
        ["Other", "Other", "iPad", "Other", "Other", None]
    # null without ignore_missing raises, per UserAgentProcessor.execute()
    with pytest.raises(ValueError):
        user_agent("ua")(t)
    # properties subset limits emitted fields
    narrow = user_agent("ua", properties=["name"], ignore_missing=True)(t)
    assert "ua_name" in narrow.column_names
    assert "ua_os" not in narrow.column_names


def test_ingest_geoip():
    from elasticsearch_ray.functions.ingest import geoip

    t = pa.table({"ip": ["1.255.0.1", "24.0.0.0", "9.1.1.1", None]})
    out = geoip("ip", ignore_missing=True)(t)
    assert out["geo_city_name"].to_pylist() == ["Sydney", "New York",
                                                None, None]
    assert out["geo_country_iso_code"].to_pylist() == ["AU", "US",
                                                       None, None]
    assert out["geo_lat"].to_pylist()[:2] == [-33.8688, 40.7128]
    with pytest.raises(ValueError):
        geoip("ip")(t)


def test_murmur3_x64_128_vectors():
    from elasticsearch_ray.functions.text import murmur3_x64_128

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    # published mmh3 reference vector for 'foo', seed 0
    h1, h2 = murmur3_x64_128(b"foo")
    assert (signed(h1), signed(h2)) == \
        (-2129773440516405919, 9128664383759220103)
    assert murmur3_x64_128(b"") == (0, 0)
    # exercise every tail-length branch + the block loop; distinct inputs
    # must produce distinct h1 (the long the mapper stores)
    seen = set()
    for n in range(0, 40):
        h1, _ = murmur3_x64_128(bytes(range(n)) * 2)
        assert h1 not in seen
        seen.add(h1)
    # stability across calls
    assert murmur3_x64_128(b"x" * 17) == murmur3_x64_128(b"x" * 17)


def test_ingest_attachment():
    import base64

    from elasticsearch_ray.functions.ingest import attachment

    t = pa.table({"data": [
        base64.b64encode(b"plain text body").decode(),
        base64.b64encode(
            b"<html><head><title>My Doc</title></head>"
            b"<body>Hello <b>World</b></body></html>").decode(),
        base64.b64encode(b"%PDF-1.4 fake").decode(),
        None,
    ]})
    ok = attachment("data", ignore_missing=True)(t.slice(0, 2))
    assert ok["attachment_content_type"].to_pylist() == \
        ["text/plain", "text/html"]
    assert ok["attachment_content"].to_pylist()[1] == "Hello World"
    assert ok["attachment_title"].to_pylist() == [None, "My Doc"]
    assert ok["attachment_content_length"].to_pylist() == [15, 11]
    # binary formats raise the documented Tika-less stub error
    with pytest.raises(NotImplementedError):
        attachment("data")(t.slice(2, 1))
    # null handling mirrors the processor contract
    with pytest.raises(ValueError):
        attachment("data")(t.slice(3, 1))
    out = attachment("data", ignore_missing=True,
                     indexed_chars=5)(t.slice(0, 1))
    assert out["attachment_content"].to_pylist() == ["plain"]


def test_decontaminate_flags_planted_overlap(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    rows = [
        {"doc_id": 1, "text": "completely unrelated content about rivers"},
        # contains a 13-token window only when n is small; plant a 5-gram
        {"doc_id": 2, "text": "intro quick brown fox jumps over outro"},
        {"doc_id": 3, "text": "quick brown fox but then it diverges"},
    ]
    out = decontaminate(rd.from_items(rows), bench, n=5)
    assert out.doc_id.tolist() == [2]
    assert out.overlap_grams.tolist() == [1]
    # n=3 also catches doc 3's shorter overlap
    out3 = decontaminate(rd.from_items(rows), bench, n=3)
    assert out3.doc_id.tolist() == [2, 3]


def test_repetition_ratios():
    from elasticsearch_ray.functions.text import repetition_ratios_batch

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["spam spam spam spam",
                           "all words here are entirely distinct tokens",
                           "x"]})
    out = repetition_ratios_batch(t)
    # "spam spam" x3 occurrences, 1 unique -> 2/3 duplicated
    assert abs(out["dup_2gram_frac"].to_pylist()[0] - 2 / 3) < 1e-12
    assert out["dup_2gram_frac"].to_pylist()[1] == 0.0
    assert out["dup_2gram_frac"].to_pylist()[2] == 0.0  # too short -> 0
    assert out["dup_3gram_frac"].to_pylist()[0] == 0.5


def test_redact_pii():
    from elasticsearch_ray.functions.text import redact_pii_batch

    t = pa.table({"text": [
        "mail a@b.co and c.d+x@e-f.org now",
        "call +1 (555) 010-9999 or 555 123 4567 x",
        "host 192.168.0.1 and 10.0.0.255",
        "clean text with no pii at all",
    ]})
    out = redact_pii_batch(t)
    texts = out["text"].to_pylist()
    assert texts[0].count("[PII:email]") == 2
    assert texts[1].count("[PII:phone]") == 2
    assert texts[2].count("[PII:ipv4]") == 2
    assert out["n_redactions"].to_pylist() == [2, 2, 2, 0]
    assert "a@b.co" not in texts[0] and "192.168.0.1" not in texts[2]


def test_hll_float32_and_nulls():
    from elasticsearch_ray.aggs.hll import HllSketch, hash64

    v32 = np.arange(1001, dtype=np.float32)  # odd length would crash view()
    h = hash64(v32)
    assert h.size == v32.size
    s = HllSketch()
    s.add(v32)
    assert abs(s.estimate() - 1001) / 1001 < 0.05


def test_histogram_ignores_nulls(ray_session):
    import ray.data as rd

    from elasticsearch_ray.aggs.aggregations import histogram

    ds = rd.from_items([{"v": 1.0}, {"v": None}, {"v": 11.0}, {"v": None}])
    out = histogram(ds, "v", width=10.0)
    assert out["bucket"].tolist() == [0.0, 10.0]
    assert out["doc_count"].tolist() == [1, 1]


def test_knn_lsh_probe_hamming_two(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.similarity import knn_brute_force, knn_lsh

    rng = np.random.default_rng(9)
    V = rng.standard_normal((300, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(300)]
    Q = V[:4] + rng.standard_normal((4, 16)).astype(np.float32) * 0.05
    exact = knn_brute_force(rd.from_items(rows), Q, k=5)
    r1 = knn_lsh(rd.from_items(rows), Q, k=5, n_planes=10, probe_hamming=1)
    r2 = knn_lsh(rd.from_items(rows), Q, k=5, n_planes=10, probe_hamming=2)

    def recall(approx):
        hits = 0
        for qi in range(4):
            e = set(exact[exact.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            hits += len(e & a)
        return hits / (4 * 5)

    # wider probing must never lose recall
    assert recall(r2) >= recall(r1)


def test_simhash_max_hamming_validated(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import simhash_pairs

    with pytest.raises(ValueError, match="max_hamming <= 3"):
        simhash_pairs(rd.from_items([{"doc_id": 1, "text": "x"}]),
                      max_hamming=4)


def test_gopher_flags():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import gopher_flags_batch

    good = ("the data " + "pipeline builds index shards with care "
            "and that should have weight ") * 4  # >50 words, sane ratios
    bullets = "- one\n- two\n- three\n* four"
    dots = "first line...\nsecond...\nthird is fine"
    symbols = "## " * 30 + "the of and that"
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array([good, bullets, dots, symbols])})
    out = gopher_flags_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[0, "kept"] == 1
    assert out.loc[1, "bullet_frac"] == 1.0 and out.loc[1, "kept"] == 0
    assert abs(out.loc[2, "ellipsis_frac"] - 0.6667) < 1e-9
    assert out.loc[3, "symbol_ratio"] > 0.1 and out.loc[3, "kept"] == 0
    # word-count lower bound
    assert out.loc[1, "n_words"] < 50


def test_gopher_empty_doc():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import gopher_flags_batch

    out = gopher_flags_batch(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([""], pa.string())})).to_pandas()
    assert out["kept"][0] == 0 and out["n_words"][0] == 0


def test_c4_filter_rules():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import c4_filter_batch

    page_ok = "one two three.\nfour five six!\nseven eight nine?"
    page_js = "one two three.\nthe javascript line here.\nfour five six.\nseven eight nine."
    page_short = "just one line here."
    page_brace = "one two three.\nfour { five six.\nseven eight nine.\nmore words here."
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "page": pa.array([page_ok, page_js, page_short,
                                    page_brace])})
    out = c4_filter_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[0, "kept"] == 1 and out.loc[0, "n_kept_lines"] == 3
    # javascript line dropped, 3 survive -> kept
    assert out.loc[1, "n_kept_lines"] == 3 and out.loc[1, "kept"] == 1
    assert "javascript" not in out.loc[1, "cleaned"]
    assert out.loc[2, "kept"] == 0
    # '{' in cleaned text kills the page even with >=3 lines
    assert out.loc[3, "n_kept_lines"] == 4 and out.loc[3, "kept"] == 0
    # two-word line fails the >=3-words rule
    t2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                   "page": pa.array(["too short."])})
    assert c4_filter_batch(t2).to_pandas()["n_kept_lines"][0] == 0


def test_ngram_char_fractions():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import ngram_char_fraction_batch

    # "a b a b c": top 2-gram "a b" x2, chars=2, total=5 -> 0.8
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([
                      "a b a b c",
                      "the quick brown fox jumps the quick brown fox jumps",
                      ""])})
    out = (ngram_char_fraction_batch(t).to_pandas().set_index("doc_id"))
    assert out.loc[0, "top_2gram_char_frac"] == 0.8
    # doc 1: the repeated 5-gram covers all 10 gram slots x chars
    assert out.loc[1, "dup_5gram_char_frac"] > 0.9
    assert out.loc[2, "top_2gram_char_frac"] == 0.0
    assert out.loc[2, "dup_5gram_char_frac"] == 0.0


def test_bloom_filter_no_false_negatives():
    import numpy as np

    from elasticsearch_ray.functions.dedup import BloomFilter

    items = [f"gram number {i} here" for i in range(5000)]
    bl = BloomFilter(items, bits_pow=18, k=4)
    arr = np.asarray(items, dtype=object)
    assert bl.contains(arr).all()
    # false-positive rate on fresh strings stays small at this sizing
    probe = np.asarray([f"unseen {i} probe" for i in range(5000)],
                       dtype=object)
    assert bl.contains(probe).mean() < 0.02
    assert not BloomFilter([], bits_pow=10).contains(probe).any()


def test_decontaminate_bloom_matches_exact(ray_session):
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    bench = ["the held out benchmark question about rayon scheduling",
             "another eval prompt with exact numeric answer forty two"]
    rows = [{"doc_id": i,
             "text": f"doc {i} filler words " + "alpha beta gamma " * 5}
            for i in range(20)]
    rows[7]["text"] += " benchmark question about rayon scheduling indeed"
    rows[13]["text"] += " exact numeric answer forty two"
    ds = rd.from_items(rows)
    a = decontaminate(ds, bench, n=4)
    b = decontaminate_bloom(rd.from_items(rows), bench, n=4, bits_pow=16)
    assert a.equals(b)
    assert set(a["doc_id"]) == {7, 13}


def test_cdc_insertion_stability():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import cdc_chunks_batch

    base = ("rolling hash chunk boundaries depend only on local content "
            "so a prefix insertion shifts but does not rewrite them ") * 6
    edited = "INSERTED PREFIX WORDS " + base
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([base, edited])})
    out = cdc_chunks_batch(t).to_pandas()
    a = set(out[out.doc_id == 0]["chunk"])
    b = set(out[out.doc_id == 1]["chunk"])
    # most of the original chunks survive the prefix edit verbatim
    assert len(a & b) >= len(a) - 2
    # chunks reassemble the normalized text exactly, in order
    joined = "".join(out[out.doc_id == 0].sort_values("chunk_idx")["chunk"])
    assert joined == " ".join(base.lower().split())


def test_cdc_short_and_empty_docs():
    import pyarrow as pa

    from elasticsearch_ray.functions.text import cdc_chunks_batch

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["", "tiny"])})
    out = cdc_chunks_batch(t).to_pandas()
    # empty doc emits nothing; sub-window doc is one whole chunk
    assert list(out["doc_id"]) == [1]
    assert out["chunk"][0] == "tiny" and out["length"][0] == 4
