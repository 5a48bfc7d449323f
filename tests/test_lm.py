"""Unigram-LM scoring (functions/lm.py): perplexity + DSIR weights vs a
driver-side reference implementation, hashed-feature mode, empty docs."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from elasticsearch_ray.functions import lm as LM


def _ref_model(texts, alpha=0.5):
    from collections import Counter
    c = Counter(w for t in texts for w in t.lower().split())
    n = sum(c.values())
    v = len(c)
    denom = n + alpha * (v + 1)
    return c, n, v, denom, alpha


def _ref_ppl(text, model):
    c, n, v, denom, alpha = model
    toks = text.lower().split()
    if not toks:
        return None
    lps = [math.log((c.get(w, 0) + alpha) / denom) for w in toks]
    return math.exp(-sum(lps) / len(lps))


TRAIN = ["the quick brown fox", "the lazy dog sleeps", "quick dog runs"]
SCORE = ["the quick dog", "unseen words entirely", "the the the", ""]


def test_perplexity_matches_reference():
    train = rd.from_pandas(pd.DataFrame({"text": TRAIN}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": SCORE}))
    model = LM.fit_unigram_lm(train)
    out = LM.perplexity(docs, model).to_pandas().set_index("doc_id")["ppl"]
    ref = _ref_model(TRAIN)
    for i, text in enumerate(SCORE):
        want = _ref_ppl(text, ref)
        if want is None:
            assert i not in out.index  # token-less doc dropped
        else:
            assert abs(out[i] - want) < 1e-9


def test_in_domain_text_scores_lower():
    train = rd.from_pandas(pd.DataFrame({"text": TRAIN}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["the quick dog", "zzz qqq vvv"]}))
    model = LM.fit_unigram_lm(train)
    out = LM.perplexity(docs, model).to_pandas().set_index("doc_id")["ppl"]
    assert out[0] < out[1]


def test_dsir_weights_match_reference():
    target_texts = ["alpha beta gamma", "beta gamma delta"]
    source_texts = target_texts + ["noise words here", "more noise tokens"]
    target = LM.fit_unigram_lm(
        rd.from_pandas(pd.DataFrame({"text": target_texts})))
    source = LM.fit_unigram_lm(
        rd.from_pandas(pd.DataFrame({"text": source_texts})))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["alpha beta", "noise tokens"]}))
    out = (LM.importance_weights(docs, target, source)
           .to_pandas().set_index("doc_id")["weight"])
    rt, rs = _ref_model(target_texts), _ref_model(source_texts)

    def ref_weight(text):
        toks = text.lower().split()
        lr = [math.log((rt[0].get(w, 0) + 0.5) / rt[3])
              - math.log((rs[0].get(w, 0) + 0.5) / rs[3]) for w in toks]
        return sum(lr) / len(lr)

    assert abs(out[0] - ref_weight("alpha beta")) < 1e-9
    assert abs(out[1] - ref_weight("noise tokens")) < 1e-9
    # target-like doc weighs higher than out-of-domain doc
    assert out[0] > out[1]


def test_hashed_mode_consistent():
    # with enough buckets to avoid collisions on a tiny vocab, hashed
    # scoring equals raw scoring
    train = rd.from_pandas(pd.DataFrame({"text": TRAIN}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64), "text": SCORE[:3]}))
    raw = LM.fit_unigram_lm(train)
    hashed = LM.fit_unigram_lm(train, num_hash_buckets=1 << 20)
    out_raw = (LM.perplexity(docs, raw)
               .to_pandas().set_index("doc_id")["ppl"])
    out_hash = (LM.perplexity(docs, hashed, num_hash_buckets=1 << 20)
                .to_pandas().set_index("doc_id")["ppl"])
    assert np.allclose(out_raw.sort_index(), out_hash.sort_index())


def test_bigram_perplexity_matches_reference():
    train = rd.from_pandas(pd.DataFrame({"text": TRAIN}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64), "text": SCORE}))
    model = LM.fit_bigram_lm(train, alpha=0.5, lam=0.7)
    out = (LM.bigram_perplexity(docs, model)
           .to_pandas().set_index("doc_id")["ppl"])

    # driver reference
    from collections import Counter
    uni = Counter(w for t in TRAIN for w in t.lower().split())
    n, v = sum(uni.values()), len(uni)
    denom = n + 0.5 * (v + 1)
    big = Counter()
    ctx = Counter()
    for t in TRAIN:
        ws = t.lower().split()
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
            ctx[a] += 1

    def pu(w):
        return (uni.get(w, 0) + 0.5) / denom

    for i, text in enumerate(SCORE):
        ws = text.lower().split()
        if not ws:
            assert i not in out.index
            continue
        lps = [math.log(pu(ws[0]))]
        for a, b in zip(ws, ws[1:]):
            bg = big.get((a, b), 0) / ctx[a] if ctx.get(a) else 0.0
            lps.append(math.log(0.7 * bg + (1 - 0.7) * pu(b)))
        want = math.exp(-sum(lps) / len(lps))
        assert abs(out[i] - want) < 1e-9


def test_bigram_beats_unigram_on_in_domain_order():
    # a doc using training word ORDER should score lower under the bigram
    # model than a scrambled version of the same tokens
    train = rd.from_pandas(pd.DataFrame({"text": TRAIN * 3}))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["the quick brown fox", "fox the brown quick"]}))
    model = LM.fit_bigram_lm(train, alpha=0.5, lam=0.7)
    out = (LM.bigram_perplexity(docs, model)
           .to_pandas().set_index("doc_id")["ppl"])
    assert out[0] < out[1]


def test_nb_classify_matches_reference():
    a_texts = ["alpha beta gamma", "beta gamma delta", "alpha gamma"]
    b_texts = ["noise words here", "more noise tokens"]
    lm_a = LM.fit_unigram_lm(rd.from_pandas(pd.DataFrame({"text": a_texts})))
    lm_b = LM.fit_unigram_lm(rd.from_pandas(pd.DataFrame({"text": b_texts})))
    prior = math.log(len(a_texts) / len(b_texts))
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([0, 1], dtype=np.int64),
         "text": ["alpha beta gamma", "noise tokens here"]}))
    out = (LM.nb_classify(docs, lm_a, lm_b, log_prior_diff=prior)
           .to_pandas().set_index("doc_id"))
    ra, rb = _ref_model(a_texts), _ref_model(b_texts)

    def ref_odds(text):
        ws = text.lower().split()
        s = prior
        for w in ws:
            s += (math.log((ra[0].get(w, 0) + 0.5) / ra[3])
                  - math.log((rb[0].get(w, 0) + 0.5) / rb[3]))
        return s

    assert abs(out.loc[0, "log_odds"] - ref_odds("alpha beta gamma")) < 1e-9
    assert abs(out.loc[1, "log_odds"] - ref_odds("noise tokens here")) < 1e-9
    assert out.loc[0, "pred"] == "a" and out.loc[1, "pred"] == "b"


def test_ngram_counts_hand_vector():
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions import lm as LM

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b a b", "a b"], pa.string())}))
    got = {(r["w1"], r["w2"]): r["c"]
           for r in LM.ngram_counts(ds, n=2).take_all()}
    assert got == {("<s>", "a"): 2, ("a", "b"): 3, ("b", "a"): 1,
                   ("b", "</s>"): 2}
    tri = {(r["w1"], r["w2"], r["w3"]): r["c"]
           for r in LM.ngram_counts(ds, n=3, min_count=2).take_all()}
    assert tri == {("<s>", "a", "b"): 2, ("a", "b", "</s>"): 2}


def test_ngram_counts_empty_and_partitioned():
    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions import lm as LM

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["", "x", ""], pa.string())})).repartition(3)
    got = {(r["w1"], r["w2"]): r["c"]
           for r in LM.ngram_counts(ds, n=2).take_all()}
    # empty docs still contribute the (<s>, </s>) bigram
    assert got == {("<s>", "</s>"): 2, ("<s>", "x"): 1, ("x", "</s>"): 1}


def test_kn_bigram_hand_vector():
    import math

    import pyarrow as pa
    import ray

    from elasticsearch_ray.functions import lm as LM

    ref = ["a b", "a b", "a c"]
    # bigrams with BOS/EOS: (<s>,a)x3 (a,b)x2 (a,c)x1 (b,</s>)x2 (c,</s>)x1
    ds = ray.data.from_arrow(pa.table({"text": pa.array(ref, pa.string())}))
    m = LM.fit_kn_bigram(ds, D=0.75, alpha=0.5)
    assert m.T == 5 and m.Vc == 4  # types; continuations {a,b,c,</s>}
    def pcont(n1b):
        return (n1b + 0.5) / (m.T + 0.5 * (m.Vc + 1))
    # score "a b": positions (<s>,a) (a,b) (b,</s>)
    # c(<s>)=3, N1f(<s>)=1; c(a)=3, N1f(a)=2; c(b)=2, N1f(b)=1
    p1 = max(3 - 0.75, 0) / 3 + 0.75 * 1 / 3 * pcont(1)   # (<s>,a), N1b(a)=1
    p2 = max(2 - 0.75, 0) / 3 + 0.75 * 2 / 3 * pcont(1)   # (a,b),  N1b(b)=1
    p3 = max(2 - 0.75, 0) / 2 + 0.75 * 1 / 2 * pcont(2)   # (b,</s>), N1b=2
    want = math.exp(-(math.log(p1) + math.log(p2) + math.log(p3)) / 3)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b", "zzz"], pa.string())}))
    out = (LM.kn_perplexity(docs, m).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert abs(out["ppl"][0] - want) < 1e-12
    # OOV doc "zzz": (<s>, zzz) context IS seen -> backoff term only;
    # (zzz, </s>) context unseen -> pure continuation prob
    p_oov = 0.75 * 1 / 3 * pcont(0)   # max(0-D,0)/3 + D*N1f(<s>)/3 * pcont
    p_eos = pcont(2)                  # N1b(</s>) = 2
    want1 = math.exp(-(math.log(p_oov) + math.log(p_eos)) / 2)
    assert abs(out["ppl"][1] - want1) < 1e-12
