"""paragraph_dedup (functions/dedup.py): planted duplicate paragraphs,
keep-first ordering, and partition invariance."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from elasticsearch_ray.functions.dedup import paragraph_dedup


def _run(df: pd.DataFrame, chunk_words: int, parts: int = 3) -> pd.DataFrame:
    ds = rd.from_pandas(df).repartition(parts)
    out = paragraph_dedup(ds, chunk_words=chunk_words).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_planted_duplicate_paragraph_removed():
    dup = "alpha beta gamma delta"  # one 4-word chunk
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{dup} one two three four",
                 f"zero zero zero zero {dup}",
                 "unique words only here"],
    })
    out = _run(df, chunk_words=4)
    # doc 1 owns the first occurrence (doc order), doc 2 loses its copy
    assert out.loc[0, "text_dedup"] == f"{dup} one two three four"
    assert out.loc[1, "text_dedup"] == "zero zero zero zero"
    assert out.loc[1, "n_kept"] == 1 and out.loc[1, "n_total"] == 2
    assert out.loc[2, "n_kept"] == out.loc[2, "n_total"] == 1


def test_keep_first_within_doc():
    # same chunk twice inside ONE doc: second occurrence dropped
    df = pd.DataFrame({"doc_id": [7],
                       "text": ["a b a b c d"]})
    out = _run(df, chunk_words=2)
    assert out.loc[0, "text_dedup"] == "a b c d"
    assert out.loc[0, "n_kept"] == 2 and out.loc[0, "n_total"] == 3


def test_partition_invariance():
    rows = []
    words = ["w%d" % (i % 9) for i in range(200)]
    for d in range(20):
        rows.append({"doc_id": d, "text": " ".join(words[d:d + 30])})
    df = pd.DataFrame(rows)
    outs = [_run(df, chunk_words=3, parts=p) for p in (1, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_empty_text():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["", "x y"]})
    out = _run(df, chunk_words=2)
    # "" splits to [''] -> one empty chunk, kept (it is globally first)
    assert out.loc[0, "n_total"] == 1
    assert out.loc[1, "text_dedup"] == "x y"


def test_canonicalize_url_rules():
    from elasticsearch_ray.functions.text import canonicalize_url as c
    assert c("HTTPS://WWW.Ex.COM:443/A/?utm_source=x&b=2&a=1#f") == "https://ex.com/A?a=1&b=2"
    assert c("http://ex.com:80/") == "http://ex.com"
    assert c("http://ex.com:8080/p/") == "http://ex.com:8080/p"
    assert c("https://ex.com/p?gclid=1&fbclid=2&ref=z") == "https://ex.com/p"
    assert c("https://ex.com/p?z=1&a=2") == "https://ex.com/p?a=2&z=1"
    assert c("not a url") == "not a url"
    assert c("") == ""


def test_substring_dedup_planted_span():
    from elasticsearch_ray.functions.dedup import substring_dedup
    span = "s1 s2 s3 s4"  # 4-gram planted in two docs
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"a b {span} c d",
                 f"x {span} y z w",
                 "p q r s t u v w"],
    })
    out = (substring_dedup(rd.from_pandas(df).repartition(2), gram_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "n_removed"] == 0              # first occurrence kept
    assert out.loc[1, "text_clean"] == "x y z w"     # span cut from doc 2
    assert out.loc[1, "n_removed"] == 4
    assert out.loc[2, "n_removed"] == 0


def test_substring_dedup_overlapping_spans_merge():
    from elasticsearch_ray.functions.dedup import substring_dedup
    # doc 2 repeats a 6-word window of doc 1 -> three overlapping dup 4-grams
    # covering one 6-word span, removed once (union, not triple-removal)
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["m1 m2 m3 m4 m5 m6",
                 "h1 m1 m2 m3 m4 m5 m6 h2"],
    })
    out = (substring_dedup(rd.from_pandas(df), gram_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[1, "text_clean"] == "h1 h2"
    assert out.loc[1, "n_removed"] == 6
    assert out.loc[0, "n_removed"] == 0


def test_substring_dedup_partition_invariance():
    from elasticsearch_ray.functions.dedup import substring_dedup
    words = ["t%d" % (i % 11) for i in range(120)]
    df = pd.DataFrame({"doc_id": range(12),
                       "text": [" ".join(words[i:i + 40]) for i in range(12)]})
    outs = []
    for p in (1, 5):
        o = (substring_dedup(rd.from_pandas(df).repartition(p), gram_words=5)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
