"""Deterministic reference query set (FIXTURES.md §2).

Covers: hot/mid/rare/absent terms, camelCase query text that must hit
snake_case docs post-analysis, stopword-only (empty) queries, OR/AND match,
phrases sampled from real generated content (so some match), prefixes and
bool must/should/must_not/filter mixes, k in {1, 10, 100}.
"""

from __future__ import annotations

import numpy as np

from .corpus import _build_vocab, generate_chunk


def reference_queries(seed: int = 7) -> list[dict]:
    vocab, _ = _build_vocab()
    rng = np.random.default_rng(seed)
    hot = [vocab[i] for i in range(6)]
    mid = [vocab[i] for i in range(40, 400, 36)]
    rare = [vocab[i] for i in range(4000, 5000, 97)]
    absent = ["zzznotaterm", "qqqmissing"]

    # phrase sources: consecutive tokens from real generated content
    sample = generate_chunk(0, 8)["content"].to_pylist()
    phrases = []
    for text in sample[:6]:
        line = text.split("\n")[0]
        words = [w for w in line.replace("(", " ").replace(")", " ").split() if w][:3]
        if len(words) >= 2:
            phrases.append(" ".join(words[:2]))

    qs: list[dict] = []
    qid = 0

    def add(q):
        nonlocal qid
        q["qid"] = qid
        qid += 1
        qs.append(q)

    for t in hot[:2] + mid[:3] + rare[:3] + absent[:1]:
        add({"kind": "term", "term": t.lower() if t.isalnum() else t, "k": 10})
    add({"kind": "term", "term": mid[0], "k": 1})
    add({"kind": "term", "term": mid[1], "k": 100})
    # match OR — mixes of hot/mid/rare; camelCase text form
    add({"kind": "match", "text": f"{mid[0]} {rare[0]}", "k": 10})
    add({"kind": "match", "text": f"{hot[0]} {mid[2]} {rare[1]}", "k": 10})
    add({"kind": "match", "text": " ".join(mid[:4]), "k": 100})
    add({"kind": "match", "text": f"{rare[2]} {absent[0]}", "k": 10})
    add({"kind": "match", "text": "the and of to", "k": 10})  # stopword-only
    # match AND
    add({"kind": "match", "text": f"{hot[0]} {hot[1]}", "operator": "and", "k": 10})
    add({"kind": "match", "text": f"{mid[0]} {mid[1]}", "operator": "and", "k": 10})
    add({"kind": "match", "text": f"{mid[0]} {absent[0]}", "operator": "and", "k": 10})
    # phrases (some match, some won't)
    for p in phrases[:4]:
        add({"kind": "match_phrase", "text": p, "k": 10})
    add({"kind": "match_phrase", "text": f"{mid[0]} {rare[0]}", "k": 10})
    # prefix
    add({"kind": "prefix", "prefix": mid[0][:4].lower(), "k": 10})
    add({"kind": "prefix", "prefix": "zz", "k": 10})
    # bool mixes
    add({"kind": "bool", "must": [{"kind": "term", "term": hot[0]}],
         "must_not": [{"kind": "term", "term": mid[0]}], "k": 10})
    add({"kind": "bool", "should": [{"kind": "term", "term": mid[1]},
                                    {"kind": "term", "term": rare[0]}], "k": 10})
    add({"kind": "bool", "must": [{"kind": "match", "text": f"{hot[1]} {mid[3]}"}],
         "filter": [{"kind": "term", "term": hot[2]}], "k": 10})
    # camelCase forms that analyze into multiple subword terms
    camels = [v for v in vocab if any(c.isupper() for c in v)]
    add({"kind": "match", "text": camels[0], "k": 10})
    add({"kind": "match", "text": camels[1], "operator": "and", "k": 10})
    return qs
