"""Token/char filter tests — Porter pinned by the published test vectors
from M.F. Porter's 1980 paper (public domain), plus golden cases for the
ngram/shingle/synonym/asciifolding filters and the english analyzer chain."""

from __future__ import annotations

import pytest

from elasticsearch_ray.analyzer import analyze_english, get_analyzer
from elasticsearch_ray.filters import (
    asciifolding,
    edge_ngram_filter,
    make_analyzer_fn,
    mapping_char_filter,
    ngram_filter,
    porter_stem,
    shingle_filter,
    synonym_filter,
)

# pairs from the examples in the Porter 1980 paper (steps 1-5)
PORTER_PAPER_PAIRS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"), ("differentli", "differ"),
    ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"), ("angulariti", "angular"),
    ("homologous", "homolog"), ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PORTER_PAPER_PAIRS,
                         ids=[p[0] for p in PORTER_PAPER_PAIRS])
def test_porter_paper_vectors(word, stem):
    assert porter_stem(word) == stem


def test_english_analyzer_chain():
    assert analyze_english("The running dogs are jumping happily") == \
        ["run", "dog", "jump", "happili"]
    assert get_analyzer("english")("connections") == ["connect"]


def test_ngram_and_edge_ngram():
    assert ngram_filter(["abc"], 2, 3) == ["ab", "bc", "abc"]
    assert edge_ngram_filter(["window"], 2, 4) == ["wi", "win", "wind"]
    assert edge_ngram_filter(["ab"], 2, 4) == ["ab"]
    assert edge_ngram_filter(["a"], 2, 4) == []


def test_shingle():
    assert shingle_filter(["a", "b", "c"], 2, 2) == ["a b", "b c"]
    assert shingle_filter(["a", "b", "c"], 2, 3, output_unigrams=True) == \
        ["a", "b", "c", "a b", "b c", "a b c"]


def test_synonym_and_mapping():
    assert synonym_filter(["big", "data"], {"big": "large"}) == ["large", "data"]
    assert mapping_char_filter("C++ and C#", {"C++": "cpp", "C#": "csharp"}) == \
        "cpp and csharp"


def test_asciifolding():
    assert asciifolding("Café Müller naïve") == "Cafe Muller naive"


def test_custom_analyzer_assembly():
    an = make_analyzer_fn(
        char_filters=[lambda t: mapping_char_filter(t, {"C++": "cpp"})],
        token_filters=[lambda ts: synonym_filter(ts, {"cpp": "cplusplus"})],
    )
    assert an("C++ Code") == ["cplusplus", "code"]

    from elasticsearch_ray.analyzer import get_analyzer, register_analyzer

    register_analyzer("my_custom", an)
    assert get_analyzer("my_custom")("C++") == ["cplusplus"]


def test_tokenizers():
    from elasticsearch_ray.filters import (
        keyword_tokenizer,
        make_char_group_tokenizer,
        make_ngram_tokenizer,
        make_pattern_tokenizer,
    )

    assert make_pattern_tokenizer(r",")("a,b,,c") == ["a", "b", "c"]
    assert keyword_tokenizer("New York") == ["New York"]
    assert keyword_tokenizer("") == []
    assert make_char_group_tokenizer("-_ ")("foo-bar_baz qux") == \
        ["foo", "bar", "baz", "qux"]
    assert make_ngram_tokenizer(2, 3)("ab cde") == \
        ["ab", "cd", "de", "cde"]

    from elasticsearch_ray.analyzer import get_analyzer, register_analyzer

    register_analyzer("csvish", make_pattern_tokenizer(r"[,;]"))
    assert get_analyzer("csvish")("A,b;C") == ["a", "b", "c"]


def test_remaining_token_filters():
    from elasticsearch_ray.filters import (
        fingerprint_analyze,
        length_filter,
        letter_tokenizer,
        limit_filter,
        min_hash_tokens,
        path_hierarchy_tokenizer,
        reverse_filter,
        synonym_graph_filter,
        trim_filter,
        uax_url_email_tokenizer,
        unique_filter,
    )

    assert unique_filter(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]
    assert trim_filter([" a ", "b"]) == ["a", "b"]
    assert length_filter(["a", "ab", "abc"], 2, 2) == ["ab"]
    assert limit_filter(["a", "b", "c"], 2) == ["a", "b"]
    assert reverse_filter(["abc"]) == ["cba"]
    assert synonym_graph_filter(["ny", "pizza"], {"ny": ["new", "york"]}) == \
        ["new", "york", "pizza"]
    sig = min_hash_tokens(["a", "b", "c"], 4)
    assert len(sig) == 4 and sig == min_hash_tokens(["c", "b", "a", "a"], 4)
    assert fingerprint_analyze("The QUICK the brown") == ["brown quick the"]
    assert letter_tokenizer("ab3cd ef") == ["ab", "cd", "ef"]
    assert path_hierarchy_tokenizer("/usr/local/bin") == \
        ["/usr", "/usr/local", "/usr/local/bin"]
    assert path_hierarchy_tokenizer("a/b") == ["a", "a/b"]
    toks = uax_url_email_tokenizer("mail bob@example.com or https://x.io/a?b=1 now")
    assert "bob@example.com" in toks
    assert any(t.startswith("https://x.io") for t in toks)
    assert "mail" in toks and "now" in toks
