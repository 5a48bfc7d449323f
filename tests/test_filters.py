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


def test_round3d_filter_batch():
    """The remaining CommonAnalysisPlugin token filters
    (CommonAnalysisPlugin.java getTokenFilters)."""
    from elasticsearch_ray.filters import (
        apostrophe_filter, decimal_digit_filter, delimited_payload_filter,
        flatten_graph_filter, german_normalization_filter, kstem_filter,
        make_common_grams_filter, make_condition_filter,
        make_dictionary_decompounder, make_keep_filter,
        make_keep_types_filter, make_keyword_marker, make_multiplexer_filter,
        make_pattern_capture, make_pattern_replace_filter,
        make_predicate_filter, make_stemmer_override, make_truncate_filter,
        remove_duplicates_filter, reverse_filter,
        scandinavian_folding_filter, scandinavian_normalization_filter,
        serbian_normalization_filter, uppercase_filter,
        word_delimiter_filter,
    )

    assert uppercase_filter(["abc"]) == ["ABC"]
    assert make_truncate_filter(3)(["elasticsearch"]) == ["ela"]
    # Unicode decimal digits (Arabic-Indic, Devanagari) fold to 0-9
    assert decimal_digit_filter(["١٢٣", "a٤b", "१२३"]) == ["123", "a4b", "123"]
    assert apostrophe_filter(["istanbul'da", "plain"]) == ["istanbul", "plain"]
    assert remove_duplicates_filter(["a", "a", "b", "a"]) == ["a", "b", "a"]
    assert make_keyword_marker({"running"})(["running", "jumping"]) == \
        ["running", "jump"]
    assert make_stemmer_override({"running": "sprint"})(
        ["running", "jumping"]) == ["sprint", "jump"]
    assert make_keep_filter({"a"})(["a", "b"]) == ["a"]
    assert make_keep_types_filter({"<NUM>"})(["abc", "123"]) == ["123"]
    assert make_keep_types_filter({"<NUM>"}, mode="exclude")(
        ["abc", "123"]) == ["abc"]
    assert make_pattern_capture([r"(\d+)"])(["abc123def456"]) == \
        ["abc123def456", "123", "456"]
    assert make_pattern_replace_filter(r"\d+", "#")(["a1b22"]) == ["a#b#"]
    assert make_common_grams_filter({"the"})(["the", "quick", "fox"]) == \
        ["the", "the_quick", "quick", "fox"]
    assert make_common_grams_filter({"the"}, query_mode=True)(
        ["the", "quick", "fox"]) == ["the_quick", "quick", "fox"]
    assert make_condition_filter(lambda t: len(t) > 4, uppercase_filter)(
        ["tiny", "enormous"]) == ["tiny", "ENORMOUS"]
    assert make_multiplexer_filter([uppercase_filter, reverse_filter])(
        ["ab"]) == ["ab", "AB", "ba"]
    assert make_predicate_filter(str.isalpha)(["ab", "a1"]) == ["ab"]
    assert scandinavian_folding_filter(["räksmörgås", "smørrebrød"]) == \
        ["raksmorgas", "smorrebrod"]
    assert scandinavian_normalization_filter(["smørrebrød", "aalborg"]) == \
        ["smörrebröd", "ålborg"]
    assert serbian_normalization_filter(["Жижа", "čvrst"]) == \
        ["ziza", "cvrst"]
    assert german_normalization_filter(["straße", "müller", "quelle"]) == \
        ["strasse", "muller", "quelle"]
    assert flatten_graph_filter(["a", "b"]) == ["a", "b"]
    assert delimited_payload_filter(["the|0.5", "dog"]) == ["the", "dog"]
    got = make_dictionary_decompounder(
        {"fuß", "ball", "donau", "dampf", "schiff"})(["fußball"])
    assert got == ["fußball", "fuß", "ball"]
    assert kstem_filter(["boxes", "glasses", "churches", "cities",
                         "running", "batted", "hoped", "dogs"]) == \
        ["box", "glass", "church", "city", "run", "bat", "hope", "dog"]
    assert word_delimiter_filter(["PowerShot500", "snake_case"]) == \
        ["power", "shot", "500", "snake", "case"]


def test_round3d_filters_compose_in_custom_analyzer():
    from elasticsearch_ray.filters import (make_analyzer_fn, kstem_filter,
                                           make_common_grams_filter)

    an = make_analyzer_fn(token_filters=(
        kstem_filter, make_common_grams_filter({"of"})))
    assert an("Boxes of cities") == \
        ["box", "box_of", "of", "of_city", "city"]


def test_round3d_tokenizer_batch():
    from elasticsearch_ray.filters import (
        classic_tokenizer, lowercase_tokenizer, make_edge_ngram_tokenizer,
        make_simple_pattern_split_tokenizer, make_simple_pattern_tokenizer)

    assert make_edge_ngram_tokenizer(1, 3)("Quick fox") == \
        ["q", "qu", "qui", "f", "fo", "fox"]
    assert lowercase_tokenizer("Ab3Cd ef") == ["ab", "cd", "ef"]
    # classic: dotted acronyms / emails / hosts survive as one token
    assert classic_tokenizer("mail bob@example.com from I.B.M. today") == \
        ["mail", "bob@example.com", "from", "i.b.m", "today"]
    assert make_simple_pattern_tokenizer(r"[0-9]{3}")("a123b456789") == \
        ["123", "456", "789"]
    assert make_simple_pattern_split_tokenizer("_")("an_underscored_phrase") \
        == ["an", "underscored", "phrase"]


def test_soundex_published_vectors():
    from elasticsearch_ray.filters import soundex

    # commons-codec SoundexTest vectors (incl. the H/W rule cases)
    for w, want in [("Robert", "R163"), ("Rupert", "R163"),
                    ("Ashcraft", "A261"), ("Ashcroft", "A261"),
                    ("Tymczak", "T522"), ("Pfister", "P236"),
                    ("Honeyman", "H555"), ("Testing", "T235"),
                    ("", ""), ("123", "")]:
        assert soundex(w) == want, w


def test_metaphone_rules():
    from elasticsearch_ray.filters import metaphone, make_phonetic_filter

    for w, want in [("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
                    ("lazy", "LS"), ("dogs", "TKS"), ("howl", "HL"),
                    ("Knight", "NT"), ("phone", "FN"), ("school", "SKL"),
                    ("gnome", "NM"), ("Xavier", "SFR"), ("what", "WT"),
                    ("shallow", "XL"), ("science", "SNS")]:
        assert metaphone(w) == want, w
    # homophones collapse
    assert metaphone("Smith") == metaphone("Smyth")
    # filter forms: replace vs inject
    assert make_phonetic_filter("soundex")(["Robert"]) == ["R163"]
    assert make_phonetic_filter("soundex", replace=False)(["Robert"]) == \
        ["Robert", "R163"]


def test_icu_filters():
    from elasticsearch_ray.filters import (
        icu_folding,
        icu_folding_filter,
        icu_normalizer,
    )

    assert icu_normalizer("ＦＵＬＬｗｉｄｔｈ") == "fullwidth"
    assert icu_normalizer("Straße") == "strasse"
    assert icu_normalizer("Åström") == "åström"  # nfkc_cf keeps accents
    assert icu_folding("Åström") == "astrom"     # folding strips them
    assert icu_folding("ﬁ") == "fi"
    assert icu_folding_filter(["É", "①"]) == ["e", "1"]
