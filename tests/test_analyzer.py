"""Analyzer golden tests — modeled on the reference's declarative YAML
conformance corpus (rest-api-spec/test/, SURVEY.md §5): input text + expected
token stream, covering word_delimiter_graph defaults
(WordDelimiterGraphTokenFilterFactory.java:78-96)."""

from __future__ import annotations

from elasticsearch_ray.analyzer import (
    ENGLISH_STOP_WORDS,
    analyze_code,
    analyze_code_positions,
    analyze_simple,
    analyze_whitespace,
    get_analyzer,
)

GOLDENS = [
    # camelCase split (split_on_case_change=true)
    ("parseHttpRequest", ["parse", "http", "request"]),
    # acronym run then hump: HTTPRequest -> HTTP, Request
    ("parseHTTPRequest2", ["parse", "http", "request", "2"]),
    # snake_case: underscore survives tokenization, split by word-delimiter
    ("snake_case_idents", ["snake", "case", "idents"]),
    # kebab-case: '-' is a tokenizer break anyway
    ("kebab-case", ["kebab", "case"]),
    # split_on_numerics: j2se -> j, 2, se
    ("j2se", ["j", "2", "se"]),
    ("500-42", ["500", "42"]),
    # possessive stemming (stem_english_possessive=true)
    ("O'Neil's", ["o", "neil"]),
    # stopword removal (Lucene English stop set)
    ("the quick fox and the dog", ["quick", "fox", "dog"]),
    # code line with punctuation
    ("def get_value(self, key): return self._map[key]",
     ["def", "get", "value", "self", "key", "return", "self", "map", "key"]),
    ("", []),
    ("   \n\t  ", []),
    # stopword-only input -> empty stream
    ("the and of to", []),
]


def test_analyzer_goldens():
    for text, expected in GOLDENS:
        assert analyze_code(text) == expected, text


def test_token_length_cap():
    long_tok = "a" * 300
    assert analyze_code(long_tok) == []  # > 255 chars dropped
    assert analyze_code("x" * 255) == ["x" * 255]


def test_positions_preserve_stopword_gaps():
    # Lucene stop filter keeps position increments: "quick" at 1, "fox" at 3
    toks = analyze_code_positions("the quick the fox")
    assert toks == [("quick", 1), ("fox", 3)]


def test_simple_analyzer_matches_sql_semantics():
    # must equal regexp_split_to_array(lower(text), '[^a-z0-9]+') minus empties
    assert analyze_simple("Hello, World_99!") == ["hello", "world", "99"]
    assert analyze_simple("snake_case") == ["snake", "case"]  # _ splits here
    assert analyze_simple("") == []


def test_whitespace_analyzer():
    assert analyze_whitespace("a  b\tc\nd") == ["a", "b", "c", "d"]


def test_registry():
    assert get_analyzer("code")("fooBar") == ["foo", "bar"]
    assert get_analyzer("simple").positions("a b") == [("a", 0), ("b", 1)]


def test_stop_set_is_lucene_english():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "code" not in ENGLISH_STOP_WORDS


def test_prebuilt_analyzer_registry_complete():
    """The reference's getAnalyzers non-language registrations
    (CommonAnalysisPlugin.java:180-186 + server prebuilts): standard, stop,
    keyword, pattern, snowball, fingerprint, standard_html_strip."""
    from elasticsearch_ray.analyzer import get_analyzer

    assert get_analyzer("standard")("The Quick-Brown FOX") == \
        ["the", "quick", "brown", "fox"]
    assert get_analyzer("stop")("The quick brown fox") == \
        ["quick", "brown", "fox"]
    assert get_analyzer("keyword")("one whole input") == ["one whole input"]
    assert get_analyzer("pattern")("Foo-Bar the baz_2") == \
        ["foo", "bar", "baz_2"]
    assert get_analyzer("snowball")("running quickly") == ["run", "quickli"]
    assert get_analyzer("standard_html_strip")(
        "<b>Bold</b> move the <i>text</i>") == ["bold", "move", "text"]
    assert get_analyzer("fingerprint")("The QUICK the brown") == \
        ["brown quick the"]


def test_annotated_text_parse_and_inject():
    from elasticsearch_ray.analyzer import (
        analyze_annotated_positions,
        parse_annotated,
    )

    plain, anns = parse_annotated(
        "New mayor is [John Smith](person&John%20Smith) today")
    assert plain == "New mayor is John Smith today"
    assert anns == [(13, 23, "person"), (13, 23, "John Smith")]
    toks = analyze_annotated_positions(
        "New mayor is [John Smith](person&John%20Smith) today")
    # injected values share the wrapped text's first token position
    assert ("person", 3) in toks and ("John Smith", 3) in toks
    assert ("john", 3) in toks and ("smith", 4) in toks
    # key=value annotations raise, per AnnotatedText.parse
    import pytest

    with pytest.raises(ValueError):
        parse_annotated("[x](type=person)")
    # multiple annotations, empty values skipped
    _, a2 = parse_annotated("[a](v1) mid [b](&v2&)")
    assert [v for _, _, v in a2] == ["v1", "v2"]
