"""Analysis chain: char_filters* -> tokenizer -> token_filters*.

Reimplements (from public knowledge of the configuration surface) the
reference's analysis pipeline shape — `CustomAnalyzer` assembly per field
(reference: server/src/main/java/org/elasticsearch/index/analysis/CustomAnalyzer.java)
— as pure Python/regex functions suitable for vectorized use inside
``Dataset.map_batches``.

The flagship "code" analyzer mirrors the `word_delimiter_graph` token filter
defaults (reference: modules/analysis-common/src/main/java/org/elasticsearch/
analysis/common/WordDelimiterGraphTokenFilterFactory.java:78-96):

    generate_word_parts=true, generate_number_parts=true,
    split_on_case_change=true  (camelCase  -> camel, case)
    split_on_numerics=true     (j2se       -> j, 2, se)
    stem_english_possessive=true  (O'Neil's -> o, neil)
    catenate_* = false, preserve_original = false

composed with a standard-ish tokenizer (split on anything that is not
[A-Za-z0-9_'] — underscores survive tokenization like UAX#29 ExtendNumLet and
are then split by the word-delimiter step, so snake_case -> snake, case),
`lowercase`, and the `stop` filter with Lucene's default English stop set.

Deviation vs the reference: tokenization is ASCII-alphanumeric (non-ASCII
letters are token breaks), not full UAX#29 — adequate for the target
source-code corpus (ASCII identifiers/keywords) and far cheaper; swap
_RAW_TOKEN_RE for a unicode class regex to widen. The stop set is
(reference: index/analysis/StopTokenFilterFactory.java:45 uses
EnglishAnalyzer.ENGLISH_STOP_WORDS_SET). Token length is capped at 255 chars
like the `standard` analyzer's max_token_length (reference:
index/analysis/StandardAnalyzerProvider.java:36-40).

Positions: the stop filter preserves position increments (gaps) like Lucene's
default `enablePositionIncrements=true`, so phrase queries do not match across
a removed stopword... positions are the index in the post-split, pre-stop
token stream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public, 33 terms) —
# engaged by the reference at StopTokenFilterFactory.java:45.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # standard analyzer default (StandardAnalyzerProvider.java:36)

# standard-ish tokenizer for code: runs of word chars incl. _ and '
_RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9_']+")

# word_delimiter_graph subword splitter:
#  - runs of digits                       (generate_number_parts, split_on_numerics)
#  - an upper followed by uppers not followed by lower (acronym run: HTTPRequest -> HTTP)
#  - an upper followed by lowers          (Camel hump)
#  - runs of lowers
_SUBWORD_RE = re.compile(
    r"\d+"  # number parts
    r"|[A-Z]+(?![a-z])"  # acronym run (HTTP in HTTPRequest, or trailing ABC)
    r"|[A-Z][a-z]+"  # capitalized hump
    r"|[a-z]+"  # lowercase run
)

_POSSESSIVE_RE = re.compile(r"'[sS]$")

# simple analyzer tokenizer: maximal runs of ascii alphanumerics on the
# lowercased text — SQL-oracle-friendly (regexp_split in DuckDB is equivalent).
_SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")

_WHITESPACE_RE = re.compile(r"\S+")


# memoized subword splits: code identifiers repeat heavily across a corpus,
# so the regex subword pass runs once per DISTINCT raw token per worker
_SUBWORD_CACHE: dict[str, tuple[str, ...]] = {}
_SUBWORD_CACHE_CAP = 200_000


def _code_tokens(text: str) -> list[str]:
    """Tokenize with word_delimiter_graph semantics; emits lowercase subwords
    in stream order (stopwords NOT yet removed)."""
    out: list[str] = []
    append = out.append
    cache = _SUBWORD_CACHE
    for raw in _RAW_TOKEN_RE.findall(text):
        # fast path: pure lowercase letters = exactly one subword (the
        # overwhelmingly common case in code+prose)
        if raw.isalpha() and raw.islower():
            append(raw)
            continue
        subs = cache.get(raw)
        if subs is None:
            r = _POSSESSIVE_RE.sub("", raw) if "'" in raw else raw
            subs = tuple(s.lower() for s in _SUBWORD_RE.findall(r))
            if len(cache) < _SUBWORD_CACHE_CAP:
                cache[raw] = subs
        out.extend(subs)
    return out


def analyze_code(text: str) -> list[str]:
    """Full 'code' chain: tokenize -> word-delimiter split -> lowercase ->
    stop filter -> length cap. Returns the term stream (positions implicit)."""
    return [
        t
        for t in _code_tokens(text)
        if t not in ENGLISH_STOP_WORDS and len(t) <= MAX_TOKEN_LENGTH
    ]


def analyze_code_positions(text: str) -> list[tuple[str, int]]:
    """Like :func:`analyze_code` but with position gaps preserved across
    removed stopwords (Lucene enablePositionIncrements semantics)."""
    return [
        (t, pos)
        for pos, t in enumerate(_code_tokens(text))
        if t not in ENGLISH_STOP_WORDS and len(t) <= MAX_TOKEN_LENGTH
    ]


def analyze_code_positions_split(text: str) -> tuple[list[str], list[int]]:
    """Hot-path form of :func:`analyze_code_positions`: parallel
    (terms, positions) lists instead of one tuple per token — the index
    build flattens millions of these per batch with C-speed list.extend,
    so avoiding per-token tuple allocation is a measured ~30% win on the
    tokenize stage."""
    terms: list[str] = []
    poss: list[int] = []
    ta, pa_ = terms.append, poss.append
    for pos, t in enumerate(_code_tokens(text)):
        if t not in ENGLISH_STOP_WORDS and len(t) <= MAX_TOKEN_LENGTH:
            ta(t)
            pa_(pos)
    return terms, poss


def analyze_simple(text: str) -> list[str]:
    """'simple' analyzer: lowercase + split on non-alphanumeric. Exactly
    mirrors DuckDB `regexp_split_to_array(lower(text), '[^a-z0-9]+')` so SQL
    oracles can re-derive the same token stream."""
    return _SIMPLE_TOKEN_RE.findall(text.lower())


def analyze_whitespace(text: str) -> list[str]:
    """`whitespace` tokenizer (CommonAnalysisPlugin tokenizers)."""
    return _WHITESPACE_RE.findall(text)


@dataclass(frozen=True)
class Analyzer:
    """A named analyzer = callable token-stream producer.

    Mirrors the reference's AnalysisRegistry lookup surface
    (index/analysis/AnalysisRegistry.java) without the classloader machinery:
    a plain registry of Python callables (SURVEY.md §2.13).
    """

    name: str
    tokenize: callable = field(compare=False)
    tokenize_positions: callable | None = field(default=None, compare=False)
    tokenize_positions_split: callable | None = field(default=None,
                                                      compare=False)

    def __call__(self, text: str) -> list[str]:
        return self.tokenize(text)

    def positions(self, text: str) -> list[tuple[str, int]]:
        if self.tokenize_positions is not None:
            return self.tokenize_positions(text)
        return list(enumerate_positions(self.tokenize(text)))

    def positions_split(self, text: str) -> tuple[list[str], list[int]]:
        """(terms, positions) as parallel lists — the build hot path.
        Falls back to unzipping positions() for analyzers registered
        without a dedicated split form."""
        if self.tokenize_positions_split is not None:
            return self.tokenize_positions_split(text)
        if self.tokenize_positions is not None:
            pairs = self.tokenize_positions(text)
            return [t for t, _ in pairs], [p for _, p in pairs]
        toks = self.tokenize(text)
        return toks, list(range(len(toks)))


def enumerate_positions(tokens: list[str]) -> list[tuple[str, int]]:
    return [(t, i) for i, t in enumerate(tokens)]


def analyze_english(text: str) -> list[str]:
    """'english' analyzer: lowercase alnum tokenize -> stop -> porter stem
    (EnglishAnalyzer shape: StandardTokenizer + stop + PorterStemFilter;
    possessive stripping is subsumed by the alnum tokenizer)."""
    from .filters import porter_stem

    return [porter_stem(t) for t in analyze_simple(text)
            if t not in ENGLISH_STOP_WORDS]


def analyze_shingle2(text: str) -> list[str]:
    """2-shingle analyzer (the search_as_you_type `_2gram` subfield shape:
    SearchAsYouTypeFieldMapper's shingle subfields): space-joined word
    bigrams of the simple token stream."""
    toks = analyze_simple(text)
    return [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def analyze_standard(text: str) -> list[str]:
    """`standard` analyzer (StandardAnalyzerProvider: standard tokenizer +
    lowercase, NO stop words by default in 7.x): Unicode word runs,
    lowercased."""
    return re.findall(r"[^\W_]+", text.lower(), re.UNICODE)


def analyze_stop(text: str) -> list[str]:
    """`stop` analyzer (StopAnalyzerProvider: lowercase letter tokenizer +
    English stop set)."""
    return [t for t in re.findall(r"[a-z]+", text.lower())
            if t not in ENGLISH_STOP_WORDS]


def analyze_keyword(text: str) -> list[str]:
    """`keyword` analyzer (KeywordAnalyzerProvider): whole input, one
    token, unchanged."""
    return [text]


def analyze_pattern(text: str) -> list[str]:
    """`pattern` analyzer (PatternAnalyzerProvider defaults: split on \\W+,
    lowercase, English stop set)."""
    return [t for t in re.split(r"\W+", text.lower())
            if t and t not in ENGLISH_STOP_WORDS]


def analyze_snowball(text: str) -> list[str]:
    """`snowball` analyzer (SnowballAnalyzerProvider, default language
    English): standard tokenize + lowercase + stop + Porter/Snowball-English
    stem — identical chain to the `english` analyzer here."""
    return analyze_english(text)


ANNOTATION_RE = re.compile(r"\[([^\]\[]*)\]\(([^\)\(]*)\)")


def parse_annotated(text: str) -> tuple[str, list[tuple[int, int, str]]]:
    """annotated_text markdown parse (plugins/mapper-annotated-text,
    AnnotatedTextFieldMapper.AnnotatedText.parse): `[wrapped](v1&v2)` ->
    plain text + (start_offset, end_offset, url-decoded value) annotations.
    key=value pairs raise, mirroring the reference's parse exception."""
    from urllib.parse import unquote

    plain: list[str] = []
    length = 0
    last = 0
    anns: list[tuple[int, int, str]] = []
    for m in ANNOTATION_RE.finditer(text):
        seg = text[last:m.start()]
        plain.append(seg)
        length += len(seg)
        start, end = length, length + len(m.group(1))
        plain.append(m.group(1))
        length = end
        last = m.end()
        for pair in m.group(2).split("&"):
            if "=" in pair:
                raise ValueError(
                    "key=value pairs are not supported in annotations")
            value = unquote(pair)
            if value:
                anns.append((start, end, value))
    plain.append(text[last:])
    return "".join(plain), anns


def analyze_annotated_positions(text: str) -> list[tuple[str, int]]:
    """annotated_text token stream: the plain text analyzed with the default
    analyzer, plus each annotation value injected VERBATIM (keyword, not
    analyzed) at the position of the first token of its wrapped text
    (AnnotationsInjector emits the value with positionIncrement 0)."""
    plain, anns = parse_annotated(text)
    toks = analyze_simple(plain)
    out = list(zip(toks, range(len(toks))))
    for start, _end, value in anns:
        pos = len(analyze_simple(plain[:start]))
        out.append((value, min(pos, max(len(toks) - 1, 0))))
    out.sort(key=lambda tp: (tp[1],))
    return out


def analyze_annotated(text: str) -> list[str]:
    return [t for t, _ in analyze_annotated_positions(text)]


def analyze_fingerprint(text: str) -> list[str]:
    """`fingerprint` analyzer (FingerprintAnalyzerProvider): lowercase,
    asciifold, dedupe, sort, join into one token (filters.fingerprint_analyze)."""
    from .filters import fingerprint_analyze

    return fingerprint_analyze(text)


def analyze_standard_html_strip(text: str) -> list[str]:
    """`standard_html_strip` analyzer (StandardHtmlStripAnalyzerProvider,
    deprecated upstream but registered): html_strip char filter ->
    standard tokenize -> lowercase -> English stop."""
    text = re.sub(r"<[^>]*>", " ", text)
    return [t for t in analyze_standard(text) if t not in ENGLISH_STOP_WORDS]


REGISTRY: dict[str, Analyzer] = {
    "code": Analyzer("code", analyze_code, analyze_code_positions,
                     analyze_code_positions_split),
    "simple": Analyzer("simple", analyze_simple),
    "whitespace": Analyzer("whitespace", analyze_whitespace),
    "english": Analyzer("english", analyze_english),
    "shingle2": Analyzer("shingle2", analyze_shingle2),
    "standard": Analyzer("standard", analyze_standard),
    "stop": Analyzer("stop", analyze_stop),
    "keyword": Analyzer("keyword", analyze_keyword),
    "pattern": Analyzer("pattern", analyze_pattern),
    "snowball": Analyzer("snowball", analyze_snowball),
    "standard_html_strip": Analyzer("standard_html_strip",
                                    analyze_standard_html_strip),
    "fingerprint": Analyzer("fingerprint", analyze_fingerprint),
    "annotated_text": Analyzer("annotated_text", analyze_annotated,
                               analyze_annotated_positions),
}


def register_analyzer(name: str, tokenize, tokenize_positions=None) -> None:
    """Extension-registry hook (AnalysisRegistry custom analyzer analog):
    register a custom chain built with filters.make_analyzer_fn."""
    REGISTRY[name] = Analyzer(name, tokenize, tokenize_positions)


def get_analyzer(name: str) -> Analyzer:
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; known: {sorted(REGISTRY)}") from None


# language analyzers (Snowball stemmer + stop set + elision chains —
# CommonAnalysisPlugin.java:180-223 registrations)
from .lang.analyzers import register_language_analyzers as _reg_langs  # noqa: E402

_reg_langs(register_analyzer)


def annotated_text_positions(s: str) -> list[tuple[str, int]]:
    """mapper-annotated-text (plugins/mapper-annotated-text/.../
    AnnotatedTextFieldMapper.java, AnnotatedText parser): markdown-like
    `[surface](key1&key2)` spans emit the surface tokens AND each
    annotation key as tokens at the SAME position as the first surface
    token — so phrase/span queries work across surface text and
    annotations. Returns [(token, position)] under the simple
    tokenization rules."""
    import re as _re
    from urllib.parse import unquote

    out: list[tuple[str, int]] = []
    pos = 0
    idx = 0
    rx = _re.compile(r"\[([^\]]+)\]\(([^)]+)\)")
    for m in rx.finditer(s):
        for tok in analyze_simple(s[idx:m.start()]):
            out.append((tok, pos))
            pos += 1
        surface = analyze_simple(m.group(1))
        anchor = pos
        for tok in surface:
            out.append((tok, pos))
            pos += 1
        for key in m.group(2).split("&"):
            out.append((unquote(key), anchor))
        idx = m.end()
    for tok in analyze_simple(s[idx:]):
        out.append((tok, pos))
        pos += 1
    return out


def _annotated_flat(s: str) -> list[str]:
    return [t for t, _ in annotated_text_positions(s)]


# registered post-definition: the annotated-text analyzer is a first-class
# registry entry so index builds can use analyzer="annotated" directly
REGISTRY["annotated"] = Analyzer(
    "annotated", _annotated_flat, annotated_text_positions)
