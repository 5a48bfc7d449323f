"""Per-language analyzers mirroring the reference's registrations
(modules/analysis-common/.../CommonAnalysisPlugin.java:180-223 — each maps
to a Lucene {Lang}Analyzer whose chain is: standard tokenizer -> lowercase
-> elision (fr/it) -> stop -> stemmer). Here each chain is a pure
text -> tokens callable registered in the analyzer REGISTRY, so the same
per-field analyzer machinery (stages/tokenize.py extra_content_columns +
field_analyzers) indexes non-English corpora."""

from __future__ import annotations

import re

from .light import LIGHT_STEMMERS, greek_fold, turkish_lower
from .snowball import SNOWBALL_STEMMERS
from .stopwords import STOP_SETS

# full per-language stemmer registry: Snowball algorithms + published
# light stemmers. brazilian is the RSLP algorithm (Orengo & Huyck 2001,
# light.py) — the distinct rule-table stemmer the reference's
# BrazilianStemmer implements, not the Snowball Portuguese one.
STEMMERS = {**SNOWBALL_STEMMERS, **LIGHT_STEMMERS}

# Unicode-aware standard-ish tokenizer: maximal runs of letters/digits
# (underscore excluded) PLUS combining marks — Python's \w excludes
# category-M codepoints, which would otherwise split Devanagari matras,
# Arabic harakat and Hebrew niqqud out of their words. The explicit
# ranges cover the combining blocks of the registered languages.
_COMBINING = ("̀-ͯ҃-҉֑-ׇؐ-ؚ"
              "ً-ٰٟۖ-ۜ۟-۪ۨ-ۭ"
              "ऀ-ःऺ-ॏ॑-ॗॢ-ॣ"
              "ঁ-ঃ়া-ৄে-ৈো-্ৗৢ-ৣ")
_UNI_TOKEN_RE = re.compile(rf"(?:[^\W_]|[{_COMBINING}])+", re.UNICODE)

# ElisionFilter article sets (Lucene FrenchAnalyzer.DEFAULT_ARTICLES and
# ItalianAnalyzer.DEFAULT_ARTICLES): the article + apostrophe prefix is
# stripped before tokenization (the apostrophe would split tokens anyway;
# stripping here keeps the article letter out of the stream).
_ELISION = {
    "french": ("l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu",
               "quoiqu", "lorsqu", "puisqu"),
    "italian": ("c", "l", "all", "dall", "dell", "nell", "sull", "coll",
                "pell", "gl", "agl", "dagl", "degl", "negl", "sugl", "un",
                "m", "t", "s", "v", "d"),
    # CatalanAnalyzer.DEFAULT_ARTICLES / IrishAnalyzer DEFAULT_ARTICLES
    "catalan": ("d", "l", "m", "n", "s", "t"),
    "irish": ("d", "m", "b"),
}


def _make_elision_re(articles: tuple[str, ...]) -> re.Pattern:
    alt = "|".join(sorted(articles, key=len, reverse=True))
    return re.compile(rf"\b(?:{alt})['’]", re.IGNORECASE | re.UNICODE)


# Turkish ApostropheFilter analog: drop the apostrophe and everything
# after it (İstanbul'da -> İstanbul) BEFORE tokenization, since the
# apostrophe would otherwise split the suffix into a stray token.
_APOSTROPHE_RE = re.compile(r"['’]\w*", re.UNICODE)

# per-language case folding (TurkishLowerCaseFilter / GreekLowerCaseFilter
# analogs); default is str.lower
_LOWER_FNS = {"turkish": turkish_lower, "greek": greek_fold}

# per-token normalizers that must run BEFORE the stop filter (the stop
# sets are written in normalized orthography); the stemmers re-apply them
# idempotently
from .light import (bengali_normalize, hindi_normalize,  # noqa: E402
                    sorani_normalize)

_TOKEN_NORMS = {"hindi": hindi_normalize, "sorani": sorani_normalize,
                "bengali": bengali_normalize}


def make_language_analyzer(language: str):
    """text -> [stemmed tokens] for one language (Lucene {Lang}Analyzer
    chain shape). Pure function: regexes/stop-set/stemmer close over the
    returned callable, so per-worker compile cost is one module import."""
    stop = STOP_SETS[language]
    stem = STEMMERS[language]
    lower = _LOWER_FNS.get(language, str.lower)
    elision_re = (_make_elision_re(_ELISION[language])
                  if language in _ELISION else None)
    apostrophe = language == "turkish"

    norm = _TOKEN_NORMS.get(language)

    def analyze(text: str) -> list[str]:
        if elision_re is not None:
            text = elision_re.sub(" ", text)
        if apostrophe:
            text = _APOSTROPHE_RE.sub("", text)
        toks = _UNI_TOKEN_RE.findall(lower(text))
        if norm is not None:
            toks = [norm(t) for t in toks]
        return [stem(t) for t in toks if t not in stop]

    return analyze


LANGUAGES = tuple(STEMMERS)


def register_language_analyzers(register) -> None:
    """Install one analyzer per language into the registry (the
    AnalysisRegistry prebuilt-analyzer loading analog). `register` is
    analyzer.register_analyzer — passed in to avoid a circular import."""
    for language in LANGUAGES:
        register(language, make_language_analyzer(language))
    # non-stemming chains: CJK bigrams + Persian normalization (lang/extra.py)
    from .extra import (analyze_cjk, analyze_cjk_positions, analyze_persian,
                        analyze_persian_positions)

    register("cjk", analyze_cjk, analyze_cjk_positions)
    register("persian", analyze_persian, analyze_persian_positions)
    # "chinese" is Lucene's StandardAnalyzer with the English stop set
    # (ChineseAnalyzerProvider.java — the old ChineseAnalyzer was retired
    # upstream); "thai" is script-run tokenization + Thai stop removal
    # (the reference's ThaiTokenizer is BreakIterator dictionary
    # segmentation — documented substitute, lang/extra.py).
    from .extra import (analyze_chinese, analyze_chinese_positions,
                        analyze_thai, analyze_thai_positions)

    register("chinese", analyze_chinese, analyze_chinese_positions)
    register("thai", analyze_thai, analyze_thai_positions)
    # "japanese" is the kuromoji substitute: script-run tokenization +
    # hiragana particle stops (lang/extra.py)
    from .extra import analyze_japanese, analyze_japanese_positions

    register("japanese", analyze_japanese, analyze_japanese_positions)
