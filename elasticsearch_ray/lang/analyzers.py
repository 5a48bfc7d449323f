"""Per-language analyzers mirroring the reference's registrations
(modules/analysis-common/.../CommonAnalysisPlugin.java:180-223 — each maps
to a Lucene {Lang}Analyzer whose chain is: standard tokenizer -> lowercase
-> elision (fr/it) -> stop -> stemmer). Here each chain is a pure
text -> tokens callable registered in the analyzer REGISTRY, so the same
per-field analyzer machinery (stages/tokenize.py extra_content_columns +
field_analyzers) indexes non-English corpora."""

from __future__ import annotations

import re

from .snowball import SNOWBALL_STEMMERS
from .stopwords import STOP_SETS

# Unicode-aware standard-ish tokenizer: maximal runs of letters/digits
# (underscore excluded), the UAX#29-lite analog of analyzer.analyze_simple
# for non-ASCII scripts.
_UNI_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

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
}


def _make_elision_re(articles: tuple[str, ...]) -> re.Pattern:
    alt = "|".join(sorted(articles, key=len, reverse=True))
    return re.compile(rf"\b(?:{alt})['’]", re.IGNORECASE | re.UNICODE)


def make_language_analyzer(language: str):
    """text -> [stemmed tokens] for one language (Lucene {Lang}Analyzer
    chain shape). Pure function: regexes/stop-set/stemmer close over the
    returned callable, so per-worker compile cost is one module import."""
    stop = STOP_SETS[language]
    stem = SNOWBALL_STEMMERS[language]
    elision_re = (_make_elision_re(_ELISION[language])
                  if language in _ELISION else None)

    def analyze(text: str) -> list[str]:
        if elision_re is not None:
            text = elision_re.sub(" ", text)
        toks = _UNI_TOKEN_RE.findall(text.lower())
        return [stem(t) for t in toks if t not in stop]

    return analyze


LANGUAGES = tuple(SNOWBALL_STEMMERS)


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
