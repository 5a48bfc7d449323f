"""Conformance: the DuckDB SQL re-derivations of the light-stemmer analyzer
chains (lang/sql_oracle.py) must match the Python analyzers token-for-token —
not just on the gate sample sentences but on the inflected golden-vector
words, so the SQL implements the *rules*, not the sample answers."""

from __future__ import annotations

import duckdb
import pytest

from elasticsearch_ray.analyzer import get_analyzer
from elasticsearch_ray.lang.sql_oracle import SQL_ORACLE_LANGS, lang_oracle_sql
from elasticsearch_ray.pipelines.ops import _LANG_SAMPLES

from test_lang import GOLDEN, GOLDEN_3C, GOLDEN_3D

_GOLDEN_WORDS = {}
for _src in (GOLDEN, GOLDEN_3C, GOLDEN_3D):
    for _lang, _pairs in _src.items():
        _GOLDEN_WORDS.setdefault(_lang, []).extend(w for w, _ in _pairs)


def _sql_tokens(lang: str, text: str) -> list[str]:
    df = duckdb.sql(lang_oracle_sql(lang, text)).df()
    assert list(df["position"]) == list(range(len(df)))
    return list(df["token"])


@pytest.mark.parametrize("lang", sorted(SQL_ORACLE_LANGS))
def test_sql_oracle_matches_sample(lang):
    text = _LANG_SAMPLES[lang]
    assert _sql_tokens(lang, text) == get_analyzer(lang)(text)


@pytest.mark.parametrize(
    "lang", sorted(set(SQL_ORACLE_LANGS) & set(_GOLDEN_WORDS)))
def test_sql_oracle_matches_golden_words(lang):
    # inflected forms from the golden vectors, run through the full chain
    text = " ".join(_GOLDEN_WORDS[lang])
    assert _sql_tokens(lang, text) == get_analyzer(lang)(text)


@pytest.mark.parametrize("lang", sorted(SQL_ORACLE_LANGS))
def test_sql_oracle_fuzz_random_words(lang):
    """Seeded fuzz: 150 random words drawn from the language's own
    alphabet must stem identically through SQL and Python. This catches
    chain-ORDER bugs the fixed samples miss (e.g. an accent fold applied
    before instead of after the stop filter turned 'áz' into the
    stopword 'az' only on the SQL side)."""
    import random
    import unicodedata

    rng = random.Random(hash(lang) & 0xFFFF)
    alpha = sorted({c for c in _LANG_SAMPLES[lang].lower() if c.isalpha()})
    if lang in ("chinese", "thai"):
        # one script per word — mixed-script single words are a quirk of
        # the substitute tokenizer, not realistic text
        groups: dict = {}
        for c in alpha:
            try:
                key = unicodedata.name(c).split()[0]
            except ValueError:
                key = "?"
            groups.setdefault(key, []).append(c)
        words = []
        for _ in range(150):
            g = rng.choice(list(groups.values()))
            words.append("".join(rng.choice(g)
                                 for _ in range(rng.randint(1, 8))))
    else:
        words = ["".join(rng.choice(alpha)
                         for _ in range(rng.randint(1, 12)))
                 for _ in range(150)]
    text = " ".join(words)
    assert _sql_tokens(lang, text) == get_analyzer(lang)(text)


def test_porter_sql_matches_python():
    # the CV-mask Porter pipeline vs filters.porter_stem on the classic
    # vectors plus y-run and short-word edge cases
    from elasticsearch_ray.filters import porter_stem
    from elasticsearch_ray.lang.sql_oracle import porter_pipeline_ctes

    words = ("caresses ponies caress cats feed agreed motoring sing "
             "hopping tanned falling happy sky relational conditional "
             "vietnamization predication operator decisiveness formaliti "
             "sensitiviti triplicate formative electriciti hopeful goodness "
             "revival allowance inference adjustable defensible irritant "
             "replacement adoption communism activate effective probate "
             "rate cease controll roll oscillate enjoyment synergy dryly "
             "crying flying dying lying typing yes abbey day say by y yy "
             "queries query data window streaming").split()
    ctes, last = porter_pipeline_ctes()
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    sql = (f"WITH tok0(position, w) AS (VALUES {vals}), "
           + ",\n".join(ctes)
           + f" SELECT position, w FROM {last} ORDER BY position")
    got = list(duckdb.sql(sql).df()["w"])
    assert got == [porter_stem(w) for w in words]


def test_stem_pipeline_reusable_over_word_rows():
    # stem_pipeline() consumes arbitrary (position, w) rows — the shape
    # the lang_stemmed_index_search oracle relies on
    from elasticsearch_ray.lang.snowball import german_stem
    from elasticsearch_ray.lang.sql_oracle import stem_pipeline

    words = ["häusern", "kindern", "spielten", "gärten", "bücher"]
    ctes, last = stem_pipeline("german")
    vals = ", ".join(f"({i}, '{w}')" for i, w in enumerate(words))
    sql = (f"WITH tok0(position, w) AS (VALUES {vals}), "
           + ",\n".join(ctes)
           + f" SELECT position, w FROM {last} ORDER BY position")
    got = list(duckdb.sql(sql).df()["w"])
    assert got == [german_stem(w) for w in words]


def test_sql_oracle_quote_escaping():
    # apostrophes in the input must survive SQL literal quoting (turkish
    # apostrophe filter + catalan/irish elision read them). Dotted capital
    # İ is exercised only in the turkish chain — Python str.lower() maps a
    # stray İ to i+combining-dot while DuckDB folds it to plain i, a
    # divergence the Turkish-aware lowercase avoids by replacing İ first.
    assert (_sql_tokens("turkish", "İstanbul'daki ağaçlar")
            == get_analyzer("turkish")("İstanbul'daki ağaçlar"))
    text = "l'escola d'avió m'agrada"
    for lang in ("catalan", "irish"):
        assert _sql_tokens(lang, text) == get_analyzer(lang)(text)
