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
