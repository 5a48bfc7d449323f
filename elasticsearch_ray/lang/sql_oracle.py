"""DuckDB re-derivations of the light-stemmer analyzer chains.

Each `lang_oracle_sql(lang, text)` call emits a standalone DuckDB SQL
statement that re-implements the full per-language analyze chain —
pre-tokenization char filtering (elision / apostrophe / case folding),
Unicode tokenization, per-token normalization, stop removal, and the
published light-stemmer rules — in SQL, over the same input string the
gate analyzes. The suffix tables are interpolated from lang/light.py (the
single source of truth for the published rule lists: Savoy CLEF family,
Ramanathan & Rao 2003 Hindi, Tala 2003 Indonesian, etc. — see light.py);
the *algorithms* (longest-suffix with stem guards, palatalization
cascades, prefix order, iteration counts) are re-expressed independently
as SQL so the oracle actually recomputes the answer instead of replaying
the Python path.

SQL building blocks (all DuckDB 1.0 core):
- tokenize:  regexp_extract_all(pre, '[\\pL\\pM\\pN]+')  (RE2 \\p classes;
  the Python analyzer's `[^\\W_]|combining` class equals L+M+N for every
  registered sample — RE2's \\w is ASCII-only, so \\p classes are required)
- strip-longest(suffixes, min_stem):
    list_aggregate(list_transform(list_filter(SUFS,
        s -> ends_with(w, s) AND length(w)-length(s) >= MIN),
        s -> length(s)), 'max')  ->  substr(w, 1, length(w)-ml)
- positions: generate_subscripts over the stop-filtered token list
  (the _analyze gate numbers kept tokens densely).
"""

from __future__ import annotations

from .snowball import (_AR_PREFIXES, _AR_SUFFIXES, _DA_STEP1, _DA_VOWELS,
                       _NO_STEP1, _NO_VOWELS, _SV_S_END, _SV_STEP1,
                       _SV_VOWELS)
from .light import (_BG_ARTICLES, _BG_PLURAL, _BN_NUKTA, _BN_SUFFIXES,
                    _CA_SUFFIXES, _CKB_SUFFIXES, _CS_CASE_4, _CS_CASE_5,
                    _CS_VOWEL_END, _EL_SUFFIXES, _ET_SUFFIXES, _EU_SUFFIXES,
                    _GA_SUFFIXES, _GL_SUFFIXES, _HI_NUKTA, _HI_SUFFIXES,
                    _HU_CASE, _HU_PLURAL, _HU_POSS, _HY_SUFFIXES, _HY_VOWELS,
                    _ID_PARTICLES, _ID_POSSESSIVE, _ID_PREFIX1, _ID_PREFIX2,
                    _ID_SUFFIX, _LT_SUFFIXES, _LV_SUFFIXES, _LV_VOWELS,
                    _TR_SUFFIXES)
from .stopwords import STOP_SETS

__all__ = ["lang_oracle_sql", "SQL_ORACLE_LANGS"]

_TOKRE = r"[\pL\pM\pN]+"


def _q(s: str) -> str:
    return s.replace("'", "''")


def _strlist(words) -> str:
    return "[" + ", ".join(f"'{_q(w)}'" for w in words) + "]"


def _strip_pass(name: str, prev: str, suffixes, min_stem: int,
                extra_cond: str = "") -> str:
    """CTE applying _strip_longest(w, suffixes, min_stem) to column w."""
    return f"""{name} AS (
  SELECT position, CASE WHEN ml IS NULL THEN w
                        ELSE substr(w, 1, length(w) - ml) END AS w
  FROM (SELECT position, w,
               list_aggregate(list_transform(list_filter({_strlist(suffixes)},
                   s -> ends_with(w, s) AND length(w) - length(s) >= {min_stem}{extra_cond}),
                   s -> length(s)), 'max') AS ml
        FROM {prev}))"""


def _case_pass(name: str, prev: str, expr: str) -> str:
    """CTE applying an arbitrary scalar CASE expression over w."""
    return f"{name} AS (SELECT position, {expr} AS w FROM {prev})"


def _ends_any(col: str, sufs) -> str:
    return "(" + " OR ".join(f"ends_with({col}, '{_q(s)}')" for s in sufs) + ")"


def _in_chars(col: str, chars: str) -> str:
    return f"{col} IN (" + ", ".join(f"'{_q(c)}'" for c in chars) + ")"


def _replace_chain(expr: str, pairs) -> str:
    for a, b in pairs:
        expr = f"replace({expr}, '{_q(a)}', '{_q(b)}')"
    return expr


# ------------------------------------------------------------------
# per-language pre-tokenization expressions and stem-pass pipelines

def _pre_default(t: str) -> str:
    return f"lower({t})"


def _hu_passes():
    # assimilated instrumental: doubled stem-final consonant + al/el
    special = ("CASE WHEN length(w) > 5 AND (ends_with(w, 'al') OR ends_with(w, 'el')) "
               "AND substr(w, length(w)-2, 1) = substr(w, length(w)-3, 1) "
               "AND substr(w, length(w)-2, 1) NOT IN ('a','e','i','o','u') "
               "THEN substr(w, 1, length(w)-3) ELSE w END")
    return [("case", _case_pass("p1", "tok0", special)),
            ("strip", _strip_pass("p2", "p1", _HU_CASE, 3)),
            ("strip", _strip_pass("p3", "p2", _HU_POSS, 3)),
            ("strip", _strip_pass("p4", "p3", _HU_PLURAL, 3))]


def _cs_passes():
    pal_u = "substr(w, 1, length(w)-2)"
    pal = (f"CASE WHEN {_ends_any(pal_u, ('čtě', 'čti', 'čtí'))} "
           f"THEN substr({pal_u}, 1, length({pal_u})-3) || 'ck' "
           f"WHEN {_ends_any(pal_u, ('ště', 'šti', 'ští'))} "
           f"THEN substr({pal_u}, 1, length({pal_u})-3) || 'sk' "
           f"WHEN {_ends_any(pal_u, ('ci', 'ce', 'či', 'če', 'cí', 'čí'))} "
           f"THEN substr({pal_u}, 1, length({pal_u})-2) || 'k' "
           f"WHEN {_ends_any(pal_u, ('zi', 'ze', 'ži', 'že', 'zí', 'ží'))} "
           f"THEN substr({pal_u}, 1, length({pal_u})-2) || 'h' "
           f"ELSE substr({pal_u}, 1, length({pal_u})-1) END")
    case = (f"CASE WHEN length(w) > 7 AND ends_with(w, 'atech') THEN substr(w, 1, length(w)-5) "
            f"WHEN length(w) > 6 AND {_ends_any('w', ('ětem', 'etem', 'atům'))} "
            f"THEN substr(w, 1, length(w)-4) "
            f"WHEN length(w) > 5 AND {_ends_any('w', _CS_CASE_5)} THEN "
            f"(CASE WHEN {_in_chars('substr(w, length(w)-2, 1)', 'eiíě')} THEN {pal} "
            f"ELSE substr(w, 1, length(w)-3) END) "
            f"WHEN length(w) > 4 AND {_ends_any('w', _CS_CASE_4)} THEN substr(w, 1, length(w)-2) "
            f"WHEN length(w) > 3 AND {_in_chars('substr(w, length(w), 1)', _CS_VOWEL_END)} "
            f"THEN substr(w, 1, length(w)-1) ELSE w END")
    poss = ("CASE WHEN length(w) > 5 AND (ends_with(w, 'ov') OR ends_with(w, 'ův')) "
            "THEN substr(w, 1, length(w)-2) "
            "WHEN length(w) > 5 AND ends_with(w, 'in') THEN substr(w, 1, length(w)-1) "
            "ELSE w END")
    return [("case", _case_pass("p1", "tok0", case)),
            ("case", _case_pass("p2", "p1", poss))]


def _bg_passes():
    vowel = (f"CASE WHEN length(w) > 3 AND {_in_chars('substr(w, length(w), 1)', 'аеиоуя')} "
             f"THEN substr(w, 1, length(w)-1) ELSE w END")
    return [("strip", _strip_pass("p1", "tok0", _BG_ARTICLES, 3)),
            ("strip", _strip_pass("p2", "p1", _BG_PLURAL, 3)),
            ("case", _case_pass("p3", "p2", vowel))]


def _lv_passes():
    vow = "".join(_LV_VOWELS)
    extra = (" AND regexp_matches(substr(w, 1, length(w) - length(s)), "
             f"'[{vow}]')")
    return [("strip", _strip_pass("p1", "tok0", _LV_SUFFIXES, 3, extra))]


def _id_passes():
    pref = (f"pf AS (SELECT position, w, "
            f"list_filter({_strlist(_ID_PREFIX1)}, p -> starts_with(w, p) AND length(w) - length(p) >= 3) AS c1, "
            f"list_filter({_strlist(_ID_PREFIX2)}, p -> starts_with(w, p) AND length(w) - length(p) >= 3) AS c2 "
            f"FROM p2)")
    pick = ("p3 AS (SELECT position, CASE WHEN len(c1) > 0 THEN substr(w, length(c1[1]) + 1) "
            "WHEN len(c2) > 0 THEN substr(w, length(c2[1]) + 1) ELSE w END AS w FROM pf)")
    return [("strip", _strip_pass("p1", "tok0", _ID_PARTICLES, 3)),
            ("strip", _strip_pass("p2", "p1", _ID_POSSESSIVE, 3)),
            ("case", pref), ("case", pick),
            ("strip", _strip_pass("p4", "p3", _ID_SUFFIX, 3))]


def _hy_passes():
    vowel = (f"CASE WHEN length(w) > 3 AND ends_with(w, 'ն') "
             f"AND {_in_chars('substr(w, length(w)-1, 1)', _HY_VOWELS)} "
             f"THEN substr(w, 1, length(w)-1) ELSE w END")
    return [("strip", _strip_pass("p1", "tok0", _HY_SUFFIXES, 3)),
            ("case", _case_pass("p2", "p1", vowel))]


def _ca_passes():
    # -ns plural short-circuits the suffix pass (early return in the stemmer)
    ml = (f"list_aggregate(list_transform(list_filter({_strlist(_CA_SUFFIXES)}, "
          f"s -> ends_with(w, s) AND length(w) - length(s) >= 3), s -> length(s)), 'max')")
    expr = (f"CASE WHEN length(w) > 5 AND ends_with(w, 'ns') THEN substr(w, 1, length(w)-1) "
            f"WHEN {ml} IS NULL THEN w ELSE substr(w, 1, length(w) - {ml}) END")
    return [("case", _case_pass("p1", "tok0", expr))]


def _gl_passes():
    recode = (f"CASE WHEN length(w) > 4 AND ends_with(w, 'ns') THEN substr(w, 1, length(w)-1) "
              f"WHEN length(w) > 5 AND ends_with(w, 'les') THEN substr(w, 1, length(w)-2) "
              f"WHEN length(w) > 5 AND {_ends_any('w', ('ais', 'eis', 'ois'))} "
              f"THEN substr(w, 1, length(w)-2) || 'l' ELSE w END")
    return [("case", _case_pass("p1", "tok0", recode)),
            ("strip", _strip_pass("p2", "p1", _GL_SUFFIXES, 3))]


def _ga_passes():
    mut = ("CASE WHEN starts_with(w, 'n-') OR starts_with(w, 't-') OR starts_with(w, 'h-') "
           "THEN substr(w, 3) "
           "WHEN length(w) > 2 AND substr(w, 1, 1) = 'h' "
           f"AND {_in_chars('substr(w, 2, 1)', 'aeiouáéíóú')} THEN substr(w, 2) "
           "WHEN starts_with(w, 'bhf') THEN substr(w, 3) "
           "WHEN starts_with(w, 'mb') OR starts_with(w, 'gc') OR starts_with(w, 'nd') "
           "OR starts_with(w, 'ng') OR starts_with(w, 'bp') OR starts_with(w, 'dt') "
           "OR starts_with(w, 'ts') THEN substr(w, 2) ELSE w END")
    return [("case", _case_pass("p1", "tok0", mut)),
            ("strip", _strip_pass("p2", "p1", _GA_SUFFIXES, 3))]


def _norm_hi(x: str) -> str:
    e = f"replace(replace({x}, chr(8204), ''), chr(8205), '')"
    e = _replace_chain(e, _HI_NUKTA.items())
    return f"replace({e}, 'ँ', 'ं')"


def _norm_ckb(x: str) -> str:
    e = (f"replace(replace(replace(replace({x}, chr(8204), ''), 'ـ', ''), "
         f"'ي', 'ی'), 'ى', 'ی')")
    e = f"replace({e}, 'ك', 'ک')"
    return (f"CASE WHEN ends_with({e}, 'ه') "
            f"THEN substr({e}, 1, length({e})-1) || 'ە' ELSE {e} END")


def _norm_bn(x: str) -> str:
    e = f"replace(replace(replace({x}, chr(8204), ''), chr(8205), ''), '়', '')"
    e = _replace_chain(e, _BN_NUKTA.items())
    return f"replace(replace({e}, 'ঁ', 'ং'), 'ৎ', 'ত')"


# ------------------------------------------------------------------
# Snowball Scandinavian trio + Arabic light10 — these carry the R1
# region (position in the ORIGINAL lowered word) as a column through
# the step CTEs, exactly as the Snowball algorithms define it.

def _r1_cte(vowels: str) -> str:
    """CTE computing Snowball R1 with the 3-char minimum the Scandinavian
    algorithms apply: R1 starts after the first non-vowel that follows a
    vowel (shortest regexp prefix '.*?[v][^v]'), floored at min(3, len)."""
    v = "".join(vowels)
    return (f"r AS (SELECT position, w, GREATEST("
            f"CASE WHEN m = '' OR m IS NULL THEN length(w) ELSE length(m) END, "
            f"LEAST(3, length(w))) AS r1 "
            f"FROM (SELECT position, w, "
            f"regexp_extract(w, '^.*?[{v}][^{v}]') AS m FROM tok0))")


def _longest_ms(sufs) -> str:
    """Longest matching suffix length (no region condition — Snowball
    picks the longest first, THEN tests the region)."""
    return (f"list_aggregate(list_transform(list_filter({_strlist(sufs)}, "
            f"s -> ends_with(w, s)), s -> length(s)), 'max')")


def _undouble1(col: str, endings, r1col: str = "r1") -> str:
    cond = " OR ".join(f"ends_with({col}, '{_q(e)}')" for e in endings)
    return (f"CASE WHEN length({col}) - 1 >= {r1col} AND ({cond}) "
            f"THEN substr({col}, 1, length({col}) - 1) ELSE {col} END")


def _sv_passes():
    s_end = _in_chars("substr(w, length(w)-1, 1)", _SV_S_END)
    s1 = (f"s1 AS (SELECT position, r1, CASE "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 THEN substr(w, 1, length(w)-ms) "
          f"WHEN ends_with(w, 's') AND length(w) - 1 >= r1 AND length(w) >= 2 AND {s_end} "
          f"THEN substr(w, 1, length(w)-1) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, {_longest_ms(_SV_STEP1)} AS ms FROM r))")
    s2 = (f"s2 AS (SELECT position, r1, "
          f"{_undouble1('w', ('dd', 'gd', 'nn', 'dt', 'gt', 'kt', 'tt'))} AS w FROM s1)")
    s3 = (f"s3 AS (SELECT position, CASE "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 THEN "
          f"(CASE WHEN substr(w, length(w)-ms+1) IN ('fullt', 'löst') "
          f"THEN substr(w, 1, length(w)-1) ELSE substr(w, 1, length(w)-ms) END) "
          f"ELSE w END AS w "
          f"FROM (SELECT position, w, r1, "
          f"{_longest_ms(('fullt', 'löst', 'lig', 'els', 'ig'))} AS ms FROM s2))")
    return [("case", _r1_cte(_SV_VOWELS)), ("case", s1), ("case", s2),
            ("case", s3)]


def _no_passes():
    prev1 = "substr(w, length(w)-1, 1)"
    prev2 = "substr(w, length(w)-2, 1)"
    s_rule = (f"ends_with(w, 's') AND length(w) - 1 >= r1 AND length(w) >= 2 AND "
              f"({_in_chars(prev1, 'bcdfghjlmnoprtvyz')} OR "
              f"({prev1} = 'k' AND (length(w) < 3 OR NOT {_in_chars(prev2, _NO_VOWELS)})))")
    s1 = (f"s1 AS (SELECT position, r1, CASE "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 THEN "
          f"(CASE WHEN substr(w, length(w)-ms+1) IN ('erte', 'ert') "
          f"THEN substr(w, 1, length(w)-ms) || 'er' "
          f"ELSE substr(w, 1, length(w)-ms) END) "
          f"WHEN {s_rule} THEN substr(w, 1, length(w)-1) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, {_longest_ms(_NO_STEP1)} AS ms FROM r))")
    s2 = (f"s2 AS (SELECT position, r1, "
          f"{_undouble1('w', ('dt', 'vt'))} AS w FROM s1)")
    step3 = ("hetslov", "slov", "elov", "elig", "eleg", "lov", "lig", "eig",
             "els", "leg", "ig")
    s3 = (f"s3 AS (SELECT position, CASE "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 "
          f"THEN substr(w, 1, length(w)-ms) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, {_longest_ms(step3)} AS ms FROM s2))")
    return [("case", _r1_cte(_NO_VOWELS)), ("case", s1), ("case", s2),
            ("case", s3)]


def _da_passes():
    s_end = _in_chars("substr(w, length(w)-1, 1)", "abcdfghjklmnoprtvyzå")
    s1 = (f"s1 AS (SELECT position, r1, CASE "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 THEN substr(w, 1, length(w)-ms) "
          f"WHEN ends_with(w, 's') AND length(w) - 1 >= r1 AND length(w) >= 2 AND {s_end} "
          f"THEN substr(w, 1, length(w)-1) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, {_longest_ms(_DA_STEP1)} AS ms FROM r))")
    und = ("gd", "dt", "gt", "kt")
    s2 = (f"s2 AS (SELECT position, r1, {_undouble1('w', und)} AS w FROM s1)")
    s3a = ("s3a AS (SELECT position, r1, CASE WHEN ends_with(w, 'igst') "
           "THEN substr(w, 1, length(w)-2) ELSE w END AS w FROM s2)")
    u = "substr(w, 1, length(w)-ms)"
    s3 = (f"s3 AS (SELECT position, r1, CASE "
          f"WHEN ms IS NOT NULL AND substr(w, length(w)-ms+1) = 'løst' THEN "
          f"(CASE WHEN length(w) - ms >= r1 - 1 THEN substr(w, 1, length(w)-1) ELSE w END) "
          f"WHEN ms IS NOT NULL AND length(w) - ms >= r1 THEN {_undouble1(u, und)} "
          f"ELSE w END AS w "
          f"FROM (SELECT position, w, r1, "
          f"{_longest_ms(('elig', 'løst', 'lig', 'els', 'ig'))} AS ms FROM s3a))")
    s4 = (f"s4 AS (SELECT position, CASE "
          f"WHEN length(w) - 1 >= r1 AND length(w) >= 2 "
          f"AND substr(w, length(w), 1) = substr(w, length(w)-1, 1) "
          f"AND NOT {_in_chars('substr(w, length(w), 1)', _DA_VOWELS)} "
          f"THEN substr(w, 1, length(w)-1) ELSE w END AS w FROM s3)")
    return [("case", _r1_cte(_DA_VOWELS)), ("case", s1), ("case", s2),
            ("case", s3a), ("case", s3), ("case", s4)]


def _ar_passes():
    # normalization: strip harakat + shadda/sukun + tatweel, unify hamza
    # forms to bare alef, alef maqsura -> ya, teh marbuta -> heh
    norm = _replace_chain(
        "translate(w, 'ًٌٍَُِّْـ', '')",
        [("أ", "ا"), ("إ", "ا"), ("آ", "ا"), ("ى", "ي"), ("ة", "ه")])
    n0 = f"n0 AS (SELECT position, {norm} AS w FROM tok0)"
    pre = (f"pr AS (SELECT position, CASE WHEN len(c) > 0 "
           f"THEN substr(w, length(c[1]) + 1) ELSE w END AS w "
           f"FROM (SELECT position, w, list_filter({_strlist(_AR_PREFIXES)}, "
           f"p -> starts_with(w, p) AND length(w) > length(p) + 1) AS c FROM n0))")
    passes = [("case", n0), ("case", pre)]
    prev = "pr"
    # light10 strips suffixes repeatedly (first match in list order each
    # round) until none applies; 8 unrolled rounds reach the fixed point
    # for any word up to ~18 chars given the 1-char-per-round minimum
    for i in range(1, 9):
        name = f"sf{i}"
        passes.append(("case", (
            f"{name} AS (SELECT position, CASE WHEN len(c) > 0 "
            f"THEN substr(w, 1, length(w) - length(c[1])) ELSE w END AS w "
            f"FROM (SELECT position, w, list_filter({_strlist(_AR_SUFFIXES)}, "
            f"s -> ends_with(w, s) AND length(w) > length(s) + 1) AS c "
            f"FROM {prev}))")))
        prev = name
    return passes


_SPECS: dict[str, dict] = {
    "swedish": dict(pre=_pre_default, passes=_sv_passes),
    "norwegian": dict(pre=_pre_default, passes=_no_passes),
    "danish": dict(pre=_pre_default, passes=_da_passes),
    "arabic": dict(pre=_pre_default, passes=_ar_passes),
    "hungarian": dict(
        pre=lambda t: f"translate(lower({t}), 'áéíóöőúüű', 'aeiooouuu')",
        passes=_hu_passes),
    "turkish": dict(
        pre=lambda t: ("lower(replace(replace(regexp_replace("
                       f"{t}, '[''’][\\pL\\pM\\pN_]*', '', 'g'), "
                       "'İ', 'i'), 'I', 'ı'))"),
        # light stemmer: up to 3 longest-suffix passes (fixed-point unroll)
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _TR_SUFFIXES, 3)),
                        ("strip", _strip_pass("p2", "p1", _TR_SUFFIXES, 3)),
                        ("strip", _strip_pass("p3", "p2", _TR_SUFFIXES, 3))]),
    "greek": dict(
        pre=lambda t: f"translate(lower({t}), 'άέήίόύώϊϋΐΰς', 'αεηιουωιυιυσ')",
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _EL_SUFFIXES, 3))]),
    "hindi": dict(pre=_pre_default, norm=_norm_hi,
                  passes=lambda: [("strip", _strip_pass("p1", "tok0", _HI_SUFFIXES, 1))]),
    "czech": dict(pre=_pre_default, passes=_cs_passes),
    "bulgarian": dict(pre=_pre_default, passes=_bg_passes),
    "latvian": dict(pre=_pre_default, passes=_lv_passes),
    "indonesian": dict(pre=_pre_default, passes=_id_passes),
    "sorani": dict(pre=_pre_default, norm=_norm_ckb,
                   passes=lambda: [("strip", _strip_pass("p1", "tok0", _CKB_SUFFIXES, 2))]),
    "armenian": dict(pre=_pre_default, passes=_hy_passes),
    "basque": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _EU_SUFFIXES, 3))]),
    "bengali": dict(pre=_pre_default, norm=_norm_bn,
                    passes=lambda: [("strip", _strip_pass("p1", "tok0", _BN_SUFFIXES, 2))]),
    "catalan": dict(
        pre=lambda t: (f"lower(regexp_replace({t}, "
                       "'(?i)\\b(d|l|m|n|s|t)[''’]', ' ', 'g'))"),
        passes=_ca_passes),
    "estonian": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _ET_SUFFIXES, 3))]),
    "galician": dict(pre=_pre_default, passes=_gl_passes),
    "irish": dict(
        pre=lambda t: (f"lower(regexp_replace({t}, "
                       "'(?i)\\b(d|m|b)[''’]', ' ', 'g'))"),
        passes=_ga_passes),
    "lithuanian": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _LT_SUFFIXES, 3))]),
}

SQL_ORACLE_LANGS = tuple(_SPECS) + ("chinese", "thai")


def lang_oracle_sql(lang: str, text: str) -> str:
    """Standalone DuckDB statement producing the (position, token) frame of
    the language's analyze chain over `text`."""
    if lang == "chinese":
        # ChineseAnalyzerProvider = StandardAnalyzer semantics: one token
        # per Han ideograph (leftmost-first alternation splits the run),
        # standard words elsewhere, English stop set. The sample contains
        # no fullwidth forms, so the CJKWidth fold is the identity here.
        stops = _strlist(sorted(STOP_SETS["chinese"]))
        return f"""
WITH arr AS (
  SELECT list_filter(regexp_extract_all(lower('{_q(text)}'),
             '[一-鿿㐀-䶿]|[a-z0-9]+'),
         x -> NOT list_contains({stops}, x)) AS a)
SELECT CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS position,
       unnest(a) AS token
FROM arr ORDER BY position"""
    if lang == "thai":
        # script-run tokenization: a maximal Thai run is one token,
        # non-Thai spans are standard words; Thai stop set.
        stops = _strlist(sorted(STOP_SETS["thai"]))
        return f"""
WITH arr AS (
  SELECT list_filter(regexp_extract_all(lower('{_q(text)}'),
             '[ก-๎๐-๙]+|[a-z0-9]+'),
         x -> NOT list_contains({stops}, x)) AS a)
SELECT CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS position,
       unnest(a) AS token
FROM arr ORDER BY position"""

    spec = _SPECS[lang]
    pre = spec["pre"]("'" + _q(text) + "'")
    norm = spec.get("norm")
    norm_expr = norm("x") if norm else "x"
    stops = _strlist(sorted(STOP_SETS[lang]))
    passes = spec["passes"]()
    ctes = [p[1] for p in passes]
    last = ctes[-1].split(" AS ")[0].strip()
    body = ",\n".join(ctes)
    return f"""
WITH arr AS (
  SELECT list_filter(list_transform(regexp_extract_all({pre}, '{_TOKRE}'),
                                    x -> {norm_expr}),
         x -> NOT list_contains({stops}, x)) AS a),
tok0 AS (
  SELECT CAST(generate_subscripts(a, 1) - 1 AS BIGINT) AS position,
         unnest(a) AS w
  FROM arr),
{body}
SELECT position, w AS token FROM {last} ORDER BY position"""
