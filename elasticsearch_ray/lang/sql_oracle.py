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
                       _DE_S_END, _DE_ST_END, _DE_VOWELS, _NL_VOWELS,
                       _NO_STEP1, _NO_VOWELS, _RU_ADJECTIVE, _RU_NOUN,
                       _RU_PARTICIPLE_1, _RU_PARTICIPLE_2, _RU_PERFECTIVE_1,
                       _RU_PERFECTIVE_2, _RU_VERB_1, _RU_VERB_2, _RU_VOWELS,
                       _SV_S_END, _SV_STEP1, _SV_VOWELS)
from .light import (_BG_ARTICLES, _BG_PLURAL, _BN_NUKTA, _BN_SUFFIXES,
                    _BR_ADVERB, _BR_AUGMENT, _BR_FEMININE, _BR_NOUN,
                    _BR_PLURAL, _BR_VERB, _BR_VOWEL,
                    _CA_SUFFIXES, _CKB_SUFFIXES, _CS_CASE_4, _CS_CASE_5,
                    _CS_VOWEL_END, _EL_SUFFIXES, _ET_SUFFIXES, _EU_SUFFIXES,
                    _GA_SUFFIXES, _GL_SUFFIXES, _HI_NUKTA, _HI_SUFFIXES,
                    _HU_CASE, _HU_PLURAL, _HU_POSS, _HY_SUFFIXES, _HY_VOWELS,
                    _ID_PARTICLES, _ID_POSSESSIVE, _ID_PREFIX1, _ID_PREFIX2,
                    _ID_SUFFIX, _LT_SUFFIXES, _LV_SUFFIXES, _LV_VOWELS,
                    _TR_SUFFIXES, _PL_CASE, _PL_DIM, _UK_REFLEX, _UK_CASE,
                    _KO_PARTICLES)
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
    # the accent fold lives INSIDE hungarian_stem — i.e. after the stop
    # filter, which checks accented forms — so it is a stem stage here,
    # not part of the pre-tokenization lowercase (an 'áz' input must NOT
    # fold into the stopword 'az' before the stop check)
    h0 = ("h0 AS (SELECT position, "
          "translate(w, 'áéíóöőúüű', 'aeiooouuu') AS w FROM tok0)")
    # assimilated instrumental: doubled stem-final consonant + al/el
    special = ("CASE WHEN length(w) > 5 AND (ends_with(w, 'al') OR ends_with(w, 'el')) "
               "AND substr(w, length(w)-2, 1) = substr(w, length(w)-3, 1) "
               "AND substr(w, length(w)-2, 1) NOT IN ('a','e','i','o','u') "
               "THEN substr(w, 1, length(w)-3) ELSE w END")
    return [("case", h0),
            ("case", _case_pass("p1", "h0", special)),
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


def _longest_ms(sufs, col: str = "w") -> str:
    """Longest matching suffix length (no region condition — Snowball
    picks the longest first, THEN tests the region)."""
    return (f"list_aggregate(list_transform(list_filter({_strlist(sufs)}, "
            f"s -> ends_with({col}, s)), s -> length(s)), 'max')")


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


# ------------------------------------------------------------------
# German / Dutch / Russian Snowball

def _r12_cte(vowels: str, prev: str, floor3: bool = True,
             name: str = "r") -> str:
    """CTE adding Snowball r1 AND r2 columns (positions in the word the
    CTE receives — for German/Dutch that is the protection-marked form,
    whose uppercase markers count as consonants, as Snowball requires)."""
    v = "".join(vowels)
    p1 = f"^.*?[{v}][^{v}]"
    p2 = f"^.*?[{v}][^{v}].*?[{v}][^{v}]"
    r1 = "CASE WHEN m1 = '' OR m1 IS NULL THEN length(w) ELSE length(m1) END"
    if floor3:
        r1 = f"GREATEST({r1}, LEAST(3, length(w)))"
    return (f"{name} AS (SELECT position, w, {r1} AS r1, "
            f"CASE WHEN m2 = '' OR m2 IS NULL THEN length(w) ELSE length(m2) END AS r2 "
            f"FROM (SELECT position, w, regexp_extract(w, '{p1}') AS m1, "
            f"regexp_extract(w, '{p2}') AS m2 FROM {prev}))")


def _protect_cte(name: str, prev: str, char_case: str,
                 carry: str = "") -> str:
    """CTE rebuilding w character-by-character (exact positional marking,
    including overlapping neighbor contexts a global regexp would miss)."""
    return (f"{name} AS (SELECT position{carry}, COALESCE(list_aggregate("
            f"list_transform(range(1, length(w)+1), i -> {char_case}), "
            f"'string_agg', ''), w) AS w FROM {prev})")


def _de_passes():
    vow = _in_chars("substr(w, i-1, 1)", _DE_VOWELS)
    vow2 = _in_chars("substr(w, i+1, 1)", _DE_VOWELS)
    prot = (f"CASE WHEN i > 1 AND i < length(w) AND substr(w, i, 1) IN ('u', 'y') "
            f"AND {vow} AND {vow2} THEN upper(substr(w, i, 1)) "
            f"ELSE substr(w, i, 1) END")
    g0 = "g0 AS (SELECT position, replace(w, 'ß', 'ss') AS w FROM tok0)"
    gp = _protect_cte("gp", "g0", prot)
    # step 1 (cut computed from the longest suffix BEFORE the region test)
    s_end = _in_chars("substr(w, length(w)-ms, 1)", _DE_S_END)
    u1 = "substr(w, 1, length(w)-ms)"
    s1 = (f"s1 AS (SELECT position, r1, r2, CASE "
          f"WHEN ms IS NULL THEN w "
          f"WHEN substr(w, length(w)-ms+1) = 's' THEN "
          f"(CASE WHEN length(w)-ms >= r1 AND length(w)-ms > 0 AND {s_end} "
          f"THEN {u1} ELSE w END) "
          f"WHEN length(w)-ms >= r1 THEN "
          f"(CASE WHEN substr(w, length(w)-ms+1) IN ('en', 'es', 'e') "
          f"AND ends_with({u1}, 'niss') THEN substr(w, 1, length(w)-ms-1) "
          f"ELSE {u1} END) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, r2, "
          f"{_longest_ms(('em', 'ern', 'er', 'en', 'es', 'e', 's'))} AS ms FROM r))")
    st_end = _in_chars("substr(w, length(w)-ms, 1)", _DE_ST_END)
    s2 = (f"s2 AS (SELECT position, r1, r2, CASE "
          f"WHEN ms IS NULL THEN w "
          f"WHEN substr(w, length(w)-ms+1) = 'st' THEN "
          f"(CASE WHEN length(w)-ms >= r1 AND length(w)-ms >= 3 AND {st_end} "
          f"THEN {u1} ELSE w END) "
          f"WHEN length(w)-ms >= r1 THEN {u1} ELSE w END AS w "
          f"FROM (SELECT position, w, r1, r2, "
          f"{_longest_ms(('est', 'en', 'er', 'st'))} AS ms FROM s1))")
    # step 3 d-suffixes; u = stripped form
    u = "substr(w, 1, length(w)-ms)"
    endung = (f"(CASE WHEN ends_with({u}, 'ig') AND length({u})-2 >= r2 "
              f"AND NOT ends_with({u}, 'eig') "
              f"THEN substr({u}, 1, length({u})-2) ELSE {u} END)")
    licheit = (f"(CASE WHEN ends_with({u}, 'er') AND length({u})-2 >= r1 "
               f"THEN substr({u}, 1, length({u})-2) "
               f"WHEN ends_with({u}, 'en') AND length({u})-2 >= r1 "
               f"THEN substr({u}, 1, length({u})-2) ELSE {u} END)")
    keit = (f"(CASE WHEN ends_with({u}, 'lich') AND length({u})-4 >= r2 "
            f"THEN substr({u}, 1, length({u})-4) "
            f"WHEN ends_with({u}, 'ig') AND length({u})-2 >= r2 "
            f"THEN substr({u}, 1, length({u})-2) ELSE {u} END)")
    s3 = (f"s3 AS (SELECT position, CASE "
          f"WHEN ms IS NULL THEN w "
          f"WHEN substr(w, length(w)-ms+1) IN ('end', 'ung') THEN "
          f"(CASE WHEN length(w)-ms >= r2 THEN {endung} ELSE w END) "
          f"WHEN substr(w, length(w)-ms+1) IN ('ig', 'ik', 'isch') THEN "
          f"(CASE WHEN length(w)-ms >= r2 AND (length(w)-ms = 0 "
          f"OR substr(w, length(w)-ms, 1) <> 'e') THEN {u} ELSE w END) "
          f"WHEN substr(w, length(w)-ms+1) IN ('lich', 'heit') THEN "
          f"(CASE WHEN length(w)-ms >= r2 THEN {licheit} ELSE w END) "
          f"WHEN substr(w, length(w)-ms+1) = 'keit' THEN "
          f"(CASE WHEN length(w)-ms >= r2 THEN {keit} ELSE w END) "
          f"ELSE w END AS w "
          f"FROM (SELECT position, w, r1, r2, "
          f"{_longest_ms(('end', 'ung', 'isch', 'ik', 'ig', 'lich', 'heit', 'keit'))} AS ms "
          f"FROM s2))")
    fin = ("fin AS (SELECT position, "
           + _replace_chain("w", [("U", "u"), ("Y", "y"), ("ä", "a"),
                                  ("ö", "o"), ("ü", "u")])
           + " AS w FROM s3)")
    return [("case", g0), ("case", gp),
            ("case", _r12_cte(_DE_VOWELS, "gp")),
            ("case", s1), ("case", s2), ("case", s3), ("case", fin)]


def _nl_undouble_sql(col: str) -> str:
    return (f"(CASE WHEN ends_with({col}, 'kk') OR ends_with({col}, 'dd') "
            f"OR ends_with({col}, 'tt') THEN substr({col}, 1, length({col})-1) "
            f"ELSE {col} END)")


def _nl_passes():
    vow_prev = _in_chars("substr(w, i-1, 1)", _NL_VOWELS)
    vow_next = _in_chars("substr(w, i+1, 1)", _NL_VOWELS)
    prot = (f"CASE WHEN substr(w, i, 1) = 'y' AND (i = 1 OR {vow_prev}) THEN 'Y' "
            f"WHEN substr(w, i, 1) = 'i' AND i > 1 AND i < length(w) "
            f"AND {vow_prev} AND {vow_next} THEN 'I' "
            f"ELSE substr(w, i, 1) END")
    d0 = ("d0 AS (SELECT position, "
          + _replace_chain("w", [("ä", "a"), ("ë", "e"), ("ï", "i"),
                                 ("ö", "o"), ("ü", "u"), ("á", "a"),
                                 ("é", "e"), ("í", "i"), ("ó", "o"),
                                 ("ú", "u")])
          + " AS w FROM tok0)")
    dp = _protect_cte("dp", "d0", prot)
    nvow = lambda col: "NOT " + _in_chars(col, _NL_VOWELS)  # noqa: E731
    u1 = "substr(w, 1, length(w)-ms)"
    s1 = (f"s1 AS (SELECT position, r1, r2, CASE "
          f"WHEN ms IS NULL THEN w "
          f"WHEN substr(w, length(w)-ms+1) = 'heden' THEN "
          f"(CASE WHEN length(w)-ms >= r1 THEN {u1} || 'heid' ELSE w END) "
          f"WHEN substr(w, length(w)-ms+1) IN ('ene', 'en') THEN "
          f"(CASE WHEN length(w)-ms >= r1 AND length(w)-ms > 0 "
          f"AND {nvow('substr(w, length(w)-ms, 1)')} "
          f"AND substr({u1}, length({u1})-2) <> 'gem' "
          f"THEN {_nl_undouble_sql(u1)} ELSE w END) "
          f"WHEN substr(w, length(w)-ms+1) IN ('se', 's') THEN "
          f"(CASE WHEN length(w)-ms >= r1 AND length(w)-ms > 0 "
          f"AND NOT {_in_chars('substr(w, length(w)-ms, 1)', _NL_VOWELS + 'j')} "
          f"THEN {u1} ELSE w END) ELSE w END AS w "
          f"FROM (SELECT position, w, r1, r2, "
          f"{_longest_ms(('heden', 'ene', 'en', 'se', 's'))} AS ms FROM r))")
    e1 = "substr(w, 1, length(w)-1)"
    s2 = (f"s2 AS (SELECT position, r1, r2, CASE "
          f"WHEN ends_with(w, 'e') AND length(w)-1 >= r1 AND length(w) >= 2 "
          f"AND {nvow('substr(w, length(w)-1, 1)')} "
          f"THEN {_nl_undouble_sql(e1)} ELSE w END AS w, "
          f"(ends_with(w, 'e') AND length(w)-1 >= r1 AND length(w) >= 2 "
          f"AND {nvow('substr(w, length(w)-1, 1)')}) AS e_removed FROM s1)")
    h4 = "substr(w, 1, length(w)-4)"
    hen = (f"(CASE WHEN ends_with({h4}, 'en') AND length({h4})-2 >= r1 "
           f"AND length({h4}) > 2 AND {nvow(f'substr({h4}, length({h4})-2, 1)')} "
           f"AND substr(substr({h4}, 1, length({h4})-2), "
           f"length(substr({h4}, 1, length({h4})-2))-2) <> 'gem' "
           f"THEN {_nl_undouble_sql(f'substr({h4}, 1, length({h4})-2)')} "
           f"ELSE {h4} END)")
    s3a = (f"s3a AS (SELECT position, r1, r2, e_removed, CASE "
           f"WHEN ends_with(w, 'heid') AND length(w)-4 >= r2 "
           f"AND (length(w) < 5 OR substr(w, length(w)-4, 1) <> 'c') "
           f"THEN {hen} ELSE w END AS w FROM s2)")
    u = "substr(w, 1, length(w)-ms)"
    endig = (f"(CASE WHEN ends_with({u}, 'ig') AND length({u})-2 >= r2 "
             f"AND (length({u}) < 3 OR substr({u}, length({u})-2, 1) <> 'e') "
             f"THEN substr({u}, 1, length({u})-2) "
             f"ELSE {_nl_undouble_sql(u)} END)")
    lijk = (f"(CASE WHEN ends_with({u}, 'e') AND length({u})-1 >= r1 "
            f"AND length({u}) >= 2 AND {nvow(f'substr({u}, length({u})-1, 1)')} "
            f"THEN {_nl_undouble_sql(f'substr({u}, 1, length({u})-1)')} "
            f"ELSE {u} END)")
    s3b = (f"s3b AS (SELECT position, CASE "
           f"WHEN ms IS NULL THEN w "
           f"WHEN substr(w, length(w)-ms+1) IN ('end', 'ing') THEN "
           f"(CASE WHEN length(w)-ms >= r2 THEN {endig} ELSE w END) "
           f"WHEN substr(w, length(w)-ms+1) = 'ig' THEN "
           f"(CASE WHEN length(w)-ms >= r2 AND (length(w)-ms = 0 "
           f"OR substr(w, length(w)-ms, 1) <> 'e') THEN {u} ELSE w END) "
           f"WHEN substr(w, length(w)-ms+1) = 'lijk' THEN "
           f"(CASE WHEN length(w)-ms >= r2 THEN {lijk} ELSE w END) "
           f"WHEN substr(w, length(w)-ms+1) = 'baar' THEN "
           f"(CASE WHEN length(w)-ms >= r2 THEN {u} ELSE w END) "
           f"WHEN substr(w, length(w)-ms+1) = 'bar' THEN "
           f"(CASE WHEN length(w)-ms >= r2 AND e_removed THEN {u} ELSE w END) "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, r1, r2, e_removed, "
           f"{_longest_ms(('end', 'ing', 'ig', 'lijk', 'baar', 'bar'))} AS ms "
           f"FROM s3a))")
    s4 = (f"s4 AS (SELECT position, CASE "
          f"WHEN length(w) >= 4 AND {nvow('substr(w, length(w), 1)')} "
          f"AND substr(w, length(w), 1) <> 'I' "
          f"AND substr(w, length(w)-1, 1) = substr(w, length(w)-2, 1) "
          f"AND substr(w, length(w)-1, 1) IN ('a', 'e', 'o', 'u') "
          f"AND {nvow('substr(w, length(w)-3, 1)')} "
          f"THEN substr(w, 1, length(w)-2) || substr(w, length(w), 1) "
          f"ELSE w END AS w FROM s3b)")
    fin = ("fin AS (SELECT position, replace(replace(w, 'Y', 'y'), 'I', 'i') "
           "AS w FROM s4)")
    return [("case", d0), ("case", dp),
            ("case", _r12_cte(_NL_VOWELS, "dp")),
            ("case", s1), ("case", s2), ("case", s3a), ("case", s3b),
            ("case", s4), ("case", fin)]


def _ru_group_ml(g1, g2, rvcol: str = "rv") -> str:
    """Longest suffix length over group2 (region-tested) and group1
    (region + preceding а/я), -1 when neither matches."""
    l2 = (f"COALESCE(list_aggregate(list_transform(list_filter({_strlist(g2)}, "
          f"s -> ends_with(w, s) AND length(w)-length(s) >= {rvcol}), "
          f"s -> length(s)), 'max'), -1)")
    if not g1:
        return l2
    l1 = (f"COALESCE(list_aggregate(list_transform(list_filter({_strlist(g1)}, "
          f"s -> ends_with(w, s) AND length(w)-length(s) >= {rvcol} "
          f"AND length(w)-length(s) > 0 "
          f"AND substr(w, length(w)-length(s), 1) IN ('а', 'я')), "
          f"s -> length(s)), 'max'), -1)")
    return f"GREATEST({l1}, {l2})"


def _ru_passes():
    v = "".join(_RU_VOWELS)
    p2 = f"^.*?[{v}][^{v}].*?[{v}][^{v}]"
    r0 = "r0 AS (SELECT position, replace(w, 'ё', 'е') AS w FROM tok0)"
    rr = (f"rr AS (SELECT position, w, "
          f"CASE WHEN mv = '' OR mv IS NULL THEN length(w) ELSE length(mv) END AS rv, "
          f"CASE WHEN m2 = '' OR m2 IS NULL THEN length(w) ELSE length(m2) END AS r2 "
          f"FROM (SELECT position, w, regexp_extract(w, '^[^{v}]*[{v}]') AS mv, "
          f"regexp_extract(w, '{p2}') AS m2 FROM r0))")
    s1a = (f"s1a AS (SELECT position, rv, r2, ml > 0 AS p_done, "
           f"CASE WHEN ml > 0 THEN substr(w, 1, length(w)-ml) ELSE w END AS w "
           f"FROM (SELECT position, w, rv, r2, "
           f"{_ru_group_ml(_RU_PERFECTIVE_1, _RU_PERFECTIVE_2)} AS ml FROM rr))")
    s1b = (f"s1b AS (SELECT position, rv, r2, p_done, CASE "
           f"WHEN NOT p_done AND (ends_with(w, 'ся') OR ends_with(w, 'сь')) "
           f"AND length(w)-2 >= rv THEN substr(w, 1, length(w)-2) "
           f"ELSE w END AS w FROM s1a)")
    s1c = (f"s1c AS (SELECT position, rv, r2, "
           f"(NOT p_done AND mla > 0) AS adj_done, CASE "
           f"WHEN p_done THEN w "
           f"WHEN mla > 0 THEN substr(w, 1, length(w)-mla) "
           f"WHEN mlv > 0 THEN substr(w, 1, length(w)-mlv) "
           f"WHEN mln > 0 THEN substr(w, 1, length(w)-mln) "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, rv, r2, p_done, "
           f"{_ru_group_ml((), _RU_ADJECTIVE)} AS mla, "
           f"{_ru_group_ml(_RU_VERB_1, _RU_VERB_2)} AS mlv, "
           f"{_ru_group_ml((), _RU_NOUN)} AS mln FROM s1b))")
    s1d = (f"s1d AS (SELECT position, rv, r2, CASE "
           f"WHEN adj_done AND ml > 0 THEN substr(w, 1, length(w)-ml) "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, rv, r2, adj_done, "
           f"{_ru_group_ml(_RU_PARTICIPLE_1, _RU_PARTICIPLE_2)} AS ml FROM s1c))")
    s2 = (f"s2 AS (SELECT position, rv, r2, CASE "
          f"WHEN ends_with(w, 'и') AND length(w)-1 >= rv "
          f"THEN substr(w, 1, length(w)-1) ELSE w END AS w FROM s1d)")
    s3 = (f"s3 AS (SELECT position, rv, CASE "
          f"WHEN ends_with(w, 'ость') AND length(w)-4 >= r2 "
          f"THEN substr(w, 1, length(w)-4) "
          f"WHEN ends_with(w, 'ост') AND length(w)-3 >= r2 "
          f"THEN substr(w, 1, length(w)-3) ELSE w END AS w FROM s2)")
    u = "substr(w, 1, length(w)-ms)"
    s4 = (f"s4 AS (SELECT position, rv, CASE "
          f"WHEN ends_with(w, 'нн') AND length(w)-1 >= rv "
          f"THEN substr(w, 1, length(w)-1) "
          f"WHEN ms IS NOT NULL AND length(w)-ms >= rv THEN "
          f"(CASE WHEN ends_with({u}, 'нн') AND length({u})-1 >= rv "
          f"THEN substr({u}, 1, length({u})-1) ELSE {u} END) "
          f"ELSE w END AS w "
          f"FROM (SELECT position, w, rv, "
          f"{_longest_ms(('ейше', 'ейш'))} AS ms FROM s3))")
    s5 = (f"s5 AS (SELECT position, CASE "
          f"WHEN ends_with(w, 'ь') AND length(w)-1 >= rv "
          f"THEN substr(w, 1, length(w)-1) ELSE w END AS w FROM s4)")
    return [("case", r0), ("case", rr), ("case", s1a), ("case", s1b),
            ("case", s1c), ("case", s1d), ("case", s2), ("case", s3),
            ("case", s4), ("case", s5)]


# ------------------------------------------------------------------
# Romance Snowball (Spanish / Italian / Portuguese): shared RV rule +
# step-1 branch tables with replacement endings and follow-up chains.

def _romance_r_cte(vowels: str, prev: str, name: str = "r") -> str:
    """CTE adding r1, r2 AND the Romance RV: if the 2nd letter is a
    consonant, RV is after the next vowel; if the first two letters are
    vowels, after the next consonant; else (C-V) after the 3rd letter."""
    v = "".join(vowels)
    p1 = f"^.*?[{v}][^{v}]"
    p2 = f"^.*?[{v}][^{v}].*?[{v}][^{v}]"
    pa = f"^..[^{v}]*[{v}]"
    pb = f"^..[{v}]*[^{v}]"
    ln = "CASE WHEN {m} = '' OR {m} IS NULL THEN length(w) ELSE length({m}) END"
    return (f"{name} AS (SELECT position, w, "
            f"{ln.format(m='m1')} AS r1, {ln.format(m='m2')} AS r2, "
            f"CASE WHEN length(w) < 3 THEN length(w) "
            f"WHEN NOT {_in_chars('substr(w, 2, 1)', vowels)} THEN {ln.format(m='ma')} "
            f"WHEN {_in_chars('substr(w, 1, 1)', vowels)} "
            f"AND {_in_chars('substr(w, 2, 1)', vowels)} THEN {ln.format(m='mb')} "
            f"ELSE 3 END AS rv "
            f"FROM (SELECT position, w, regexp_extract(w, '{p1}') AS m1, "
            f"regexp_extract(w, '{p2}') AS m2, regexp_extract(w, '{pa}') AS ma, "
            f"regexp_extract(w, '{pb}') AS mb FROM {prev}))")


def _first_match_strip(u: str, pres, region: str = "r2") -> str:
    """for pre in pres: if u.endswith(pre) and len(u)-len(pre)>=region:
    strip; break — as a first-match CASE."""
    arms = " ".join(
        f"WHEN ends_with({u}, '{_q(p)}') AND length({u})-{len(p)} >= {region} "
        f"THEN substr({u}, 1, length({u})-{len(p)})" for p in pres)
    return f"(CASE {arms} ELSE {u} END)"


def _fixed2_strip(u: str, pres, region: str = "r2") -> str:
    """Portuguese amente variant: condition and strip use a fixed 2."""
    arms = " ".join(
        f"WHEN ends_with({u}, '{_q(p)}') AND length({u})-2 >= {region} "
        f"THEN substr({u}, 1, length({u})-2)" for p in pres)
    return f"(CASE {arms} ELSE {u} END)"


def _iv_at_chain(u: str, fallback: str) -> str:
    """if u ends iv (R2): strip, then at (R2): strip; else fallback."""
    u2 = f"substr({u}, 1, length({u})-2)"
    u4 = f"substr({u}, 1, length({u})-4)"
    return (f"(CASE WHEN ends_with({u}, 'iv') AND length({u})-2 >= r2 THEN "
            f"(CASE WHEN ends_with({u2}, 'at') AND length({u2})-2 >= r2 "
            f"THEN {u4} ELSE {u2} END) ELSE {fallback} END)")


def _at_chain(u: str, then_ic: bool = False) -> str:
    """if u ends at (R2): strip (Italian then retests ic)."""
    u2 = f"substr({u}, 1, length({u})-2)"
    if not then_ic:
        return (f"(CASE WHEN ends_with({u}, 'at') AND length({u})-2 >= r2 "
                f"THEN {u2} ELSE {u} END)")
    u4 = f"substr({u}, 1, length({u})-4)"
    return (f"(CASE WHEN ends_with({u}, 'at') AND length({u})-2 >= r2 THEN "
            f"(CASE WHEN ends_with({u2}, 'ic') AND length({u2})-2 >= r2 "
            f"THEN {u4} ELSE {u2} END) ELSE {u} END)")


def _ic_chain(u: str) -> str:
    u2 = f"substr({u}, 1, length({u})-2)"
    return (f"(CASE WHEN ends_with({u}, 'ic') AND length({u})-2 >= r2 "
            f"THEN {u2} ELSE {u} END)")


def _branch_case(branches, all_sufs) -> str:
    """Snowball step-1 dispatcher: ms = longest over the full table, then
    branch on which group the matched suffix belongs to. `branches` is a
    list of (group_sufs, region_col, action(u_expr) -> sql)."""
    u = "substr(w, 1, length(w)-ms)"
    sfx = "substr(w, length(w)-ms+1)"
    arms = []
    for sufs, region, action in branches:
        in_group = sfx + " IN (" + ", ".join(f"'{_q(s)}'" for s in sufs) + ")"
        guard = f"length(w)-ms >= {region}" if region else "TRUE"
        extra = ""
        if region == "rv+e":  # portuguese ira: preceded by e, region rv
            guard = ("length(w)-ms >= rv AND length(w)-ms > 0 "
                     "AND substr(w, length(w)-ms, 1) = 'e'")
        arms.append(f"WHEN {in_group} THEN "
                    f"(CASE WHEN {guard}{extra} THEN {action(u)} ELSE w END)")
    body = " ".join(arms)
    return (f"CASE WHEN ms IS NULL THEN w {body} ELSE w END",
            _longest_ms(all_sufs))


def _es_passes():
    from .snowball import (_ES_PRE_ACC, _ES_PRE_PLAIN, _ES_PRONOUNS,
                           _ES_VERB_SUFFIXES, _ES_VOWELS)
    # step 0: attached pronouns
    z0 = (f"z0 AS (SELECT position, w, r1, r2, rv, "
          f"{_longest_ms(_ES_PRONOUNS)} AS mp FROM r)")
    z1 = ("z1 AS (SELECT position, w, r1, r2, rv, mp, "
          "CASE WHEN mp IS NULL THEN NULL "
          "ELSE substr(w, 1, length(w)-mp) END AS base FROM z0)")
    st0 = (f"st0 AS (SELECT position, r1, r2, rv, CASE "
           f"WHEN mp IS NULL THEN w "
           f"WHEN mla IS NOT NULL AND length(base)-mla+1 >= rv "
           f"THEN translate(base, 'áéíóú', 'aeiou') "
           f"WHEN mlb IS NOT NULL AND length(base)-mlb >= rv THEN base "
           f"WHEN ends_with(base, 'yendo') AND contains(substr(base, "
           f"GREATEST(1, length(base)-5)), 'uyendo') THEN base "
           f"ELSE w END AS w "
           f"FROM (SELECT *, {_longest_ms(_ES_PRE_ACC, 'base')} AS mla, "
           f"{_longest_ms(_ES_PRE_PLAIN, 'base')} AS mlb FROM z1))")
    # step 1 branch table (mirrors spanish_stem's elif chain)
    g_strip = ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
               "ismos", "able", "ables", "ible", "ibles", "ista", "istas",
               "oso", "osa", "osos", "osas", "amiento", "amientos",
               "imiento", "imientos")
    g_ador = ("adora", "ador", "ación", "adoras", "adores", "aciones",
              "ante", "antes", "ancia", "ancias")
    all_sufs = ("amientos", "imientos", "amiento", "imiento", "aciones",
                "adoras", "adores", "ancias", "logías", "encias", "amente",
                "idades", "anzas", "icos", "icas", "ismos", "ables",
                "ibles", "istas", "osos", "osas", "ación", "adora",
                "ancia", "logía", "ución", "encia", "mente", "anza",
                "icas", "idad", "ivas", "ivos", "ico", "ica", "ismo",
                "able", "ible", "ista", "oso", "osa", "ador", "ante",
                "antes", "uciones", "iva", "ivo")
    case1, ms1 = _branch_case([
        (g_strip, "r2", lambda u: u),
        (g_ador, "r2", _ic_chain),
        (("logía", "logías"), "r2", lambda u: f"{u} || 'log'"),
        (("ución", "uciones"), "r2", lambda u: f"{u} || 'u'"),
        (("encia", "encias"), "r2", lambda u: f"{u} || 'ente'"),
        (("amente",), "r1",
         lambda u: _iv_at_chain(u, _first_match_strip(u, ("os", "ic", "ad")))),
        (("mente",), "r2",
         lambda u: _first_match_strip(u, ("ante", "able", "ible"))),
        (("idad", "idades"), "r2",
         lambda u: _first_match_strip(u, ("abil", "ic", "iv"))),
        (("iva", "ivo", "ivas", "ivos"), "r2", _at_chain),
    ], all_sufs)
    st1 = (f"st1 AS (SELECT position, r1, r2, rv, wn <> w AS ch1, wn AS w "
           f"FROM (SELECT position, w, r1, r2, rv, {case1} AS wn "
           f"FROM (SELECT position, w, r1, r2, rv, {ms1} AS ms FROM st0)))")
    # step 2a: y-verb suffixes preceded by u (only when step 1 left w alone)
    ysufs = ("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
             "ya", "ye", "yo", "yó")
    st2a = (f"st2a AS (SELECT position, r2, rv, "
            f"(ch1 OR (msy IS NOT NULL AND length(w)-msy >= rv "
            f"AND length(w)-msy > 0 AND substr(w, length(w)-msy, 1) = 'u')) AS done2, "
            f"CASE WHEN NOT ch1 AND msy IS NOT NULL AND length(w)-msy >= rv "
            f"AND length(w)-msy > 0 AND substr(w, length(w)-msy, 1) = 'u' "
            f"THEN substr(w, 1, length(w)-msy) ELSE w END AS w "
            f"FROM (SELECT position, w, r2, rv, ch1, "
            f"{_longest_ms(ysufs)} AS msy FROM st1))")
    verb_all = ("éis", "emos", "en", "es") + _ES_VERB_SUFFIXES
    u = "substr(w, 1, length(w)-ms)"
    st2b = (f"st2b AS (SELECT position, rv, CASE "
            f"WHEN NOT done2 AND ms IS NOT NULL AND length(w)-ms >= rv THEN "
            f"(CASE WHEN substr(w, length(w)-ms+1) IN ('en', 'es', 'éis', 'emos') "
            f"AND ends_with({u}, 'gu') THEN substr({u}, 1, length({u})-1) "
            f"ELSE {u} END) ELSE w END AS w "
            f"FROM (SELECT position, w, rv, done2, "
            f"{_longest_ms(verb_all)} AS ms FROM st2a))")
    st3 = (f"st3 AS (SELECT position, CASE "
           f"WHEN ms IS NOT NULL AND length(w)-ms >= rv THEN "
           f"(CASE WHEN substr(w, length(w)-ms+1) IN ('e', 'é') "
           f"AND ends_with({u}, 'gu') AND length({u})-1 >= rv "
           f"THEN substr({u}, 1, length({u})-1) ELSE {u} END) "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, rv, "
           f"{_longest_ms(('os', 'a', 'o', 'á', 'í', 'ó', 'e', 'é'))} AS ms "
           f"FROM st2b))")
    fin = ("fin AS (SELECT position, translate(w, 'áéíóúü', 'aeiouu') AS w "
           "FROM st3)")
    return [("case", _romance_r_cte(_ES_VOWELS, "tok0")),
            ("case", z0), ("case", z1), ("case", st0), ("case", st1),
            ("case", st2a), ("case", st2b), ("case", st3), ("case", fin)]


def _it_passes():
    from .snowball import (_IT_PRONOUNS, _IT_VERB_SUFFIXES, _IT_VOWELS)
    vow_prev = _in_chars("substr(w, i-1, 1)", _IT_VOWELS)
    vow_next = _in_chars("substr(w, i+1, 1)", _IT_VOWELS)
    prot = (f"CASE WHEN i > 1 AND i < length(w) AND substr(w, i, 1) IN ('i', 'u') "
            f"AND {vow_prev} AND {vow_next} THEN upper(substr(w, i, 1)) "
            f"WHEN i > 1 AND substr(w, i, 1) = 'u' AND substr(w, i-1, 1) = 'q' "
            f"THEN 'U' ELSE substr(w, i, 1) END")
    i0 = ("i0 AS (SELECT position, translate(w, 'áéíóú', 'àèìòù') AS w "
          "FROM tok0)")
    ip = _protect_cte("ip", "i0", prot)
    z0 = (f"z0 AS (SELECT position, w, r1, r2, rv, "
          f"{_longest_ms(_IT_PRONOUNS)} AS mp FROM r)")
    z1 = ("z1 AS (SELECT position, w, r1, r2, rv, mp, "
          "CASE WHEN mp IS NULL THEN NULL "
          "ELSE substr(w, 1, length(w)-mp) END AS base FROM z0)")
    st0 = (f"st0 AS (SELECT position, r1, r2, rv, CASE "
           f"WHEN mp IS NULL THEN w "
           f"WHEN mlg IS NOT NULL AND length(base)-mlg >= rv THEN base "
           f"WHEN mli IS NOT NULL AND length(base)-mli >= rv THEN base || 'e' "
           f"ELSE w END AS w "
           f"FROM (SELECT *, {_longest_ms(('ando', 'endo'), 'base')} AS mlg, "
           f"{_longest_ms(('ar', 'er', 'ir'), 'base')} AS mli FROM z1))")
    g_strip = ("anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi",
               "ismo", "ismi", "abile", "abili", "ibile", "ibili", "ista",
               "iste", "isti", "istà", "istè", "istì", "oso", "osi", "osa",
               "ose", "mente", "atrice", "atrici", "ante", "anti")
    all_sufs = ("atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
                "usione", "usioni", "amento", "amenti", "imento", "imenti",
                "amente", "abile", "abili", "ibile", "ibili", "mente",
                "atore", "atori", "logia", "logie", "anza", "anze", "iche",
                "ichi", "ismo", "ismi", "ista", "iste", "isti", "istà",
                "istè", "istì", "ante", "anti", "enza", "enze", "ico",
                "ici", "ica", "ice", "oso", "osi", "osa", "ose", "ità",
                "ivo", "ivi", "iva", "ive")
    case1, ms1 = _branch_case([
        (g_strip, "r2", lambda u: u),
        (("azione", "azioni", "atore", "atori"), "r2", _ic_chain),
        (("logia", "logie"), "r2", lambda u: f"{u} || 'log'"),
        (("uzione", "uzioni", "usione", "usioni"), "r2",
         lambda u: f"{u} || 'u'"),
        (("enza", "enze"), "r2", lambda u: f"{u} || 'ente'"),
        (("amento", "amenti", "imento", "imenti"), "rv", lambda u: u),
        (("amente",), "r1",
         lambda u: _iv_at_chain(u, _first_match_strip(u, ("os", "ic", "abil")))),
        (("ità",), "r2",
         lambda u: _first_match_strip(u, ("abil", "ic", "iv"))),
        (("ivo", "ivi", "iva", "ive"), "r2",
         lambda u: _at_chain(u, then_ic=True)),
    ], all_sufs)
    st1 = (f"st1 AS (SELECT position, r1, r2, rv, wn <> w AS ch1, wn AS w "
           f"FROM (SELECT position, w, r1, r2, rv, {case1} AS wn "
           f"FROM (SELECT position, w, r1, r2, rv, {ms1} AS ms FROM st0)))")
    st2 = (f"st2 AS (SELECT position, rv, CASE "
           f"WHEN NOT ch1 AND ms IS NOT NULL AND length(w)-ms >= rv "
           f"THEN substr(w, 1, length(w)-ms) ELSE w END AS w "
           f"FROM (SELECT position, w, rv, ch1, "
           f"{_longest_ms(_IT_VERB_SUFFIXES)} AS ms FROM st1))")
    e1 = "substr(w, 1, length(w)-1)"
    st3a = (f"st3a AS (SELECT position, rv, CASE "
            f"WHEN {_in_chars('substr(w, length(w), 1)', 'aeioàèìò')} "
            f"AND length(w)-1 >= rv THEN "
            f"(CASE WHEN ends_with({e1}, 'i') AND length({e1})-1 >= rv "
            f"THEN substr({e1}, 1, length({e1})-1) ELSE {e1} END) "
            f"ELSE w END AS w FROM st2)")
    st3b = (f"st3b AS (SELECT position, CASE "
            f"WHEN length(w)-1 >= rv AND (ends_with(w, 'ch') OR ends_with(w, 'gh')) "
            f"THEN substr(w, 1, length(w)-1) ELSE w END AS w FROM st3a)")
    fin = ("fin AS (SELECT position, replace(replace(w, 'I', 'i'), 'U', 'u') "
           "AS w FROM st3b)")
    return [("case", i0), ("case", ip),
            ("case", _romance_r_cte(_IT_VOWELS, "ip")),
            ("case", z0), ("case", z1), ("case", st0), ("case", st1),
            ("case", st2), ("case", st3a), ("case", st3b), ("case", fin)]


def _pt_passes():
    from .snowball import _PT_VERB_SUFFIXES, _PT_VOWELS
    p0 = ("p0 AS (SELECT position, replace(replace(w, 'ã', 'a~'), 'õ', 'o~') "
          "AS w FROM tok0)")
    g_strip = ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
               "ável", "ível", "ista", "istas", "oso", "osa", "osos",
               "osas", "amento", "amentos", "imento", "imentos")
    g_ador = ("adora", "ador", "aça~o", "adoras", "adores", "aço~es",
              "ante", "antes", "ância")
    all_sufs = ("amentos", "imentos", "uço~es", "amento", "imento",
                "adoras", "adores", "aço~es", "logias", "ências", "amente",
                "idades", "ismos", "istas", "adora", "aça~o", "antes",
                "ância", "logia", "uça~o", "ência", "mente", "idade",
                "ezas", "icos", "icas", "ivas", "ivos", "iras", "eza",
                "ico", "ica", "oso", "osa", "osos", "osas", "ador",
                "ante", "ável", "ível", "ista", "ismo", "iva", "ivo",
                "ira")
    case1, ms1 = _branch_case([
        (g_strip, "r2", lambda u: u),
        (g_ador, "r2", _ic_chain),
        (("logia", "logias"), "r2", lambda u: f"{u} || 'log'"),
        (("uça~o", "uço~es"), "r2", lambda u: f"{u} || 'u'"),
        (("ência", "ências"), "r2", lambda u: f"{u} || 'ente'"),
        (("amente",), "r1",
         lambda u: _iv_at_chain(u, _fixed2_strip(u, ("os", "ic", "ad")))),
        (("mente",), "r2",
         lambda u: _first_match_strip(u, ("ante", "avel", "ível"))),
        (("idade", "idades"), "r2",
         lambda u: _first_match_strip(u, ("abil", "ic", "iv"))),
        (("iva", "ivo", "ivas", "ivos"), "r2", _at_chain),
        (("ira", "iras"), "rv+e", lambda u: f"{u} || 'ir'"),
    ], all_sufs)
    st1 = (f"st1 AS (SELECT position, r1, r2, rv, wn <> w AS ch1, wn AS w "
           f"FROM (SELECT position, w, r1, r2, rv, {case1} AS wn "
           f"FROM (SELECT position, w, r1, r2, rv, {ms1} AS ms FROM r)))")
    st2 = (f"st2 AS (SELECT position, rv, "
           f"(ch1 OR (NOT ch1 AND ms IS NOT NULL AND length(w)-ms >= rv)) AS ch, "
           f"CASE WHEN NOT ch1 AND ms IS NOT NULL AND length(w)-ms >= rv "
           f"THEN substr(w, 1, length(w)-ms) ELSE w END AS w "
           f"FROM (SELECT position, w, rv, ch1, "
           f"{_longest_ms(_PT_VERB_SUFFIXES)} AS ms FROM st1))")
    st34 = (f"st34 AS (SELECT position, rv, CASE "
            f"WHEN ch THEN (CASE WHEN ends_with(w, 'i') AND length(w)-1 >= rv "
            f"AND length(w) >= 2 AND substr(w, length(w)-1, 1) = 'c' "
            f"THEN substr(w, 1, length(w)-1) ELSE w END) "
            f"WHEN ms IS NOT NULL AND length(w)-ms >= rv "
            f"THEN substr(w, 1, length(w)-ms) ELSE w END AS w "
            f"FROM (SELECT position, w, rv, ch, "
            f"{_longest_ms(('os', 'a', 'i', 'o', 'á', 'í', 'ó'))} AS ms "
            f"FROM st2))")
    e1 = "substr(w, 1, length(w)-1)"
    e2 = f"substr({e1}, 1, length({e1})-1)"
    st5 = (f"st5 AS (SELECT position, CASE "
           f"WHEN {_in_chars('substr(w, length(w), 1)', 'eéê')} "
           f"AND length(w)-1 >= rv THEN "
           f"(CASE WHEN (ends_with({e1}, 'gu') AND length({e1})-1 >= rv) "
           f"OR (ends_with({e1}, 'ci') AND length({e1})-1 >= rv) "
           f"THEN {e2} ELSE {e1} END) ELSE w END AS w FROM st34)")
    st5b = (f"st5b AS (SELECT position, CASE WHEN ends_with(w, 'ç') "
            f"THEN substr(w, 1, length(w)-1) || 'c' ELSE w END AS w FROM st5)")
    fin = ("fin AS (SELECT position, translate(replace(replace(w, 'a~', 'ã'), "
           "'o~', 'õ'), 'áéíóúâêôãõà', 'aeiouaeoaoa') AS w FROM st5b)")
    return [("case", p0), ("case", _romance_r_cte(_PT_VOWELS, "p0")),
            ("case", st1), ("case", st2), ("case", st34), ("case", st5),
            ("case", st5b), ("case", fin)]


# ------------------------------------------------------------------
# French / Romanian / Finnish Snowball

def _fr_passes():
    from .snowball import (_FR_STEP2A, _FR_STEP2B_A, _FR_STEP2B_ER,
                           _FR_VOWELS)
    V = _FR_VOWELS
    vs = "".join(V)
    vow_prev = _in_chars("substr(w, i-1, 1)", V)
    vow_next = _in_chars("substr(w, i+1, 1)", V)
    prot = (f"CASE WHEN i > 1 AND i < length(w) AND substr(w, i, 1) IN ('i', 'u') "
            f"AND {vow_prev} AND {vow_next} THEN upper(substr(w, i, 1)) "
            f"WHEN i > 1 AND substr(w, i, 1) = 'u' AND substr(w, i-1, 1) = 'q' "
            f"THEN 'U' "
            f"WHEN substr(w, i, 1) = 'y' AND ((i > 1 AND {vow_prev}) "
            f"OR (i < length(w) AND {vow_next})) THEN 'Y' "
            f"ELSE substr(w, i, 1) END")
    fp = _protect_cte("fp", "tok0", prot)
    # r1/r2 over the protected form + the French RV special cases
    p1 = f"^.*?[{vs}][^{vs}]"
    p2 = f"^.*?[{vs}][^{vs}].*?[{vs}][^{vs}]"
    pv = f"^.[^{vs}]*[{vs}]"
    ln = "CASE WHEN {m} = '' OR {m} IS NULL THEN length(w) ELSE length({m}) END"
    r = (f"r AS (SELECT position, w, {ln.format(m='m1')} AS r1, "
         f"{ln.format(m='m2')} AS r2, "
         f"CASE WHEN length(w) >= 2 AND {_in_chars('substr(w, 1, 1)', V)} "
         f"AND {_in_chars('substr(w, 2, 1)', V)} THEN LEAST(3, length(w)) "
         f"WHEN substr(w, 1, 3) IN ('par', 'col', 'tap') THEN LEAST(3, length(w)) "
         f"ELSE {ln.format(m='mv')} END AS rv "
         f"FROM (SELECT position, w, regexp_extract(w, '{p1}') AS m1, "
         f"regexp_extract(w, '{p2}') AS m2, regexp_extract(w, '{pv}') AS mv "
         f"FROM fp))")

    def ic_or_iqU(u):
        u2 = f"substr({u}, 1, length({u})-2)"
        return (f"(CASE WHEN ends_with({u}, 'ic') THEN "
                f"(CASE WHEN length({u})-2 >= r2 THEN {u2} "
                f"ELSE {u2} || 'iqU' END) ELSE {u} END)")

    def ement_chain(u):
        u2 = f"substr({u}, 1, length({u})-2)"
        u3 = f"substr({u}, 1, length({u})-3)"
        u4 = f"substr({u2}, 1, length({u2})-2)"
        return (f"(CASE WHEN ends_with({u}, 'iv') AND length({u})-2 >= r2 THEN "
                f"(CASE WHEN ends_with({u2}, 'at') AND length({u2})-2 >= r2 "
                f"THEN {u4} ELSE {u2} END) "
                f"WHEN ends_with({u}, 'eus') THEN "
                f"(CASE WHEN length({u})-3 >= r2 THEN {u3} "
                f"WHEN length({u})-3 >= r1 THEN {u3} || 'eux' ELSE {u} END) "
                f"WHEN (ends_with({u}, 'abl') OR ends_with({u}, 'iqU')) "
                f"AND length({u})-3 >= r2 THEN {u3} "
                f"WHEN (ends_with({u}, 'ièr') OR ends_with({u}, 'Ièr')) "
                f"AND length({u})-3 >= rv THEN {u3} || 'i' "
                f"ELSE {u} END)")

    def ite_chain(u):
        u2 = f"substr({u}, 1, length({u})-2)"
        u4 = f"substr({u}, 1, length({u})-4)"
        return (f"(CASE WHEN ends_with({u}, 'abil') THEN "
                f"(CASE WHEN length({u})-4 >= r2 THEN {u4} "
                f"ELSE {u4} || 'abl' END) "
                f"WHEN ends_with({u}, 'ic') THEN "
                f"(CASE WHEN length({u})-2 >= r2 THEN {u2} "
                f"ELSE {u2} || 'iqU' END) "
                f"WHEN ends_with({u}, 'iv') AND length({u})-2 >= r2 "
                f"THEN {u2} ELSE {u} END)")

    def if_chain(u):
        u2 = f"substr({u}, 1, length({u})-2)"
        return (f"(CASE WHEN ends_with({u}, 'at') AND length({u})-2 >= r2 "
                f"THEN {ic_or_iqU(u2)} ELSE {u} END)")

    all1 = ("issements", "issement", "atrices", "utions", "ements",
            "amment", "emment", "ations", "atrice", "ateurs", "logies",
            "usions", "ements", "ités", "ances", "iqUes", "ismes",
            "ables", "istes", "ateur", "ation", "ement", "euses",
            "ments", "ance", "iqUe", "isme", "able", "iste", "ence",
            "ille", "logie", "usion", "ution", "ences", "ment", "eaux",
            "ités", "ives", "euse", "eux", "ité", "ive", "ifs", "aux",
            "if")
    u = "substr(w, 1, length(w)-ms)"
    sfx = "substr(w, length(w)-ms+1)"
    prevc = "substr(w, length(w)-ms, 1)"
    case1 = (
        f"CASE WHEN ms IS NULL THEN w "
        f"WHEN {sfx} IN ('ance', 'iqUe', 'isme', 'able', 'iste', 'eux', "
        f"'ances', 'iqUes', 'ismes', 'ables', 'istes') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {u} ELSE w END) "
        f"WHEN {sfx} IN ('atrice', 'ateur', 'ation', 'atrices', 'ateurs', "
        f"'ations') THEN (CASE WHEN length(w)-ms >= r2 THEN {ic_or_iqU(u)} ELSE w END) "
        f"WHEN {sfx} IN ('logie', 'logies') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {u} || 'log' ELSE w END) "
        f"WHEN {sfx} IN ('usion', 'ution', 'usions', 'utions') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {u} || 'u' ELSE w END) "
        f"WHEN {sfx} IN ('ence', 'ences') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {u} || 'ent' ELSE w END) "
        f"WHEN {sfx} IN ('ement', 'ements') THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {ement_chain(u)} ELSE w END) "
        f"WHEN {sfx} IN ('ité', 'ités') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {ite_chain(u)} ELSE w END) "
        f"WHEN {sfx} IN ('if', 'ive', 'ifs', 'ives') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {if_chain(u)} ELSE w END) "
        f"WHEN {sfx} = 'eaux' THEN substr(w, 1, length(w)-1) "
        f"WHEN {sfx} = 'aux' THEN "
        f"(CASE WHEN length(w)-ms >= r1 THEN {u} || 'al' ELSE w END) "
        f"WHEN {sfx} IN ('euse', 'euses') THEN "
        f"(CASE WHEN length(w)-ms >= r2 THEN {u} "
        f"WHEN length(w)-ms >= r1 THEN {u} || 'eux' ELSE w END) "
        f"WHEN {sfx} IN ('issement', 'issements') THEN "
        f"(CASE WHEN length(w)-ms >= r1 AND length(w)-ms > 0 "
        f"AND NOT {_in_chars(prevc, V)} THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'amment' THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {u} || 'ant' ELSE w END) "
        f"WHEN {sfx} = 'emment' THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {u} || 'ent' ELSE w END) "
        f"WHEN {sfx} IN ('ment', 'ments') THEN "
        f"(CASE WHEN length(w)-ms >= 1 AND length(w)-ms-1 >= rv "
        f"AND {_in_chars(prevc, V)} THEN {u} ELSE w END) "
        f"ELSE w END")
    fm = (f"(ms IS NOT NULL AND (({sfx} = 'amment' AND length(w)-ms >= rv) "
          f"OR ({sfx} = 'emment' AND length(w)-ms >= rv) "
          f"OR ({sfx} IN ('ment', 'ments') AND length(w)-ms >= 1 "
          f"AND length(w)-ms-1 >= rv AND {_in_chars(prevc, V)})))")
    st1 = (f"st1 AS (SELECT position, r1, r2, rv, wn <> w AS ch1, fm, wn AS w "
           f"FROM (SELECT position, w, r1, r2, rv, {case1} AS wn, {fm} AS fm "
           f"FROM (SELECT position, w, r1, r2, rv, {_longest_ms(all1)} AS ms "
           f"FROM r)))")
    # step 2a (only when step 1 changed nothing, or removed a -ment form)
    s2a_fire = (f"(NOT ch1 OR fm) AND ms IS NOT NULL AND length(w)-ms-1 >= rv "
                f"AND NOT {_in_chars(prevc, V)}")
    st2a = (f"st2a AS (SELECT position, r2, rv, ch1, fm, "
            f"({s2a_fire}) AS did2a, "
            f"CASE WHEN {s2a_fire} THEN {u} ELSE w END AS w "
            f"FROM (SELECT position, w, r2, rv, ch1, fm, "
            f"{_longest_ms(_FR_STEP2A)} AS ms FROM st1))")
    all2b = _FR_STEP2B_ER + _FR_STEP2B_A + ("ions",)
    er_in = "(" + ", ".join(f"'{_q(s)}'" for s in _FR_STEP2B_ER) + ")"
    ue = f"substr({u}, 1, length({u})-1)"
    case2b = (
        f"CASE WHEN (NOT ch1 OR fm) AND NOT did2a AND ms IS NOT NULL THEN "
        f"(CASE WHEN {sfx} = 'ions' THEN "
        f"(CASE WHEN length(w)-ms >= r2 AND length(w)-ms >= rv THEN {u} ELSE w END) "
        f"WHEN {sfx} IN {er_in} THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {u} ELSE w END) "
        f"ELSE (CASE WHEN length(w)-ms >= rv THEN "
        f"(CASE WHEN ends_with({u}, 'e') AND length({u})-1 >= rv "
        f"THEN {ue} ELSE {u} END) ELSE w END) END) ELSE w END")
    st2b = (f"st2b AS (SELECT position, r2, rv, ch1, fm, did2a, wn <> w AS chb, wn AS w "
            f"FROM (SELECT position, w, r2, rv, ch1, fm, did2a, {case2b} AS wn "
            f"FROM (SELECT position, w, r2, rv, ch1, fm, did2a, "
            f"{_longest_ms(all2b)} AS ms FROM st2a)))")
    # ch2 = step-2 block changed w (2a fired, or 2b changed it)
    st34 = (f"st34 AS (SELECT position, rv, r2, CASE "
            f"WHEN ch1 OR did2a OR chb THEN "
            f"(CASE WHEN ends_with(w, 'Y') THEN substr(w, 1, length(w)-1) || 'i' "
            f"WHEN ends_with(w, 'ç') THEN substr(w, 1, length(w)-1) || 'c' "
            f"ELSE w END) "
            f"ELSE (CASE WHEN ends_with(w, 's') AND length(w) >= 2 "
            f"AND NOT {_in_chars('substr(w, length(w)-1, 1)', 'aiouès')} "
            f"THEN substr(w, 1, length(w)-1) ELSE w END) END AS w, "
            f"(ch1 OR did2a OR chb) AS ch12 FROM st2b)")
    sufs4 = ("ion", "ière", "Ière", "ier", "Ier", "e", "ë")
    case4 = (
        f"CASE WHEN ch12 OR ms IS NULL THEN w "
        f"WHEN {sfx} = 'ion' THEN "
        f"(CASE WHEN length(w)-ms >= r2 AND length(w)-ms >= rv "
        f"AND length(w)-ms > 0 AND {prevc} IN ('s', 't') THEN {u} ELSE w END) "
        f"WHEN {sfx} IN ('ière', 'Ière', 'ier', 'Ier') THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {u} || 'i' ELSE w END) "
        f"WHEN {sfx} = 'e' THEN "
        f"(CASE WHEN length(w)-ms >= rv THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'ë' THEN "
        f"(CASE WHEN substr(w, length(w)-2, 2) = 'gu' AND length(w)-ms >= rv "
        f"THEN {u} ELSE w END) ELSE w END")
    st4 = (f"st4 AS (SELECT position, {case4} AS w "
           f"FROM (SELECT position, w, rv, r2, ch12, "
           f"{_longest_ms(sufs4)} AS ms FROM st34))")
    st5 = (f"st5 AS (SELECT position, CASE "
           f"WHEN ends_with(w, 'eill') THEN substr(w, 1, length(w)-1) "
           f"WHEN ends_with(w, 'enn') OR ends_with(w, 'onn') "
           f"OR ends_with(w, 'ett') OR ends_with(w, 'ell') "
           f"THEN substr(w, 1, length(w)-1) ELSE w END AS w FROM st4)")
    # step 6: é/è before a final all-consonant tail -> e
    st6 = (f"st6 AS (SELECT position, "
           f"regexp_replace(w, '([éè])([^{vs}]+)$', 'e\\2') AS w FROM st5)")
    fin = ("fin AS (SELECT position, replace(replace(replace(w, 'I', 'i'), "
           "'U', 'u'), 'Y', 'y') AS w FROM st6)")
    return [("case", fp), ("case", r), ("case", st1), ("case", st2a),
            ("case", st2b), ("case", st34), ("case", st4), ("case", st5),
            ("case", st6), ("case", fin)]


def _ro_passes():
    from .snowball import (_RO_STEP1, _RO_STEP2_DEL, _RO_STEP2_IST,
                           _RO_VERB, _RO_VOWELS)
    V = _RO_VOWELS
    t0 = ("t0 AS (SELECT position, replace(replace(w, 'ș', 'ş'), 'ț', 'ţ') "
          "AS w FROM tok0)")
    # regions are computed over the UNPROTECTED lowered form (the stemmer
    # lowers before measuring), so measure first, then protect
    rr = _romance_r_cte(V, "t0")
    vow_prev = _in_chars("substr(w, i-1, 1)", V)
    vow_next = _in_chars("substr(w, i+1, 1)", V)
    prot = (f"CASE WHEN i > 1 AND i < length(w) AND substr(w, i, 1) IN ('i', 'u') "
            f"AND {vow_prev} AND {vow_next} THEN upper(substr(w, i, 1)) "
            f"ELSE substr(w, i, 1) END")
    rp = _protect_cte("rp", "r", prot, carry=", r1, r2, rv")
    u = "substr(w, 1, length(w)-ms)"
    sfx = "substr(w, length(w)-ms+1)"
    # step 0: plurals (R1) with replacement endings
    sufs0 = ("ului", "aua", "ele", "elor", "iua", "iei", "iile", "iilor",
             "ilor", "ile", "atei", "aţie", "aţia", "ul", "ea", "ii")
    case0 = (
        f"CASE WHEN ms IS NULL OR length(w)-ms < r1 THEN w "
        f"WHEN {sfx} IN ('ul', 'ului') THEN {u} "
        f"WHEN {sfx} = 'aua' THEN {u} || 'a' "
        f"WHEN {sfx} IN ('ea', 'ele', 'elor') THEN {u} || 'e' "
        f"WHEN {sfx} IN ('ii', 'iua', 'iei', 'iile', 'iilor', 'ilor') "
        f"THEN {u} || 'i' "
        f"WHEN {sfx} = 'ile' THEN "
        f"(CASE WHEN ends_with({u}, 'ab') THEN w ELSE {u} || 'i' END) "
        f"WHEN {sfx} = 'atei' THEN {u} || 'at' "
        f"WHEN {sfx} IN ('aţie', 'aţia') THEN {u} || 'aţi' "
        f"ELSE w END")
    st0 = (f"st0 AS (SELECT position, r1, r2, rv, {case0} AS w "
           f"FROM (SELECT position, w, r1, r2, rv, {_longest_ms(sufs0)} AS ms "
           f"FROM rp))")
    # step 1: combining suffixes, repeated to fixed point (R1). Each
    # replacement shortens the word, so 5 unrolled rounds converge.
    keys = tuple(_RO_STEP1)
    repl_arms = " ".join(
        f"WHEN {sfx} = '{_q(k)}' THEN {u} || '{_q(v)}'"
        for k, v in _RO_STEP1.items())
    passes = [("case", t0), ("case", rr), ("case", rp), ("case", st0)]
    prev = "st0"
    for i in range(1, 6):
        name = f"c{i}"
        passes.append(("case", (
            f"{name} AS (SELECT position, r1, r2, rv, "
            f"COALESCE(ch, FALSE) OR (ms IS NOT NULL AND length(w)-ms >= r1) AS ch, "
            f"CASE WHEN ms IS NOT NULL AND length(w)-ms >= r1 THEN "
            f"(CASE {repl_arms} ELSE w END) ELSE w END AS w "
            f"FROM (SELECT position, w, r1, r2, rv, "
            f"{'FALSE' if i == 1 else 'ch'} AS ch, "
            f"{_longest_ms(keys)} AS ms FROM {prev}))")))
        prev = name
    # step 2: standard suffixes (R2)
    all2 = _RO_STEP2_DEL + _RO_STEP2_IST + ("iune", "iuni")
    ist_in = "(" + ", ".join(f"'{_q(s)}'" for s in _RO_STEP2_IST) + ")"
    case2 = (
        f"CASE WHEN ms IS NULL OR length(w)-ms < r2 THEN w "
        f"WHEN {sfx} IN ('iune', 'iuni') THEN "
        f"(CASE WHEN length(w)-ms > 0 AND substr(w, length(w)-ms, 1) = 'ţ' "
        f"THEN substr(w, 1, length(w)-ms-1) || 't' ELSE w END) "
        f"WHEN {sfx} IN {ist_in} THEN {u} || 'ist' "
        f"ELSE {u} END")
    fired2 = (f"(ms IS NOT NULL AND length(w)-ms >= r2 AND "
              f"(CASE WHEN {sfx} IN ('iune', 'iuni') THEN "
              f"length(w)-ms > 0 AND substr(w, length(w)-ms, 1) = 'ţ' "
              f"ELSE TRUE END))")
    st2 = (f"st2 AS (SELECT position, rv, ch OR {fired2} AS ch, {case2} AS w "
           f"FROM (SELECT position, w, r2, rv, ch, {_longest_ms(all2)} AS ms "
           f"FROM c5))")
    # step 3: verb suffixes (RV) only if steps 1-2 removed nothing
    grp1_first = "substr(w, length(w)-ms+1, 1) IN ('a', 'e', 'i', 'â', 'u')"
    grp1_exc = f"{sfx} IN ('ui', 'âi', 'âm', 'âţi')"
    prevc = "substr(w, length(w)-ms, 1)"
    case3 = (
        f"CASE WHEN ch OR ms IS NULL OR length(w)-ms < rv THEN w "
        f"WHEN {grp1_first} AND NOT {grp1_exc} THEN "
        f"(CASE WHEN length(w)-ms > 0 AND "
        f"(NOT {_in_chars(f'lower({prevc})', V)} OR {prevc} IN ('u', 'U')) "
        f"THEN {u} ELSE w END) "
        f"ELSE {u} END")
    st3 = (f"st3 AS (SELECT position, rv, {case3} AS w "
           f"FROM (SELECT position, w, rv, ch, {_longest_ms(_RO_VERB)} AS ms "
           f"FROM st2))")
    st4 = (f"st4 AS (SELECT position, CASE "
           f"WHEN ms IS NOT NULL AND length(w)-ms >= rv THEN {u} ELSE w END AS w "
           f"FROM (SELECT position, w, rv, "
           f"{_longest_ms(('ie', 'a', 'e', 'i', 'ă'))} AS ms FROM st3))")
    fin = ("fin AS (SELECT position, replace(replace(w, 'I', 'i'), 'U', 'u') "
           "AS w FROM st4)")
    passes += [("case", st2), ("case", st3), ("case", st4), ("case", fin)]
    return passes


def _fi_passes():
    from .snowball import _FI_CASES, _FI_LONG_V, _FI_VOWELS
    V = _FI_VOWELS
    u = "substr(w, 1, length(w)-ms)"
    sfx = "substr(w, length(w)-ms+1)"
    prevc = "substr(w, length(w)-ms, 1)"
    prev2c = "substr(w, length(w)-ms-1, 1)"
    long_v = "(" + " OR ".join(
        f"ends_with({{c}}, '{lv}')" for lv in _FI_LONG_V) + ")"
    st1 = (f"s1 AS (SELECT position, r1, r2, CASE "
           f"WHEN ms IS NULL THEN w "
           f"WHEN {sfx} = 'sti' THEN "
           f"(CASE WHEN length(w)-ms >= r2 THEN {u} ELSE w END) "
           f"WHEN length(w)-ms >= r1 AND length(w)-ms > 0 "
           f"AND {_in_chars(prevc, 'nt' + ''.join(V))} THEN {u} "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, r1, r2, "
           f"{_longest_ms(('kaan', 'kään', 'kin', 'han', 'hän', 'ko', 'kö', 'pa', 'pä', 'sti'))} AS ms "
           f"FROM r))")
    ukse = (f"(CASE WHEN ends_with({u}, 'kse') "
            f"THEN substr({u}, 1, length({u})-1) || 'i' ELSE {u} END)")
    case2 = (
        f"CASE WHEN ms IS NULL OR length(w)-ms < r1 THEN w "
        f"WHEN {sfx} = 'si' THEN "
        f"(CASE WHEN length(w)-ms > 0 AND {prevc} <> 'k' THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'ni' THEN {ukse} "
        f"WHEN {sfx} IN ('nsa', 'nsä', 'mme', 'nne') THEN {u} "
        f"WHEN {sfx} = 'an' THEN (CASE WHEN "
        + " OR ".join(f"ends_with({u}, '{s}')"
                      for s in ("ta", "ssa", "sta", "lla", "lta", "na"))
        + f" THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'än' THEN (CASE WHEN "
        + " OR ".join(f"ends_with({u}, '{s}')"
                      for s in ("tä", "ssä", "stä", "llä", "ltä", "nä"))
        + f" THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'en' THEN (CASE WHEN "
        + " OR ".join(f"ends_with({u}, '{s}')" for s in ("lle", "ine"))
        + f" THEN {u} ELSE w END) ELSE w END")
    st2 = (f"s2 AS (SELECT position, r1, r2, {case2} AS w "
           f"FROM (SELECT position, w, r1, r2, "
           f"{_longest_ms(('nsa', 'nsä', 'mme', 'nne', 'si', 'ni', 'an', 'än', 'en'))} AS ms "
           f"FROM s1))")
    hxn = ("han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön")
    hxn_in = "(" + ", ".join(f"'{s}'" for s in hxn) + ")"
    un1 = f"substr({u}, 1, length({u})-1)"
    ncase = (f"(CASE WHEN {long_v.format(c=u)} OR ends_with({u}, 'ie') "
             f"THEN {un1} ELSE {u} END)")
    case3 = (
        f"CASE WHEN ms IS NULL OR length(w)-ms < r1 THEN w "
        f"WHEN {sfx} IN {hxn_in} THEN "
        f"(CASE WHEN length(w)-ms > 0 AND {prevc} = substr({sfx}, 2, 1) "
        f"THEN {u} ELSE w END) "
        f"WHEN {sfx} IN ('siin', 'den', 'tten') THEN "
        f"(CASE WHEN length(w)-ms >= 2 AND {prevc} = 'i' "
        f"AND {_in_chars(prev2c, V)} THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'seen' THEN "
        f"(CASE WHEN {long_v.format(c=u)} THEN {u} ELSE w END) "
        f"WHEN {sfx} IN ('a', 'ä') THEN "
        f"(CASE WHEN length(w)-ms >= 2 AND {_in_chars(prevc, V)} "
        f"AND NOT {_in_chars(prev2c, V)} THEN {u} ELSE w END) "
        f"WHEN {sfx} IN ('tta', 'ttä') THEN "
        f"(CASE WHEN length(w)-ms > 0 AND {prevc} = 'e' THEN {u} ELSE w END) "
        f"WHEN {sfx} = 'n' THEN {ncase} "
        f"ELSE {u} END")
    er3 = (
        f"(ms IS NOT NULL AND length(w)-ms >= r1 AND "
        f"(CASE WHEN {sfx} IN {hxn_in} THEN length(w)-ms > 0 AND {prevc} = substr({sfx}, 2, 1) "
        f"WHEN {sfx} IN ('siin', 'den', 'tten') THEN length(w)-ms >= 2 "
        f"AND {prevc} = 'i' AND {_in_chars(prev2c, V)} "
        f"WHEN {sfx} = 'seen' THEN {long_v.format(c=u)} "
        f"WHEN {sfx} IN ('a', 'ä') THEN length(w)-ms >= 2 "
        f"AND {_in_chars(prevc, V)} AND NOT {_in_chars(prev2c, V)} "
        f"WHEN {sfx} IN ('tta', 'ttä') THEN length(w)-ms > 0 AND {prevc} = 'e' "
        f"ELSE TRUE END))")
    st3 = (f"s3 AS (SELECT position, r1, r2, {er3} AS er, {case3} AS w "
           f"FROM (SELECT position, w, r1, r2, {_longest_ms(_FI_CASES)} AS ms "
           f"FROM s2))")
    mp = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
    mp_in = "(" + ", ".join(f"'{s}'" for s in mp) + ")"
    case4 = (
        f"CASE WHEN ms IS NULL OR length(w)-ms < r2 THEN w "
        f"WHEN {sfx} IN {mp_in} THEN "
        f"(CASE WHEN ends_with({u}, 'po') THEN w ELSE {u} END) "
        f"ELSE {u} END")
    st4 = (f"s4 AS (SELECT position, r1, r2, er, {case4} AS w "
           f"FROM (SELECT position, w, r1, r2, er, "
           f"{_longest_ms(('impi', 'impa', 'impä', 'immi', 'imma', 'immä') + mp + ('eja', 'ejä'))} AS ms "
           f"FROM s3))")
    w1 = "substr(w, 1, length(w)-1)"
    w4 = f"substr({w1}, 1, length({w1})-4)"
    w3 = f"substr({w1}, 1, length({w1})-3)"
    tchain = (
        f"(CASE WHEN ends_with({w1}, 'imma') AND length({w1})-4 >= r2 THEN {w4} "
        f"WHEN ends_with({w1}, 'mma') AND length({w1})-3 >= r2 "
        f"AND NOT ends_with(substr({w1}, 1, length({w1})-3), 'po') THEN {w3} "
        f"ELSE {w1} END)")
    st5 = (f"s5 AS (SELECT position, r1, r2, CASE "
           f"WHEN er THEN (CASE WHEN (ends_with(w, 'i') OR ends_with(w, 'j')) "
           f"AND length(w)-1 >= r1 THEN {w1} ELSE w END) "
           f"ELSE (CASE WHEN ends_with(w, 't') AND length(w)-1 >= r1 "
           f"AND length(w) >= 2 AND {_in_chars('substr(w, length(w)-1, 1)', V)} "
           f"THEN {tchain} ELSE w END) END AS w FROM s4)")
    t1 = (f"t1 AS (SELECT position, r1, r2, CASE "
          f"WHEN length(w) >= 2 AND {long_v.format(c='w')} AND length(w)-2 >= r1 "
          f"THEN {w1} ELSE w END AS w FROM s5)")
    t2 = (f"t2 AS (SELECT position, r1, r2, CASE "
          f"WHEN length(w) >= 2 AND {_in_chars('substr(w, length(w), 1)', 'aäei')} "
          f"AND NOT {_in_chars('substr(w, length(w)-1, 1)', V)} "
          f"AND length(w)-1 >= r1 THEN {w1} ELSE w END AS w FROM t1)")
    t3 = (f"t3 AS (SELECT position, r1, CASE "
          f"WHEN (ends_with(w, 'oj') OR ends_with(w, 'uj')) AND length(w)-1 >= r1 "
          f"THEN {w1} ELSE w END AS w FROM t2)")
    t4 = (f"t4 AS (SELECT position, r1, CASE "
          f"WHEN ends_with(w, 'jo') AND length(w)-1 >= r1 THEN {w1} "
          f"ELSE w END AS w FROM t3)")
    # undouble the final consonant (which may be followed by vowels):
    # k = trailing-vowel run length, i = index of last consonant
    und = (f"t5 AS (SELECT position, CASE "
           f"WHEN length(w) - k >= 2 "
           f"AND NOT {_in_chars('substr(w, length(w)-k, 1)', V)} "
           f"AND substr(w, length(w)-k, 1) = substr(w, length(w)-k-1, 1) "
           f"THEN substr(w, 1, length(w)-k-1) || substr(w, length(w)-k+1) "
           f"ELSE w END AS w "
           f"FROM (SELECT position, w, "
           f"length(COALESCE(regexp_extract(w, '[{''.join(V)}]*$'), '')) AS k "
           f"FROM t4))")
    return [("case", _r12_cte(V, "tok0", floor3=False)),
            ("case", st1), ("case", st2), ("case", st3), ("case", st4),
            ("case", st5), ("case", t1), ("case", t2), ("case", t3),
            ("case", t4), ("case", und)]


def _rslp_case_expr(rules, col: str = "w") -> str:
    """First-match-in-order RSLP rule table as one CASE over `col`:
    suffix match + stem-length guard + full-word exception filter, then
    suffix replacement — re-expressed in SQL from the same light.py
    tables the Python stemmer reads (the algorithm recomputed, not the
    Python path replayed)."""
    parts = []
    for suf, mn, rep, exc in rules:
        cond = (f"ends_with({col}, '{_q(suf)}') "
                f"AND length({col}) - {len(suf)} >= {mn}")
        if exc:
            cond += f" AND {col} NOT IN ({', '.join(chr(39) + _q(e) + chr(39) for e in exc)})"
        then = f"substr({col}, 1, length({col}) - {len(suf)})"
        if rep:
            then += f" || '{_q(rep)}'"
        parts.append(f"WHEN {cond} THEN {then}")
    return "CASE " + " ".join(parts) + f" ELSE {col} END"


def _br_passes():
    """RSLP (Orengo & Huyck 2001) in SQL: plural (gated on final s),
    feminine (gated on final a/ã), adverb, augmentative, then the
    noun -> verb -> vowel first-success branch, then accent removal."""
    plural = (f"CASE WHEN ends_with(w, 's') THEN {_rslp_case_expr(_BR_PLURAL)} "
              "ELSE w END")
    fem = (f"CASE WHEN ends_with(w, 'a') OR ends_with(w, 'ã') "
           f"THEN {_rslp_case_expr(_BR_FEMININE)} ELSE w END")
    accents = _replace_chain(
        "w", zip("áâãàéêíóôõúüç", "aaaaeeiooouuc"))
    return [
        ("case", _case_pass("b1", "tok0", plural)),
        ("case", _case_pass("b2", "b1", fem)),
        ("case", _case_pass("b3", "b2", _rslp_case_expr(_BR_ADVERB))),
        ("case", _case_pass("b4", "b3", _rslp_case_expr(_BR_AUGMENT))),
        # noun result kept beside the input so the verb/vowel branch can
        # test "did a noun rule fire" (w != pre)
        ("case", f"b5 AS (SELECT position, w AS pre, "
                 f"{_rslp_case_expr(_BR_NOUN)} AS w FROM b4)"),
        ("case", f"b6 AS (SELECT position, pre, CASE WHEN w != pre THEN w "
                 f"ELSE {_rslp_case_expr(_BR_VERB, 'pre')} END AS w FROM b5)"),
        ("case", f"b7 AS (SELECT position, CASE WHEN w != pre THEN w "
                 f"ELSE {_rslp_case_expr(_BR_VOWEL, 'pre')} END AS w FROM b6)"),
        ("case", _case_pass("b8", "b7", accents)),
    ]


_SPECS: dict[str, dict] = {
    "french": dict(
        pre=lambda t: (f"lower(regexp_replace({t}, "
                       "'(?i)\\b(jusqu|quoiqu|lorsqu|puisqu|qu"
                       "|l|m|t|n|s|j|d|c)[''\u2019]', ' ', 'g'))"),
        passes=_fr_passes),
    "romanian": dict(pre=_pre_default, passes=_ro_passes),
    "finnish": dict(pre=_pre_default, passes=_fi_passes),
    "spanish": dict(pre=_pre_default, passes=_es_passes),
    "italian": dict(
        pre=lambda t: (f"lower(regexp_replace({t}, "
                       "'(?i)\\b(all|dall|dell|nell|sull|coll|pell"
                       "|agl|dagl|degl|negl|sugl|gl|un"
                       "|c|l|m|t|s|v|d)[''\u2019]', ' ', 'g'))"),
        passes=_it_passes),

    "portuguese": dict(pre=_pre_default, passes=_pt_passes),
    # brazilian = the RSLP algorithm (Orengo & Huyck 2001) — distinct
    # from Snowball Portuguese, mirroring the reference's BrazilianStemmer
    "brazilian": dict(pre=_pre_default, passes=_br_passes),
    "german": dict(pre=_pre_default, passes=_de_passes),
    "dutch": dict(pre=_pre_default, passes=_nl_passes),
    "russian": dict(pre=_pre_default, passes=_ru_passes),
    "swedish": dict(pre=_pre_default, passes=_sv_passes),
    "norwegian": dict(pre=_pre_default, passes=_no_passes),
    "danish": dict(pre=_pre_default, passes=_da_passes),
    "arabic": dict(pre=_pre_default, passes=_ar_passes),
    "hungarian": dict(pre=_pre_default, passes=_hu_passes),
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
    "polish": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _PL_CASE, 3)),
                        ("strip", _strip_pass("p2", "p1", _PL_DIM, 3))]),
    "ukrainian": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0", _UK_REFLEX, 3)),
                        ("strip", _strip_pass("p2", "p1", _UK_CASE, 3))]),
    "korean": dict(
        pre=_pre_default,
        passes=lambda: [("strip", _strip_pass("p1", "tok0",
                                              _KO_PARTICLES, 1))]),
}

SQL_ORACLE_LANGS = tuple(_SPECS) + ("chinese", "thai", "japanese")


def stem_pipeline(lang: str):
    """(ctes, last_cte_name) for a language's stem pipeline. The CTEs
    consume a `tok0(position, w)` relation — any number of word rows —
    and the last CTE yields (position, w) with w stemmed. Lets other
    oracles (e.g. stemmed index search) run the SQL stemmer over words
    derived from a table instead of a literal sentence."""
    passes = _SPECS[lang]["passes"]()
    ctes = [p[1] for p in passes]
    last = ctes[-1].split(" AS ")[0].strip()
    return ctes, last


# ------------------------------------------------------------------
# Porter 1980 (the `english` analyzer / stemmer filter): the CV mask of
# a word is computed once per step (translate + y-resolution rounds) and
# every measure/has-vowel/cvc test reads a PREFIX of that mask — valid
# because Porter's is_cons(i) depends only on chars <= i.

_PORTER_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
_PORTER_CLASSES = "".join(
    "v" if c in "aeiou" else ("y" if c == "y" else "c")
    for c in _PORTER_ALPHABET)


def _porter_mask(col: str) -> str:
    m = f"translate({col}, '{_PORTER_ALPHABET}', '{_PORTER_CLASSES}')"
    # initial y is a consonant; remaining y's resolve left-to-right
    # (y after consonant = vowel, after vowel = consonant) — 5 rounds
    # of the pair-replace reach the fixed point for any realistic run
    m = f"(CASE WHEN substr({m}, 1, 1) = 'y' THEN 'c' || substr({m}, 2) ELSE {m} END)"
    for _ in range(5):
        m = f"replace(replace({m}, 'cy', 'cv'), 'vy', 'vc')"
    return m


def _mcount(maskexpr: str) -> str:
    """Porter measure m = number of VC transitions in the mask."""
    return f"(length({maskexpr}) - length(replace({maskexpr}, 'vc', 'c')))"


def porter_pipeline_ctes() -> tuple[list[str], str]:
    """Porter steps 1a-5b as CTEs over tok0(position, w); words of
    length <= 2 pass through unchanged (the algorithm's guard)."""
    pfx = lambda k: f"substr(mk, 1, length(w)-{k})"  # noqa: E731
    w_ = lambda k: f"substr(w, 1, length(w)-{k})"  # noqa: E731
    q0 = ("q0 AS (SELECT position, w AS wo, w FROM tok0)")
    q1a = (f"q1a AS (SELECT position, wo, CASE "
           f"WHEN ends_with(w, 'sses') THEN {w_(2)} "
           f"WHEN ends_with(w, 'ies') THEN {w_(2)} "
           f"WHEN ends_with(w, 'ss') THEN w "
           f"WHEN ends_with(w, 's') THEN {w_(1)} ELSE w END AS w FROM q0)")
    q1b = (f"q1b AS (SELECT position, wo, CASE "
           f"WHEN ends_with(w, 'eed') THEN "
           f"(CASE WHEN {_mcount(pfx(3))} > 0 THEN {w_(1)} ELSE w END) "
           f"WHEN ends_with(w, 'ed') AND contains({pfx(2)}, 'v') THEN {w_(2)} "
           f"WHEN ends_with(w, 'ing') AND contains({pfx(3)}, 'v') THEN {w_(3)} "
           f"ELSE w END AS w, "
           f"((ends_with(w, 'ed') AND NOT ends_with(w, 'eed') "
           f"AND contains({pfx(2)}, 'v')) "
           f"OR (ends_with(w, 'ing') AND contains({pfx(3)}, 'v'))) AS f "
           f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q1a))")
    dbl = ("(length(w) >= 2 AND substr(w, length(w), 1) = substr(w, length(w)-1, 1) "
           "AND ends_with(mk, 'c'))")
    cvc = ("(ends_with(mk, 'cvc') AND NOT substr(w, length(w), 1) IN ('w', 'x', 'y'))")
    q1f = (f"q1f AS (SELECT position, wo, CASE "
           f"WHEN NOT f THEN w "
           f"WHEN ends_with(w, 'at') OR ends_with(w, 'bl') OR ends_with(w, 'iz') "
           f"THEN w || 'e' "
           f"WHEN {dbl} AND NOT substr(w, length(w), 1) IN ('l', 's', 'z') "
           f"THEN {w_(1)} "
           f"WHEN {_mcount('mk')} = 1 AND {cvc} THEN w || 'e' "
           f"ELSE w END AS w "
           f"FROM (SELECT position, wo, w, f, {_porter_mask('w')} AS mk FROM q1b))")
    q1c = (f"q1c AS (SELECT position, wo, CASE "
           f"WHEN ends_with(w, 'y') AND contains({pfx(1)}, 'v') "
           f"THEN {w_(1)} || 'i' ELSE w END AS w "
           f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q1f))")

    def rules_case(pairs, min_m: int) -> str:
        arms = []
        for suf, rep in pairs:
            k = len(suf)
            arms.append(
                f"WHEN ends_with(w, '{suf}') THEN "
                f"(CASE WHEN {_mcount(pfx(k))} > {min_m - 1} "
                f"THEN {w_(k)} || '{rep}' ELSE w END)")
        return "CASE " + " ".join(arms) + " ELSE w END"

    step2 = (("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
             ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
             ("alli", "al"), ("entli", "ent"), ("eli", "e"),
             ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
             ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
             ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
             ("iviti", "ive"), ("biliti", "ble"))
    step3 = (("icate", "ic"), ("ative", ""), ("alize", "al"),
             ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""))
    q2 = (f"q2 AS (SELECT position, wo, {rules_case(step2, 1)} AS w "
          f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q1c))")
    q3 = (f"q3 AS (SELECT position, wo, {rules_case(step3, 1)} AS w "
          f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q2))")
    step4 = ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
             "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
             "ous", "ive", "ize")
    arms4 = []
    for suf in step4:
        k = len(suf)
        cond = f"{_mcount(pfx(k))} > 1"
        if suf == "ion":
            cond = (f"(ends_with({w_(k)}, 's') OR ends_with({w_(k)}, 't')) "
                    f"AND {cond}")
        arms4.append(f"WHEN ends_with(w, '{suf}') THEN "
                     f"(CASE WHEN {cond} THEN {w_(k)} ELSE w END)")
    q4 = (f"q4 AS (SELECT position, wo, CASE {' '.join(arms4)} ELSE w END AS w "
          f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q3))")
    cvc1 = (f"(ends_with({pfx(1)}, 'cvc') "
            f"AND NOT substr(w, length(w)-1, 1) IN ('w', 'x', 'y'))")
    q5a = (f"q5a AS (SELECT position, wo, CASE "
           f"WHEN ends_with(w, 'e') AND ({_mcount(pfx(1))} > 1 "
           f"OR ({_mcount(pfx(1))} = 1 AND NOT {cvc1})) THEN {w_(1)} "
           f"ELSE w END AS w "
           f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q4))")
    q5b = (f"q5b AS (SELECT position, wo, CASE "
           f"WHEN {_mcount('mk')} > 1 AND {dbl} AND ends_with(w, 'l') "
           f"THEN {w_(1)} ELSE w END AS w "
           f"FROM (SELECT position, wo, w, {_porter_mask('w')} AS mk FROM q5a))")
    qf = ("qf AS (SELECT position, CASE WHEN length(wo) <= 2 THEN wo "
          "ELSE w END AS w FROM q5b)")
    return [q0, q1a, q1b, q1f, q1c, q2, q3, q4, q5a, q5b, qf], "qf"


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
    if lang == "japanese":
        # kuromoji substitute: Han unigrams, katakana/hiragana maximal
        # runs, standard words elsewhere; hiragana particle stop set
        stops = _strlist(sorted(STOP_SETS["japanese"]))
        return f"""
WITH arr AS (
  SELECT list_filter(regexp_extract_all(lower('{_q(text)}'),
             '[一-鿿㐀-䶿]|[ァ-ヺー]+|[ぁ-ゖ]+|[a-z0-9]+'),
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
