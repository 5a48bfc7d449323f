"""Snowball stemmers (Porter's Snowball family, public algorithm specs at
snowballstem.org) for the languages the reference registers through
StemmerTokenFilterFactory (modules/analysis-common/.../
StemmerTokenFilterFactory.java: name "french" -> SnowballFilter("French"),
"german" -> SnowballFilter("German"), etc.).

Implemented from the published algorithm descriptions — NOT ports of any
stemmer codebase. Each stemmer is a pure str -> str function, usable as a
token filter inside map_batches with zero per-call state.

Shared framework: R1 = the region after the first non-vowel following a
vowel; R2 = R1 applied again inside R1; RV is language-specific.
"""

from __future__ import annotations

__all__ = ["SNOWBALL_STEMMERS", "snowball_stem"]


def _r1r2(word: str, vowels: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            r2 = i + 1
            break
    return r1, r2


def _longest_suffix(word: str, suffixes) -> str | None:
    """Longest of `suffixes` that `word` ends with (Snowball 'longest among')."""
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# =========================== German ===========================

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def german_stem(word: str) -> str:
    """Snowball German (snowballstem.org/algorithms/german/stemmer.html)."""
    w = word.lower().replace("ß", "ss")
    # protect u, y between vowels
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and w[i - 1] in _DE_VOWELS and w[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1r2(w, _DE_VOWELS)
    r1 = max(r1, min(3, len(w)))  # region before R1 must have >= 3 letters

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    s = _longest_suffix(w, ("em", "ern", "er", "en", "es", "e", "s"))
    if s:
        cut = len(w) - len(s)
        if s == "s":
            if in_r1(cut) and cut > 0 and w[cut - 1] in _DE_S_END:
                w = w[:cut]
        elif in_r1(cut):
            w = w[:cut]
            if s in ("en", "es", "e") and w.endswith("niss"):
                w = w[:-1]

    # step 2
    s = _longest_suffix(w, ("est", "en", "er", "st"))
    if s:
        cut = len(w) - len(s)
        if s == "st":
            if in_r1(cut) and cut >= 3 and w[cut - 1] in _DE_ST_END:
                w = w[:cut]
        elif in_r1(cut):
            w = w[:cut]

    # step 3: d-suffixes
    s = _longest_suffix(w, ("end", "ung", "isch", "ik", "ig", "lich", "heit",
                            "keit"))
    if s:
        cut = len(w) - len(s)
        if s in ("end", "ung"):
            if in_r2(cut):
                w = w[:cut]
                if w.endswith("ig") and in_r2(len(w) - 2) and \
                        not w.endswith("eig"):
                    w = w[:-2]
        elif s in ("ig", "ik", "isch"):
            if in_r2(cut) and (cut == 0 or w[cut - 1] != "e"):
                w = w[:cut]
        elif s in ("lich", "heit"):
            if in_r2(cut):
                w = w[:cut]
                for pre in ("er", "en"):
                    if w.endswith(pre) and in_r1(len(w) - 2):
                        w = w[:-2]
                        break
        elif s == "keit":
            if in_r2(cut):
                w = w[:cut]
                for pre in ("lich", "ig"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[: -len(pre)]
                        break

    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# =========================== Dutch ===========================

_NL_VOWELS = "aeiouyè"


def _nl_undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Snowball Dutch (snowballstem.org/algorithms/dutch/stemmer.html)."""
    w = word.lower()
    for a, b in (("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"), ("ü", "u"),
                 ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    chars = list(w)
    # protect: initial y, y after vowel, i between vowels
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or w[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif c == "i" and 0 < i < len(chars) - 1 and \
                w[i - 1] in _NL_VOWELS and w[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    w = "".join(chars)
    r1, r2 = _r1r2(w, _NL_VOWELS)
    r1 = max(r1, min(3, len(w)))

    # step 1
    s = _longest_suffix(w, ("heden", "ene", "en", "se", "s"))
    if s:
        cut = len(w) - len(s)
        if s == "heden":
            if cut >= r1:
                w = w[:cut] + "heid"
        elif s in ("ene", "en"):
            if cut >= r1 and cut > 0 and w[cut - 1] not in _NL_VOWELS \
                    and w[:cut][-3:] != "gem":
                w = _nl_undouble(w[:cut])
        elif s in ("se", "s"):
            if cut >= r1 and cut > 0 and w[cut - 1] not in _NL_VOWELS + "j":
                w = w[:cut]

    # step 2
    e_removed = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a
    if w.endswith("heid") and len(w) - 4 >= r2 and \
            (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en") and len(w) - 2 >= r1 and len(w) > 2 \
                and w[-3] not in _NL_VOWELS and w[:-2][-3:] != "gem":
            w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes
    s = _longest_suffix(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if s:
        cut = len(w) - len(s)
        if s in ("end", "ing"):
            if cut >= r2:
                w = w[:cut]
                if w.endswith("ig") and len(w) - 2 >= r2 and \
                        (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif s == "ig":
            if cut >= r2 and (cut == 0 or w[cut - 1] != "e"):
                w = w[:cut]
        elif s == "lijk":
            if cut >= r2:
                w = w[:cut]
                if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif s == "baar":
            if cut >= r2:
                w = w[:cut]
        elif s == "bar":
            if cut >= r2 and e_removed:
                w = w[:cut]

    # step 4: undouble vowel (CVVC, last consonant not I)
    if len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I" \
            and w[-2] == w[-3] and w[-2] in "aeou" \
            and w[-4] not in _NL_VOWELS:
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# =========================== Russian ===========================

_RU_VOWELS = "аеиоуыэюя"

_RU_PERFECTIVE_1 = ("в", "вши", "вшись")          # preceded by а/я
_RU_PERFECTIVE_2 = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = ("ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
                 "ой", "ем", "им", "ым", "ом", "его", "ого", "ему", "ому",
                 "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # preceded by а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло",
              "но", "ет", "ют", "ны", "ть", "ешь", "нно")  # preceded by а/я
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли",
              "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло",
              "ено", "ят", "ует", "уют", "ит", "ыт", "ены", "ить", "ыть",
              "ишь", "ую", "ю")
_RU_NOUN = ("а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
            "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
            "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
            "ью", "ю", "ия", "ья", "я")


def _ru_longest_group(w: str, rv: int, group1, group2) -> str | None:
    """Longest match where group1 suffixes additionally require a preceding
    а/я (which stays); all matches must lie inside RV."""
    best = None
    best_len = -1
    for s in group2:
        cut = len(w) - len(s)
        if w.endswith(s) and cut >= rv and len(s) > best_len:
            best, best_len = w[:cut], len(s)
    for s in group1:
        cut = len(w) - len(s)
        if w.endswith(s) and cut >= rv and cut > 0 and w[cut - 1] in "ая" \
                and len(s) > best_len:
            best, best_len = w[:cut], len(s)
    return best


def russian_stem(word: str) -> str:
    """Snowball Russian (snowballstem.org/algorithms/russian/stemmer.html)."""
    w = word.lower().replace("ё", "е")
    rv = len(w)
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = _r1r2(w, _RU_VOWELS)

    # step 1: perfective gerund, else (reflexive?) adjectival | verb | noun
    out = _ru_longest_group(w, rv, _RU_PERFECTIVE_1, _RU_PERFECTIVE_2)
    if out is not None:
        w = out
    else:
        for s in ("ся", "сь"):
            if w.endswith(s) and len(w) - len(s) >= rv:
                w = w[: -len(s)]
                break
        adj = _ru_longest_group(w, rv, (), _RU_ADJECTIVE)
        if adj is not None:
            w = adj
            part = _ru_longest_group(w, rv, _RU_PARTICIPLE_1, _RU_PARTICIPLE_2)
            if part is not None:
                w = part
        else:
            verb = _ru_longest_group(w, rv, _RU_VERB_1, _RU_VERB_2)
            if verb is not None:
                w = verb
            else:
                noun = _ru_longest_group(w, rv, (), _RU_NOUN)
                if noun is not None:
                    w = noun

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational, in R2
    for s in ("ость", "ост"):
        if w.endswith(s) and len(w) - len(s) >= r2:
            w = w[: -len(s)]
            break

    # step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        eish = _longest_suffix(w, ("ейше", "ейш"))
        if eish and len(w) - len(eish) >= rv:
            w = w[: -len(eish)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w


# =========================== Spanish ===========================

_ES_VOWELS = "aeiouáéíóúü"


def _rv_romance(w: str, vowels: str) -> int:
    """RV for Spanish/Italian/Portuguese: if the second letter is a
    consonant, RV is the region after the next following vowel; if the first
    two letters are vowels, after the next consonant; otherwise (C-V case)
    after the third letter. RV = end if those positions don't exist."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        for i in range(2, n):
            if w[i] in vowels:
                return i + 1
        return n
    if w[0] in vowels and w[1] in vowels:
        for i in range(2, n):
            if w[i] not in vowels:
                return i + 1
        return n
    return 3


_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
                "me", "se", "la", "le", "lo")
_ES_PRE_ACC = ("ándo", "iéndo", "ár", "ér", "ír")
_ES_PRE_PLAIN = ("ando", "iendo", "ar", "er", "ir")

_ES_STEP1 = {
    # suffix: (region, replacement) — region 1=R1, 2=R2
    **{s: (2, "") for s in (
        "anzas", "anza", "icos", "icas", "ico", "ica", "ismos", "ismo",
        "ables", "able", "ibles", "ible", "istas", "ista", "osos", "osas",
        "oso", "osa", "amientos", "amiento", "imientos", "imiento")},
}

_ES_VERB_SUFFIXES = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "ábamos",
    "áramos", "ásemos", "arían", "arías", "aréis", "erían", "erías",
    "eréis", "irían", "irías", "iréis", "ierais", "ieseis", "asteis",
    "isteis", "ábais", "áabais", "árais", "ierais", "aseis", "íamos",
    "arán", "arás", "aría", "erán", "erás", "ería", "irán", "irás",
    "iría", "iera", "iese", "aste", "iste", "aban", "aran", "asen",
    "aron", "ieron", "iendo", "ieran", "iesen", "abais", "arais",
    "íais", "aremos", "eremos", "iremos", "ando", "abas", "adas",
    "idas", "aras", "ases", "ías", "ará", "aré", "erá", "eré", "irá",
    "iré", "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
    "ieras", "ieses", "ía", "ad", "ed", "id", "an", "ió", "ar", "er",
    "ir", "as", "ís", "áis", "ías", "imos", "amos",
)


def spanish_stem(word: str) -> str:
    """Snowball Spanish (snowballstem.org/algorithms/spanish/stemmer.html)."""
    w = word.lower()
    r1, r2 = _r1r2(w, _ES_VOWELS)
    rv = _rv_romance(w, _ES_VOWELS)

    # step 0: attached pronoun
    p = _longest_suffix(w, _ES_PRONOUNS)
    if p:
        base = w[: -len(p)]
        acc = _longest_suffix(base, _ES_PRE_ACC)
        plain = _longest_suffix(base, _ES_PRE_PLAIN)
        if acc and len(base) - len(acc) + 1 >= rv:
            tr = str.maketrans("áéíóú", "aeiou")
            w = base.translate(tr)
        elif plain and len(base) - len(plain) >= rv:
            if plain == "iendo" and base.endswith("uyendo"):
                w = base
            else:
                w = base
        elif base.endswith("yendo") and "uyendo" in base[-6:]:
            w = base

    changed1 = False
    # step 1: standard suffixes (longest first)
    s = _longest_suffix(w, (
        "amientos", "imientos", "amiento", "imiento", "aciones", "adoras",
        "adores", "ancias", "logías", "encias", "amente", "idades",
        "anzas", "icos", "icas", "ismos", "ables", "ibles", "istas",
        "osos", "osas", "ación", "adora", "ancia", "logía", "ución",
        "encia", "mente", "anza", "icas", "idad", "ivas", "ivos", "ico",
        "ica", "ismo", "able", "ible", "ista", "oso", "osa", "ador",
        "ante", "antes", "uciones", "iva", "ivo",
    ))
    if s:
        cut = len(w) - len(s)
        if s in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "able", "ables", "ible", "ibles", "ista",
                 "istas", "oso", "osa", "osos", "osas", "amiento",
                 "amientos", "imiento", "imientos"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
        elif s in ("adora", "ador", "ación", "adoras", "adores",
                   "aciones", "ante", "antes", "ancia", "ancias"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logía", "logías"):
            if cut >= r2:
                w = w[:cut] + "log"
                changed1 = True
        elif s in ("ución", "uciones"):
            if cut >= r2:
                w = w[:cut] + "u"
                changed1 = True
        elif s in ("encia", "encias"):
            if cut >= r2:
                w = w[:cut] + "ente"
                changed1 = True
        elif s == "amente":
            if cut >= r1:
                w = w[:cut]
                changed1 = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif s in ("idad", "idades"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    if not changed1:
        # step 2a: verb suffixes beginning y (preceded by u)
        s = _longest_suffix(w, ("yeron", "yendo", "yamos", "yais", "yan",
                                "yen", "yas", "yes", "ya", "ye", "yo", "yó"))
        done2a = False
        if s:
            cut = len(w) - len(s)
            if cut >= rv and cut > 0 and w[cut - 1] == "u":
                w = w[:cut]
                done2a = True
        if not done2a:
            # step 2b: other verb suffixes
            s = _longest_suffix(w, ("éis", "emos", "en", "es") + _ES_VERB_SUFFIXES)
            if s:
                cut = len(w) - len(s)
                if cut >= rv:
                    w = w[:cut]
                    if s in ("en", "es", "éis", "emos") and w.endswith("gu"):
                        w = w[:-1]

    # step 3: residual suffix
    s = _longest_suffix(w, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if s:
        cut = len(w) - len(s)
        if cut >= rv:
            w = w[:cut]
            if s in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]

    return w.translate(str.maketrans("áéíóúü", "aeiouu"))


# =========================== Italian ===========================

_IT_VOWELS = "aeiouàèìòù"

_IT_PRONOUNS = ("gliela", "gliele", "glieli", "glielo", "gliene", "sene",
                "mela", "mele", "meli", "melo", "mene", "tela", "tele",
                "teli", "telo", "tene", "cela", "cele", "celi", "celo",
                "cene", "vela", "vele", "veli", "velo", "vene", "gli",
                "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi")

_IT_VERB_SUFFIXES = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti", "iscano", "iscono", "issero", "arono", "avamo",
    "avano", "avate", "eremo", "erete", "erono", "evamo", "evano",
    "evate", "iremo", "irete", "irono", "ivamo", "ivano", "ivate",
    "ammo", "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
    "endo", "erai", "erei", "yamo", "iamo", "immo", "irai", "irei",
    "isca", "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati",
    "ato", "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva",
    "evi", "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito",
    "iva", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


def italian_stem(word: str) -> str:
    """Snowball Italian (snowballstem.org/algorithms/italian/stemmer.html)."""
    w = word.lower()
    w = w.translate(str.maketrans("áéíóú", "àèìòù"))
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and w[i - 1] in _IT_VOWELS and w[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    # u after q
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    w = "".join(chars)
    r1, r2 = _r1r2(w, _IT_VOWELS)
    rv = _rv_romance(w, _IT_VOWELS)

    # step 0: attached pronoun
    p = _longest_suffix(w, _IT_PRONOUNS)
    if p:
        base = w[: -len(p)]
        ger = _longest_suffix(base, ("ando", "endo"))
        inf = _longest_suffix(base, ("ar", "er", "ir"))
        if ger and len(base) - len(ger) >= rv:
            w = base
        elif inf and len(base) - len(inf) >= rv:
            w = base + "e"

    changed1 = False
    s = _longest_suffix(w, (
        "atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
        "usione", "usioni", "amento", "amenti", "imento", "imenti",
        "amente", "abile", "abili", "ibile", "ibili", "mente", "atore",
        "atori", "logia", "logie", "anza", "anze", "iche", "ichi",
        "ismo", "ismi", "ista", "iste", "isti", "istà", "istè", "istì",
        "ante", "anti", "enza", "enze", "ico", "ici", "ica", "ice",
        "oso", "osi", "osa", "ose", "ità", "ivo", "ivi", "iva", "ive",
    ))
    if s:
        cut = len(w) - len(s)
        if s in ("anza", "anze", "ico", "ici", "ica", "ice", "iche",
                 "ichi", "ismo", "ismi", "abile", "abili", "ibile",
                 "ibili", "ista", "iste", "isti", "istà", "istè",
                 "istì", "oso", "osi", "osa", "ose", "mente", "atrice",
                 "atrici", "ante", "anti"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
        elif s in ("azione", "azioni", "atore", "atori"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logia", "logie"):
            if cut >= r2:
                w = w[:cut] + "log"
                changed1 = True
        elif s in ("uzione", "uzioni", "usione", "usioni"):
            if cut >= r2:
                w = w[:cut] + "u"
                changed1 = True
        elif s in ("enza", "enze"):
            if cut >= r2:
                w = w[:cut] + "ente"
                changed1 = True
        elif s in ("amento", "amenti", "imento", "imenti"):
            if cut >= rv:
                w = w[:cut]
                changed1 = True
        elif s == "amente":
            if cut >= r1:
                w = w[:cut]
                changed1 = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if w.endswith(pre) and len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                            break
        elif s == "ità":
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif s in ("ivo", "ivi", "iva", "ive"):
            if cut >= r2:
                w = w[:cut]
                changed1 = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]

    if not changed1:
        s = _longest_suffix(w, _IT_VERB_SUFFIXES)
        if s:
            cut = len(w) - len(s)
            if cut >= rv:
                w = w[:cut]

    # step 3a: final vowel
    s = _longest_suffix(w, ("a", "e", "i", "o", "à", "è", "ì", "ò"))
    if s and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # step 3b
    if len(w) - 1 >= rv and w.endswith(("ch", "gh")):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# =========================== Portuguese ===========================

_PT_VOWELS = "aeiouáéíóúâêôà"

_PT_VERB_SUFFIXES = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "áramos", "éramos", "íramos",
    "ávamos", "aremos", "eremos", "iremos", "ariam", "eriam", "iriam",
    "assem", "essem", "issem", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áveis", "íamos", "arei", "erei", "irei", "aram", "eram",
    "iram", "avam", "arem", "erem", "irem", "ando", "endo", "indo",
    "adas", "idas", "arás", "aras", "erás", "eras", "irás", "avas",
    "ares", "eres", "ires", "íeis", "ados", "idos", "ámos", "amos",
    "emos", "imos", "iras", "ada", "ida", "ará", "ara", "erá", "era",
    "irá", "ava", "iam", "ado", "ido", "ias", "ais", "eis", "ões",
    "am", "ado", "em", "ou", "ad", "ed", "id", "an", "ar", "er", "ir",
    "as", "es", "is", "eu", "iu", "ia", "ira",
)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese (snowballstem.org/algorithms/portuguese/
    stemmer.html). Nasalized vowels are marked a~/o~ internally."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _r1r2(w, _PT_VOWELS)
    rv = _rv_romance(w, _PT_VOWELS)

    changed = False
    s = _longest_suffix(w, (
        "amentos", "imentos", "uço~es", "amento", "imento", "adoras",
        "adores", "aço~es", "logias", "ências", "amente", "idades",
        "ismos", "istas", "adora", "aça~o", "antes", "ância", "logia",
        "uça~o", "ência", "mente", "idade", "ezas", "icos", "icas",
        "ivas", "ivos", "iras", "eza", "ico", "ica", "oso", "osa",
        "osos", "osas", "ador", "ante", "ável", "ível", "ista", "ismo",
        "iva", "ivo", "ira",
    ))
    if s:
        cut = len(w) - len(s)
        if s in ("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
                 "ismos", "ável", "ível", "ista", "istas", "oso", "osa",
                 "osos", "osas", "amento", "amentos", "imento",
                 "imentos"):
            if cut >= r2:
                w = w[:cut]
                changed = True
        elif s in ("adora", "ador", "aça~o", "adoras", "adores",
                   "aço~es", "ante", "antes", "ância"):
            if cut >= r2:
                w = w[:cut]
                changed = True
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("logia", "logias"):
            if cut >= r2:
                w = w[:cut] + "log"
                changed = True
        elif s in ("uça~o", "uço~es"):
            if cut >= r2:
                w = w[:cut] + "u"
                changed = True
        elif s in ("ência", "ências"):
            if cut >= r2:
                w = w[:cut] + "ente"
                changed = True
        elif s == "amente":
            if cut >= r1:
                w = w[:cut]
                changed = True
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif s == "mente":
            if cut >= r2:
                w = w[:cut]
                changed = True
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif s in ("idade", "idades"):
            if cut >= r2:
                w = w[:cut]
                changed = True
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif s in ("iva", "ivo", "ivas", "ivos"):
            if cut >= r2:
                w = w[:cut]
                changed = True
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("ira", "iras"):
            if cut >= rv and cut > 0 and w[cut - 1] == "e":
                w = w[:cut] + "ir"
                changed = True

    if not changed:
        s = _longest_suffix(w, _PT_VERB_SUFFIXES)
        if s:
            cut = len(w) - len(s)
            if cut >= rv:
                w = w[:cut]
                changed = True

    if changed:
        if w.endswith("i") and len(w) - 1 >= rv and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4: residual suffix
        s = _longest_suffix(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if s and len(w) - len(s) >= rv:
            w = w[: -len(s)]

    # step 5
    if w.endswith(("e", "é", "ê")) and len(w) - 1 >= rv:
        w = w[:-1]
        if (w.endswith("gu") and len(w) - 1 >= rv) or \
                (w.endswith("ci") and len(w) - 1 >= rv):
            w = w[:-1]
    if w.endswith("ç"):
        w = w[:-1] + "c"

    return (w.replace("a~", "ã").replace("o~", "õ")
            .translate(str.maketrans("áéíóúâêôãõà", "aeiouaeoaoa")))


# =========================== French ===========================

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 2 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return min(3, n)
    if w[:3] in ("par", "col", "tap"):
        return min(3, n)
    for i in range(1, n):
        if w[i] in _FR_VOWELS:
            return i + 1
    return n


_FR_STEP2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i",
)

_FR_STEP2B_ER = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_FR_STEP2B_A = (
    "assions", "assiez", "assent", "antes", "aIent", "asses", "âtes",
    "ants", "asse", "âmes", "ante", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
)


def french_stem(word: str) -> str:
    """Snowball French (snowballstem.org/algorithms/french/stemmer.html)."""
    w = word.lower()
    chars = list(w)
    n = len(chars)
    for i, c in enumerate(chars):
        if c in "iu" and 0 < i < n - 1 and w[i - 1] in _FR_VOWELS \
                and w[i + 1] in _FR_VOWELS:
            chars[i] = c.upper()
        elif c == "u" and i > 0 and w[i - 1] == "q":
            chars[i] = "U"
        elif c == "y" and ((i > 0 and w[i - 1] in _FR_VOWELS)
                           or (i < n - 1 and w[i + 1] in _FR_VOWELS)):
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _r1r2(w, _FR_VOWELS)
    rv = _fr_rv(w)

    orig = w
    found_ment = False

    # ---- step 1: standard suffix removal ----
    s = _longest_suffix(w, (
        "issements", "issement", "atrices", "utions", "ements", "amment",
        "emment", "ations", "atrice", "ateurs", "logies", "usions",
        "ements", "ités", "ances", "iqUes", "ismes", "ables", "istes",
        "ateur", "ation", "ement", "euses", "ments", "ance", "iqUe",
        "isme", "able", "iste", "ence", "ille", "logie", "usion",
        "ution", "ences", "ment", "eaux", "ités", "ives", "euse",
        "eux", "ité", "ive", "ifs", "aux", "if",
    ))
    if s:
        cut = len(w) - len(s)
        if s in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                 "iqUes", "ismes", "ables", "istes"):
            if cut >= r2:
                w = w[:cut]
        elif s in ("atrice", "ateur", "ation", "atrices", "ateurs",
                   "ations"):
            if cut >= r2:
                w = w[:cut]
                if w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif s in ("logie", "logies"):
            if cut >= r2:
                w = w[:cut] + "log"
        elif s in ("usion", "ution", "usions", "utions"):
            if cut >= r2:
                w = w[:cut] + "u"
        elif s in ("ence", "ences"):
            if cut >= r2:
                w = w[:cut] + "ent"
        elif s in ("ement", "ements"):
            if cut >= rv:
                w = w[:cut]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                elif w.endswith("eus"):
                    if len(w) - 3 >= r2:
                        w = w[:-3]
                    elif len(w) - 3 >= r1:
                        w = w[:-3] + "eux"
                elif w.endswith(("abl", "iqU")) and len(w) - 3 >= r2:
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and len(w) - 3 >= rv:
                    w = w[:-3] + "i"
        elif s in ("ité", "ités"):
            if cut >= r2:
                w = w[:cut]
                if w.endswith("abil"):
                    if len(w) - 4 >= r2:
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if len(w) - 2 >= r2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif s in ("if", "ive", "ifs", "ives"):
            if cut >= r2:
                w = w[:cut]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic"):
                        if len(w) - 2 >= r2:
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif s == "eaux":
            w = w[:-1]
        elif s == "aux":
            if cut >= r1:
                w = w[:cut] + "al"
        elif s in ("euse", "euses"):
            if cut >= r2:
                w = w[:cut]
            elif cut >= r1:
                w = w[:cut] + "eux"
        elif s in ("issement", "issements"):
            if cut >= r1 and cut > 0 and w[cut - 1] not in _FR_VOWELS:
                w = w[:cut]
        elif s == "amment":
            if cut >= rv:
                w = w[:cut] + "ant"
                found_ment = True
        elif s == "emment":
            if cut >= rv:
                w = w[:cut] + "ent"
                found_ment = True
        elif s in ("ment", "ments"):
            if cut >= 1 and cut - 1 >= rv and w[cut - 1] in _FR_VOWELS:
                w = w[:cut]
                found_ment = True

    step1_changed = w != orig
    do_2a = (not step1_changed) or found_ment
    step2_changed = False
    if do_2a:
        before = w
        s = _longest_suffix(w, _FR_STEP2A)
        if s:
            cut = len(w) - len(s)
            # suffix in RV, preceded by a non-vowel itself in RV
            if cut - 1 >= rv and w[cut - 1] not in _FR_VOWELS:
                w = w[:cut]
        if w == before:
            # step 2b
            s = _longest_suffix(w, _FR_STEP2B_ER + _FR_STEP2B_A + ("ions",))
            if s:
                cut = len(w) - len(s)
                if s == "ions":
                    if cut >= r2 and cut >= rv:
                        w = w[:cut]
                elif s in _FR_STEP2B_ER:
                    if cut >= rv:
                        w = w[:cut]
                else:  # a-group
                    if cut >= rv:
                        w = w[:cut]
                        if w.endswith("e") and len(w) - 1 >= rv:
                            w = w[:-1]
        step2_changed = w != before

    if step1_changed or step2_changed:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        s = _longest_suffix(w, ("ion", "ière", "Ière", "ier", "Ier", "e", "ë"))
        if s:
            cut = len(w) - len(s)
            if s == "ion":
                if cut >= r2 and cut >= rv and cut > 0 and w[cut - 1] in "st":
                    w = w[:cut]
            elif s in ("ière", "Ière", "ier", "Ier"):
                if cut >= rv:
                    w = w[:cut] + "i"
            elif s == "e":
                if cut >= rv:
                    w = w[:cut]
            elif s == "ë":
                if w[-3:-1] == "gu" and cut >= rv:
                    w = w[:cut]

    # step 5: undouble
    for dbl in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(dbl):
            w = w[:-1]
            break

    # step 6: un-accent final syllable
    for i in range(len(w) - 1, -1, -1):
        if w[i] in ("é", "è"):
            if all(c not in _FR_VOWELS for c in w[i + 1:]) and i < len(w) - 1:
                w = w[:i] + "e" + w[i + 1:]
            break
        if w[i] in _FR_VOWELS:
            break

    return w.replace("I", "i").replace("U", "u").replace("Y", "y")


SNOWBALL_STEMMERS = {
    "german": german_stem,
    "dutch": dutch_stem,
    "russian": russian_stem,
    "spanish": spanish_stem,
    "italian": italian_stem,
    "portuguese": portuguese_stem,
    "french": french_stem,
}


def snowball_stem(language: str, word: str) -> str:
    try:
        return SNOWBALL_STEMMERS[language](word)
    except KeyError:
        raise ValueError(
            f"no snowball stemmer for {language!r}; "
            f"known: {sorted(SNOWBALL_STEMMERS)}") from None


# =========================== Swedish ===========================

_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"

_SV_STEP1 = ("heterna", "hetens", "heter", "heten", "anden", "arnas",
             "ernas", "ornas", "ades", "andes", "enes", "arens", "hetens",
             "erns", "andet", "arna", "erna", "orna", "ande", "arne",
             "aste", "aren", "heten", "erns", "ens", "ern", "het", "ast",
             "ade", "are", "ad", "en", "ar", "er", "or", "as", "es", "at",
             "a", "e")


def swedish_stem(word: str) -> str:
    """Snowball Swedish (snowballstem.org/algorithms/swedish/stemmer.html)."""
    w = word.lower()
    r1, _ = _r1r2(w, _SV_VOWELS)
    r1 = max(r1, min(3, len(w)))
    # step 1
    s = _longest_suffix(w, _SV_STEP1)
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] in _SV_S_END:
        w = w[:-1]
    # step 2
    if len(w) - 1 >= r1 and w.endswith(("dd", "gd", "nn", "dt", "gt",
                                        "kt", "tt")):
        w = w[:-1]
    # step 3
    s = _longest_suffix(w, ("fullt", "löst", "lig", "els", "ig"))
    if s:
        cut = len(w) - len(s)
        if cut >= r1:
            if s == "fullt":
                w = w[:-1]
            elif s == "löst":
                w = w[:-1]
            else:
                w = w[:cut]
    return w


# =========================== Norwegian ===========================

_NO_VOWELS = "aeiouyæåø"

_NO_STEP1 = ("hetenes", "hetene", "hetens", "heten", "heter", "endes",
             "enes", "edes", "erte", "ande", "ende", "ane", "ene", "ede",
             "ers", "ets", "het", "ast", "ens", "ert", "et", "es", "as",
             "ar", "er", "en", "a", "e")


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian (snowballstem.org/algorithms/norwegian/
    stemmer.html)."""
    w = word.lower()
    r1, _ = _r1r2(w, _NO_VOWELS)
    r1 = max(r1, min(3, len(w)))
    s = _longest_suffix(w, _NO_STEP1)
    if s and len(w) - len(s) >= r1:
        if s in ("erte", "ert"):
            w = w[: -len(s)] + "er"
        else:
            w = w[: -len(s)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 and (
            w[-2] in "bcdfghjlmnoprtvyz"
            or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))):
        w = w[:-1]
    # step 2
    if len(w) - 1 >= r1 and w.endswith(("dt", "vt")):
        w = w[:-1]
    # step 3
    s = _longest_suffix(w, ("hetslov", "slov", "elov", "elig", "eleg",
                            "lov", "lig", "eig", "els", "leg", "ig"))
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    return w


# =========================== Danish ===========================

_DA_VOWELS = "aeiouyæåø"

_DA_STEP1 = ("erendes", "erende", "hedens", "erede", "heden", "heder",
             "endes", "ernes", "erens", "erets", "ethed", "ered", "ende",
             "erne", "eren", "erer", "heds", "enes", "eres", "eret",
             "hed", "ene", "ere", "ens", "ers", "ets", "en", "er", "es",
             "et", "e")


def danish_stem(word: str) -> str:
    """Snowball Danish (snowballstem.org/algorithms/danish/stemmer.html)."""
    w = word.lower()
    r1, _ = _r1r2(w, _DA_VOWELS)
    r1 = max(r1, min(3, len(w)))
    s = _longest_suffix(w, _DA_STEP1)
    if s and len(w) - len(s) >= r1:
        w = w[: -len(s)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] in "abcdfghjklmnoprtvyzå":
        w = w[:-1]
    # step 2
    if len(w) - 1 >= r1 and w.endswith(("gd", "dt", "gt", "kt")):
        w = w[:-1]
    # step 3
    if w.endswith("igst"):
        w = w[:-2]
    s = _longest_suffix(w, ("elig", "løst", "lig", "els", "ig"))
    if s:
        cut = len(w) - len(s)
        if s == "løst":
            if cut >= r1 - 1:
                w = w[:-1]
        elif cut >= r1:
            w = w[:cut]
            # repeat step 2 (undouble after removal)
            if len(w) - 1 >= r1 and w.endswith(("gd", "dt", "gt", "kt")):
                w = w[:-1]
    # step 4: undouble final double consonant
    if len(w) - 1 >= r1 and len(w) >= 2 and w[-1] == w[-2] \
            and w[-1] not in _DA_VOWELS:
        w = w[:-1]
    return w


# =========================== Arabic (light10) ===========================

_AR_DIACRITICS = "ًٌٍَُِّْ"
_AR_PREFIXES = ("وال", "بال", "كال", "فال", "ال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


def arabic_stem(word: str) -> str:
    """Arabic light10 stemmer (Larkey, Ballesteros & Connell 2002 — the
    public algorithm behind Lucene's ArabicStemmer): orthographic
    normalization, then one longest-prefix and repeated suffix stripping."""
    w = word
    # normalization (ArabicNormalizer): strip tatweel + diacritics, hamza
    # forms -> bare alef, alef maqsura -> ya, teh marbuta -> heh
    w = "".join(c for c in w if c not in _AR_DIACRITICS and c != "ـ")
    w = (w.replace("أ", "ا").replace("إ", "ا").replace("آ", "ا")
         .replace("ى", "ي").replace("ة", "ه"))
    for p in _AR_PREFIXES:
        if w.startswith(p) and len(w) > len(p) + 1:
            w = w[len(p):]
            break
    changed = True
    while changed:
        changed = False
        for s in _AR_SUFFIXES:
            if w.endswith(s) and len(w) > len(s) + 1:
                w = w[: -len(s)]
                changed = True
                break
    return w


SNOWBALL_STEMMERS.update({
    "swedish": swedish_stem,
    "norwegian": norwegian_stem,
    "danish": danish_stem,
    "arabic": arabic_stem,
})


# =========================== Romanian ===========================

_RO_VOWELS = "aăâeiîou"

_RO_STEP1 = {
    **{s: "abil" for s in ("abilitate", "abilitati", "abilităi", "abilităţi")},
    "ibilitate": "ibil",
    **{s: "iv" for s in ("ivitate", "ivitati", "ivităi", "ivităţi")},
    **{s: "ic" for s in (
        "icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
        "iciv", "iciva", "icive", "icivi", "icivă", "ical", "icala",
        "icale", "icali", "icală")},
    **{s: "at" for s in (
        "ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
        "ator", "atori", "ătoare", "ător", "ători")},
    **{s: "it" for s in (
        "itiv", "itiva", "itive", "itivi", "itivă", "iţiune", "itoare",
        "itor", "itori")},
}

_RO_STEP2_DEL = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
    "iv", "iva", "ive", "ivi", "ivă", "abil", "abila", "abile", "abili",
    "abilă", "ibil", "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă",
    "oase", "os", "osi", "oşi", "ant", "anta", "ante", "anti", "antă",
    "ator", "atori", "itate", "itati", "ităi", "ităţi",
)
_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
                 "işti")

_RO_VERB = (
    "aserăţi", "iserăţi", "âserăţi", "userăţi", "aserăm", "iserăm",
    "âserăm", "userăm", "ească", "arăţi", "urăţi", "irăţi", "ârăţi",
    "aseşi", "iseşi", "âseşi", "useşi", "asem", "isem", "âsem", "usem",
    "aseră", "iseră", "âseră", "useră", "indu", "ându", "ează", "eşti",
    "eşte", "ăşti", "ăşte", "eaţi", "iaţi", "arăm", "urăm", "irăm",
    "ârăm", "aşi", "aţi", "ează", "eze", "ezi", "esc", "ăsc", "eam",
    "eai", "eau", "iam", "iai", "iau", "aşi", "are", "ere", "ire",
    "âre", "ind", "ând", "eze", "ează", "am", "ai", "au", "ea", "ia",
    "ui", "âi", "ez", "âţi", "âm", "ăm", "em", "im",
    "serăm", "serăţi", "seră", "sese", "sesem", "seseşi", "seserăm",
    "seserăţi", "seseră",
)


def romanian_stem(word: str) -> str:
    """Snowball Romanian (snowballstem.org/algorithms/romanian/stemmer.html).
    Comma-below forms (ș ț) are folded to the cedilla forms (ş ţ) the
    published algorithm is written in."""
    w = word.lower().replace("ș", "ş").replace("ț", "ţ")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and w[i - 1] in _RO_VOWELS and w[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _r1r2(w.lower(), _RO_VOWELS)
    rv = _rv_romance(w.lower(), _RO_VOWELS)

    def in_r1(cut):
        return cut >= r1

    def in_r2(cut):
        return cut >= r2

    def in_rv(cut):
        return cut >= rv

    # step 0: removal of plurals (R1)
    s = _longest_suffix(w, ("ului", "aua", "ele", "elor", "iua", "iei",
                            "iile", "iilor", "ilor", "ile", "atei", "aţie",
                            "aţia", "ul", "ea", "ii"))
    if s:
        cut = len(w) - len(s)
        if in_r1(cut):
            if s in ("ul", "ului"):
                w = w[:cut]
            elif s == "aua":
                w = w[:cut] + "a"
            elif s in ("ea", "ele", "elor"):
                w = w[:cut] + "e"
            elif s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
                w = w[:cut] + "i"
            elif s == "ile":
                if not w[:cut].endswith("ab"):
                    w = w[:cut] + "i"
            elif s == "atei":
                w = w[:cut] + "at"
            elif s in ("aţie", "aţia"):
                w = w[:cut] + "aţi"

    # step 1: reduction of combining suffixes (R1, repeat)
    step_removed = False
    while True:
        s = _longest_suffix(w, tuple(_RO_STEP1))
        if s and in_r1(len(w) - len(s)):
            w = w[: len(w) - len(s)] + _RO_STEP1[s]
            step_removed = True
            continue
        break

    # step 2: standard suffixes (R2)
    s = _longest_suffix(w, _RO_STEP2_DEL + _RO_STEP2_IST + ("iune", "iuni"))
    if s:
        cut = len(w) - len(s)
        if in_r2(cut):
            if s in ("iune", "iuni"):
                if cut > 0 and w[cut - 1] == "ţ":
                    w = w[: cut - 1] + "t"
                    step_removed = True
            elif s in _RO_STEP2_IST:
                w = w[:cut] + "ist"
                step_removed = True
            else:
                w = w[:cut]
                step_removed = True

    # step 3: verb suffixes (RV) — only if steps 1-2 removed nothing
    if not step_removed:
        s = _longest_suffix(w, _RO_VERB)
        if s:
            cut = len(w) - len(s)
            if in_rv(cut):
                first = s[0]
                if first in ("a", "e", "i", "â", "u") and s not in (
                        "ui", "âi", "âm", "âţi"):
                    # group 1: delete only if preceded by consonant or 'u'
                    if cut > 0 and (w[cut - 1].lower() not in _RO_VOWELS
                                    or w[cut - 1] in "uU"):
                        w = w[:cut]
                else:
                    w = w[:cut]

    # step 4: final vowel (RV)
    s = _longest_suffix(w, ("ie", "a", "e", "i", "ă"))
    if s and in_rv(len(w) - len(s)):
        w = w[: len(w) - len(s)]
    return w.replace("I", "i").replace("U", "u")


# =========================== Finnish ===========================

_FI_VOWELS = "aeiouyäö"
_FI_LONG_V = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CASES = ("siin", "tten", "seen", "lle", "ine", "ssa", "ssä", "sta",
             "stä", "lla", "llä", "lta", "ltä", "tta", "ttä", "ksi",
             "han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön",
             "den", "na", "nä", "ta", "tä", "a", "ä", "n")


def finnish_stem(word: str) -> str:
    """Snowball Finnish (snowballstem.org/algorithms/finnish/stemmer.html)."""
    w = word.lower()
    r1, r2 = _r1r2(w, _FI_VOWELS)

    def in_r1(cut):
        return cut >= r1

    def in_r2(cut):
        return cut >= r2

    # step 1: particle etc.
    s = _longest_suffix(w, ("kaan", "kään", "kin", "han", "hän", "ko", "kö",
                            "pa", "pä", "sti"))
    if s:
        cut = len(w) - len(s)
        if s == "sti":
            if in_r2(cut):
                w = w[:cut]
        elif in_r1(cut) and cut > 0 and w[cut - 1] in ("n", "t") + tuple(_FI_VOWELS):
            w = w[:cut]

    # step 2: possessives (R1)
    s = _longest_suffix(w, ("nsa", "nsä", "mme", "nne", "si", "ni", "an",
                            "än", "en"))
    if s:
        cut = len(w) - len(s)
        if in_r1(cut):
            if s == "si":
                if cut > 0 and w[cut - 1] != "k":
                    w = w[:cut]
            elif s == "ni":
                w = w[:cut]
                if w.endswith("kse"):
                    w = w[:-1] + "i"
            elif s in ("nsa", "nsä", "mme", "nne"):
                w = w[:cut]
            elif s == "an":
                if w[:cut].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
                    w = w[:cut]
            elif s == "än":
                if w[:cut].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
                    w = w[:cut]
            elif s == "en":
                if w[:cut].endswith(("lle", "ine")):
                    w = w[:cut]

    # step 3: cases (R1)
    ending_removed = False
    s = _longest_suffix(w, _FI_CASES)
    if s:
        cut = len(w) - len(s)
        if in_r1(cut):
            if s in ("han", "hen", "hin", "hon", "hun", "hyn", "hän", "hön"):
                # hXn preceded by X (a-han, e-hen, ...)
                if cut > 0 and w[cut - 1] == s[1]:
                    w = w[:cut]
                    ending_removed = True
            elif s in ("siin", "den", "tten"):
                # preceded by Vi
                if cut >= 2 and w[cut - 1] == "i" and w[cut - 2] in _FI_VOWELS:
                    w = w[:cut]
                    ending_removed = True
            elif s == "seen":
                if w[:cut].endswith(_FI_LONG_V):
                    w = w[:cut]
                    ending_removed = True
            elif s in ("a", "ä"):
                # preceded by consonant + vowel
                if cut >= 2 and w[cut - 1] in _FI_VOWELS \
                        and w[cut - 2] not in _FI_VOWELS:
                    w = w[:cut]
                    ending_removed = True
            elif s in ("tta", "ttä"):
                if cut > 0 and w[cut - 1] == "e":
                    w = w[:cut]
                    ending_removed = True
            elif s == "n":
                w = w[:cut]
                ending_removed = True
                if w.endswith(_FI_LONG_V) or w.endswith("ie"):
                    w = w[:-1]
            else:
                w = w[:cut]
                ending_removed = True

    # step 4: other endings (R2)
    s = _longest_suffix(w, ("impi", "impa", "impä", "immi", "imma", "immä",
                            "mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                            "eja", "ejä"))
    if s:
        cut = len(w) - len(s)
        if in_r2(cut):
            if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not w[:cut].endswith("po"):
                    w = w[:cut]
            else:
                w = w[:cut]

    # step 5: plurals
    if ending_removed:
        if w.endswith(("i", "j")) and in_r1(len(w) - 1):
            w = w[:-1]
    else:
        if w.endswith("t") and in_r1(len(w) - 1) \
                and len(w) >= 2 and w[-2] in _FI_VOWELS:
            w = w[:-1]
            if w.endswith("imma") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("mma") and in_r2(len(w) - 3) \
                    and not w[: len(w) - 3].endswith("po"):
                w = w[:-3]

    # step 6: tidying (all sub-steps operate inside R1)
    if len(w) >= 2 and w.endswith(_FI_LONG_V) and len(w) - 2 >= r1:
        w = w[:-1]
    if len(w) >= 2 and w[-1] in "aäei" and w[-2] not in _FI_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    if w.endswith(("oj", "uj")) and len(w) - 1 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 1 >= r1:
        w = w[:-1]
    # undouble final consonant (possibly followed by vowels)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _FI_VOWELS and w[i] == w[i - 1]:
        w = w[:i] + w[i + 1:]
    return w


SNOWBALL_STEMMERS.update({
    "romanian": romanian_stem,
    "finnish": finnish_stem,
})
