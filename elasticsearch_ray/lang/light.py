"""Light stemmers for the remaining reference language analyzers
(modules/analysis-common/.../CommonAnalysisPlugin.java registrations whose
Lucene implementation is a published *light* stemmer rather than a Snowball
algorithm — e.g. HungarianLightStemmer, CzechStemmer, BulgarianStemmer,
LatvianStemmer, HindiStemmer, IndonesianStemmer, SoraniStemmer, the Greek
case-ending stemmer).

Implemented from the published algorithm families (Savoy's CLEF light
stemmers: Dolamic & Savoy 2009 for Czech; Savoy 2008 for Hungarian and
Bulgarian; Ramanathan & Rao 2003 for Hindi; Tala 2003 for Indonesian) —
NOT ports of any stemmer codebase. Where a rule list here is a condensed
form of the published one, the docstring says so; behavior is pinned by
golden vectors in tests/test_lang.py.

Each stemmer is a pure str -> str function with zero per-call state, usable
as a token filter inside map_batches.
"""

from __future__ import annotations

__all__ = ["LIGHT_STEMMERS", "turkish_lower", "greek_fold",
           "hindi_normalize", "sorani_normalize", "bengali_normalize"]


def _strip_longest(w: str, suffixes, min_stem: int) -> str:
    """Remove the longest matching suffix, keeping >= min_stem chars."""
    best = None
    for s in suffixes:
        if len(w) - len(s) >= min_stem and w.endswith(s) \
                and (best is None or len(s) > len(best)):
            best = s
    return w[: len(w) - len(best)] if best else w


# =========================== Hungarian (light) ===========================

_HU_ACCENT = str.maketrans("áéíóöőúüű", "aeiooouuu")

_HU_CASE = ("kent", "nak", "nek", "val", "vel", "tol", "rol", "ban", "ben",
            "bol", "nal", "nel", "hoz", "hez", "ert", "ig", "on", "en",
            "an", "ot", "at", "et", "ut", "ba", "be", "ra", "re", "t", "n")
_HU_POSS = ("ainak", "einek", "aitok", "eitek", "aink", "eink", "juk",
            "unk", "tok", "tek", "uk", "om", "em", "am", "od", "ed", "ad",
            "ja", "je", "a", "e", "o")
_HU_PLURAL = ("ak", "ok", "ek", "k", "ai", "ei", "i")


def hungarian_stem(word: str) -> str:
    """Savoy-style light Hungarian stemmer (the HungarianLightStemmer
    family): accent folding, then case / possessive / plural ending
    removal with a 3-char stem guard. Condensed rule list; not the
    Snowball Hungarian algorithm."""
    w = word.lower().translate(_HU_ACCENT)
    # assimilated instrumental/translative: stem-final consonant doubled
    # + al/el (hazakkal, seggel) -> strip the ending and undouble
    if len(w) > 5 and w.endswith(("al", "el")) and len(w) >= 4 \
            and w[-3] == w[-4] and w[-3] not in "aeiou":
        w = w[:-3]
    w = _strip_longest(w, _HU_CASE, 3)
    w = _strip_longest(w, _HU_POSS, 3)
    w = _strip_longest(w, _HU_PLURAL, 3)
    return w


# =========================== Turkish (light) ===========================


def turkish_lower(text: str) -> str:
    """TurkishLowerCaseFilter semantics: dotted capital İ lowercases to i,
    dotless capital I to ı (must happen BEFORE str.lower(), which would
    produce i + combining-dot for İ)."""
    return text.replace("İ", "i").replace("I", "ı").lower()


_TR_SUFFIXES = ("ımız", "imiz", "umuz", "ümüz", "ınız", "iniz", "unuz",
                "ünüz", "ları", "leri", "ndan", "nden", "lar", "ler",
                "dan", "den", "tan", "ten", "nda", "nde", "yla", "yle",
                "nın", "nin", "nun", "nün", "sı", "si", "su", "sü",
                "ın", "in", "un", "ün", "ım", "im", "um", "üm", "da",
                "de", "ta", "te", "la", "le", "ya", "ye", "yı", "yi",
                "yu", "yü", "a", "e", "ı", "i", "u", "ü", "n")


def turkish_stem(word: str) -> str:
    """Light Turkish stemmer: iterative removal of the most frequent
    nominal inflection suffixes (plural, possessive, case) in both vowel
    harmonies, 3-char stem guard, max 3 passes. The reference chain uses
    Snowball Turkish; this is the documented light substitute — the
    apostrophe filter + Turkish-aware lowercasing parts of the chain are
    exact."""
    w = word
    for _ in range(3):
        nxt = _strip_longest(w, _TR_SUFFIXES, 3)
        if nxt == w:
            break
        w = nxt
    return w


# =========================== Greek (light) ===========================

_EL_FOLD = str.maketrans("άέήίόύώϊϋΐΰς", "αεηιουωιυιυσ")

_EL_SUFFIXES = ("ιουσ", "ουσαν", "ουσεσ", "ουμε", "ουνε", "ειτε", "ουσα",
                "ματα", "ματοσ", "ονταν", "εται", "ουν", "ουσ", "ων",
                "εισ", "ησ", "ασ", "οσ", "ου", "οι", "εσ", "α", "η", "ο",
                "ι", "ε", "υ", "ω")


def greek_fold(text: str) -> str:
    """GreekLowerCaseFilter analog: lowercase, strip tonos/dialytika,
    normalize final sigma."""
    return text.lower().translate(_EL_FOLD)


def greek_stem(word: str) -> str:
    """Light Greek stemmer: case-ending removal over the folded form with
    a 3-char stem guard — the inflectional core of the published Greek
    stemmer (Ntais 2006) without its exception tables."""
    return _strip_longest(greek_fold(word), _EL_SUFFIXES, 3)


# =========================== Hindi (light) ===========================

_HI_NUKTA = {
    # BOTH Unicode forms of each nukta consonant map to the base
    # (HindiNormalizer): decomposed base+U+093C pairs AND the precomposed
    # codepoints U+0958-U+095F / U+0929 / U+0931 / U+0934
    **{chr(b) + "\u093c": chr(b) for b in
       (0x0915, 0x0916, 0x0917, 0x091C, 0x0921, 0x0922, 0x092B, 0x092F,
        0x0928, 0x0930, 0x0933)},
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095a": "\u0917",
    "\u095b": "\u091c", "\u095c": "\u0921", "\u095d": "\u0922",
    "\u095e": "\u092b", "\u095f": "\u092f", "\u0929": "\u0928",
    "\u0931": "\u0930", "\u0934": "\u0933",
}


def hindi_normalize(word: str) -> str:
    """HindiNormalizer analog: drop ZWJ/ZWNJ, decompose nukta consonants to
    their base forms, chandrabindu -> anusvara."""
    w = word.replace("‌", "").replace("‍", "")
    for k, v in _HI_NUKTA.items():
        w = w.replace(k, v)
    return w.replace("ँ", "ं")


_HI_SUFFIXES = (
    "ाइयाँ", "ाइयों", "ाइयां",
    "ियाँ", "ियों", "ियां", "ाएं", "ाओं", "ुओं", "ुएं", "ुआं",
    "ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
    "ाने", "ाना", "ाते", "ाती", "ाता",
    "कर", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", "ती",
    "ता", "ाँ", "ां", "ों", "ें",
    "ो", "े", "ू", "ु", "ी", "ि", "ा",
)


def hindi_stem(word: str) -> str:
    """Lightweight Hindi stemmer (Ramanathan & Rao 2003): strip the longest
    matching suffix from the published ending list, one pass."""
    return _strip_longest(hindi_normalize(word), _HI_SUFFIXES, 1)


# =========================== Czech (light) ===========================

_CS_CASE_5 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ete",
              "eti", "iho", "ího", "ími", "imu", "ách", "ata", "aty",
              "ých", "ama", "ami", "ové", "ovi", "ými")
_CS_CASE_4 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CS_VOWEL_END = "aáeéěiíoóuůúyý"


def _cs_palatalize(w: str) -> str:
    if w.endswith(("čtě", "čti", "čtí")):
        return w[:-3] + "ck"
    if w.endswith(("ště", "šti", "ští")):
        return w[:-3] + "sk"
    if w.endswith(("ci", "ce", "či", "če", "cí", "čí")):
        return w[:-2] + "k"
    if w.endswith(("zi", "ze", "ži", "že", "zí", "ží")):
        return w[:-2] + "h"
    return w[:-1] if w else w


def czech_stem(word: str) -> str:
    """Light Czech stemmer (Dolamic & Savoy 2009): length-guarded case
    ending removal, possessive removal, then palatalization recoding of
    the exposed stem final."""
    w = word.lower()
    # remove case
    if len(w) > 7 and w.endswith("atech"):
        w = w[:-5]
    elif len(w) > 6 and (w.endswith("ětem") or w.endswith("etem")
                         or w.endswith("atům")):
        w = w[:-4]
    elif len(w) > 5 and w.endswith(_CS_CASE_5):
        if w[-3] in "eiíě":
            # keep the palatal vowel, then recode (digraph -> k/h/ck/sk,
            # else the kept vowel is dropped)
            w = _cs_palatalize(w[:-2])
        else:
            w = w[:-3]
    elif len(w) > 4 and w.endswith(_CS_CASE_4):
        w = w[:-2]
    elif len(w) > 3 and w[-1] in _CS_VOWEL_END:
        w = w[:-1]
    # remove possessives
    if len(w) > 5:
        if w.endswith(("ov", "ův")):
            w = w[:-2]
        elif w.endswith("in"):
            w = w[:-1]
    return w


# =========================== Bulgarian (light) ===========================

_BG_ARTICLES = ("ият", "ът", "та", "то", "те", "ят")
_BG_PLURAL = ("ове", "еве", "ища", "овци", "ета", "ия")


def bulgarian_stem(word: str) -> str:
    """Light Bulgarian stemmer (Savoy's CLEF family / the BulgarianStemmer
    shape): strip the definite article, then plural endings, then a final
    vowel, with a 3-char stem guard. Condensed rule list."""
    w = word.lower()
    w = _strip_longest(w, _BG_ARTICLES, 3)
    w = _strip_longest(w, _BG_PLURAL, 3)
    if len(w) > 3 and w[-1] in "аеиоуя":
        w = w[:-1]
    return w


# =========================== Latvian (light) ===========================

_LV_VOWELS = "aāeēiīouū"
_LV_SUFFIXES = ("ajiem", "ajai", "ajam", "ajām", "ajos", "ajās", "iem",
                "ajā", "ais", "ai", "ei", "am", "ām", "ēm", "īm", "im",
                "um", "us", "os", "ās", "as", "es", "ij", "ie", "ē", "e",
                "a", "i", "u", "o", "s", "š")


def latvian_stem(word: str) -> str:
    """Light Latvian stemmer (the Dolamic & Savoy approach behind Lucene's
    LatvianStemmer): strip the longest declension ending such that the
    stem keeps >= 3 chars and at least one vowel."""
    w = word.lower()
    best = None
    for s in _LV_SUFFIXES:
        stem_len = len(w) - len(s)
        if stem_len >= 3 and w.endswith(s) \
                and any(c in _LV_VOWELS for c in w[:stem_len]) \
                and (best is None or len(s) > len(best)):
            best = s
    return w[: len(w) - len(best)] if best else w


# =========================== Indonesian (Tala) ===========================

_ID_PARTICLES = ("kah", "lah", "tah", "pun")
_ID_POSSESSIVE = ("ku", "mu", "nya")
_ID_PREFIX1 = ("meng", "meny", "men", "mem", "me", "peng", "peny", "pen",
               "pem", "di", "ter", "ke")
_ID_PREFIX2 = ("ber", "per", "be", "pe")
_ID_SUFFIX = ("kan", "an", "i")


def indonesian_stem(word: str) -> str:
    """Indonesian stemmer (Tala 2003, after Nazief & Adriani): remove
    inflectional particles and possessive pronouns, then derivational
    prefixes (two orders) and suffixes, 3-char stem guard. Without the
    recoding rules of the full algorithm."""
    w = word.lower()
    w = _strip_longest(w, _ID_PARTICLES, 3)
    w = _strip_longest(w, _ID_POSSESSIVE, 3)
    for p in _ID_PREFIX1:
        if w.startswith(p) and len(w) - len(p) >= 3:
            w = w[len(p):]
            break
    else:
        for p in _ID_PREFIX2:
            if w.startswith(p) and len(w) - len(p) >= 3:
                w = w[len(p):]
                break
    w = _strip_longest(w, _ID_SUFFIX, 3)
    return w


# =========================== Sorani Kurdish ===========================


def sorani_normalize(word: str) -> str:
    """SoraniNormalizer analog: Arabic-script letter unification (yeh and
    kaf variants), ZWNJ and tatweel removal, trailing heh -> ae."""
    w = (word.replace("‌", "").replace("ـ", "")
         .replace("ي", "ی").replace("ى", "ی").replace("ك", "ک"))
    if w.endswith("ه"):
        w = w[:-1] + "ە"
    return w


_CKB_SUFFIXES = ("ەکانی", "ەکانێ", "ەکان", "ەکەی", "ەکە", "کانی", "کان",
                 "ێکی", "ێک", "یەکی", "یەک", "ەوە", "تان", "مان", "یش",
                 "ان", "ین", "ی", "ە")


def sorani_stem(word: str) -> str:
    """Sorani Kurdish stemmer (the SoraniStemmer suffix family): normalize,
    then strip the longest definite/indefinite/plural/izafe ending with a
    2-char stem guard."""
    return _strip_longest(sorani_normalize(word), _CKB_SUFFIXES, 2)


# =========================== Armenian (light) ===========================

_HY_SUFFIXES = ("ություններից", "ությունների", "ություններ", "ությունը",
                "ությամբ", "ության", "ություն", "ներից", "ներում", "ներին",
                "ներով", "երից", "երում", "երին", "երով", "ները", "ներն",
                "երը", "յին", "ում", "ով", "ից", "ին", "ան", "ը", "յի",
                "ի", "ու")
_HY_SUFFIXES = tuple(s for s in _HY_SUFFIXES if s != "ան")

_HY_VOWELS = "աեէըիոօ"  # ւ excluded: it closes the ու digraph (տուն)


def armenian_stem(word: str) -> str:
    """Light Armenian stemmer (the Snowball-Armenian ending families:
    -ություն abstract nouns, case endings, articles) as a condensed
    longest-suffix pass with a 3-char stem guard. The -ն article is
    stripped only after a vowel (երեխան -> երեխա) — after a consonant or
    ւ it is part of the root (տուն)."""
    w = _strip_longest(word.lower(), _HY_SUFFIXES, 3)
    if len(w) > 3 and w.endswith("ն") and w[-2] in _HY_VOWELS:
        w = w[:-1]
    return w


# =========================== Basque (light) ===========================

_EU_SUFFIXES = ("arentzat", "entzat", "arekin", "ekin", "aren", "agatik",
                "etako", "etatik", "etara", "ari", "ari", "tik", "ean",
                "era", "eko", "etan", "ak", "ek", "en", "an", "ko", "ra",
                "az", "ez", "ei", "a")


def basque_stem(word: str) -> str:
    """Light Basque stemmer (the Snowball-Basque determiner/case ending
    families: absolutive/ergative -a/-ak/-ek, genitive -en/-aren,
    locatives -an/-etan/-eko, ablative -tik) condensed to one
    longest-suffix pass with a 3-char stem guard."""
    return _strip_longest(word.lower(), _EU_SUFFIXES, 3)


# =========================== Bengali (light) ===========================

_BN_NUKTA = {
    # decomposed base+U+09BC pairs AND precomposed U+09DC/U+09DD/U+09DF
    **{chr(b) + "\u09bc": chr(b) for b in (0x09A1, 0x09A2, 0x09AF, 0x09B0)},
    "\u09dc": "\u09a1", "\u09dd": "\u09a2", "\u09df": "\u09af",
}


def bengali_normalize(word: str) -> str:
    """BengaliNormalizer analog: ZWJ/ZWNJ removal, nukta-consonant
    decomposition to base forms, chandrabindu -> anusvara, khanda-ta ->
    ta."""
    w = word.replace("‌", "").replace("‍", "")
    for k, v in _BN_NUKTA.items():
        w = w.replace(k, v)
    w = w.replace("\u09bc", "")
    return w.replace("ঁ", "ং").replace("ৎ", "ত")


_BN_SUFFIXES = ("গুলোতে", "গুলিতে", "দেরকে", "গুলো", "গুলি", "দের", "েরা",
                "খানা", "খানি", "টিতে", "টাতে", "েদের", "রা", "কে", "ের",
                "টা", "টি", "তে", "ে", "র", "ও")


def bengali_stem(word: str) -> str:
    """Light Bengali stemmer (the BengaliStemmer suffix families:
    plural/classifier -গুলো/-টা/-টি, case -কে/-ের/-তে, genitive -র):
    normalize, then one longest-suffix pass with a 2-char stem guard."""
    return _strip_longest(bengali_normalize(word), _BN_SUFFIXES, 2)


# =========================== Catalan (light) ===========================

_CA_SUFFIXES = ("aments", "ament", "acions", "ació", "ments", "ment",
                "ables", "able", "ibles", "ible", "istes", "ista", "ismes",
                "isme", "cions", "ció", "dors", "dora", "dores", "dor",
                "ança", "ances", "íssim", "íssima", "ívol", "itats",
                "itat", "ives", "iva", "ius", "iu", "oses", "osa", "osos",
                "ós",
                # verb endings (imperfect/gerund/participle/present)
                "aven", "ava", "aven", "ant", "ada", "ades", "ats", "at",
                "ar", "er", "ir", "en",
                "es", "s", "a", "e", "í", "ï", "o")


def catalan_stem(word: str) -> str:
    """Light Catalan stemmer (the Snowball-Catalan standard-suffix
    families: -ment adverbs, -ació/-ció nominalizations, -able/-ible,
    -ista/-isme, -dor agents, plural -s/-es) condensed to one
    longest-suffix pass with a 3-char stem guard; -ns plural restored
    to -n (cançons -> cançon -> cançó is out of scope)."""
    w = word.lower()
    if len(w) > 5 and w.endswith("ns"):
        return w[:-1]
    return _strip_longest(w, _CA_SUFFIXES, 3)


# =========================== Estonian (light) ===========================

_ET_SUFFIXES = ("dele", "dest", "dega", "deks", "deni", "dena", "tele",
                "test", "tega", "teks", "teni", "tena", "sse", "des",
                "tes", "ste", "le", "lt", "st", "ga", "ks", "ni", "na",
                "ta", "id", "te", "de", "l", "s", "t", "d", "e")


def estonian_stem(word: str) -> str:
    """Light Estonian stemmer: the 14-case agglutinative ending set
    (allative -le, ablative -lt, elative -st, comitative -ga, translative
    -ks, terminative -ni, essive -na, abessive -ta, plural -d/-te/-de)
    as one longest-suffix pass with a 3-char stem guard."""
    return _strip_longest(word.lower(), _ET_SUFFIXES, 3)


# =========================== Galician (light) ===========================

_GL_SUFFIXES = ("amentos", "amento", "mentos", "mento", "acións", "ación",
                "cións", "ción", "sións", "sión", "idades", "idade",
                "ismos", "ismo", "istas", "ista", "ables", "able", "ibles",
                "ible", "eiras", "eira", "eiros", "eiro", "osas", "osa",
                "osos", "oso", "ezas", "eza", "mente",
                # verb endings (imperfect/gerund/participle/infinitive)
                "aban", "aba", "ando", "endo", "indo", "ados", "adas",
                "ado", "ada", "idos", "idas", "ido", "ida", "ar", "er",
                "ir", "ou", "eu", "iu", "an", "en",
                "es", "as", "os", "a", "o", "e", "ás", "ón")


def galician_stem(word: str) -> str:
    """Light Galician stemmer (the RSLP-derived family behind Lucene's
    GalicianStemmer, Otero et al.): plural -ns -> -n, -les -> -l, then
    one longest-suffix pass over the derivational/number endings with a
    3-char stem guard."""
    w = word.lower()
    # plural recoding falls through into the suffix pass so singular and
    # plural land on the same stem (cancións -> canción -> can == canción)
    if len(w) > 4 and w.endswith("ns"):
        w = w[:-1]
    elif len(w) > 5 and w.endswith("les"):
        w = w[:-2]
    elif len(w) > 5 and w.endswith(("ais", "eis", "ois")):
        w = w[:-2] + "l"
    return _strip_longest(w, _GL_SUFFIXES, 3)


# =========================== Irish ===========================

_GA_SUFFIXES = ("íochta", "aíocht", "íocht", "eachta", "achta", "eacht",
                "acht", "eanna", "anna", "acha", "eacha", "ógaí", "óga",
                "aithe", "ithe", "í", "e", "a")


def irish_stem(word: str) -> str:
    """Irish stemmer (the Snowball-Irish shape): strip initial mutations
    exactly — h/n/t prefix before a vowel (with or without hyphen),
    eclipsis clusters mb/gc/nd/ng/bp/dt/bhf, lenition ts —
    then one longest-suffix pass over the plural/abstract endings with a
    3-char stem guard."""
    w = word.lower()
    # initial mutations (exact, per the published algorithm): hyphenated
    # n-/t-/h- prefixes; unhyphenated h-prefix ("na héireann"); eclipsis
    # clusters; "ts". Unhyphenated t/n + vowel is NOT stripped — modern
    # orthography always hyphenates those, and plain words (tithe, nead)
    # begin that way.
    if w.startswith(("n-", "t-", "h-")):
        w = w[2:]
    elif len(w) > 2 and w[0] == "h" and w[1] in "aeiouáéíóú":
        w = w[1:]
    elif w.startswith("bhf"):
        w = w[2:]  # eclipsed f: bhfuil -> fuil
    elif w.startswith(("mb", "gc", "nd", "ng", "bp", "dt", "ts")):
        w = w[1:]
    return _strip_longest(w, _GA_SUFFIXES, 3)


# =========================== Lithuanian (light) ===========================

_LT_SUFFIXES = ("iausias", "iausia", "iuose", "uose", "ose", "yse", "ėse",
                "ams", "ams", "oms", "ėms", "ims", "ums", "ais", "iais",
                "omis", "ėmis", "imis", "umis", "uje", "yje", "ėje", "oje",
                "ioje", "as", "is", "ys", "us", "ia", "io", "iu", "ių",
                "ai", "ei", "ui", "ės", "ės", "ą", "ę", "į", "ų", "ė",
                "o", "a", "e", "i", "u", "y", "s")


def lithuanian_stem(word: str) -> str:
    """Light Lithuanian stemmer (the Snowball-Lithuanian declension
    ending families: nominative -as/-is/-ys/-us, locatives -e/-uose/-yje,
    instrumentals -ais/-omis, accusative nasals -ą/-ę/-į/-ų) condensed to
    one longest-suffix pass with a 3-char stem guard."""
    return _strip_longest(word.lower(), _LT_SUFFIXES, 3)


LIGHT_STEMMERS = {
    "hungarian": hungarian_stem,
    "turkish": turkish_stem,
    "greek": greek_stem,
    "hindi": hindi_stem,
    "czech": czech_stem,
    "bulgarian": bulgarian_stem,
    "latvian": latvian_stem,
    "indonesian": indonesian_stem,
    "sorani": sorani_stem,
    "armenian": armenian_stem,
    "basque": basque_stem,
    "bengali": bengali_stem,
    "catalan": catalan_stem,
    "estonian": estonian_stem,
    "galician": galician_stem,
    "irish": irish_stem,
    "lithuanian": lithuanian_stem,
}


# =========================== Polish (light) ===========================
# The reference ships Polish via the stempel plugin (statistical Egothor
# stemmer trained on a dictionary — plugins/analysis-stempel); this is the
# documented substitute: Savoy's CLEF-family light Polish stemmer shape
# (condensed rule list — case/plural endings then diminutive suffixes).

_PL_CASE = ("owie", "ach", "ami", "iej", "ego", "emu", "ymi", "imi",
            "ych", "ich", "owi", "om", "ów", "ym", "im", "ej",
            "ą", "ę", "y", "i", "e", "a", "o", "u")
_PL_DIM = ("ek", "ik")


def polish_stem(word: str) -> str:
    """Light Polish stemmer (condensed CLEF-family rule list): longest
    case/plural ending with a 3-char stem guard, then diminutives."""
    w = word.lower()
    w = _strip_longest(w, _PL_CASE, 3)
    w = _strip_longest(w, _PL_DIM, 3)
    return w


# =========================== Ukrainian (light) ===========================
# The reference's ukrainian plugin lemmatizes via a morfologik dictionary
# (plugins/analysis-ukrainian); documented substitute: reflexive-particle
# removal then a longest case-ending strip (condensed rule list).

_UK_REFLEX = ("ся", "сь")
_UK_CASE = ("ами", "ові", "ого", "ому", "ими", "ях", "ям", "ах", "ею",
            "ою", "ій", "ий", "их", "іх", "ів",
            "ї", "ю", "я", "і", "и", "а", "о", "у", "е", "ь")


def ukrainian_stem(word: str) -> str:
    """Light Ukrainian stemmer (condensed rule list): strip the reflexive
    particle, then the longest case ending, 3-char stem guard."""
    w = word.lower()
    w = _strip_longest(w, _UK_REFLEX, 3)
    w = _strip_longest(w, _UK_CASE, 3)
    return w


LIGHT_STEMMERS["polish"] = polish_stem
LIGHT_STEMMERS["ukrainian"] = ukrainian_stem


# =========================== Korean (light) ===========================
# The reference ships Korean via the nori plugin (mecab-ko dictionary
# decompounding — plugins/analysis-nori); documented substitute: Hangul
# words are space-separated eojeol, so stripping the attached particle
# (josa) / verb-ending suffix recovers the content stem.

_KO_PARTICLES = ("들은", "들이", "에서", "으로", "에게", "까지", "부터",
                 "처럼", "았다", "었다", "들", "은", "는", "이", "가",
                 "을", "를", "의", "에", "와", "과", "도", "로", "만",
                 "다")


def korean_stem(word: str) -> str:
    """Light Korean stemmer (condensed josa/ending rule list): strip the
    longest attached particle or verb ending, 1-syllable stem guard."""
    return _strip_longest(word.lower(), _KO_PARTICLES, 1)


LIGHT_STEMMERS["korean"] = korean_stem


# ====================== Brazilian Portuguese (RSLP) ======================
# Orengo & Huyck 2001, "A Stemming Algorithm for the Portuguese Language"
# (the published RSLP algorithm the reference's BrazilianStemmer follows —
# org.apache.lucene.analysis.br.BrazilianStemmer; implemented here from the
# paper's step flowchart and rule tables, NOT ported from Lucene). Each
# rule is (suffix, min_stem_len, replacement, full-word exceptions); steps
# apply the FIRST matching rule in table order. Step flow: plural (only if
# the word ends in s) -> feminine (only if it ends in a/ã) -> adverb ->
# augmentative/diminutive -> noun; if no noun rule fired, verb; if no verb
# rule fired, final-vowel removal; accents stripped last.

_BR_PLURAL = (
    ("ns", 1, "m", ()),
    ("ões", 3, "ão", ()),
    ("ães", 1, "ão", ("mães",)),
    ("ais", 1, "al", ("cais", "mais")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ()),
    ("is", 2, "il", ("lápis", "cais", "mais", "crúcis", "biquínis",
                     "pois", "depois", "dois", "leis")),
    ("les", 3, "l", ()),
    ("res", 3, "r", ()),
    ("s", 2, "", ("aliás", "pires", "lápis", "cais", "mais", "mas",
                  "menos", "férias", "fezes", "pêsames", "crúcis",
                  "gás", "atrás", "moisés", "através", "convés",
                  "ês", "país", "após", "ambas", "ambos", "messias")),
)

_BR_FEMININE = (
    ("ona", 3, "ão", ("abandona", "lona", "iona", "cortisona",
                      "monótona", "maratona", "acetona", "detona",
                      "carona")),
    ("ora", 3, "or", ()),
    ("na", 4, "no", ("carona", "abandona", "lona", "iona", "cortisona",
                     "monótona", "maratona", "acetona", "detona",
                     "guiana", "campana", "grana", "caravana", "banana",
                     "paisana")),
    ("inha", 3, "inho", ("rainha", "linha", "minha")),
    ("esa", 3, "ês", ("mesa", "obesa", "princesa", "turquesa", "ilesa",
                      "pesa", "presa")),
    ("osa", 3, "oso", ("mucosa", "prosa")),
    ("íaca", 3, "íaco", ()),
    ("ica", 3, "ico", ("dica",)),
    ("ada", 2, "ado", ("pitada",)),
    ("ida", 3, "ido", ("vida",)),
    ("ída", 3, "ido", ("recaída", "saída", "dormida")),
    ("eira", 3, "eiro", ("beira", "cadeira", "frigideira", "bandeira",
                         "feira", "capoeira", "barreira", "fronteira",
                         "besteira", "poeira")),
    ("ã", 2, "ão", ("amanhã", "arapuã", "fã", "divã")),
)

_BR_ADVERB = (("mente", 4, "", ("experimente",)),)

_BR_AUGMENT = (
    ("díssimo", 5, "", ()),
    ("abilíssimo", 5, "", ()),
    ("íssimo", 3, "", ()),
    ("ésimo", 3, "", ()),
    ("érrimo", 4, "", ()),
    ("zinho", 2, "", ()),
    ("quinho", 4, "c", ()),
    ("uinho", 4, "", ()),
    ("adinho", 3, "", ()),
    ("inho", 3, "", ("caminho", "cominho")),
    ("alhão", 4, "", ()),
    ("uça", 4, "", ()),
    ("aço", 4, "", ("antebraço",)),
    ("aça", 4, "", ()),
    ("adão", 4, "", ()),
    ("idão", 4, "", ()),
    ("ázio", 3, "", ("topázio",)),
    ("arraz", 4, "", ()),
    ("zarrão", 3, "", ()),
    ("arrão", 4, "", ()),
    ("arra", 3, "", ()),
    ("zão", 2, "", ("coalizão",)),
    ("ão", 3, "", ("camarão", "chimarrão", "canção", "coração",
                   "embrião", "grotão", "glutão", "ficção", "fogão",
                   "feição", "furacão", "gamão", "lampião", "leão",
                   "macacão", "nação", "órfão", "orgão", "patrão",
                   "portão", "quinhão", "rincão", "tração", "falcão",
                   "espião", "mamão", "folião", "cordão", "aptidão",
                   "campeão", "colchão", "limão", "leilão", "melão",
                   "barão", "milhão", "bilhão", "fusão", "cristão",
                   "ilusão", "capitão", "estação", "senão")),
)

_BR_NOUN = (
    ("encialista", 4, "", ()),
    ("alista", 5, "", ()),
    ("agem", 3, "", ("coragem", "chantagem", "vantagem", "carruagem")),
    ("iamento", 4, "", ()),
    ("amento", 3, "", ("firmamento", "fundamento", "departamento")),
    ("imento", 3, "", ()),
    ("mento", 6, "", ("firmamento", "elemento", "complemento",
                      "instrumento", "departamento")),
    ("alizado", 4, "", ()),
    ("atizado", 4, "", ()),
    ("izado", 5, "", ("organizado", "pulverizado")),
    ("ativo", 4, "", ("pejorativo", "relativo")),
    ("tivo", 4, "", ("relativo",)),
    ("ivo", 4, "", ("passivo", "possessivo", "pejorativo", "positivo")),
    ("ado", 2, "", ("grado",)),
    ("ido", 3, "", ("cândido", "consolido", "rápido", "decido",
                    "tímido", "duvido", "marido")),
    ("ador", 3, "", ()),
    ("edor", 3, "", ()),
    ("idor", 4, "", ("ouvidor",)),
    ("atoria", 5, "", ()),
    ("tor", 3, "", ("benfeitor", "leitor", "editor", "pastor",
                    "produtor", "promotor", "consultor")),
    ("or", 2, "", ("motor", "melhor", "redor", "rigor", "sensor",
                   "tambor", "tumor", "assessor", "benfeitor",
                   "pastor", "terior", "favor", "autor")),
    ("abilidade", 5, "", ()),
    ("icionista", 4, "", ()),
    ("cionista", 5, "", ()),
    ("ional", 4, "", ()),
    ("ência", 3, "", ()),
    ("ância", 4, "", ("ambulância",)),
    ("edouro", 3, "", ()),
    ("queiro", 3, "c", ()),
    ("adeiro", 4, "", ("desfiladeiro",)),
    ("eiro", 3, "", ("desfiladeiro", "pioneiro", "mosteiro")),
    ("uoso", 3, "", ()),
    ("oso", 3, "", ("precioso",)),
    ("alizaç", 5, "", ()),
    ("izaç", 5, "", ("organizaç",)),
    ("aç", 3, "", ("equaç", "relaç")),
    ("iç", 3, "", ("eleiç",)),
    ("ário", 3, "", ("voluntário", "salário", "aniversário", "diário",
                     "lionário", "armário")),
    ("ério", 6, "", ()),
    ("ês", 4, "", ()),
    ("eza", 3, "", ()),
    ("ez", 4, "", ()),
    ("esco", 4, "", ()),
    ("ante", 2, "", ("gigante", "elefante", "adiante", "possante",
                     "instante", "restaurante")),
    ("ástico", 4, "", ("eclesiástico",)),
    ("ático", 3, "", ()),
    ("ico", 4, "", ("tico", "público", "explico")),
    ("ividade", 5, "", ()),
    ("idade", 4, "", ("autoridade", "comunidade")),
    ("oria", 4, "", ("categoria",)),
    ("encial", 5, "", ()),
    ("ista", 4, "", ()),
    ("ice", 4, "", ("cúmplice",)),
    ("íaco", 3, "", ()),
    ("ente", 4, "", ("freqüente", "alimente", "acrescente",
                     "permanente", "oriente", "aparente")),
    ("inal", 3, "", ()),
    ("ano", 4, "", ()),
    ("ável", 2, "", ("afável", "razoável", "potável", "vulnerável")),
    ("ível", 3, "", ("possível",)),
    ("ura", 4, "", ("imatura", "acupuntura", "costura")),
    ("ual", 3, "", ("bissexual", "virtual", "visual", "pontual")),
    ("ial", 3, "", ()),
    ("al", 4, "", ("afinal", "animal", "estatal", "bissexual",
                   "desleal", "fiscal", "formal", "pessoal", "liberal",
                   "postal", "virtual", "visual", "pontual", "sideral",
                   "sucursal")),
    ("ismo", 3, "", ("cinismo",)),
)

_BR_VERB = (
    ("aríamo", 2, "", ()), ("ássemo", 2, "", ()), ("eríamo", 2, "", ()),
    ("êssemo", 2, "", ()), ("iríamo", 3, "", ()), ("íssemo", 3, "", ()),
    ("áramo", 2, "", ()), ("árei", 2, "", ()), ("aremo", 2, "", ()),
    ("ariam", 2, "", ()), ("aríei", 2, "", ()), ("ássei", 2, "", ()),
    ("assem", 2, "", ()), ("ávamo", 2, "", ()), ("êramo", 3, "", ()),
    ("eremo", 3, "", ()), ("eriam", 3, "", ()), ("eríei", 3, "", ()),
    ("êssei", 3, "", ()), ("essem", 3, "", ()), ("íramo", 3, "", ()),
    ("iremo", 3, "", ()), ("iriam", 3, "", ()), ("iríei", 3, "", ()),
    ("íssei", 3, "", ()), ("issem", 3, "", ()), ("ando", 2, "", ()),
    ("endo", 3, "", ()), ("indo", 3, "", ()), ("ondo", 3, "", ()),
    ("aram", 2, "", ()), ("arão", 2, "", ()), ("arde", 2, "", ()),
    ("arei", 2, "", ()), ("arem", 2, "", ()), ("aria", 2, "", ()),
    ("armo", 2, "", ()), ("asse", 2, "", ()), ("aste", 2, "", ()),
    ("avam", 2, "", ("agravam",)), ("ávei", 2, "", ()),
    ("eram", 3, "", ()), ("erão", 3, "", ()), ("erde", 3, "", ()),
    ("erei", 3, "", ()), ("erem", 3, "", ()), ("eria", 3, "", ()),
    ("ermo", 3, "", ()), ("esse", 3, "", ()),
    ("este", 3, "", ("faroeste", "agreste")),
    ("íamo", 3, "", ()), ("iram", 3, "", ()), ("íram", 3, "", ()),
    ("irão", 2, "", ()), ("irde", 2, "", ()),
    ("irei", 3, "", ("admirei",)), ("irem", 3, "", ("adquirem",)),
    ("iria", 3, "", ()), ("irmo", 3, "", ()), ("isse", 3, "", ()),
    ("iste", 4, "", ()), ("iava", 4, "", ("ampliava",)),
    ("amo", 2, "", ()), ("iona", 3, "", ()),
    ("ara", 2, "", ("arara", "prepara")), ("ará", 2, "", ("alvará",)),
    ("are", 2, "", ("prepare",)), ("ava", 2, "", ("agrava",)),
    ("emo", 2, "", ()), ("era", 3, "", ("acelera", "espera")),
    ("erá", 3, "", ()), ("ere", 3, "", ("espere",)),
    ("iam", 3, "", ("enfiam", "ampliam", "elogiam", "ensaiam")),
    ("íei", 3, "", ()),
    ("imo", 3, "", ("reprimo", "intimo", "íntimo", "nimo", "queimo",
                    "ximo")),
    ("ira", 3, "", ("fronteira", "sátira")), ("ído", 3, "", ()),
    ("irá", 3, "", ()), ("tizar", 4, "", ("alfabetizar",)),
    ("izar", 5, "", ("organizar",)),
    ("itar", 5, "", ("acreditar", "explicitar", "estreitar")),
    ("ire", 3, "", ("adquire",)), ("omo", 3, "", ()),
    ("ai", 2, "", ()), ("am", 2, "", ()),
    ("ear", 4, "", ("alardear", "nuclear")),
    ("ar", 2, "", ("azar", "bazar", "patamar")),
    ("uei", 3, "", ()), ("ei", 3, "", ()),
    ("guem", 3, "g", ()),
    ("em", 2, "", ("alem", "virgem")),
    ("er", 2, "", ("éter", "pier")),
    ("eu", 3, "", ("chapeu",)),
    ("ia", 3, "", ("estória", "fatia", "acia", "praia", "elogia",
                   "mania", "lábia", "aprecia", "polícia", "arredia",
                   "cheia", "ásia")),
    ("ir", 3, "", ("freir",)), ("iu", 3, "", ()), ("ou", 3, "", ()),
    ("i", 3, "", ()),
)

_BR_VOWEL = (("a", 3, "", ("ásia",)), ("e", 3, "", ()),
             ("o", 3, "", ("ão",)))

_BR_ACCENTS = str.maketrans("áâãàéêíóôõúüç", "aaaaeeiooouuc")


def _rslp_step(w: str, rules) -> str:
    """Apply the FIRST rule whose suffix matches with the stem-length
    guard and whose full-word exception list does not contain w."""
    for suf, mn, rep, exc in rules:
        if w.endswith(suf) and len(w) - len(suf) >= mn and w not in exc:
            return w[: len(w) - len(suf)] + rep
    return w


def brazilian_stem(word: str) -> str:
    """RSLP (Orengo & Huyck 2001) — see the table block above."""
    w = word.lower()
    if w.endswith("s"):
        w = _rslp_step(w, _BR_PLURAL)
    if w.endswith(("a", "ã")):
        w = _rslp_step(w, _BR_FEMININE)
    w = _rslp_step(w, _BR_ADVERB)
    w = _rslp_step(w, _BR_AUGMENT)
    n = _rslp_step(w, _BR_NOUN)
    if n != w:
        w = n
    else:
        v = _rslp_step(w, _BR_VERB)
        w = v if v != w else _rslp_step(w, _BR_VOWEL)
    return w.translate(_BR_ACCENTS)


LIGHT_STEMMERS["brazilian"] = brazilian_stem
