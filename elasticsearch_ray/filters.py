"""Token filters + char filters for custom analysis chains (SURVEY.md §2.2).

Mirrors the configuration surface of the reference's analysis-common module
(modules/analysis-common/.../CommonAnalysisPlugin.java:230-303 registrations):
`porter_stem` (stemmer token filter, "porter"/"english" flavor), `synonym`
(replacement form), `ngram` / `edge_ngram`, `shingle`, `asciifolding`, and the
`mapping` char filter. All are pure functions over token lists / text so they
compose inside ``map_batches`` without per-actor state.

The Porter stemmer follows the original 1980 algorithm (public domain
specification; M.F. Porter, "An algorithm for suffix stripping") — the same
algorithm behind Lucene's PorterStemFilter.
"""

from __future__ import annotations

import re
import unicodedata

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in C?(VC){m}V? form."""
    m = 0
    prev_cons = True
    started = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if not cons:
            started = True
        elif started and not prev_cons:
            m += 1
        prev_cons = cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (_is_cons(word, len(word) - 3)
            and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)
            and word[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Porter 1980 algorithm, steps 1a-5b."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0 suffix rewrites)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4 (m > 1 suffix removal)
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def stemmer_filter(tokens: list[str]) -> list[str]:
    return [porter_stem(t) for t in tokens]


def synonym_filter(tokens: list[str], mapping: dict[str, str]) -> list[str]:
    """Replacement-form synonyms (`a => b`, SynonymTokenFilterFactory's
    simplest configuration)."""
    return [mapping.get(t, t) for t in tokens]


def ngram_filter(tokens: list[str], min_gram: int = 2, max_gram: int = 3) -> list[str]:
    """`ngram` token filter: all character n-grams of each token."""
    out: list[str] = []
    for t in tokens:
        for n in range(min_gram, max_gram + 1):
            for i in range(0, len(t) - n + 1):
                out.append(t[i : i + n])
    return out


def edge_ngram_filter(tokens: list[str], min_gram: int = 2, max_gram: int = 4) -> list[str]:
    """`edge_ngram` token filter: leading n-grams of each token."""
    out: list[str] = []
    for t in tokens:
        for n in range(min_gram, min(max_gram, len(t)) + 1):
            out.append(t[:n])
    return out


def shingle_filter(tokens: list[str], min_shingle: int = 2, max_shingle: int = 2,
                   sep: str = " ", output_unigrams: bool = False) -> list[str]:
    """`shingle` token filter: word n-grams."""
    out: list[str] = list(tokens) if output_unigrams else []
    for n in range(min_shingle, max_shingle + 1):
        for i in range(0, len(tokens) - n + 1):
            out.append(sep.join(tokens[i : i + n]))
    return out


def asciifolding(text: str) -> str:
    """`asciifolding` token/char behavior: NFKD-decompose and drop combining
    marks (Latin accents fold to ASCII)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text)
        if not unicodedata.combining(c)
    )


def mapping_char_filter(text: str, mapping: dict[str, str]) -> str:
    """`mapping` char filter: literal replacements applied longest-key-first
    (MappingCharFilterFactory semantics for non-overlapping keys)."""
    for k in sorted(mapping, key=len, reverse=True):
        text = text.replace(k, mapping[k])
    return text


_STD_TOKEN_RE = re.compile(r"[a-z0-9]+")


def make_analyzer_fn(*, char_filters=(), token_filters=()):
    """CustomAnalyzer assembly (index/analysis/CustomAnalyzer.java shape):
    char_filters* -> lowercase alnum tokenizer -> token_filters*. Returns a
    plain callable usable as an Analyzer tokenize function."""

    def analyze(text: str) -> list[str]:
        for cf in char_filters:
            text = cf(text)
        tokens = _STD_TOKEN_RE.findall(text.lower())
        for tf in token_filters:
            tokens = tf(tokens)
        return tokens

    return analyze


# ---------------- tokenizers (CommonAnalysisPlugin tokenizer registrations) --


def make_pattern_tokenizer(pattern: str = r"\W+", lowercase: bool = True):
    """`pattern` tokenizer: SPLIT on the regex (Lucene PatternTokenizer
    group=-1 default)."""
    rx = re.compile(pattern)

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        return [t for t in rx.split(text) if t]

    return tokenize


def keyword_tokenizer(text: str) -> list[str]:
    """`keyword` tokenizer: the whole input as a single token."""
    return [text] if text else []


def make_char_group_tokenizer(chars: set[str] | str, lowercase: bool = True):
    """`char_group` tokenizer: split on an explicit character set."""
    cls = "[" + re.escape("".join(sorted(set(chars)))) + "]+"
    rx = re.compile(cls)

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        return [t for t in rx.split(text) if t]

    return tokenize


def make_ngram_tokenizer(min_gram: int = 2, max_gram: int = 3,
                         lowercase: bool = True):
    """`ngram` tokenizer: character n-grams over the raw text (whitespace
    kept out, like token_chars: [letter, digit])."""
    word_rx = re.compile(r"[a-z0-9]+")

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        out: list[str] = []
        for w in word_rx.findall(text):
            for n in range(min_gram, max_gram + 1):
                for i in range(0, len(w) - n + 1):
                    out.append(w[i : i + n])
        return out

    return tokenize


# ---------------- remaining CommonAnalysisPlugin filter registrations --------


def unique_filter(tokens: list[str]) -> list[str]:
    """`unique` token filter: drop duplicate tokens, keep first occurrence."""
    seen: set[str] = set()
    out = []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def trim_filter(tokens: list[str]) -> list[str]:
    """`trim` token filter."""
    return [t.strip() for t in tokens]


def length_filter(tokens: list[str], min_len: int = 0, max_len: int = 255) -> list[str]:
    """`length` token filter: keep tokens within [min, max] chars."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def limit_filter(tokens: list[str], max_token_count: int = 1) -> list[str]:
    """`limit` token filter: keep only the first N tokens."""
    return tokens[:max_token_count]


def reverse_filter(tokens: list[str]) -> list[str]:
    """`reverse` token filter (suffix-matching trick)."""
    return [t[::-1] for t in tokens]


def synonym_graph_filter(tokens: list[str],
                         mapping: dict[str, list[str]]) -> list[str]:
    """`synonym_graph` expand form: a token expands to multiple tokens
    in-stream (single-token keys; the multi-word-KEY case needs the full
    graph machinery and is out of scope)."""
    out: list[str] = []
    for t in tokens:
        out.extend(mapping.get(t, [t]))
    return out


def min_hash_tokens(tokens: list[str], num_hashes: int = 4) -> list[str]:
    """`min_hash` token filter: replace the stream with hex min-hash tokens
    (one per hash function) — the near-dup signature field shape."""
    import zlib

    if not tokens:
        return []
    out = []
    for i in range(num_hashes):
        h = min(zlib.crc32(f"{i}\x00{t}".encode()) for t in set(tokens))
        out.append(f"{h:08x}")
    return out


def fingerprint_analyze(text: str) -> list[str]:
    """`fingerprint` analyzer: lowercase, dedupe, SORT, single joined token
    (FingerprintAnalyzerProvider defaults)."""
    toks = sorted(set(_STD_TOKEN_RE.findall(asciifolding(text).lower())))
    return [" ".join(toks)] if toks else []


def letter_tokenizer(text: str) -> list[str]:
    """`letter` tokenizer: maximal runs of letters, lowercased."""
    return re.findall(r"[a-z]+", text.lower())


def path_hierarchy_tokenizer(text: str, delimiter: str = "/") -> list[str]:
    """`path_hierarchy` tokenizer: /a/b/c -> [/a, /a/b, /a/b/c]."""
    parts = [p for p in text.split(delimiter) if p]
    lead = text.startswith(delimiter)
    out = []
    cur = ""
    for p in parts:
        cur = (cur + delimiter + p) if (cur or lead) else p
        out.append(cur)
    return out


_URL_EMAIL_RE = re.compile(
    r"[a-z0-9.+-]+@[a-z0-9.-]+\.[a-z]{2,}"     # email
    r"|https?://[^\s]+"                         # url
    r"|[a-z0-9]+", re.IGNORECASE)


def uax_url_email_tokenizer(text: str) -> list[str]:
    """`uax_url_email`-style tokenizer: emails and URLs survive as single
    tokens; everything else splits on non-alphanumerics."""
    return [t.lower() for t in _URL_EMAIL_RE.findall(text)]


# ---- round-3d filter batch: the remaining CommonAnalysisPlugin token
# filters (CommonAnalysisPlugin.java getTokenFilters, 63 registrations).
# Same contract as above: plain list[str] -> list[str] callables usable in
# make_analyzer_fn / map_batches; factories return closures for the
# parameterized ones.


def uppercase_filter(tokens: list[str]) -> list[str]:
    """`uppercase` token filter (UpperCaseFilter)."""
    return [t.upper() for t in tokens]


def make_truncate_filter(length: int = 10):
    """`truncate` token filter (TruncateTokenFilterFactory, default 10)."""

    def truncate(tokens: list[str]) -> list[str]:
        return [t[:length] for t in tokens]

    return truncate


import unicodedata as _ud

_DECIMAL_TRANS = {
    c: ord("0") + _ud.decimal(chr(c))
    for c in range(0x10FFFF)
    if not ("0" <= chr(c) <= "9") and _ud.category(chr(c)) == "Nd"
}


def decimal_digit_filter(tokens: list[str]) -> list[str]:
    """`decimal_digit` token filter (DecimalDigitFilter): fold any Unicode
    decimal digit (Arabic-Indic, Devanagari, full-width, ...) to 0-9."""
    return [t.translate(_DECIMAL_TRANS) for t in tokens]


def apostrophe_filter(tokens: list[str]) -> list[str]:
    """`apostrophe` token filter (ApostropheFilter): drop the apostrophe
    and everything after it."""
    out = []
    for t in tokens:
        i = t.find("'")
        if i < 0:
            i = t.find("’")
        out.append(t if i < 0 else t[:i])
    return out


def remove_duplicates_filter(tokens: list[str]) -> list[str]:
    """`remove_duplicates` token filter (RemoveDuplicatesTokenFilter):
    drop a token identical to its predecessor (same-position duplicates in
    the flat-stream model)."""
    return [t for i, t in enumerate(tokens) if i == 0 or t != tokens[i - 1]]


def make_keyword_marker(keywords: set[str], stem=None):
    """`keyword_marker` + stemmer composition (KeywordMarkerFilterFactory):
    tokens in `keywords` bypass the stemmer; everything else is stemmed.
    In the flat-function model the marker and the stemmer fuse into one
    filter (there is no token attribute to carry the flag)."""
    from .analyzer import REGISTRY

    stem = stem or porter_stem

    def keyword_marker(tokens: list[str]) -> list[str]:
        return [t if t in keywords else stem(t) for t in tokens]

    return keyword_marker


def make_stemmer_override(overrides: dict[str, str], stem=None):
    """`stemmer_override` token filter (StemmerOverrideTokenFilterFactory):
    dictionary stems win; the algorithmic stemmer handles the rest."""
    stem = stem or porter_stem

    def stemmer_override(tokens: list[str]) -> list[str]:
        return [overrides.get(t) or stem(t) for t in tokens]

    return stemmer_override


def make_keep_filter(keep_words: set[str]):
    """`keep` token filter (KeepWordFilterFactory): keep only listed words."""

    def keep(tokens: list[str]) -> list[str]:
        return [t for t in tokens if t in keep_words]

    return keep


def make_keep_types_filter(types: set[str], mode: str = "include"):
    """`keep_types` token filter (KeepTypesFilterFactory). The flat model
    has no lexer-assigned types; the standard tokenizer's two types are
    derived: '<NUM>' for all-digit tokens, '<ALPHANUM>' otherwise."""

    def _type(t: str) -> str:
        return "<NUM>" if t.isdigit() else "<ALPHANUM>"

    def keep_types(tokens: list[str]) -> list[str]:
        if mode == "include":
            return [t for t in tokens if _type(t) in types]
        return [t for t in tokens if _type(t) not in types]

    return keep_types


def make_pattern_capture(patterns: list[str], preserve_original: bool = True):
    """`pattern_capture` token filter (PatternCaptureGroupTokenFilter):
    emit every capture group of every pattern (plus the original)."""
    import re as _re

    compiled = [_re.compile(p) for p in patterns]

    def pattern_capture(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            if preserve_original:
                out.append(t)
            for rx in compiled:
                for m in rx.finditer(t):
                    out.extend(g for g in m.groups() if g and g != t)
        return out

    return pattern_capture


def make_pattern_replace_filter(pattern: str, replacement: str = ""):
    """`pattern_replace` TOKEN filter (PatternReplaceTokenFilterFactory) —
    the char-filter form is mapping_char_filter/make_analyzer_fn's
    char_filters."""
    import re as _re

    rx = _re.compile(pattern)

    def pattern_replace(tokens: list[str]) -> list[str]:
        return [rx.sub(replacement, t) for t in tokens]

    return pattern_replace


def make_common_grams_filter(common_words: set[str],
                             query_mode: bool = False):
    """`common_grams` token filter (CommonGramsFilter): emit a word_word
    bigram wherever a common word adjoins another token; in query_mode
    the common unigrams themselves are dropped."""

    def common_grams(tokens: list[str]) -> list[str]:
        out = []
        for i, t in enumerate(tokens):
            is_common = t in common_words
            nxt = tokens[i + 1] if i + 1 < len(tokens) else None
            if not (query_mode and is_common):
                out.append(t)
            if nxt is not None and (is_common or nxt in common_words):
                out.append(f"{t}_{nxt}")
        return out

    return common_grams


def make_condition_filter(predicate, inner):
    """`condition` token filter (ScriptedConditionTokenFilter): apply
    `inner` only to tokens where `predicate` holds."""

    def condition(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            out.extend(inner([t]) if predicate(t) else [t])
        return out

    return condition


def make_multiplexer_filter(filters: list, preserve_original: bool = True):
    """`multiplexer` token filter (MultiplexerTokenFilterFactory): run each
    branch filter at the same position, dedup identical outputs."""

    def multiplexer(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            seen = set()
            if preserve_original:
                out.append(t)
                seen.add(t)
            for f in filters:
                for r in f([t]):
                    if r not in seen:
                        seen.add(r)
                        out.append(r)
        return out

    return multiplexer


def make_predicate_filter(predicate):
    """`predicate_token_filter` (ScriptedPredicateTokenFilter): keep tokens
    where the predicate holds."""

    def predicate_filter(tokens: list[str]) -> list[str]:
        return [t for t in tokens if predicate(t)]

    return predicate_filter


_SCANDI_FOLD = str.maketrans({"å": "a", "ä": "a", "æ": "a", "ö": "o",
                              "ø": "o", "Å": "A", "Ä": "A", "Æ": "A",
                              "Ö": "O", "Ø": "O"})


def scandinavian_folding_filter(tokens: list[str]) -> list[str]:
    """`scandinavian_folding` (ScandinavianFoldingFilter): å/ä/æ -> a,
    ö/ø -> o (plus aa/ae/ao/oe/oo digraph collapse)."""
    out = []
    for t in tokens:
        t = t.translate(_SCANDI_FOLD)
        for dg, r in (("aa", "a"), ("ao", "a"), ("ae", "a"), ("oe", "o"),
                      ("oo", "o")):
            t = t.replace(dg, r)
        out.append(t)
    return out


_SCANDI_NORM = str.maketrans({"æ": "ä", "ø": "ö", "Æ": "Ä", "Ø": "Ö"})


def scandinavian_normalization_filter(tokens: list[str]) -> list[str]:
    """`scandinavian_normalization` (ScandinavianNormalizationFilter):
    unify the interchangeable Danish/Norwegian/Swedish spellings
    (æ -> ä, ø -> ö, ae -> ä, oe -> ö, aa -> å)."""
    out = []
    for t in tokens:
        t = t.translate(_SCANDI_NORM)
        t = t.replace("ae", "ä").replace("oe", "ö").replace("aa", "å")
        out.append(t)
    return out


_SERBIAN_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj", "е": "e",
    "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "ћ": "c", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "c",
    "џ": "dz", "ш": "s",
}


def serbian_normalization_filter(tokens: list[str]) -> list[str]:
    """`serbian_normalization` (SerbianNormalizationFilter): Cyrillic ->
    bald Latin, diacritic Latin (č/ć/š/ž/đ) -> bald Latin."""
    lat = str.maketrans({"č": "c", "ć": "c", "š": "s", "ž": "z", "đ": "dj"})
    out = []
    for t in tokens:
        t = "".join(_SERBIAN_CYR.get(c, c) for c in t.lower())
        out.append(t.translate(lat))
    return out


def german_normalization_filter(tokens: list[str]) -> list[str]:
    """`german_normalization` (GermanNormalizationFilter): ß -> ss,
    ä/ö/ü -> a/o/u, ae/oe/ue -> a/o/u (after a vowel-bearing prefix)."""
    tr = str.maketrans({"ä": "a", "ö": "o", "ü": "u"})
    out = []
    for t in tokens:
        t = t.replace("ß", "ss").translate(tr)
        for dg, r in (("ae", "a"), ("oe", "o"), ("ue", "u")):
            i = t.find(dg, 1)
            while i > 0:
                # Lucene exception: 'ue' is kept after q or a vowel
                # (quelle, statue)
                if dg == "ue" and t[i - 1] in "qaeiou":
                    i = t.find(dg, i + 1)
                    continue
                t = t[:i] + r + t[i + 2:]
                i = t.find(dg, 1)
        out.append(t)
    return out


def flatten_graph_filter(tokens: list[str]) -> list[str]:
    """`flatten_graph` (FlattenGraphFilter): identity in this engine — the
    flat-stream model never produces multi-position graph tokens, so
    indexing any filter chain is already safe."""
    return tokens


def delimited_payload_filter(tokens: list[str],
                             delimiter: str = "|") -> list[str]:
    """`delimited_payload` (DelimitedPayloadTokenFilter): strip the
    payload; payloads themselves are not indexed in this engine (the
    reference stores them per-posting; rank_feature / script fields cover
    the use cases)."""
    return [t.split(delimiter, 1)[0] for t in tokens]


def make_dictionary_decompounder(word_list: set[str], min_word_size: int = 5,
                                 min_subword_size: int = 2,
                                 max_subword_size: int = 15,
                                 only_longest_match: bool = False):
    """`dictionary_decompounder` (DictionaryCompoundWordTokenFilter): emit
    the original token plus every dictionary word found inside it. Also
    the documented substitute for `hyphenation_decompounder` (the XML
    hyphenation-pattern files the reference loads are not available;
    candidate generation differs, dictionary matching is the same)."""

    def decompound(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            out.append(t)
            if len(t) < min_word_size:
                continue
            found = []
            for i in range(len(t)):
                for j in range(i + min_subword_size,
                               min(i + max_subword_size, len(t)) + 1):
                    sub = t[i:j]
                    if sub != t and sub in word_list:
                        found.append(sub)
            if only_longest_match and found:
                found = [max(found, key=len)]
            out.extend(found)
        return out

    return decompound


def kstem_filter(tokens: list[str]) -> list[str]:
    """`kstem` (KStemFilter): the rule-driven core of Krovetz stemming —
    plural -ies/-es/-s, past -ed, -ing with e-restoration — WITHOUT the
    ~30k-entry head dictionary the real KStem consults first (not
    shipped; documented divergence). Lighter than Porter: derivational
    suffixes are left alone."""
    out = []
    for t in tokens:
        w = t
        if len(w) > 4 and w.endswith("ies"):
            w = w[:-3] + "y"
        elif len(w) > 3 and w.endswith("es") and not w.endswith("ss"):
            w = w[:-1]
            # es-plural e was epenthetic after sibilants: boxes -> box,
            # glasses -> glass, churches -> church
            if len(w) > 3 and w.endswith(("che", "she", "xe", "ze", "sse")):
                w = w[:-1]
        elif len(w) > 3 and w.endswith("s") and not w.endswith("ss") \
                and not w.endswith("us"):
            w = w[:-1]
        if len(w) > 4 and w.endswith("ing"):
            stem = w[:-3]
            if len(stem) >= 3:
                if len(stem) > 1 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
                    w = stem[:-1]
                elif stem[-1] not in "aeiou" and stem[-2:-1] in list("aeiou"):
                    w = stem + "e"
                else:
                    w = stem
        elif len(w) > 4 and w.endswith("ed"):
            stem = w[:-2]
            if len(stem) > 1 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
                w = stem[:-1]
            elif stem.endswith(("at", "iz", "us", "id")) or (
                    len(stem) >= 3 and stem[-1] not in "aeiouwxy"
                    and stem[-2] in "aeiou" and stem[-3] not in "aeiou"):
                w = stem + "e"  # CVC: hoped -> hope, not hop
            else:
                w = stem
        out.append(w)
    return out


def word_delimiter_filter(tokens: list[str]) -> list[str]:
    """`word_delimiter` (non-graph WordDelimiterFilter): same subword
    splitting as the graph form the `code` analyzer uses, flat output."""
    from .analyzer import _SUBWORD_RE

    out = []
    for t in tokens:
        out.extend(s.lower() for s in _SUBWORD_RE.findall(t))
    return out


# ---- round-3d tokenizer batch: the remaining CommonAnalysisPlugin
# tokenizer registrations (getTokenizers): classic, simple_pattern,
# simple_pattern_split, lowercase, edge_ngram tokenizer form.


def make_edge_ngram_tokenizer(min_gram: int = 1, max_gram: int = 2,
                              lowercase: bool = True):
    """`edge_ngram` TOKENIZER (EdgeNGramTokenizer, default 1-2): leading
    character n-grams of each letter/digit run."""
    word_rx = re.compile(r"[a-z0-9]+" if lowercase else r"[A-Za-z0-9]+")

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        out: list[str] = []
        for w in word_rx.findall(text):
            for n in range(min_gram, min(max_gram, len(w)) + 1):
                out.append(w[:n])
        return out

    return tokenize


def lowercase_tokenizer(text: str) -> list[str]:
    """`lowercase` tokenizer (LowerCaseTokenizer = letter tokenizer +
    lowercase in one pass)."""
    return re.findall(r"[a-z]+", text.lower())


_CLASSIC_RX = re.compile(
    r"[A-Za-z0-9]+(?:[.@&'][A-Za-z0-9]+)+"  # emails/hosts/acronyms (dotted)
    r"|[A-Za-z0-9]+")


def classic_tokenizer(text: str, lowercase: bool = True) -> list[str]:
    """`classic` tokenizer (ClassicTokenizer): English-heuristic grammar —
    keeps dotted acronyms, emails and host names as single tokens,
    splits at other punctuation. Condensed rule set of the JFlex
    grammar; behavior pinned by tests."""
    toks = _CLASSIC_RX.findall(text)
    return [t.lower() for t in toks] if lowercase else toks


def make_simple_pattern_tokenizer(pattern: str, lowercase: bool = True):
    """`simple_pattern` tokenizer (SimplePatternTokenizerFactory): the
    pattern MATCHES become the tokens."""
    rx = re.compile(pattern)

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        return [t for t in rx.findall(text) if t]

    return tokenize


def make_simple_pattern_split_tokenizer(pattern: str, lowercase: bool = True):
    """`simple_pattern_split` tokenizer (SimplePatternSplitTokenizerFactory):
    the pattern matches are the SEPARATORS."""
    rx = re.compile(pattern)

    def tokenize(text: str) -> list[str]:
        if lowercase:
            text = text.lower()
        return [t for t in rx.split(text) if t]

    return tokenize


# -- phonetic encoders (plugins/analysis-phonetic) ----------------------------
# PhoneticTokenFilterFactory registers commons-codec encoders behind the
# `phonetic` token filter (encoder: soundex/metaphone/...). Implemented from
# the published algorithms: Russell/Odell soundex with the commons-codec H/W
# rule, and Lawrence Philips' 1990 metaphone.

_SOUNDEX_MAP = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                        "01230120022455012623010202"))


def soundex(term: str) -> str:
    """American soundex, commons-codec semantics: first letter kept; H and W
    deleted outright (consonants separated only by H/W collapse together);
    adjacent equal codes collapse (including into the first letter's code);
    vowels separate; padded/truncated to letter + 3 digits."""
    letters = [c for c in term.upper() if c.isalpha()]
    if not letters:
        return ""
    first = letters[0]
    # delete H/W after the first letter (they never separate codes)
    rest = [c for c in letters[1:] if c not in "HW"]
    codes = [_SOUNDEX_MAP.get(first, "0")]
    for c in rest:
        codes.append(_SOUNDEX_MAP.get(c, "0"))
    # collapse adjacent equal codes, then drop the first letter's slot
    out = []
    for i, d in enumerate(codes):
        if i and d != codes[i - 1]:
            out.append(d)
    digits = "".join(d for d in out if d != "0")
    return (first + digits + "000")[:4]


_PH_VOWELS = "AEIOU"


def metaphone(term: str, max_len: int = 4) -> str:
    """Classic metaphone (Lawrence Philips, Computer Language 7(12), 1990),
    commons-codec rule set: 16 consonant transformations over the
    uppercased word, initial-letter exceptions (AE/GN/KN/PN/WR drop the
    first letter, X -> S, WH -> W), vowels kept only when initial."""
    word = "".join(c for c in term.upper() if c.isalpha())
    if not word:
        return ""
    # initial exceptions
    if word[:2] in ("AE", "GN", "KN", "PN", "WR"):
        word = word[1:]
    elif word[:1] == "X":
        word = "S" + word[1:]
    elif word[:2] == "WH":
        word = "W" + word[2:]
    n = len(word)
    out = []

    def ch(i):
        return word[i] if 0 <= i < n else ""

    def vow(i):
        return 0 <= i < n and word[i] in _PH_VOWELS

    i = 0
    while i < n and len(out) < max_len:
        c = word[i]
        # dedup doubled letters except C
        if c != "C" and i > 0 and ch(i - 1) == c:
            i += 1
            continue
        if c in _PH_VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and ch(i - 1) == "M"):
                out.append("B")
        elif c == "C":
            if ch(i + 1) == "I" and ch(i + 2) == "A":      # -cia-
                out.append("X")
            elif ch(i + 1) == "H":
                # -sch- hard, else ch -> X
                out.append("K" if ch(i - 1) == "S" else "X")
            elif ch(i + 1) in "IEY":
                if ch(i - 1) != "S":                        # -sci/sce/scy- drop
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if ch(i + 1) == "G" and ch(i + 2) in "EIY":    # -dge- -> J
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            # silent: -gh- with no vowel after the h (night, laugh), -gn-
            silent = (ch(i + 1) == "H" and not vow(i + 2)) or \
                     ch(i + 1) == "N"
            if ch(i + 1) == "H" and vow(i + 2):
                out.append("K")
                i += 1
            elif not silent:
                if ch(i + 1) in "EIY":
                    out.append("J")
                else:
                    out.append("K")
        elif c == "H":
            if vow(i - 1) and not vow(i + 1):
                pass                                        # silent
            elif i > 0 and ch(i - 1) in "CSPTG":
                pass                                        # part of digraph
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if ch(i - 1) != "C":
                out.append("K")
        elif c == "P":
            if ch(i + 1) == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if ch(i + 1) == "H":
                out.append("X")
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":   # -sio-/-sia-
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if ch(i + 1) == "H":
                out.append("0")                             # theta
                i += 1
            elif ch(i + 1) == "I" and ch(i + 2) in "OA":   # -tio-/-tia-
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if vow(i + 1):
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Y":
            if vow(i + 1):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


def make_phonetic_filter(encoder: str = "metaphone", replace: bool = True):
    """`phonetic` token filter (PhoneticTokenFilterFactory): encode each
    token; replace=false keeps the original token alongside the code."""
    enc = {"soundex": soundex, "metaphone": metaphone}[encoder]

    def f(tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            code = enc(t)
            if not replace and code != t:
                out.append(t)
            if code:
                out.append(code)
        return out

    return f


# -- ICU filters (plugins/analysis-icu) ---------------------------------------

def icu_normalizer(text: str) -> str:
    """`icu_normalizer` char/token filter (IcuNormalizerTokenFilterFactory,
    default mode nfkc_cf): NFKC compatibility normalization + Unicode case
    folding, via the stdlib unicodedata analog of ICU's Normalizer2."""
    return unicodedata.normalize("NFKC", text).casefold()


def icu_folding(text: str) -> str:
    """`icu_folding` token filter (IcuFoldingTokenFilterFactory): foldings
    from UTR #30 — accent removal (NFKD + strip combining marks), case
    folding, and compatibility forms."""
    decomposed = unicodedata.normalize("NFKD", text)
    stripped = "".join(c for c in decomposed if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", stripped).casefold()


def icu_folding_filter(tokens: list[str]) -> list[str]:
    return [icu_folding(t) for t in tokens]


def icu_normalizer_filter(tokens: list[str]) -> list[str]:
    return [icu_normalizer(t) for t in tokens]


def multiplexer_filter(tokens: list[str], branches) -> list[str]:
    """`multiplexer` token filter (MultiplexerTokenFilterFactory, 6.4):
    each input token is emitted once per branch filter chain at the SAME
    position, duplicates at a position removed. `branches` is a list of
    callables token -> token (identity = the unfiltered branch)."""
    out: list[str] = []
    for t in tokens:
        seen = []
        for br in branches:
            v = br(t)
            if v and v not in seen:
                seen.append(v)
        out.extend(seen)
    return out


def condition_filter(tokens: list[str], predicate, inner) -> list[str]:
    """`condition` token filter (ScriptedConditionTokenFilterFactory,
    7.1: wraps a filter chain behind a token-level script predicate —
    the inner filters apply only to tokens where it is true)."""
    return [inner(t) if predicate(t) else t for t in tokens]


def predicate_filter(tokens: list[str], predicate) -> list[str]:
    """`predicate_token_filter` (7.1): keep only tokens whose script
    predicate is true."""
    return [t for t in tokens if predicate(t)]
