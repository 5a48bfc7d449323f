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
