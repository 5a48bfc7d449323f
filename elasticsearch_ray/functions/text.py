"""Text analysis stages for large-scale training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are vectorized `map_batches` transforms over the documents table
(`doc_id, text, lang, source, n_chars`). Quality/token-count formulas are
deliberately SQL-expressible so DuckDB oracles can verify them value-for-value
(see __ray_entry__.oracle_sql); the n-gram language-ID heuristic and rolling-
hash fingerprint are verified by rows-only checks + unit tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from ..analyzer import ENGLISH_STOP_WORDS
from ..utils import round_half_away

# tiny deterministic character-trigram profiles (public-knowledge heuristic:
# rank-order trigram profiles a la Cavnar & Trenkle). Profiles here are seeded
# from each language's most common function words.
def _round4(x: float) -> float:
    """round-half-away-from-zero at 4 decimals (delegates to the shared
    utils.round_half_away so the semantics stay in ONE place)."""
    return float(round_half_away(np.float64(x), 4))


_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", " th", "he ", "er ", "on ", " of"],
    "es": ["de ", " de", "la ", "os ", "ión", "ent", " la", "es ", "ado", "que"],
    "fr": ["es ", " de", "de ", "ent", "le ", " le", "ion", "la ", "et ", " et"],
    "zh": [],  # CJK detected by codepoint range, not trigrams
}


def lang_id_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: CJK codepoint ratio first, then trigram-profile
    overlap. Adds `pred_lang:string` and `lang_score:double`."""
    texts = t[text_col].to_pylist()
    langs, scores = [], []
    for s in texts:
        sample = s[:2000]
        if not sample:
            langs.append("und")
            scores.append(0.0)
            continue
        cjk = sum(1 for ch in sample if 0x4E00 <= ord(ch) <= 0x9FFF)
        if cjk / len(sample) > 0.05:
            langs.append("zh")
            scores.append(_round4(cjk / len(sample)))
            continue
        low = sample.lower()
        best, best_score = "und", 0.0
        for lang, grams in _LANG_PROFILES.items():
            if not grams:
                continue
            hits = sum(low.count(g) for g in grams)
            sc = hits / max(1, len(low) / 100)
            if sc > best_score:
                best, best_score = lang, sc
        langs.append(best)
        # half-away rounding (not Python banker's) so the DuckDB ROUND
        # oracle reproduces boundary values exactly
        scores.append(_round4(float(best_score)))
    return t.append_column("pred_lang", pa.array(langs, pa.string())).append_column(
        "lang_score", pa.array(scores, pa.float64())
    )


def quality_score_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality signals (SQL-expressible): length, alpha ratio, space ratio,
    stopword ratio over whitespace tokens, mean token length. Adds columns
    n_chars_q, alpha_ratio, space_ratio, stop_ratio, mean_tok_len, quality."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    alpha = np.zeros(n, np.float64)
    space = np.zeros(n, np.float64)
    stopr = np.zeros(n, np.float64)
    mtl = np.zeros(n, np.float64)
    for i, s in enumerate(texts):
        L = len(s)
        n_chars[i] = L
        if L == 0:
            continue
        a = sum(1 for c in s if c.isalpha())
        sp = s.count(" ")
        alpha[i] = a / L
        space[i] = sp / L
        toks = s.split()
        if toks:
            stopr[i] = sum(1 for w in toks if w.lower() in ENGLISH_STOP_WORDS) / len(toks)
            mtl[i] = sum(len(w) for w in toks) / len(toks)
    quality = np.clip(
        0.4 * alpha + 0.2 * np.clip(space * 6, 0, 1) + 0.2 * (1 - stopr) +
        0.2 * np.clip(mtl / 8, 0, 1),
        0, 1,
    )
    out = t
    for name, arr in [
        ("n_chars_q", n_chars),
        ("alpha_ratio", round_half_away(alpha, 4)),
        ("space_ratio", round_half_away(space, 4)),
        ("stop_ratio", round_half_away(stopr, 4)),
        ("mean_tok_len", round_half_away(mtl, 4)),
        ("quality", round_half_away(quality, 4)),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


_BPEISH = None


def token_count_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer count
    (GPT-2-style pretokenizer pattern, public). Adds ws_tokens, bpe_tokens."""
    global _BPEISH
    import re

    if _BPEISH is None:
        _BPEISH = re.compile(r"\w+|[^\w\s]", re.UNICODE)
    texts = t[text_col].to_pylist()
    ws = np.fromiter((len(s.split()) for s in texts), np.int64, len(texts))
    bpe = np.fromiter((len(_BPEISH.findall(s)) for s in texts), np.int64, len(texts))
    return t.append_column("ws_tokens", pa.array(ws)).append_column(
        "bpe_tokens", pa.array(bpe)
    )


def fingerprint_batch(t: pa.Table, text_col: str = "text", window: int = 16) -> pa.Table:
    """Document fingerprint: winnowed rolling (Karp-Rabin) hash — min hash of
    each `window`-gram over the normalized text (public winnowing idea,
    Schleimer et al.). Adds fingerprint:uint64 (stable content signature)."""
    texts = t[text_col].to_pylist()
    out = np.zeros(len(texts), np.uint64)
    B = np.uint64(1000003)
    MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
    # window-constant rolling-hash powers, computed once per batch
    powers = np.array([pow(1000003, window - 1 - j, 1 << 64)
                       for j in range(window)], dtype=np.uint64)
    for i, s in enumerate(texts):
        data = np.frombuffer(" ".join(s.lower().split()).encode(), dtype=np.uint8)
        if data.size == 0:
            continue
        if data.size < window:
            h = np.uint64(0)
            for byt in data:
                h = (h * B + np.uint64(byt)) & MOD_MASK
            out[i] = h
            continue
        # vectorized rolling hash over all windows
        n_win = data.size - window + 1
        idx = np.arange(window)[None, :] + np.arange(n_win)[:, None]
        hashes = (data[idx].astype(np.uint64) * powers[None, :]).sum(axis=1) & MOD_MASK
        out[i] = hashes.min()
    return t.append_column("fingerprint", pa.array(out, pa.uint64()))


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64_128 (Austin Appleby's public-domain algorithm; the
    variant behind the reference's common/hash/MurmurHash3.java used by
    plugins/mapper-murmur3). Returns (h1, h2) as unsigned 64-bit ints."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    mask = (1 << 64) - 1

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & mask

    def fmix(k: int) -> int:
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & mask
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & mask
        k ^= k >> 33
        return k

    length = len(data)
    h1 = h2 = seed
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], "little")
        k1 = (k1 * c1) & mask
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & mask
        h1 = (h1 * 5 + 0x52DCE729) & mask
        k2 = (k2 * c2) & mask
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & mask
        h2 = (h2 * 5 + 0x38495AB5) & mask
    tail = data[nblocks * 16:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & mask
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & mask
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & mask
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & mask
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    return h1, h2


def repetition_ratios_batch(t: pa.Table, text_col: str = "text",
                            ns: tuple[int, ...] = (2, 3)) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): for each n,
    the fraction of word n-gram occurrences that are duplicates of an
    already-seen n-gram in the same document. 0 = no repetition, -> 1 for
    degenerate boilerplate."""
    cols: dict[str, list] = {f"dup_{n}gram_frac": [] for n in ns}
    for text in t[text_col].to_pylist():
        toks = WORD_RE.findall(text.lower())
        for n in ns:
            total = max(len(toks) - n + 1, 0)
            if total == 0:
                cols[f"dup_{n}gram_frac"].append(0.0)
                continue
            n_unique = len({tuple(toks[i:i + n]) for i in range(total)})
            cols[f"dup_{n}gram_frac"].append((total - n_unique) / total)
    out = t.select([c for c in t.column_names if c != text_col])
    for k, v in cols.items():
        out = out.append_column(k, pa.array(v, pa.float64()))
    return out


WORD_RE = re.compile(r"[a-z0-9]+")

PII_PATTERNS = {
    # RE2-safe patterns (no lookaround) so engine (pyarrow RE2) and any
    # SQL oracle (DuckDB RE2) apply byte-identical semantics
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii_batch(t: pa.Table, text_col: str = "text",
                     kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
                     token: str = "[PII:{kind}]") -> pa.Table:
    """PII redaction (training-data scrubbing): each pattern class replaced
    with a typed placeholder, fully vectorized via Arrow's RE2 kernel; adds
    a per-doc redaction count column."""
    import pyarrow.compute as pc

    col = t[text_col]
    n_red = np.zeros(len(t), np.int64)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        n_red += pc.count_substring_regex(col, pat).to_numpy()
        col = pc.replace_substring_regex(col, pattern=pat,
                                         replacement=token.format(kind=kind))
    out = t.set_column(t.schema.get_field_index(text_col), text_col, col)
    return out.append_column("n_redactions", pa.array(n_red, pa.int64()))


# ---------------- URL canonicalization (crawl dedup primitive) ----------------

_TRACKING_PARAM = re.compile(r"^(utm_[^=]*|gclid|fbclid|ref)=")
_SCHEME_HOST = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)")


def canonicalize_url(u: str) -> str:
    """Deterministic URL canonical form (the dedup key of a crawl pipeline):
    scheme+host lowercased, leading `www.` stripped, default port stripped
    (:80 for http, :443 for https), fragment dropped, tracking params
    (utm_*, gclid, fbclid, ref) dropped, remaining query params sorted
    bytewise, trailing slashes stripped from the path. Path/query case is
    preserved. The DuckDB oracle re-derives exactly these rules."""
    m = _SCHEME_HOST.match(u or "")
    if not m:
        return u or ""
    sh = m.group(1).lower()
    scheme, host = sh.split("://", 1)
    if host.startswith("www."):
        host = host[4:]
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    rest = u[m.end():]
    rest = rest.split("#", 1)[0]
    if "?" in rest:
        path, query = rest.split("?", 1)
    else:
        path, query = rest, ""
    path = path.rstrip("/")
    params = sorted(p for p in query.split("&")
                    if p and not _TRACKING_PARAM.match(p))
    out = f"{scheme}://{host}{path}"
    if params:
        out += "?" + "&".join(params)
    return out


def canonicalize_url_batch(t: pa.Table, url_col: str = "url",
                           out_col: str = "canonical_url") -> pa.Table:
    vals = [canonicalize_url(u) for u in t[url_col].to_pylist()]
    return t.append_column(out_col, pa.array(vals, pa.string()))


_GOPHER_STOPS = frozenset(
    ["the", "be", "to", "of", "and", "that", "have", "with"])
_ALPHA_RE = re.compile(r"[A-Za-z]")


def gopher_flags_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """The Gopher quality-rule set (Rae et al. 2021, Table A1, public):
    word-count bounds, mean-word-length band, symbol-to-word ratio
    ('#' + '...'), bullet-start / ellipsis-end line fractions,
    alphabetic-word fraction, and the >=2-hit function-word test; `kept`
    is the conjunction (50 <= words <= 100k, 3 <= mwl <= 10, sym <= 0.1,
    bullets <= 0.9, ellipsis <= 0.3, alpha >= 0.8, stops >= 2). Every
    metric is deliberately SQL-expressible for the DuckDB oracle."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    nw = np.zeros(n, np.int64)
    mwl = np.zeros(n, np.float64)
    sym = np.zeros(n, np.float64)
    awf = np.zeros(n, np.float64)
    stops = np.zeros(n, np.int64)
    bullet = np.zeros(n, np.float64)
    ellip = np.zeros(n, np.float64)
    for i, s in enumerate(texts):
        toks = s.split()
        lines = s.split("\n")
        bullet[i] = (sum(1 for l in lines
                         if l.lstrip(" \t").startswith(("-", "*", "•")))
                     / len(lines))
        ellip[i] = (sum(1 for l in lines
                        if l.rstrip(" \t").endswith(("...", "…")))
                    / len(lines))
        if not toks:
            continue
        nw[i] = len(toks)
        mwl[i] = sum(len(w) for w in toks) / len(toks)
        sym[i] = (s.count("#") + s.count("...")) / len(toks)
        awf[i] = sum(1 for w in toks if _ALPHA_RE.search(w)) / len(toks)
        stops[i] = sum(1 for w in toks if w.lower() in _GOPHER_STOPS)
    kept = ((nw >= 50) & (nw <= 100_000) & (mwl >= 3.0) & (mwl <= 10.0)
            & (sym <= 0.1) & (bullet <= 0.9) & (ellip <= 0.3)
            & (awf >= 0.8) & (stops >= 2))
    out = t
    for name, arr in [
        ("n_words", nw),
        ("mean_word_len", round_half_away(mwl, 4)),
        ("symbol_ratio", round_half_away(sym, 4)),
        ("alpha_word_frac", round_half_away(awf, 4)),
        ("stop_hits", stops),
        ("bullet_frac", round_half_away(bullet, 4)),
        ("ellipsis_frac", round_half_away(ellip, 4)),
        ("kept", kept.astype(np.int64)),
    ]:
        out = out.append_column(name, pa.array(arr))
    return out


_C4_TERMINAL_RE = re.compile(r'[.!?"]\s*$')


def c4_filter_batch(t: pa.Table, text_col: str = "page",
                    id_col: str = "doc_id") -> pa.Table:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, public): keep only lines
    that end in terminal punctuation, have >= 3 words, and don't mention
    'javascript'; drop the whole page if fewer than 3 lines survive or the
    cleaned text contains '{' or 'lorem ipsum'. Emits (id, n_kept_lines,
    cleaned, kept)."""
    ids = t[id_col].to_pylist()
    out_n, out_clean, out_kept = [], [], []
    for s in t[text_col].to_pylist():
        kept_lines = [
            l for l in s.split("\n")
            if _C4_TERMINAL_RE.search(l) and len(l.split()) >= 3
            and "javascript" not in l.lower()]
        cleaned = "\n".join(kept_lines)
        low = cleaned.lower()
        ok = (len(kept_lines) >= 3 and "{" not in cleaned
              and "lorem ipsum" not in low)
        out_n.append(len(kept_lines))
        out_clean.append(cleaned)
        out_kept.append(1 if ok else 0)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "n_kept_lines": pa.array(out_n, pa.int64()),
                     "cleaned": pa.array(out_clean, pa.string()),
                     "kept": pa.array(out_kept, pa.int64())})


def ngram_char_fraction_batch(t: pa.Table, text_col: str = "text",
                              top_ns: tuple[int, ...] = (2, 3, 4),
                              dup_ns: tuple[int, ...] = (5,)) -> pa.Table:
    """The character-level repetition rules completing Gopher Table A1
    (Rae et al. 2021): for n in `top_ns`, the fraction of (non-space word)
    characters covered by occurrences of the single most frequent word
    n-gram; for n in `dup_ns`, the fraction covered by all n-grams that
    occur more than once. chars(gram) = sum of its word lengths; the
    denominator is the doc's total word characters. Ties for the top gram
    break to the lexicographically smallest (deterministic, SQL-parity)."""
    from collections import Counter

    cols: dict[str, list] = {f"top_{n}gram_char_frac": [] for n in top_ns}
    cols.update({f"dup_{n}gram_char_frac": [] for n in dup_ns})
    for text in t[text_col].to_pylist():
        toks = WORD_RE.findall(text.lower())
        total = sum(len(w) for w in toks)
        wl = np.array([len(w) for w in toks], dtype=np.int64)
        for n in (*top_ns, *dup_ns):
            name_top = f"top_{n}gram_char_frac"
            name_dup = f"dup_{n}gram_char_frac"
            m = len(toks) - n + 1
            if m <= 0 or total == 0:
                if n in top_ns:
                    cols[name_top].append(0.0)
                if n in dup_ns:
                    cols[name_dup].append(0.0)
                continue
            grams = Counter()
            chars = {}
            for i in range(m):
                g = " ".join(toks[i:i + n])
                grams[g] += 1
                if g not in chars:
                    chars[g] = int(wl[i:i + n].sum())
            if n in top_ns:
                g, c = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))
                cols[name_top].append(c * chars[g] / total)
            if n in dup_ns:
                dup = sum(c * chars[g] for g, c in grams.items() if c > 1)
                cols[name_dup].append(dup / total)
    out = t.select([c for c in t.column_names if c != text_col])
    for k, v in cols.items():
        out = out.append_column(k, pa.array(round_half_away(
            np.asarray(v, dtype=np.float64), 6), pa.float64()))
    return out


def entropy_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Shannon entropy quality signals (a standard web-curation heuristic:
    near-zero char entropy = degenerate/boilerplate text, abnormally high =
    binary junk): per-doc character entropy over the raw text and word
    entropy over whitespace tokens, in nats. SQL-expressible exactly."""
    ce, we = [], []
    for s in t[text_col].to_pylist():
        if s:
            _, cnt = np.unique(np.frombuffer(s.encode("utf-32-le"),
                                             dtype=np.uint32), return_counts=True)
            p = cnt / cnt.sum()
            ce.append(float(-(p * np.log(p)).sum()))
        else:
            ce.append(0.0)
        toks = s.split()
        if toks:
            _, cnt = np.unique(np.asarray(toks, dtype=object).astype(str),
                               return_counts=True)
            p = cnt / cnt.sum()
            we.append(float(-(p * np.log(p)).sum()))
        else:
            we.append(0.0)
    out = t.select([c for c in t.column_names if c != text_col])
    out = out.append_column("char_entropy", pa.array(
        round_half_away(np.asarray(ce), 6), pa.float64()))
    return out.append_column("word_entropy", pa.array(
        round_half_away(np.asarray(we), 6), pa.float64()))


def cdc_chunks_batch(t: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 16,
                     modulus: int = 64) -> pa.Table:
    """Content-defined chunking (the Karp-Rabin/gear CDC idea of LBFS and
    storage dedup, public): over the whitespace-normalized lowercase text,
    a `window`-gram whose polynomial hash (same 1000003^j mod 2^64 recipe
    as fingerprint_batch) is divisible by `modulus` ends a chunk; the tail
    forms the final chunk. Boundaries depend only on local content, so
    insertions shift chunk ids without re-chunking the rest of the doc —
    the property batch dedup of near-identical crawls relies on.
    Production CDC adds min/max chunk bounds; omitted here so the rule is
    position-independent and the SQL oracle can mirror it exactly.
    Emits (id, chunk_idx, start [1-based], length, chunk)."""
    ids_out, idxs, starts, lens, chunks = [], [], [], [], []
    powers = np.array([pow(1000003, window - 1 - j, 1 << 64)
                       for j in range(window)], dtype=np.uint64)
    mod = np.uint64(modulus)
    for did, s in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        s = " ".join(s.lower().split())
        data = np.frombuffer(s.encode(), dtype=np.uint8)
        n = data.size
        if n == 0:
            continue
        cuts = []
        if n >= window:
            idx = (np.arange(window)[None, :]
                   + np.arange(n - window + 1)[:, None])
            h = (data[idx].astype(np.uint64) * powers[None, :]).sum(axis=1)
            cuts = (np.flatnonzero(h % mod == 0) + window).tolist()
        if not cuts or cuts[-1] != n:
            cuts.append(n)
        prev = 0
        for k, c in enumerate(cuts):
            ids_out.append(did)
            idxs.append(k)
            starts.append(prev + 1)
            lens.append(c - prev)
            chunks.append(s[prev:c])
            prev = c
    return pa.table({id_col: pa.array(ids_out, pa.int64()),
                     "chunk_idx": pa.array(idxs, pa.int64()),
                     "start": pa.array(starts, pa.int64()),
                     "length": pa.array(lens, pa.int64()),
                     "chunk": pa.array(chunks, pa.string())})
