"""Non-stemming language analyzers: CJK bigrams and Persian normalization.

- `cjk` (CommonAnalysisPlugin.java:180-223 registers CjkAnalyzerProvider →
  Lucene CJKAnalyzer): width folding, lowercase, CJK-script bigrams
  (CJKBigramFilter semantics: a run of n >= 2 CJK chars emits n-1
  overlapping bigrams at consecutive positions; a lone CJK char is emitted
  as a unigram), English stop set on the Latin tokens.
  Deviation: halfwidth-katakana composition (the second half of
  CJKWidthFilter) is not implemented — only the fullwidth→ASCII fold;
  documented, affects no Han/Hangul text.

- `persian` (PersianAnalyzerProvider → Lucene PersianAnalyzer): ZWNJ→space
  char filter, Arabic normalization (strip tatweel + harakat diacritics,
  fold alef variants), Persian normalization (arabic yeh/kaf → farsi
  yeh/keheh, teh marbuta → heh), stop filter, NO stemmer — the reference's
  Persian chain is normalization-only.
"""

from __future__ import annotations

import re

from .stopwords import STOP_SETS

# ---------------------------------------------------------------- CJK

# fullwidth ASCII block U+FF01-U+FF5E -> ASCII, ideographic space -> space
_WIDTH_FOLD = {c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)}
_WIDTH_FOLD[0x3000] = 0x20

_CJK_RANGES = (
    "㐀-䶿"   # CJK ext A
    "一-鿿"   # CJK unified
    "豈-﫿"   # CJK compat ideographs
    "぀-ゟ"   # hiragana
    "゠-ヿ"   # katakana
    "가-힯"   # hangul syllables
)
# one text = alternating CJK runs and non-CJK word runs
_CJK_RUN_RE = re.compile(f"([{_CJK_RANGES}]+)|([^\\W_]+)", re.UNICODE)

# Lucene CJKAnalyzer.getDefaultStopSet verbatim (note: 's', 't', 'www'
# included; 'an' absent — it differs from the standard English set)
_ENGLISH_STOP = frozenset(
    """a and are as at be but by for if in into is it no not of on or s such
    t that the their then there these they this to was will with
    www""".split()
)


def analyze_cjk_positions(text: str) -> list[tuple[str, int]]:
    """CJK analyzer token stream with positions. Stop-filtered Latin tokens
    keep position gaps (enablePositionIncrements), matching the other
    chains."""
    text = text.translate(_WIDTH_FOLD)
    out: list[tuple[str, int]] = []
    pos = 0
    for m in _CJK_RUN_RE.finditer(text):
        cjk, word = m.group(1), m.group(2)
        if cjk is not None:
            if len(cjk) == 1:
                out.append((cjk, pos))
                pos += 1
            else:
                for i in range(len(cjk) - 1):
                    out.append((cjk[i : i + 2], pos))
                    pos += 1
        else:
            w = word.lower()
            if w not in _ENGLISH_STOP:
                out.append((w, pos))
            pos += 1
    return out


def analyze_cjk(text: str) -> list[str]:
    return [t for t, _ in analyze_cjk_positions(text)]


# ------------------------------------------------------------- Persian

_FA_FOLD: dict[int, int | None] = {0x200C: 0x20}  # ZWNJ -> space
_FA_FOLD[0x0640] = None                            # tatweel
for _c in range(0x064B, 0x0653):                   # harakat diacritics
    _FA_FOLD[_c] = None
for _c in (0x0622, 0x0623, 0x0625, 0x0671):        # alef variants -> alef
    _FA_FOLD[_c] = 0x0627
_FA_FOLD[0x064A] = 0x06CC                          # arabic yeh  -> farsi yeh
_FA_FOLD[0x0649] = 0x06CC                          # alef maksura -> farsi yeh
_FA_FOLD[0x0643] = 0x06A9                          # arabic kaf  -> keheh
_FA_FOLD[0x0629] = 0x0647                          # teh marbuta -> heh
_FA_FOLD[0x06C0] = 0x0647                          # heh+hamza   -> heh

_UNI_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def analyze_persian_positions(text: str) -> list[tuple[str, int]]:
    stop = STOP_SETS["persian"]
    text = text.lower().translate(_FA_FOLD)
    return [
        (t, pos)
        for pos, t in enumerate(_UNI_TOKEN_RE.findall(text))
        if t not in stop
    ]


def analyze_persian(text: str) -> list[str]:
    return [t for t, _ in analyze_persian_positions(text)]


# =========================== Chinese / Thai ===========================
# "chinese" (ChineseAnalyzerProvider.java): Lucene retired the old
# ChineseAnalyzer — the provider is StandardAnalyzer with the ENGLISH
# stop set. Han runs therefore come out as one token per run (standard
# tokenizer semantics for ideographs here: maximal run, no bigrams).
#
# "thai" (ThaiAnalyzerProvider.java -> ThaiAnalyzer): the reference
# tokenizes Thai with a BreakIterator DICTIONARY segmenter. No dictionary
# ships in this environment, so the documented substitute is script-run
# tokenization (a Thai run = one token) + ThaiAnalyzer's stop removal and
# decimal-digit handling; non-Thai spans go through the standard path.
# Divergence: multi-word Thai runs are not split (recall over precision).

_HAN_RUN_RE = re.compile(r"([一-鿿㐀-䶿]+)|([^\W_]+)",
                         re.UNICODE)
_THAI_RUN_RE = re.compile(r"([ก-๎๐-๙]+)|([^\W_]+)",
                          re.UNICODE)


def analyze_chinese_positions(text: str) -> list[tuple[str, int]]:
    # StandardTokenizer (UAX#29) emits ONE TOKEN PER IDEOGRAPH for Han
    # text; non-Han spans are standard word tokens.
    stop = STOP_SETS["chinese"]
    out, pos = [], 0
    for m in _HAN_RUN_RE.finditer(text.lower().translate(_WIDTH_FOLD)):
        if m.group(1) is not None:
            for ch in m.group(1):
                out.append((ch, pos))
                pos += 1
            continue
        t = m.group(0)
        if t not in stop:
            out.append((t, pos))
        pos += 1
    return out


def analyze_chinese(text: str) -> list[str]:
    return [t for t, _ in analyze_chinese_positions(text)]


def analyze_thai_positions(text: str) -> list[tuple[str, int]]:
    stop = STOP_SETS["thai"]
    out, pos = [], 0
    for m in _THAI_RUN_RE.finditer(text.lower()):
        t = m.group(0)
        if t not in stop:
            out.append((t, pos))
        pos += 1
    return out


def analyze_thai(text: str) -> list[str]:
    return [t for t, _ in analyze_thai_positions(text)]


# =========================== Japanese (script-run) ===========================
# The reference ships Japanese via the kuromoji plugin (Viterbi dictionary
# segmentation — plugins/analysis-kuromoji); documented substitute:
# script-run tokenization (Han unigrams like the standard tokenizer,
# katakana/hiragana maximal runs, standard words elsewhere) + a hiragana
# particle stop set.

_JA_RUN_RE = re.compile(
    r"([一-鿿㐀-䶿]+)|([ァ-ヺー]+|[ぁ-ゖ]+|[^\W_]+)", re.UNICODE)


def analyze_japanese_positions(text: str) -> list[tuple[str, int]]:
    stop = STOP_SETS["japanese"]
    out, pos = [], 0
    for m in _JA_RUN_RE.finditer(text.lower()):
        if m.group(1) is not None:
            for ch in m.group(1):
                out.append((ch, pos))
                pos += 1
            continue
        t = m.group(0)
        if t not in stop:
            out.append((t, pos))
        pos += 1
    return out


def analyze_japanese(text: str) -> list[str]:
    return [t for t, _ in analyze_japanese_positions(text)]
