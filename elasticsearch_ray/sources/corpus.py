"""Deterministic synthetic source-code corpus (FIXTURES.md §1, input_hint shape).

Schema exactly: (repo:string, path:string, commit:string, lang:string,
content:string). Content is deterministic pseudo-source-code with a
Zipf-distributed identifier vocabulary (~5k terms) mixing camelCase,
snake_case, kebab-case and digit-suffixed names plus stopword-bearing
comments — so the analyzer's word-delimiter paths and hot-term salting are
both exercised. Row i's content depends only on (seed, i // CHUNK, i % CHUNK)
— stable regardless of how generation is chunked or parallelized.

No external data; everything derives from the seed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1000  # fixed generation chunk; do not change (determinism contract)
VOCAB_SIZE = 5000
_EXTS = [("py", "python"), ("java", "java"), ("go", "go"), ("rs", "rust"), ("js", "javascript")]

_SUBWORDS = None
_VOCAB = None
_ZIPF_P = None
_VOCAB_SEED = None  # cache is per seed, rebuilt when the seed changes


def _base_subwords(rng: np.random.Generator) -> list[str]:
    kws = ("def class return int for while import from static void public let fn"
           " func var const type struct impl match if else elif try except catch"
           " new delete this self super len str map list set dict vec push pop"
           " get put post http request response parse encode decode read write"
           " open close file path node tree graph hash index query scan filter"
           " sort merge join split buffer stream batch block chunk shard").split()
    syll = ["ba", "co", "da", "el", "fi", "gu", "ha", "in", "jo", "ka", "lu", "mi",
            "no", "or", "pa", "qu", "ra", "su", "ta", "ur", "va", "wo", "xe", "yo", "zu"]
    extra = []
    while len(extra) < 800 - len(kws):
        n = rng.integers(2, 4)
        extra.append("".join(rng.choice(syll) for _ in range(n)))
    return kws + extra


def _build_vocab(seed: int = 42) -> tuple[list[str], np.ndarray]:
    """~5k identifiers in mixed styles + Zipf probabilities."""
    global _SUBWORDS, _VOCAB, _ZIPF_P, _VOCAB_SEED
    if _VOCAB is not None and _VOCAB_SEED == seed:
        return _VOCAB, _ZIPF_P
    _VOCAB_SEED = seed
    rng = np.random.default_rng(seed)
    subs = _base_subwords(rng)
    vocab: list[str] = []
    vocab.extend(subs[:200])  # bare keywords / single subwords stay hot
    while len(vocab) < VOCAB_SIZE:
        k = int(rng.integers(2, 4))
        parts = [subs[int(rng.integers(0, len(subs)))] for _ in range(k)]
        style = int(rng.integers(0, 4))
        if style == 0:  # camelCase
            ident = parts[0] + "".join(p.capitalize() for p in parts[1:])
        elif style == 1:  # snake_case
            ident = "_".join(parts)
        elif style == 2:  # kebab-case
            ident = "-".join(parts)
        else:  # digit-suffixed camel (parseHTTPRequest2-ish)
            ident = parts[0] + "".join(p.capitalize() for p in parts[1:]) + str(int(rng.integers(0, 10)))
        vocab.append(ident)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = 1.0 / ranks**1.07  # Zipf-ish
    _SUBWORDS, _VOCAB, _ZIPF_P = subs, vocab, p / p.sum()
    return _VOCAB, _ZIPF_P


_ZIPF_CDF = None


def _zipf_cdf() -> np.ndarray:
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        _, p = _build_vocab()
        _ZIPF_CDF = np.cumsum(p)
    return _ZIPF_CDF


_COMMENT_STOP = ("the quick result of the scan and the merge will be in there",
                 "this is a note that they will not keep for such an index",
                 "if it was an error then these are not to be used")


def generate_chunk(chunk_id: int, n_rows: int, seed: int = 42) -> pa.Table:
    """Generate rows [chunk_id*CHUNK, chunk_id*CHUNK + n_rows) deterministically."""
    vocab, p = _build_vocab(seed)
    rng = np.random.default_rng([seed, chunk_id])
    repos, paths, commits, langs, contents = [], [], [], [], []
    for j in range(n_rows):
        i = chunk_id * CHUNK + j
        ext, lang = _EXTS[i % len(_EXTS)]
        repos.append(f"org{i % 7}/proj{i % 23}")
        paths.append(f"src/dir{i % 13}/mod{i % 97}/file{i}.{ext}")
        commits.append(hashlib.sha1(f"{seed}:{i}".encode()).hexdigest())
        langs.append(lang)
        # target length: 50..5000 chars, with a 100KB outlier every 5000 rows
        target = 100_000 if i % 5000 == 17 else int(rng.integers(50, 5000))
        # pre-sample everything vectorized (inverse-CDF Zipf draw), then
        # assemble lines consuming from the pools — no per-line RNG calls
        est_tokens = max(16, target // 5)
        tok_idx = np.searchsorted(_zipf_cdf(), rng.random(est_tokens))
        nums = rng.integers(0, 1000, size=est_tokens // 4 + 4)
        kinds = rng.random(est_tokens // 4 + 4)
        lines, size, tp, np_, kp = [], 0, 0, 0, 0
        while size < target:
            if tp + 8 >= est_tokens:  # pool exhausted (rare): resample
                tok_idx = np.concatenate([tok_idx, np.searchsorted(_zipf_cdf(), rng.random(est_tokens))])
                est_tokens *= 2
            toks = [vocab[k] for k in tok_idx[tp : tp + 6]]
            tp += 6
            r = kinds[kp % kinds.size]
            kp += 1
            num = int(nums[np_ % nums.size])
            np_ += 1
            if r < 0.15:
                line = "# " + _COMMENT_STOP[num % 3] + " " + " ".join(toks[:3])
            elif r < 0.5:
                line = f"def {toks[0]}({toks[1]}, {toks[2]}): return {toks[3]}.{toks[5]}[{num % 100}]"
            elif r < 0.8:
                line = f"{toks[0]} = {toks[1]}({toks[2]}, {toks[3]}, {toks[4]})"
            else:
                line = f"if {toks[0]} != {toks[1]}: {toks[2]}.{toks[3]} += {num}"
            lines.append(line)
            size += len(line) + 1
        contents.append("\n".join(lines))
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def generate_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """Whole corpus as one Arrow table (use write_corpus for big ones)."""
    tables = [
        generate_chunk(c, min(CHUNK, n_rows - c * CHUNK), seed)
        for c in range((n_rows + CHUNK - 1) // CHUNK)
    ]
    return pa.concat_tables(tables)


def write_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 20_000,
    row_group_size: int = 5_000,
    use_ray: bool = True,
) -> str:
    """Materialize the corpus to partitioned Parquet (cached: skips if the
    _SUCCESS marker matches). Generation parallelized with Ray when available."""
    if rows_per_file % CHUNK:
        raise ValueError(f"rows_per_file must be a multiple of {CHUNK}")
    marker = os.path.join(out_dir, "_SUCCESS")
    tag = f"{n_rows}:{seed}:{rows_per_file}:{row_group_size}"
    if os.path.exists(marker) and open(marker).read() == tag:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for old_part in os.listdir(out_dir):
        # stale parts from a previous (different-tag) corpus must not leak
        # into readers that glob the directory
        if old_part.startswith("part-") and old_part.endswith(".parquet"):
            os.remove(os.path.join(out_dir, old_part))

    def _write_one(fi: int, lo: int, hi: int) -> None:
        chunks = []
        c0, c1 = lo // CHUNK, (hi + CHUNK - 1) // CHUNK
        for c in range(c0, c1):
            n = min(CHUNK, n_rows - c * CHUNK)
            chunks.append(generate_chunk(c, n, seed))
        t = pa.concat_tables(chunks)
        pq.write_table(t, os.path.join(out_dir, f"part-{fi:05d}.parquet"),
                       row_group_size=row_group_size)

    spans = [
        (fi, lo, min(lo + rows_per_file, n_rows))
        for fi, lo in enumerate(range(0, n_rows, rows_per_file))
    ]
    if use_ray:
        import ray

        if ray.is_initialized():
            w = ray.remote(num_cpus=1)(_write_one)
            ray.get([w.remote(*s) for s in spans])
        else:
            use_ray = False
    if not use_ray:
        for s in spans:
            _write_one(*s)
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir
