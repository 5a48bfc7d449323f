"""Alternative similarities beyond BM25 (SURVEY.md §2.14 extension).

The reference exposes per-field similarity configs DFR / IB / LMDirichlet /
LMJelinekMercer / boolean (index/similarity/SimilarityProviders.java:89-100,
283-360) backed by Lucene's SimilarityBase family, which implements the
published retrieval models:

- LM Dirichlet and LM Jelinek-Mercer: Zhai & Lafferty, "A Study of Smoothing
  Methods for Language Models Applied to Ad Hoc Information Retrieval"
  (SIGIR 2001).
- DFR (Divergence From Randomness): Amati & van Rijsbergen, "Probabilistic
  models of information retrieval based on measuring the divergence from
  randomness" (TOIS 2002) — basic model x after-effect x tf normalization.
- IB (Information-Based): Clinchant & Gaussier, "Information-based models
  for ad hoc IR" (SIGIR 2010) — distribution x lambda x tf normalization.
- boolean: constant-score (the `boolean` similarity, SimilarityProviders
  BOOLEAN_SIMILARITY).

All arithmetic here is float64 over exact doc lengths (the engine's
`exact64` convention) so DuckDB SQL oracles can re-derive values exactly;
quantized-norm variants are out of scope. Stats are GLOBAL corpus stats
(n_docs, df, total term freq F, sum of doc lengths) — the same scope the
engine pins for BM25 parity (SURVEY.md §2.14).

Scope: these similarities drive term-frequency scoring (`term`, `terms`,
`match`, `bool` combinations — everything routed through
IndexSearcher._term_scores). Positional/phrase weights keep BM25, mirroring
a reference deployment where only selected fields override the similarity.
"""

from __future__ import annotations

import numpy as np

LOG2 = np.log(2.0)


def _tfn(tfs: np.ndarray, dls: np.ndarray, avgdl: float, normalization: str,
         c: float, z: float) -> np.ndarray:
    """DFR/IB tf normalizations (Amati & van Rijsbergen §4; Lucene
    NormalizationH1/H2/Z and `no`)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    if normalization == "no":
        return tf
    if normalization == "h1":
        return c * tf * (avgdl / dl)
    if normalization == "h2":
        # ln/ln2 instead of np.log2 so SQL oracles (ln(x)/ln(2)) reproduce
        # the exact float64 value
        return tf * (np.log(1.0 + c * avgdl / dl) / LOG2)
    if normalization == "z":
        return tf * np.power(avgdl / dl, z)
    raise ValueError(f"unknown tf normalization {normalization!r}")


class LMDirichlet:
    """Dirichlet-prior smoothed query likelihood [Zhai & Lafferty 2001].

    p_c = (F + 1) / (sum_dl + 1)   (add-one collection model, the Lucene
                                    LMSimilarity.DefaultCollectionModel form)
    score = boost * max(0, ln(1 + tf/(mu*p_c)) + ln(mu/(dl + mu)))
    (clamped at 0: long docs score negatively for rare-in-doc terms)."""

    name = "LMDirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        p = (ttf + 1.0) / (sum_dl + 1.0)
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        raw = np.log(1.0 + tf / (self.mu * p)) + np.log(self.mu / (dl + self.mu))
        return boost * np.maximum(raw, 0.0)


class LMJelinekMercer:
    """Jelinek-Mercer linear-interpolation smoothing [Zhai & Lafferty 2001].

    score = boost * ln(1 + ((1-lambda)*tf/dl) / (lambda*p_c)); lambda=0.1
    (the reference's default for title-like fields)."""

    name = "LMJelinekMercer"

    def __init__(self, lam: float = 0.1):
        if not 0.0 < lam < 1.0:
            raise ValueError("lambda must be in (0, 1)")
        self.lam = float(lam)

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        p = (ttf + 1.0) / (sum_dl + 1.0)
        tf = tfs.astype(np.float64)
        dl = dls.astype(np.float64)
        raw = np.log(1.0 + ((1.0 - self.lam) * tf / dl) / (self.lam * p))
        return boost * raw


class DFR:
    """Divergence From Randomness [Amati & van Rijsbergen 2002]:
    score = boost * after_effect(tfn) * basic_model(tfn).

    basic_model: 'in'  tfn * log2((N+1)/(n+0.5))
                 'ine' like 'in' with n replaced by the expected df
                       ne = N * (1 - ((N-1)/N)^F)
                 'if'  tfn * log2(1 + (N+1)/(F+0.5))
                 'g'   geometric: log2(1+l) + tfn*log2((1+l)/l), l = F/N
    after_effect: 'b' (F+1)/(n*(tfn+1)) | 'l' 1/(tfn+1) | 'no' 1
    normalization: 'no' | 'h1' (c) | 'h2' (c) | 'z' (z) — see _tfn.
    (N = n_docs, n = df, F = total term freq.)"""

    name = "DFR"
    _MODELS = ("in", "ine", "if", "g")
    _EFFECTS = ("b", "l", "no")

    def __init__(self, basic_model: str = "if", after_effect: str = "b",
                 normalization: str = "h2", c: float = 1.0, z: float = 0.30):
        if basic_model not in self._MODELS:
            raise ValueError(f"unknown DFR basic model {basic_model!r}")
        if after_effect not in self._EFFECTS:
            raise ValueError(f"unknown DFR after effect {after_effect!r}")
        self.basic_model, self.after_effect = basic_model, after_effect
        self.normalization, self.c, self.z = normalization, float(c), float(z)

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        tfn = _tfn(tfs, dls, avgdl, self.normalization, self.c, self.z)
        N, n, F = float(n_docs), float(df), float(ttf)
        bm = self.basic_model
        if bm == "in":
            basic = tfn * (np.log((N + 1.0) / (n + 0.5)) / LOG2)
        elif bm == "ine":
            ne = N * (1.0 - np.power((N - 1.0) / N, F))
            basic = tfn * (np.log((N + 1.0) / (ne + 0.5)) / LOG2)
        elif bm == "if":
            basic = tfn * (np.log(1.0 + (N + 1.0) / (F + 0.5)) / LOG2)
        else:  # 'g'
            lam = F / N
            basic = (np.log(1.0 + lam) + tfn * np.log((1.0 + lam) / lam)) / LOG2
        if self.after_effect == "b":
            gain = (F + 1.0) / (n * (tfn + 1.0))
        elif self.after_effect == "l":
            gain = 1.0 / (tfn + 1.0)
        else:
            gain = 1.0
        return boost * gain * basic


class IB:
    """Information-Based models [Clinchant & Gaussier 2010]:
    score = boost * dist(tfn, lambda).

    distribution: 'll'  ln(1 + tfn/lambda)           (log-logistic)
                  'spl' -ln((lambda^(tfn/(tfn+1)) - lambda) / (1 - lambda))
                        (smoothed power law; requires lambda < 1)
    lambda: 'df' n/N | 'ttf' F/N.  normalization: as DFR."""

    name = "IB"

    def __init__(self, distribution: str = "ll", lamb: str = "df",
                 normalization: str = "h2", c: float = 1.0, z: float = 0.30):
        if distribution not in ("ll", "spl"):
            raise ValueError(f"unknown IB distribution {distribution!r}")
        if lamb not in ("df", "ttf"):
            raise ValueError(f"unknown IB lambda {lamb!r}")
        self.distribution, self.lamb = distribution, lamb
        self.normalization, self.c, self.z = normalization, float(c), float(z)

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        tfn = _tfn(tfs, dls, avgdl, self.normalization, self.c, self.z)
        lam = (df / float(n_docs)) if self.lamb == "df" else (ttf / float(n_docs))
        if self.distribution == "ll":
            raw = np.log(1.0 + tfn / lam)
        else:
            lam = min(lam, 1.0 - 1e-12)  # spl needs lambda < 1
            raw = -np.log(
                (np.power(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam))
        return boost * raw


class BooleanSim:
    """Constant-score `boolean` similarity: every match scores `boost`."""

    name = "boolean"

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        return np.full(len(tfs), float(boost), np.float64)


class ScriptedSimilarity:
    """Scripted similarity (index/similarity/ScriptedSimilarity.java): the
    user supplies a vectorized Python callable over the same stats tuple
    the built-in models receive — the Painless-script analog in this
    engine's plain-callable extension model (SURVEY.md §2.13). The
    callable gets numpy arrays (tf, dl) plus scalar corpus stats and must
    return an array of per-doc scores; non-negative clamping mirrors the
    reference's requirement that scripted scores be >= 0."""

    name = "scripted"

    def __init__(self, script):
        if not callable(script):
            raise TypeError("scripted similarity needs a callable "
                            "(tf, dl, df, ttf, n_docs, sum_dl, avgdl) -> scores")
        self.script = script

    def score_tf(self, tfs, dls, df, ttf, n_docs, sum_dl, avgdl, boost=1.0):
        raw = np.asarray(
            self.script(tfs.astype(np.float64), dls.astype(np.float64),
                        float(df), float(ttf), float(n_docs), float(sum_dl),
                        float(avgdl)),
            dtype=np.float64)
        return boost * np.maximum(raw, 0.0)


_FACTORIES = {
    "LMDirichlet": LMDirichlet,
    "LMJelinekMercer": LMJelinekMercer,
    "DFR": DFR,
    "IB": IB,
    "boolean": BooleanSim,
    "scripted": ScriptedSimilarity,
}


def make_similarity(name: str, **params):
    """Factory mirroring SimilarityProviders' `type` dispatch."""
    try:
        return _FACTORIES[name](**params)
    except KeyError:
        raise ValueError(f"unknown similarity type {name!r}") from None
