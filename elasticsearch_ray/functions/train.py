"""Distributed quality-classifier TRAINING (full-batch logistic GD).

Real training-data pipelines train their quality/language classifiers on the
corpus itself (the fastText-style filters of CCNet / LLaMA data prep); the
scoring side already exists (`embed_score`, `nb_domain_classify`) — this is
the training side, expressed Ray-Data-first: each iteration is ONE streaming
pass where every batch emits an integer gradient partial, and the driver
folds partials and takes the step. Exchanging gradients as integers
(floor(g*grid + 0.5), the same fixed-point trick as the PageRank/HITS
exchanges) makes the fold order-invariant, so training is bit-identical
under any partitioning — and exactly mirrorable in SQL.

The sigmoid is the RATIONAL approximation s(z) = 0.5 + z/(2*(1+|z|))
(the 'fast sigmoid' x/(1+|x|), e.g. Elliott 1993): exp() differs by ulps
between numpy's SIMD implementation and the oracle's libm, which would
poison the fixed-point snap; the rational form is plain IEEE arithmetic,
identical on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

GRID = 1_000_000_000  # gradient fixed-point grid


def _features(t: pa.Table, text_col: str, label_col: str,
              pos_label: str) -> tuple[np.ndarray, np.ndarray]:
    """x = [1, alpha_ratio, space_ratio] (the SQL-expressible quality
    signals, exact integer ratios in double); y = 1 if label == pos."""
    texts = t[text_col].to_pylist()
    n = len(texts)
    X = np.zeros((n, 3), np.float64)
    X[:, 0] = 1.0
    for i, s in enumerate(texts):
        L = len(s)
        if L == 0:
            continue
        # ASCII letter range EXACTLY (not str.isalpha(), which is Unicode-
        # aware): the SQL twin counts [a-zA-Z], and one accented letter
        # would silently desync the fixed-point gradient snap
        a = sum(1 for c in s if "a" <= c <= "z" or "A" <= c <= "Z")
        X[i, 1] = a / L
        X[i, 2] = s.count(" ") / L
    y = (np.asarray(t[label_col].to_pylist()) == pos_label).astype(np.float64)
    return X, y


def train_logreg_gd(ds, *, iters: int = 2, lr: float = 0.5,
                    text_col: str = "text", label_col: str = "lang",
                    pos_label: str = "en") -> pd.DataFrame:
    """Full-batch gradient descent, `iters` streaming passes. lr = 0.5 (a
    power of two, so the step multiply is exact). Returns the final weights
    snapped to the grid (integers -> exact comparison) per feature index.

    z is evaluated left-associated (w0 + x1*w1 + x2*w2), matching the
    oracle's expression order — double addition is not associative, so the
    order is part of the contract."""
    import ray

    w = np.zeros(3, np.float64)
    n_total = 0
    for it in range(iters):
        w_now = w.copy()
        w_ref = ray.put(w_now)

        def partial(t: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            if t.num_rows == 0:
                return pa.table({"n": pa.array([0], pa.int64()),
                                 "g0": pa.array([0], pa.int64()),
                                 "g1": pa.array([0], pa.int64()),
                                 "g2": pa.array([0], pa.int64())})
            X, y = _features(t, text_col, label_col, pos_label)
            z = wv[0] + X[:, 1] * wv[1] + X[:, 2] * wv[2]
            p = 0.5 + z / (2 * (1 + np.abs(z)))
            r = p - y
            g = np.floor(r[:, None] * X * GRID + 0.5).astype(np.int64)
            return pa.table({
                "n": pa.array([X.shape[0]], pa.int64()),
                "g0": pa.array([int(g[:, 0].sum())], pa.int64()),
                "g1": pa.array([int(g[:, 1].sum())], pa.int64()),
                "g2": pa.array([int(g[:, 2].sum())], pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=4096).to_pandas()
        n_total = int(parts["n"].sum())
        G = np.array([int(parts["g0"].sum()), int(parts["g1"].sum()),
                      int(parts["g2"].sum())], np.float64)
        w = w - lr * (G / (n_total * float(GRID)))
    return pd.DataFrame({
        "j": pd.array([0, 1, 2], dtype="int64"),
        "w_num": pd.array(
            [int(np.floor(wi * GRID + 0.5)) for wi in w], dtype="int64"),
    })
