"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, nd: int = 4):
    """Round half away from zero (SQL ROUND semantics). numpy/pandas default
    to banker's rounding, which disagrees with DuckDB on exact .5 ticks
    (e.g. 0.03125 at 4 digits) — oracle-compared outputs must use this."""
    import pandas as pd

    scale = 10.0**nd
    if isinstance(x, pd.Series):
        return pd.Series(
            np.sign(x.to_numpy()) * np.floor(np.abs(x.to_numpy()) * scale + 0.5) / scale,
            index=x.index,
            name=x.name,
        )
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
