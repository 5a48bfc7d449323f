"""Date math expressions (server/src/main/java/org/elasticsearch/
common/time/JavaDateMathParser.java): `now` or an explicit anchor
followed by `||`, then any number of `+N<unit>` / `-N<unit>` offsets and
`/unit` roundings, evaluated left to right. Units y M w d h H m s;
`/w` rounds to the ISO week start (Monday), matching the reference.

`now` is injected by the caller (the reference resolves it from the
request context) so every evaluation is deterministic."""

from __future__ import annotations

import re

import pandas as pd

_TOKEN = re.compile(r"(?:([+-]\d+)([yMwdhHms]))|(?:/([yMwdhHms]))")

_OFFSET_KW = {"y": "years", "M": "months", "w": "weeks", "d": "days",
              "h": "hours", "H": "hours", "m": "minutes", "s": "seconds"}


def _round_down(t: pd.Timestamp, unit: str) -> pd.Timestamp:
    if unit == "y":
        return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                         microsecond=0, nanosecond=0)
    if unit == "M":
        return t.replace(day=1, hour=0, minute=0, second=0,
                         microsecond=0, nanosecond=0)
    if unit == "w":
        return (t - pd.Timedelta(days=int(t.dayofweek))).floor("D")
    return t.floor({"d": "D", "h": "h", "H": "h", "m": "min",
                    "s": "s"}[unit])


def parse_date_math(expr: str, now) -> pd.Timestamp:
    """Evaluate a date-math string against the injected `now` anchor."""
    expr = expr.strip()
    if expr.startswith("now"):
        t = pd.Timestamp(now)
        rest = expr[3:]
    else:
        anchor, sep, rest = expr.partition("||")
        t = pd.Timestamp(anchor)
        if not sep:
            rest = ""
    pos = 0
    for m in _TOKEN.finditer(rest):
        if m.start() != pos:
            raise ValueError(f"bad date math at {rest[pos:]!r}")
        pos = m.end()
        if m.group(3):
            t = _round_down(t, m.group(3))
        else:
            n, unit = int(m.group(1)), m.group(2)
            t = t + pd.DateOffset(**{_OFFSET_KW[unit]: n})
    if pos != len(rest):
        raise ValueError(f"bad date math at {rest[pos:]!r}")
    return t
