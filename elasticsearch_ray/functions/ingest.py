"""Ingest processors (SURVEY.md §2.9) as vectorized map_batches transforms.

The reference ships ~30 per-document processors
(modules/ingest-common/.../IngestCommonPlugin.java:64-91); each maps to a
pyarrow.compute kernel over a column. `pipeline(...)` composes them in order
like an ES ingest pipeline definition. Painless-script extension surface ->
plain Python callables via `script()`.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def uppercase(col: str):
    return lambda t: t.set_column(
        t.schema.get_field_index(col), col, pc.utf8_upper(t[col])
    )


def lowercase(col: str):
    return lambda t: t.set_column(
        t.schema.get_field_index(col), col, pc.utf8_lower(t[col])
    )


def trim(col: str):
    return lambda t: t.set_column(
        t.schema.get_field_index(col), col, pc.utf8_trim_whitespace(t[col])
    )


def gsub(col: str, pattern: str, replacement: str):
    """regex replace (the `gsub` processor)."""
    return lambda t: t.set_column(
        t.schema.get_field_index(col), col,
        pc.replace_substring_regex(t[col], pattern=pattern, replacement=replacement),
    )


def split(col: str, pattern: str, out: str | None = None):
    """split into a list column."""
    out = out or col

    def f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(t[col], pattern=pattern)
        if out == col:
            return t.set_column(t.schema.get_field_index(col), col, parts)
        return t.append_column(out, parts)

    return f


def join(col: str, sep: str, out: str | None = None):
    out = out or col

    def f(t: pa.Table) -> pa.Table:
        joined = pc.binary_join(t[col], sep)
        if out == col:
            return t.set_column(t.schema.get_field_index(col), col, joined)
        return t.append_column(out, joined)

    return f


def set_value(col: str, value):
    return lambda t: _put(t, col, pa.array([value] * len(t)))


def rename(src: str, dst: str):
    def f(t: pa.Table) -> pa.Table:
        names = [dst if n == src else n for n in t.column_names]
        return t.rename_columns(names)

    return f


def remove(col: str):
    return lambda t: t.drop_columns([col])


def convert(col: str, type_: pa.DataType):
    return lambda t: t.set_column(
        t.schema.get_field_index(col), col, pc.cast(t[col], type_)
    )


def json_parse(col: str, field: str, out: str):
    """extract one field from a JSON string column (the `json` processor)."""

    def f(t: pa.Table) -> pa.Table:
        vals = []
        for s in t[col].to_pylist():
            try:
                vals.append(json.loads(s).get(field))
            except (TypeError, json.JSONDecodeError):
                vals.append(None)
        return _put(t, out, pa.array(vals))

    return f


def date_parse(col: str, out: str | None = None, fmt: str = "%Y-%m-%dT%H:%M:%S"):
    out = out or col
    return lambda t: _put(t, out, pc.strptime(t[col], format=fmt, unit="us"))


def html_strip(col: str):
    return gsub(col, r"<[^>]*>", "")


def urldecode(col: str):
    def f(t: pa.Table) -> pa.Table:
        from urllib.parse import unquote

        return _put(t, col, pa.array([unquote(s) if s is not None else None
                                      for s in t[col].to_pylist()]))

    return f


def bytes_human(col: str, out: str | None = None):
    """'1kb'/'2mb' -> bytes (the `bytes` processor)."""
    out = out or col
    mult = {"b": 1, "kb": 1 << 10, "mb": 1 << 20, "gb": 1 << 30, "tb": 1 << 40}

    def f(t: pa.Table) -> pa.Table:
        vals = []
        for s in t[col].to_pylist():
            if s is None:
                vals.append(None)
                continue
            s2 = s.strip().lower()
            for suf in ("tb", "gb", "mb", "kb", "b"):
                if s2.endswith(suf):
                    vals.append(int(float(s2[: -len(suf)]) * mult[suf]))
                    break
            else:
                vals.append(int(s2))
        return _put(t, out, pa.array(vals, pa.int64()))

    return f


def drop_if(predicate):
    """the `drop` processor: predicate(table) -> bool mask of rows to DROP."""

    def f(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        return t.filter(pc.invert(mask))

    return f


def script(fn):
    """Painless-script analog: arbitrary table -> table Python callable."""
    return fn


def dissect(col: str, pattern: str, out_prefix: str = ""):
    """`dissect` processor: '%{a} %{b}'-style fixed pattern extraction."""
    import re

    keys = re.findall(r"%\{(\w+)\}", pattern)
    regex = re.escape(pattern)
    for k in keys:
        regex = regex.replace(re.escape("%{" + k + "}"), f"(?P<{k}>.*?)")
    regex = re.compile("^" + regex + "$")

    def f(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in keys}
        for s in t[col].to_pylist():
            m = regex.match(s) if s is not None else None
            for k in keys:
                cols[k].append(m.group(k) if m else None)
        for k in keys:
            t = _put(t, out_prefix + k, pa.array(cols[k], pa.string()))
        return t

    return f


def pipeline(*processors):
    """Compose processors into one map_batches-ready callable
    (ingest pipeline analog)."""

    def f(t: pa.Table) -> pa.Table:
        for p in processors:
            t = p(t)
        return t

    return f


def _put(t: pa.Table, col: str, arr) -> pa.Table:
    if col in t.column_names:
        return t.set_column(t.schema.get_field_index(col), col, arr)
    return t.append_column(col, arr)
