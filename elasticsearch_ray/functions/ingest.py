"""Ingest processors (SURVEY.md §2.9) as vectorized map_batches transforms.

The reference ships ~30 per-document processors
(modules/ingest-common/.../IngestCommonPlugin.java:64-91); each maps to a
pyarrow.compute kernel over a column. `pipeline(...)` composes them in order
like an ES ingest pipeline definition. Painless-script extension surface ->
plain Python callables via `script()`.
"""

from __future__ import annotations

import json

import numpy as np
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
    # explicit type so a zero-row batch doesn't infer a null-typed column
    typ = pa.scalar(value).type
    return lambda t: _put(t, col, pa.array([value] * len(t), typ))


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


# ---------------- round 2: remaining ingest-common processors ----------------

# minimal grok pattern library (the `grok` processor ships a large bank;
# these cover the common access-log shapes — extend via the patterns arg)
GROK_PATTERNS = {
    "WORD": r"\w+",
    "NUMBER": r"-?\d+(?:\.\d+)?",
    "INT": r"-?\d+",
    "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
}


def grok(col: str, pattern: str, out_prefix: str = "",
         patterns: dict[str, str] | None = None):
    """`grok` processor: %{SYNTAX:name} named captures over a pattern
    bank; the %{SYNTAX:name:int|float} type suffix converts the capture
    (Grok.java's semantic conversion)."""
    import re

    bank = {**GROK_PATTERNS, **(patterns or {})}
    names: list[str] = []
    types: dict[str, str] = {}

    def sub(m):
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        names.append(name)
        if typ:
            types[name] = typ
        return f"(?P<{name}>{bank[syntax]})"

    regex = re.compile(
        re.sub(r"%\{(\w+):(\w+)(?::(int|long|float|double|boolean))?\}",
               sub, pattern))

    def f(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in names}
        for s in t[col].to_pylist():
            m = regex.search(s) if s is not None else None
            for k in names:
                cols[k].append(m.group(k) if m else None)
        for k in names:
            typ = types.get(k)
            if typ in ("int", "long"):
                arr = pa.array([int(v) if v is not None else None
                                for v in cols[k]], pa.int64())
            elif typ in ("float", "double"):
                arr = pa.array([float(v) if v is not None else None
                                for v in cols[k]], pa.float64())
            elif typ == "boolean":
                arr = pa.array([v.lower() == "true" if v is not None
                                else None for v in cols[k]], pa.bool_())
            else:
                arr = pa.array(cols[k], pa.string())
            t = _put(t, out_prefix + k, arr)
        return t

    return f


def kv(col: str, field_split: str = " ", value_split: str = "=",
       out_prefix: str = "", include: list[str] | None = None):
    """`kv` processor: parse key=value pairs into columns.

    Pass `include` whenever this runs as a distributed map_batches stage:
    without it the output keys are discovered per batch, so blocks whose
    rows carry different keys get different schemas and Ray Data's schema
    unification fails. (With include the schema is fixed up front.)"""

    def f(t: pa.Table) -> pa.Table:
        keys = include
        rows = []
        for s in t[col].to_pylist():
            d = {}
            if s:
                for part in s.split(field_split):
                    if value_split in part:
                        k, v = part.split(value_split, 1)
                        d[k] = v
            rows.append(d)
        if keys is None:
            keys = sorted({k for d in rows for k in d})
        for k in keys:
            t = _put(t, out_prefix + k,
                     pa.array([d.get(k) for d in rows], pa.string()))
        return t

    return f


def csv_parse(col: str, target_fields: list[str], separator: str = ",",
              quote: str = '"'):
    """`csv` processor: split one CSV-formatted column into target fields."""
    import csv as _csv
    import io

    def f(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in target_fields}
        for s in t[col].to_pylist():
            vals = next(_csv.reader(io.StringIO(s or ""), delimiter=separator,
                                    quotechar=quote), [])
            for i, k in enumerate(target_fields):
                cols[k].append(vals[i] if i < len(vals) else None)
        for k in target_fields:
            t = _put(t, k, pa.array(cols[k], pa.string()))
        return t

    return f


def _normalized_list(c):
    """(zero-based offsets, flat values, null mask) for a list array.

    `c.offsets` is the raw buffer — for a sliced array or one with null
    entries it disagrees with `c.flatten()` (which respects slicing and skips
    null lists), so offsets are rebuilt from per-list value lengths instead.
    """
    import numpy as np

    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    lens = pc.list_value_length(c).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    offsets = np.zeros(len(c) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    mask = pc.is_null(c) if c.null_count else None
    return offsets, c.flatten(), mask


def _rebuild_list(offsets, values, mask):
    import numpy as np

    return pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), values,
        mask=mask if mask is not None else None)


def foreach(col: str, elem_fn, out: str | None = None):
    """`foreach` processor: apply a vectorized function to every element of a
    list column (applied once to the flattened child values)."""
    out = out or col

    def f(t: pa.Table) -> pa.Table:
        offsets, flat, mask = _normalized_list(t[col])
        rebuilt = _rebuild_list(offsets, elem_fn(flat), mask)
        return _put(t, out, rebuilt)

    return f


def dot_expander(col: str):
    """`dot_expander` processor: 'a.b' flat column -> struct column a{b}."""

    def f(t: pa.Table) -> pa.Table:
        parent, child = col.split(".", 1)
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        struct = pa.StructArray.from_arrays([c], names=[child])
        return t.drop_columns([col]).append_column(parent, struct)

    return f


def date_index_name(col: str, prefix: str, rounding: str = "day",
                    out: str = "_index"):
    """`date_index_name` processor: route each doc to a time-partitioned
    index/partition name (the write-partitioning key at scale)."""
    unit = {"day": "day", "month": "month", "hour": "hour"}[rounding]
    fmt = {"day": "%Y-%m-%d", "month": "%Y-%m", "hour": "%Y-%m-%d-%H"}[rounding]

    def f(t: pa.Table) -> pa.Table:
        floored = pc.floor_temporal(t[col], unit=unit)
        names = pc.binary_join_element_wise(
            pa.array([prefix] * len(t)), pc.strftime(floored, format=fmt), "-")
        return _put(t, out, names)

    return f


class IngestFailure(Exception):
    """Raised by the `fail` processor."""


def fail_if(predicate, message: str = "ingest pipeline failed"):
    """`fail` processor: abort the pipeline when any row matches."""

    def f(t: pa.Table) -> pa.Table:
        mask = predicate(t)
        if pc.any(mask).as_py():
            raise IngestFailure(message)
        return t

    return f


def sort_list(col: str, order: str = "ascending"):
    """`sort` processor: sort each list element of a list column."""

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        offsets, flat_arr, mask = _normalized_list(t[col])
        flat = flat_arr.to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(offsets) - 1), np.diff(offsets))
        # stable sort by value within each list segment; descending via
        # rank reversal (unary minus would crash on string lists)
        asc = np.lexsort((flat, seg))
        if order == "ascending":
            idx = asc
        else:
            # reverse each segment's ascending run
            counts = np.diff(offsets)
            starts = np.repeat(offsets[:-1], counts)
            ends = np.repeat(offsets[1:], counts)
            within = np.arange(flat.size) - starts
            idx = asc[(ends - 1 - starts - within) + starts]
        rebuilt = _rebuild_list(offsets, pa.array(flat[idx]), mask)
        return _put(t, col, rebuilt)

    return f


def append(col: str, values):
    """`append` processor (AppendProcessor): append value(s) to a list field,
    creating it when absent; a scalar column is promoted to a list first."""
    vals = list(values) if isinstance(values, (list, tuple)) else [values]

    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        n = len(t)
        if col in t.column_names:
            c = t[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            if not pa.types.is_list(c.type):
                c = pa.ListArray.from_arrays(
                    pa.array(range(n + 1), pa.int32()), c)
            offsets, flat, mask = _normalized_list(c)
        else:
            offsets = np.zeros(n + 1, np.int64)
            flat = pa.array([], pa.string() if isinstance(vals[0], str)
                            else pa.int64())
            mask = None
        k = len(vals)
        new_offsets = offsets + np.arange(n + 1, dtype=np.int64) * k
        tail = pa.array(vals * n, flat.type)
        # interleave: each row's existing values then the appended ones
        pieces = []
        for i in range(n):
            pieces.append(flat.slice(int(offsets[i]),
                                     int(offsets[i + 1] - offsets[i])))
            pieces.append(tail.slice(i * k, k))
        combined = pa.concat_arrays(pieces) if pieces else flat
        rebuilt = _rebuild_list(new_offsets, combined, mask)
        return _put(t, col, rebuilt)

    return f


# -- user_agent (modules/ingest-user-agent) ----------------------------------
# UserAgentProcessor.java + UserAgentParser.java: ordered regex bank (first
# match wins, mirroring the uap-core regexes.yml evaluation order the
# reference ships), classic (non-ECS) field layout: name/major/minor/patch,
# os/os_name/os_major/os_minor, device.

_UA_BROWSERS = [
    # (name, pattern) — Edge/Opera before Chrome, Chrome before Safari,
    # because Chromium UAs carry the Safari and Chrome tokens too
    ("Edge", r"Edge?/(\d+)(?:\.(\d+))?(?:\.(\d+))?"),
    ("Opera", r"OPR/(\d+)\.(\d+)(?:\.(\d+))?"),
    ("Chrome", r"Chrome/(\d+)\.(\d+)(?:\.(\d+))?"),
    ("Firefox", r"Firefox/(\d+)\.(\d+)(?:\.(\d+))?"),
    ("Safari", r"Version/(\d+)\.(\d+)(?:\.(\d+))?(?:\.\d+)? .*Safari/"),
    ("IE", r"MSIE (\d+)\.(\d+)"),
    ("IE", r"Trident/.*rv:(\d+)\.(\d+)"),
    ("curl", r"curl/(\d+)\.(\d+)(?:\.(\d+))?"),
]

_UA_OSES = [
    # Windows NT minor-version names per the uap-core mapping
    ("Windows", r"Windows NT 10\.0", "10", None),
    ("Windows", r"Windows NT 6\.3", "8", "1"),
    ("Windows", r"Windows NT 6\.2", "8", None),
    ("Windows", r"Windows NT 6\.1", "7", None),
    ("iOS", r"(?:iPhone )?OS (\d+)_(\d+) like Mac OS X", None, None),
    ("Mac OS X", r"Mac OS X (\d+)[_.](\d+)", None, None),
    ("Android", r"Android (\d+)(?:\.(\d+))?", None, None),
    ("Linux", r"Linux", None, None),
]

_UA_DEVICES = [("iPhone", "iPhone"), ("iPad", "iPad"), ("Mac", "Macintosh")]


def _parse_user_agent(ua: str) -> dict:
    import re

    out = {"name": "Other", "major": None, "minor": None, "patch": None,
           "os": "Other", "os_name": "Other", "os_major": None,
           "os_minor": None, "device": "Other"}
    for name, pat in _UA_BROWSERS:
        m = re.search(pat, ua)
        if m:
            g = m.groups()
            out["name"] = name
            out["major"] = g[0] if g else None
            out["minor"] = g[1] if len(g) > 1 else None
            out["patch"] = g[2] if len(g) > 2 else None
            break
    for name, pat, fix_major, fix_minor in _UA_OSES:
        m = re.search(pat, ua)
        if m:
            g = m.groups()
            major = fix_major if fix_major is not None else \
                (g[0] if g else None)
            minor = fix_minor if fix_minor is not None else \
                (g[1] if len(g) > 1 else None)
            out["os_name"] = name
            out["os_major"] = major
            out["os_minor"] = minor
            full = name
            if major:
                full += f" {major}"
                if minor:
                    full += f".{minor}"
            out["os"] = full
            break
    for dev, token in _UA_DEVICES:
        if token in ua:
            out["device"] = dev
            break
    return out


def user_agent(col: str, out_prefix: str = "ua_",
               properties: list[str] | None = None,
               ignore_missing: bool = False):
    """`user_agent` processor (UserAgentProcessor.java): parse a UA string
    into name/major/minor/patch + os fields + device. `properties` limits
    the emitted fields (Property enum); null input raises unless
    ignore_missing (UserAgentProcessor.java execute())."""
    fields = properties or ["name", "major", "minor", "patch", "os",
                            "os_name", "os_major", "os_minor", "device"]

    def f(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in fields}
        for s in t[col].to_pylist():
            if s is None:
                if not ignore_missing:
                    raise ValueError(
                        f"field [{col}] is null, cannot parse user-agent.")
                d = {}
            else:
                d = _parse_user_agent(s)
            for k in fields:
                cols[k].append(d.get(k))
        for k in fields:
            t = _put(t, out_prefix + k, pa.array(cols[k], pa.string()))
        return t

    return f


# -- geoip (modules/ingest-geoip) ---------------------------------------------
# GeoIpProcessor.java resolves IPs against a MaxMind database; that binary
# database is not redistributable, so the lookup table here is a DETERMINISTIC
# SYNTHETIC stand-in with the same shape (sorted non-overlapping uint32
# ranges -> city/country/continent/location rows). The machinery — CIDR
# parsing, uint32 conversion, vectorized searchsorted range lookup,
# ignore_missing — is the real implementation; swap _GEOIP_DB for a parsed
# GeoLite CSV to go live.

def _ip_to_u32(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def _cidr_range(cidr: str) -> tuple[int, int]:
    base, bits = cidr.split("/")
    lo = _ip_to_u32(base)
    span = 1 << (32 - int(bits))
    return lo, lo + span - 1


# (cidr, continent_name, country_iso_code, city_name, lat, lon)
_GEOIP_DB = [
    ("1.0.0.0/8", "Oceania", "AU", "Sydney", -33.8688, 151.2093),
    ("24.0.0.0/8", "North America", "US", "New York", 40.7128, -74.006),
    ("46.0.0.0/8", "Europe", "RU", "Moscow", 55.7558, 37.6173),
    ("81.0.0.0/8", "Europe", "DE", "Berlin", 52.52, 13.405),
    ("101.0.0.0/8", "Asia", "CN", "Beijing", 39.9042, 116.4074),
    ("133.0.0.0/8", "Asia", "JP", "Tokyo", 35.6762, 139.6503),
    ("177.0.0.0/8", "South America", "BR", "Sao Paulo", -23.5505, -46.6333),
    ("196.0.0.0/8", "Africa", "ZA", "Johannesburg", -26.2041, 28.0473),
]


def geoip(col: str, out_prefix: str = "geo_",
          properties: list[str] | None = None, ignore_missing: bool = False):
    """`geoip` processor (GeoIpProcessor.java): map an IP column to
    continent_name / country_iso_code / city_name / location via a sorted
    range table, vectorized with searchsorted. Unmatched IPs yield nulls
    (the reference omits the target field when the DB has no record)."""
    import numpy as np

    fields = properties or ["continent_name", "country_iso_code",
                            "city_name", "lat", "lon"]
    ranges = sorted((_cidr_range(c), cont, iso, city, la, lo)
                    for c, cont, iso, city, la, lo in _GEOIP_DB)
    starts = np.array([r[0][0] for r in ranges], np.uint32)
    ends = np.array([r[0][1] for r in ranges], np.uint32)
    meta = [(r[1], r[2], r[3], r[4], r[5]) for r in ranges]

    def f(t: pa.Table) -> pa.Table:
        ips = t[col].to_pylist()
        u32 = np.zeros(len(ips), np.uint32)
        valid = np.zeros(len(ips), bool)
        for i, s in enumerate(ips):
            if s is None:
                if not ignore_missing:
                    raise ValueError(
                        f"field [{col}] is null, cannot extract geoip.")
                continue
            u32[i] = _ip_to_u32(s)
            valid[i] = True
        idx = np.searchsorted(starts, u32, side="right") - 1
        ok = valid & (idx >= 0)
        safe = np.maximum(idx, 0)
        ok &= u32 <= ends[safe]
        cols: dict[str, list] = {k: [] for k in fields}
        for i in range(len(ips)):
            row = meta[safe[i]] if ok[i] else (None,) * 5
            named = dict(zip(("continent_name", "country_iso_code",
                              "city_name", "lat", "lon"), row))
            for k in fields:
                cols[k].append(named[k])
        for k in fields:
            typ = pa.float64() if k in ("lat", "lon") else pa.string()
            t = _put(t, out_prefix + k, pa.array(cols[k], typ))
        return t

    return f


# -- attachment (plugins/ingest-attachment) ------------------------------------
# AttachmentProcessor.java runs Apache Tika over a base64 payload and emits
# content / content_type / content_length / language / title. Tika is not
# available here, so the extractors cover the text-bearing formats that need
# no native parser — plain text and HTML (title + tag-stripped body) — and
# raise a clearly-marked NotImplementedError for binary formats (pdf, docx),
# mirroring the multimodal stub policy. Sniffing, base64 decode, property
# selection, indexed_chars truncation and ignore_missing are the real
# implementation.

def _sniff_content_type(raw: bytes) -> str:
    if b"<html" in raw[:256].lower():
        return "text/html"
    if raw[:4] == b"%PDF":
        return "application/pdf"
    if raw[:4] == b"PK\x03\x04":
        return "application/zip"
    return "text/plain"


def attachment(col: str, out_prefix: str = "attachment_",
               properties: list[str] | None = None,
               indexed_chars: int = 100_000, ignore_missing: bool = False):
    """`attachment` processor: decode base64, sniff the content type,
    extract text content (+ html <title>), emit content_length."""
    import base64
    import re as _re

    fields = properties or ["content", "content_type", "content_length",
                            "title"]
    title_re = _re.compile(rb"<title[^>]*>(.*?)</title>",
                           _re.IGNORECASE | _re.DOTALL)
    tag_re = _re.compile(rb"<[^>]*>")

    def extract(b64: str) -> dict:
        raw = base64.b64decode(b64)
        ctype = _sniff_content_type(raw)
        title = None
        if ctype == "text/plain":
            content = raw.decode("utf-8", "replace")
        elif ctype == "text/html":
            m = title_re.search(raw)
            if m:
                title = m.group(1).strip().decode("utf-8", "replace")
            body = tag_re.sub(b" ", title_re.sub(b" ", raw))
            content = " ".join(body.decode("utf-8", "replace").split())
        else:
            raise NotImplementedError(
                f"attachment: no parser for {ctype} in this build "
                "(reference delegates to Apache Tika)")
        content = content[:indexed_chars]
        return {"content": content, "content_type": ctype,
                "content_length": len(content), "title": title}

    def f(t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in fields}
        for s in t[col].to_pylist():
            if s is None:
                if not ignore_missing:
                    raise ValueError(
                        f"field [{col}] is null, cannot parse.")
                d = {}
            else:
                d = extract(s)
            for k in fields:
                cols[k].append(d.get(k))
        for k in fields:
            typ = pa.int64() if k == "content_length" else pa.string()
            t = _put(t, out_prefix + k, pa.array(cols[k], typ))
        return t

    return f


def uri_parts(col: str, out_prefix: str = "url_"):
    """`uri_parts` processor (ingest-common UriPartsProcessor, 7.12):
    scheme/user_info/domain/port/path/query/fragment/extension via ONE
    pc.extract_regex pass per batch."""
    rx = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?:(?P<user_info>[^@/]+)@)?"
          r"(?P<domain>[^:/?#]+)(?::(?P<port>\d+))?(?P<path>/[^?#]*)?"
          r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$")

    def f(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t[col], rx)
        for name in ("scheme", "user_info", "domain", "port", "path",
                     "query", "fragment"):
            v = pc.struct_field(st, name)
            # an absent optional group captures "" — normalize to null
            v = pc.if_else(pc.equal(v, ""), pa.scalar(None, pa.string()), v)
            if name == "port":
                v = pc.cast(v, pa.int64())
            t = _put(t, out_prefix + name, v)
        ext = pc.extract_regex(t[out_prefix + "path"],
                               r"\.(?P<extension>[A-Za-z0-9]+)$")
        t = _put(t, out_prefix + "extension",
                 pc.struct_field(ext, "extension"))
        return t

    return f


# ordered longest-suffix-first subset of the public suffix list — the
# reference bundles Mozilla's full PSL (RegisteredDomainProcessor, 7.13)
_PSL = ("co.uk", "org.uk", "com.au", "co.jp", "github.io", "com", "org",
        "net", "io", "gov", "edu", "uk")


def registered_domain(col: str, out_prefix: str = ""):
    """`registered_domain` processor (RegisteredDomainProcessor): eTLD,
    registered domain and subdomain — one alternation-regex pass."""
    alt = "|".join(p.replace(".", r"\.") for p in _PSL)
    # lazy subdomain -> the public suffix match is longest (co.uk beats uk,
    # github.io beats io), which is the PSL longest-match rule
    rx = (r"^(?:(?P<subdomain>.+?)\.)?"
          rf"(?P<registered_domain>[^.]+\.(?:{alt}))$")
    tld_rx = rf"\.(?P<top_level_domain>{alt})$"

    def _nz(v):
        return pc.if_else(pc.equal(v, ""), pa.scalar(None, pa.string()), v)

    def f(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t[col], rx)
        t = _put(t, out_prefix + "registered_domain",
                 _nz(pc.struct_field(st, "registered_domain")))
        t = _put(t, out_prefix + "subdomain",
                 _nz(pc.struct_field(st, "subdomain")))
        tl = pc.extract_regex(t[col], tld_rx)
        t = _put(t, out_prefix + "top_level_domain",
                 _nz(pc.struct_field(tl, "top_level_domain")))
        return t

    return f


def community_id(src_col: str, dst_col: str, sport_col: str, dport_col: str,
                 proto: int = 6, seed: int = 0, out: str = "community_id"):
    """`community_id` processor (CommunityIdProcessor, 7.12): the
    Corelight community-id v1 flow hash — sha1 over (seed, ordered
    endpoint tuple, proto), base64, '1:' prefix. Byte assembly is
    vectorized; the sha1 itself is per-flow (same as the reference)."""
    import base64
    import hashlib
    import socket
    import struct

    def one(src: str, dst: str, sp: int, dp: int) -> str:
        a = socket.inet_aton(src)
        b = socket.inet_aton(dst)
        if (a, sp) > (b, dp):
            a, b, sp, dp = b, a, dp, sp
        payload = (struct.pack("!H", seed) + a + b +
                   struct.pack("!BBHH", proto, 0, sp, dp))
        return "1:" + base64.b64encode(
            hashlib.sha1(payload).digest()).decode()

    def f(t: pa.Table) -> pa.Table:
        vals = [one(s, d, int(sp), int(dp)) for s, d, sp, dp in zip(
            t[src_col].to_pylist(), t[dst_col].to_pylist(),
            t[sport_col].to_pylist(), t[dport_col].to_pylist())]
        return _put(t, out, pa.array(vals, pa.string()))

    return f


def network_direction(src_col: str, dst_col: str,
                      internal_networks: tuple[str, ...] = (
                          "10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"),
                      out: str = "direction"):
    """`network_direction` processor (NetworkDirectionProcessor, 7.13):
    inbound/outbound/internal/external from CIDR membership of both
    endpoints — vectorized u32 range tests."""
    import numpy as np

    ranges = [_cidr_range(c) for c in internal_networks]

    def is_internal(ips) -> "np.ndarray":
        u = np.array([_ip_to_u32(ip) for ip in ips], np.uint32)
        m = np.zeros(len(ips), bool)
        for lo, hi in ranges:
            m |= (u >= lo) & (u <= hi)
        return m

    def f(t: pa.Table) -> pa.Table:
        s = is_internal(t[src_col].to_pylist())
        d = is_internal(t[dst_col].to_pylist())
        vals = np.where(s & d, "internal",
                        np.where(s, "outbound",
                                 np.where(d, "inbound", "external")))
        return _put(t, out, pa.array(vals.tolist(), pa.string()))

    return f


def when(predicate, processor):
    """Per-processor `if` condition (ingest ConditionalProcessor, 6.5+:
    every processor spec may carry an `if` script; the processor runs
    only for documents where it evaluates true). `predicate` is a
    vectorized `pa.Table -> bool mask`; matching rows run the processor,
    the rest pass through untouched, and original row order is restored
    — per-document semantics at batch cost."""
    def f(t: pa.Table) -> pa.Table:
        import numpy as np

        mask = np.asarray(predicate(t), bool)
        if mask.all():
            return processor(t)
        if not mask.any():
            return t
        idx = pa.array(np.arange(len(t)), pa.int64())
        t2 = t.append_column("__row_idx", idx)
        done = processor(t2.filter(pa.array(mask)))
        rest = t2.filter(pa.array(~mask))
        # schema union: columns the processor added are null on the
        # untouched side; columns it removed are null on the done side
        for c in done.column_names:
            if c not in rest.column_names:
                rest = rest.append_column(
                    c, pa.nulls(len(rest), done.schema.field(c).type))
        for c in rest.column_names:
            if c not in done.column_names:
                done = done.append_column(
                    c, pa.nulls(len(done), rest.schema.field(c).type))
        merged = pa.concat_tables([done.select(rest.column_names), rest])
        merged = merged.sort_by("__row_idx")
        return merged.drop_columns(["__row_idx"])

    return f


def ignore_failure(processor):
    """`ignore_failure: true` (CompoundProcessor): an exception from the
    wrapped processor leaves the batch unchanged instead of failing the
    pipeline."""
    def f(t: pa.Table) -> pa.Table:
        try:
            return processor(t)
        except Exception:
            return t

    return f


def on_failure(fail_pred, body, handlers):
    """CompoundProcessor `on_failure` (server/src/main/java/org/
    elasticsearch/ingest/CompoundProcessor.java:35 onFailureProcessors,
    executeOnFailure): rows the body would fail are routed to the handler
    chain instead of failing the pipeline; handlers see the failure via
    `_ingest_on_failure_message` (the reference's on_failure_message
    ingest metadata). Vectorized split/apply/merge preserving row order —
    the failure condition is the `fail` processor's predicate, which is
    exactly the reference's FailProcessorException path.

    fail_pred: pa.Table -> BooleanArray (True = this row fails the body);
    body / handlers: composed processor callables (see pipeline())."""

    def f(t: pa.Table) -> pa.Table:
        mask = fail_pred(t)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(mask)
        order = pa.array(np.arange(len(t)), pa.int64())
        t2 = t.append_column("__row", order)
        ok = body(t2.filter(pc.invert(mask)))
        bad = t2.filter(mask)
        bad = _put(bad, "_ingest_on_failure_message",
                   pa.array(["fail condition met"] * len(bad), pa.string()))
        bad = handlers(bad)
        # align schemas (a column only one branch added -> nulls elsewhere)
        names = list(dict.fromkeys(ok.schema.names + bad.schema.names))
        def widen(x: pa.Table) -> pa.Table:
            for n in names:
                if n not in x.schema.names:
                    ref = ok if n in ok.schema.names else bad
                    x = x.append_column(
                        n, pa.nulls(len(x), ref.schema.field(n).type))
            return x.select(names)
        merged = pa.concat_tables([widen(ok), widen(bad)],
                                  promote_options="permissive")
        merged = merged.sort_by("__row")
        return merged.drop_columns(["__row"])

    return f


def dissect_advanced(col: str, pattern: str, out_prefix: str = "",
                     append_separator: str = ""):
    """`dissect` with the full DissectKey modifier set (libs/dissect/.../
    DissectParser.java:95, DissectKey.Modifier): `%{+key}` appends
    captures into one field (appearance order, or explicit `%{+key/n}`
    order) joined by append_separator; `%{?key}` is a named skip;
    `%{key->}` lets the following delimiter repeat (right padding);
    `%{*key}`/`%{&key}` reference pairs turn captured names into field
    names (the kv-style dynamic columns of DissectMatch). The basic
    dissect() stays as the fast path."""
    import re

    parts = []          # regex parts
    fields = []         # (group, target, order) for kept captures
    refnames = []       # (group, ref key) for %{*key}
    refvalues = []      # (group, ref key) for %{&key}
    gi = 0
    last = 0
    pad_prev = False
    matches = list(re.finditer(r"%\{([^}]*)\}", pattern))
    for i, m in enumerate(matches):
        lit = pattern[last:m.start()]
        if lit:
            parts.append(f"(?:{re.escape(lit)})+" if pad_prev
                         else re.escape(lit))
        pad_prev = False
        key = m.group(1)
        if key.endswith("->"):
            key = key[:-2]
            pad_prev = True
        order = None
        if key.startswith("+"):
            key = key[1:]
            if "/" in key:
                key, o = key.split("/", 1)
                order = int(o)
            target = key
            kind = "append"
        elif key.startswith("?"):
            key = key[1:]
            target = None
            kind = "skip"
        elif key.startswith("*"):
            key = key[1:]
            target = key
            kind = "refname"
        elif key.startswith("&"):
            key = key[1:]
            target = key
            kind = "refvalue"
        else:
            target = key
            kind = "plain"
        group = f"g{gi}"
        gi += 1
        is_last = i == len(matches) - 1
        parts.append(f"(?P<{group}>.*)" if is_last else f"(?P<{group}>.*?)")
        if kind == "refname":
            refnames.append((group, target))
        elif kind == "refvalue":
            refvalues.append((group, target))
        elif kind != "skip":
            fields.append((group, target, order))
        last = m.end()
    tail = pattern[last:]
    if tail:
        parts.append(f"(?:{re.escape(tail)})+" if pad_prev
                     else re.escape(tail))
    rx = re.compile("^" + "".join(parts) + "$")
    targets = list(dict.fromkeys(t for _, t, _ in fields))
    rn = dict(refnames)
    rv = {k: g for g, k in refvalues}

    def f(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in targets}
        dyn: dict[str, list] = {}
        n_done = 0
        for s in t[col].to_pylist():
            m = rx.match(s) if s is not None else None
            if m is None:
                for k in targets:
                    cols[k].append(None)
                for k in dyn:
                    dyn[k].append(None)
                n_done += 1
                continue
            per: dict[str, list] = {k: [] for k in targets}
            for idx, (group, target, order) in enumerate(fields):
                per[target].append(
                    (order if order is not None else idx, m.group(group)))
            for k in targets:
                vals = [v for _, v in sorted(per[k], key=lambda x: x[0])]
                cols[k].append(append_separator.join(vals))
            # reference pairs: %{*k} capture names the column, %{&k} its value
            for g, key in refnames:
                name = m.group(g)
                val = m.group(rv[key]) if key in rv else None
                if name not in dyn:
                    dyn[name] = [None] * n_done
                dyn[name].append(val)
            for k in dyn:
                if len(dyn[k]) <= n_done:
                    dyn[k].append(None)
            n_done += 1
        for k in targets:
            t = _put(t, out_prefix + k, pa.array(cols[k], pa.string()))
        for k in sorted(dyn):
            t = _put(t, out_prefix + k, pa.array(dyn[k], pa.string()))
        return t

    return f
