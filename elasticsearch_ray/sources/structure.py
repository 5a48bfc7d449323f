"""_text_structure/find_structure analog (x-pack text-structure plugin,
7.13: TextStructureFinderManager): given sample text lines, detect the
file format (ndjson / delimited / semi-structured text), the column
names, a per-field ES mapping, and — for semi-structured text — a grok
pattern candidate with the timestamp field.

The finder itself is driver-side over a bounded sample (the reference
caps at `lines_to_sample`, default 1000); what scales is what the
result configures: the NDJSON/CSV fragment readers that then stream the
full corpus."""

from __future__ import annotations

import json
import re

_TS_RX = re.compile(
    r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?")
_INT_RX = re.compile(r"^[+-]?\d+$")
_NUM_RX = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_BOOL = {"true", "false"}


def _infer_type(values: list) -> str:
    """ES field type from sampled string/scalar values (the reference's
    TimestampFormatFinder + numeric/keyword heuristics)."""
    vs = [v for v in values if v is not None and v != ""]
    if not vs:
        return "keyword"
    if all(isinstance(v, bool) for v in vs):
        return "boolean"
    if all(isinstance(v, int) and not isinstance(v, bool) for v in vs):
        return "long"
    if all(isinstance(v, (int, float)) and not isinstance(v, bool)
           for v in vs):
        return "double"
    s = [str(v) for v in vs]
    if all(_TS_RX.fullmatch(x) for x in s):
        return "date"
    if all(x.lower() in _BOOL for x in s):
        return "boolean"
    if all(_INT_RX.fullmatch(x) for x in s):
        return "long"
    if all(_NUM_RX.fullmatch(x) for x in s):
        return "double"
    # text vs keyword: the reference maps free-form prose to text
    if sum(len(x) for x in s) / len(s) > 50 or any(" " in x for x in s):
        return "text"
    return "keyword"


def find_structure(lines: list[str], lines_to_sample: int = 1000) -> dict:
    """-> {"format", "column_names", "mappings", "has_header_row"?,
    "delimiter"?, "grok_pattern"?, "timestamp_field"?, "num_lines_analyzed"}."""
    sample = [ln for ln in lines[:lines_to_sample] if ln.strip()]
    if not sample:
        raise ValueError("no non-empty lines to analyze")

    # 1) NDJSON: every line is a JSON object
    objs = []
    for ln in sample:
        try:
            o = json.loads(ln)
        except (json.JSONDecodeError, ValueError):
            objs = None
            break
        if not isinstance(o, dict):
            objs = None
            break
        objs.append(o)
    if objs:
        fields: dict[str, list] = {}
        for o in objs:
            for k, v in o.items():
                fields.setdefault(k, []).append(v)
        mappings = {k: _infer_type(v) for k, v in sorted(fields.items())}
        ts = next((k for k, t in mappings.items() if t == "date"), None)
        out = {"format": "ndjson", "column_names": sorted(fields),
               "mappings": mappings, "num_lines_analyzed": len(sample)}
        if ts:
            out["timestamp_field"] = ts
        return out

    # 2) delimited: one candidate delimiter gives a consistent count >= 2
    for delim in (",", "\t", ";", "|"):
        counts = {ln.count(delim) for ln in sample}
        if len(counts) == 1 and counts.pop() >= 1:
            rows = [ln.split(delim) for ln in sample]
            head = rows[0]
            has_header = (len(set(head)) == len(head) and
                          not any(_NUM_RX.fullmatch(c.strip())
                                  for c in head))
            names = ([c.strip() for c in head] if has_header else
                     [f"column{i + 1}" for i in range(len(head))])
            body = rows[1:] if has_header else rows
            cols = list(zip(*body)) if body else [[] for _ in names]
            mappings = {n: _infer_type([c.strip() for c in col])
                        for n, col in zip(names, cols)}
            ts = next((k for k in names if mappings[k] == "date"), None)
            out = {"format": "delimited", "delimiter": delim,
                   "has_header_row": has_header, "column_names": names,
                   "mappings": mappings,
                   "num_lines_analyzed": len(sample)}
            if ts:
                out["timestamp_field"] = ts
            return out

    # 3) semi-structured text: require a recognizable timestamp and build
    # a grok candidate around it (the reference's fallback)
    if not all(_TS_RX.search(ln) for ln in sample):
        raise ValueError("could not determine the structure of the text")
    grok = "%{TIMESTAMP_ISO8601:timestamp} %{GREEDYDATA:message}"
    return {"format": "semi_structured_text", "grok_pattern": grok,
            "timestamp_field": "timestamp",
            "column_names": ["timestamp", "message"],
            "mappings": {"timestamp": "date", "message": "text"},
            "num_lines_analyzed": len(sample)}
