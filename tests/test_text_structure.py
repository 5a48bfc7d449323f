"""_text_structure/find_structure analog (x-pack text-structure 7.13):
format detection, header detection, type inference, grok fallback."""

from __future__ import annotations

import pytest

from elasticsearch_ray.sources.structure import find_structure


def test_ndjson_detection_and_types():
    st = find_structure([
        '{"a": 1, "b": "x y z words here", "t": "2024-01-01T10:00:00Z"}',
        '{"a": 2, "b": "more prose text", "t": "2024-01-02T11:30:00Z"}'])
    assert st["format"] == "ndjson"
    assert st["mappings"] == {"a": "long", "b": "text", "t": "date"}
    assert st["timestamp_field"] == "t"


def test_delimited_with_header():
    st = find_structure(["id,name,score",
                         "1,alpha,2.5",
                         "2,beta,3.75"])
    assert st["format"] == "delimited" and st["delimiter"] == ","
    assert st["has_header_row"] is True
    assert st["column_names"] == ["id", "name", "score"]
    assert st["mappings"] == {"id": "long", "name": "keyword",
                              "score": "double"}


def test_delimited_without_header_synthesizes_names():
    st = find_structure(["1|x|2.5", "2|y|3.5"])
    assert st["format"] == "delimited" and st["delimiter"] == "|"
    assert st["has_header_row"] is False
    assert st["column_names"] == ["column1", "column2", "column3"]


def test_semi_structured_grok_fallback():
    st = find_structure([
        "2024-01-01T10:00:00Z node started",
        "2024-01-01T10:00:05Z shard allocated"])
    assert st["format"] == "semi_structured_text"
    assert st["grok_pattern"].startswith("%{TIMESTAMP_ISO8601:timestamp}")


def test_unstructured_rejected():
    with pytest.raises(ValueError, match="structure"):
        find_structure(["no timestamps here", "just words"])


def test_boolean_and_keyword_inference():
    st = find_structure(["flag,tag", "true,red", "false,blue"])
    assert st["mappings"] == {"flag": "boolean", "tag": "keyword"}
