"""Ingest plugin processors added in 7.12-7.13 (ingest-common):
uri_parts, registered_domain, community_id, network_direction."""

from __future__ import annotations

import pyarrow as pa

from elasticsearch_ray.functions import ingest as I


def test_uri_parts_full_and_minimal():
    t = pa.table({"uri": [
        "https://user@www.example.co.uk:8080/a/b.html?x=1#frag",
        "ftp://files.example.com/f.txt",
        "https://example.com"]})
    r = I.uri_parts("uri")(t)
    assert r["url_scheme"].to_pylist() == ["https", "ftp", "https"]
    assert r["url_user_info"].to_pylist() == ["user", None, None]
    assert r["url_port"].to_pylist() == [8080, None, None]
    assert r["url_path"].to_pylist() == ["/a/b.html", "/f.txt", None]
    assert r["url_query"].to_pylist() == ["x=1", None, None]
    assert r["url_fragment"].to_pylist() == ["frag", None, None]
    assert r["url_extension"].to_pylist() == ["html", "txt", None]


def test_registered_domain_psl_longest_match():
    t = pa.table({"host": ["www.example.co.uk", "a.b.site.github.io",
                           "plain.com", "nosuffix.zz"]})
    r = I.registered_domain("host")(t)
    assert r["registered_domain"].to_pylist() == [
        "example.co.uk", "site.github.io", "plain.com", None]
    assert r["subdomain"].to_pylist() == ["www", "a.b", None, None]
    assert r["top_level_domain"].to_pylist() == [
        "co.uk", "github.io", "com", None]


def test_community_id_spec_vector():
    # the Corelight community-id spec's published TCP vector
    t = pa.table({"s": ["128.232.110.120"], "d": ["66.35.250.204"],
                  "sp": [34855], "dp": [80]})
    r = I.community_id("s", "d", "sp", "dp", proto=6)(t)
    assert r["community_id"].to_pylist() == ["1:LQU9qZlK+B5F3KDmev6m5PMibrg="]


def test_community_id_direction_invariant():
    # the flow hash is symmetric: (src, dst) and (dst, src) agree
    a = I.community_id("s", "d", "sp", "dp")(pa.table(
        {"s": ["10.0.0.1"], "d": ["10.0.0.2"], "sp": [1111], "dp": [2222]}))
    b = I.community_id("s", "d", "sp", "dp")(pa.table(
        {"s": ["10.0.0.2"], "d": ["10.0.0.1"], "sp": [2222], "dp": [1111]}))
    assert a["community_id"].to_pylist() == b["community_id"].to_pylist()


def test_network_direction_quadrants():
    t = pa.table({"s": ["10.1.2.3", "203.0.113.5", "192.168.1.1", "8.8.8.8"],
                  "d": ["10.9.9.9", "10.0.0.1", "203.0.113.9", "1.1.1.1"]})
    r = I.network_direction("s", "d")(t)
    assert r["direction"].to_pylist() == [
        "internal", "inbound", "outbound", "external"]


def test_network_direction_custom_networks():
    t = pa.table({"s": ["172.16.5.5"], "d": ["172.31.255.255"]})
    r = I.network_direction("s", "d")(t)
    assert r["direction"].to_pylist() == ["internal"]  # 172.16.0.0/12
