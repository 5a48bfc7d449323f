"""Round-3 session-13 operators.

ES|QL hash functions (8.16): x-pack/plugin/esql/src/main/java/org/
elasticsearch/xpack/esql/expression/function/scalar/string/
{Md5,Sha1,Sha256,Hash}.java — per-value digest, lowercase hex output,
HASH(alg, input) generic form rejecting unknown algorithms.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.functions.esql_expr import evaluate, parse_expr
from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def _oracle(name: str):
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(E.oracle_sql()[name]).df()


def _ev(expr: str, t: pa.Table):
    return evaluate(parse_expr(expr), t)


def test_hash_known_vectors():
    t = pa.table({"s": ["abc", "", None]})
    assert _ev("MD5(s)", t).to_pylist() == [
        hashlib.md5(b"abc").hexdigest(),
        hashlib.md5(b"").hexdigest(), None]
    assert _ev("SHA1(s)", t).to_pylist()[0] == (
        "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert _ev("SHA256(s)", t).to_pylist()[0] == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")


def test_hash_generic_and_errors():
    t = pa.table({"s": ["x"]})
    assert _ev('HASH("sha512", s)', t).to_pylist() == [
        hashlib.sha512(b"x").hexdigest()]
    # algorithm name case-insensitive like the reference's MessageDigest
    assert _ev('HASH("MD5", s)', t).to_pylist() == [
        hashlib.md5(b"x").hexdigest()]
    with pytest.raises(ValueError, match="unsupported algorithm"):
        _ev('HASH("crc32", s)', t)


def test_esql_hash_functions_matches_oracle(ray_session):
    got = ops.esql_hash_functions(SF).reset_index(drop=True)
    exp = _oracle("esql_hash_functions")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# --- ES|QL spatial ST_* family (8.12-8.16 x-pack esql spatial functions) ---


def test_st_point_accessors_and_grid():
    t = pa.table({"p": ["POINT (10.40744 57.64911)", "POINT (-49.265506 -25.382708)"]})
    # ST_X/ST_Y return the WKT coordinates (lon, lat order)
    assert _ev("ST_X(p)", t).to_pylist() == [10.40744, -49.265506]
    assert _ev("ST_Y(p)", t).to_pylist() == [57.64911, -25.382708]
    # grid functions agree with the tested geohash/geotile kernels
    gh = _ev("ST_GEOHASH(p, 11)", t).to_pylist()
    assert gh[0] == "u4pruydqqvj"
    assert _ev("ST_GEOHASH(p, 8)", t).to_pylist()[1] == "6gkzwgjz"
    assert _ev("ST_GEOTILE(p, 3)", t).to_pylist() == ["3/4/2", "3/2/4"]


def test_st_distance_haversine():
    import numpy as np

    # equator degree: one degree of longitude at the equator on the
    # GeoUtils mean-radius sphere
    t = pa.table({"p": ["POINT (1 0)"]})
    d = _ev('ST_DISTANCE(p, TO_GEOPOINT("POINT (0 0)"))', t).to_pylist()[0]
    assert abs(d - 6371008.7714 * np.pi / 180.0) < 1e-6
    # symmetric and zero on identity
    assert _ev('ST_DISTANCE(p, TO_GEOPOINT("POINT (1 0)"))',
               t).to_pylist()[0] == 0.0


def test_st_predicates_polygon_envelope():
    t = pa.table({"p": ["POINT (0.5 0.5)", "POINT (50.5 0.5)",
                        "POINT (0.5 -80.5)"]})
    poly = 'TO_GEOSHAPE("POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))")'
    assert _ev(f"ST_INTERSECTS(p, {poly})", t).to_pylist() == [
        True, False, False]
    assert _ev(f"ST_WITHIN(p, {poly})", t).to_pylist() == [
        True, False, False]
    assert _ev(f"ST_DISJOINT(p, {poly})", t).to_pylist() == [
        False, True, True]
    env = 'TO_GEOSHAPE("ENVELOPE (-10, 60, 10, -10)")'
    assert _ev(f"ST_CONTAINS({env}, p)", t).to_pylist() == [
        True, True, False]
    with pytest.raises(ValueError, match="shape literal"):
        _ev("ST_WITHIN(p, p)", t)


def test_to_geopoint_validates():
    t = pa.table({"s": ["POINT (1 2)", "LINESTRING (0 0, 1 1)"]})
    with pytest.raises(ValueError):
        _ev("ST_X(TO_GEOPOINT(s))", t)


def test_esql_st_gates_match_oracle(ray_session):
    for name in ("esql_st_functions", "esql_st_centroid",
                 "esql_st_within_disjoint"):
        got = getattr(ops, name)(SF).reset_index(drop=True)
        exp = _oracle(name)
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_st_centroid_agg_partition_invariant(ray_session):
    # the centroid partials are int64 fixed-point sums: any partitioning
    # folds to the same totals
    from elasticsearch_ray.functions import esql

    q = '''
        FROM events
        | EVAL lat = ((user_id * 7919) % 180) - 90 + 0.5,
               lon = ((user_id * 104729) % 360) - 180 + 0.5
        | EVAL p = TO_GEOPOINT(CONCAT("POINT (", TO_STRING(lon), " ",
                                      TO_STRING(lat), ")"))
        | STATS c = ST_CENTROID_AGG(p) BY event_type
        | SORT event_type
    '''
    base = esql.run(SF, q)

    def reader(table):
        import ray.data as rd

        return rd.read_parquet(f"{SF}/{table}.parquet").repartition(7)

    repart = esql.run(SF, q, reader=reader)
    pd.testing.assert_frame_equal(base, repart)


# --- ES|QL :: inline cast operator (8.14) ---


def test_inline_cast_operator():
    t = pa.table({"v": [105.7, -3.2], "i": [1, 2]})
    assert _ev("v::long", t).to_pylist() == [105, -3]  # trunc toward zero
    assert _ev("i::string", t).to_pylist() == ["1", "2"]
    assert _ev("(v > 50)::string", t).to_pylist() == ["true", "false"]
    assert _ev("v::long::double", t).to_pylist() == [105.0, -3.0]
    # cast binds tighter than unary minus (EsqlBaseParser precedence)
    assert _ev("-v::long", t).to_pylist() == [-105, 3]
    with pytest.raises(ValueError, match="unsupported cast type"):
        _ev("v::frobnicate", t)


def test_esql_inline_cast_matches_oracle(ray_session):
    got = ops.esql_inline_cast(SF).reset_index(drop=True)
    exp = _oracle("esql_inline_cast")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# --- _cat/allocation + _migration/deprecations ---


def test_cat_allocation_matches_oracle(ray_session):
    got = ops.cat_allocation(SF).reset_index(drop=True)
    exp = _oracle("cat_allocation")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every shard placed exactly once across nodes
    assert int(got["shards"].sum()) == 4


def test_deprecation_info_matches_oracle(ray_session):
    got = ops.deprecation_info(SF).reset_index(drop=True)
    exp = _oracle("deprecation_info")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # events carries the unmapped dynamic-json warning at every sf
    assert (("events" == got["index"]) & (got["level"] == "warning")).any()


# --- _sql SYS commands: SHOW TABLES / DESCRIBE ---


def test_sql_sys_commands_match_oracle(ray_session):
    for name in ("sql_show_tables", "sql_describe_table"):
        got = getattr(ops, name)(SF).reset_index(drop=True)
        exp = _oracle(name)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sql_sys_grammar_forms():
    from elasticsearch_ray.functions.sql import SqlParseError, run_sql

    d1 = run_sql("DESCRIBE events", SF, ds_factory=None)
    d2 = run_sql("SHOW COLUMNS FROM events", SF, ds_factory=None)
    d3 = run_sql("desc events", SF, ds_factory=None)
    pd.testing.assert_frame_equal(d1, d2)
    pd.testing.assert_frame_equal(d1, d3)
    assert "props" in list(d1["column"])
    with pytest.raises(SqlParseError, match="unknown table"):
        run_sql("DESCRIBE nosuch", SF, ds_factory=None)
    # embeddings: list<float> maps to dense_vector, int32 to integer
    de = run_sql("DESCRIBE embeddings", SF, ds_factory=None)
    m = dict(zip(de["column"], de["mapping"]))
    assert m["embedding"] == "dense_vector" and m["label"] == "integer"


# --- ES|QL NOW() + date-period literals ---


def test_now_and_duration_literals():
    import datetime as dt

    t = pa.table({"ts": pa.array([dt.datetime(2024, 1, 10),
                                  dt.datetime(2024, 1, 24)],
                                 pa.timestamp("us"))})
    def scalar(expr):
        v = _ev(expr, t)
        return v.as_py() if hasattr(v, "as_py") else v

    assert scalar("NOW()") == dt.datetime(2024, 1, 25, 13, 45)
    assert _ev("ts > NOW() - 2 day", t).to_pylist() == [False, True]
    assert _ev("ts + 1 week", t).to_pylist() == [
        dt.datetime(2024, 1, 17), dt.datetime(2024, 1, 31)]
    # plural and singular unit spellings both parse
    assert scalar("NOW() - 2 hours") == dt.datetime(2024, 1, 25, 11, 45)
    assert scalar("NOW() - 90 minute") == dt.datetime(2024, 1, 25, 12, 15)


def test_esql_now_datemath_matches_oracle(ray_session):
    got = ops.esql_now_datemath(SF).reset_index(drop=True)
    exp = _oracle("esql_now_datemath")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
