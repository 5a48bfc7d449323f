"""ES|QL scalar-expression engine (esql_expr): parser unit tests plus
end-to-end differential checks of WHERE/EVAL grammar against DuckDB.

Reference surface: x-pack/plugin/esql EsqlBaseParser.g4 booleanExpression
and the EsqlFunctionRegistry scalar functions.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from elasticsearch_ray.functions import esql
from elasticsearch_ray.functions.esql_expr import (
    compile_eval, compile_predicate, parse_expr)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- parser unit

def test_precedence_and_or_not():
    # NOT binds tighter than AND which binds tighter than OR
    ast = parse_expr('a == 1 OR NOT b == 2 AND c == 3')
    assert ast[0] == "or"
    assert ast[2][0] == "and" and ast[2][1][0] == "not"


def test_arith_precedence():
    ast = parse_expr("a + b * 2 - c / 4")
    # ((a + (b*2)) - (c/4))
    assert ast == ("arith", "-",
                   ("arith", "+", ("col", "a"),
                    ("arith", "*", ("col", "b"), ("lit", 2))),
                   ("arith", "/", ("col", "c"), ("lit", 4)))


def test_rejects_trailing_garbage():
    with pytest.raises(ValueError):
        parse_expr("a == 1 extra tokens")
    with pytest.raises(ValueError):
        parse_expr("a ==")


def test_predicate_batch_semantics():
    t = pa.table({"x": [1, 2, 3, None], "s": ["ab", "cd", "ae", None]})
    f = compile_predicate('x >= 2 OR s LIKE "a?"')
    out = f(t)
    assert out["x"].to_pylist() == [1, 2, 3]
    f2 = compile_predicate("x IS NULL")
    assert f2(t)["s"].to_pylist() == [None]
    f3 = compile_predicate("x IN (1, 3) AND NOT s RLIKE \"c.\"")
    assert f3(t)["x"].to_pylist() == [1, 3]


def test_eval_chained_and_overwrite():
    t = pa.table({"x": [1, 2]})
    t = compile_eval("y", "x * 10")(t)
    t = compile_eval("y", "y + COALESCE(NULL, 5)")(t)
    assert t["y"].to_pylist() == [15, 25]


# ------------------------------------------------ differential vs DuckDB

CASES = [
    ("""FROM events
        | WHERE value > 10 AND (event_type == "click" OR event_type == "view")
        | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events
        WHERE value > 10 AND (event_type = 'click' OR event_type = 'view')"""),
    ("""FROM events | WHERE event_type IN ("click", "view") AND NOT value <= 5
        | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events
        WHERE event_type IN ('click','view') AND NOT value <= 5"""),
    ("""FROM events | WHERE event_type LIKE "cl*" | STATS c = COUNT(*)""",
     """SELECT count(*) c FROM events WHERE event_type LIKE 'cl%'"""),
    ("""FROM events
        | EVAL v2 = ROUND(value * 2 + 1, 1), ln = LENGTH(event_type)
        | WHERE v2 > 20 | STATS s = SUM(ln), m = MAX(v2)""",
     """SELECT sum(ln) s, max(v2) m FROM (
          SELECT round(value*2+1, 1) v2, length(event_type) ln FROM events)
        WHERE v2 > 20"""),
    ("""FROM events
        | EVAL u = TO_UPPER(event_type), p = SUBSTRING(event_type, 2, 3)
        | STATS c = COUNT(*) BY u, p | SORT u, p""",
     """SELECT upper(event_type) u, substring(event_type, 2, 3) p,
          count(*) c FROM events GROUP BY 1,2 ORDER BY 1,2"""),
    ("""FROM events
        | EVAL b = CASE(value > 50, "hi", value > 20, "mid", "lo")
        | STATS c = COUNT(*) BY b | SORT b""",
     """SELECT CASE WHEN value > 50 THEN 'hi' WHEN value > 20 THEN 'mid'
          ELSE 'lo' END b, count(*) c FROM events GROUP BY 1 ORDER BY 1"""),
    ("""FROM events
        | EVAL g = GREATEST(value, 50.0), q = MOD(TO_INTEGER(value), 7)
        | STATS s = SUM(g), t = SUM(q)""",
     """SELECT sum(greatest(value, 50.0)) s,
          sum(trunc(value)::BIGINT % 7) t FROM events"""),
    ("""FROM events
        | EVAL c = CONCAT(event_type, "_", TO_STRING(TO_INTEGER(value)))
        | STATS n = COUNT(*) BY c | SORT n DESC, c | LIMIT 5""",
     """SELECT event_type || '_' || trunc(value)::BIGINT::VARCHAR c,
          count(*) n FROM events GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 5"""),
]


@pytest.mark.parametrize("eq,sql", CASES, ids=[c[0].split("|")[1].strip()[:40]
                                               for c in CASES])
def test_expression_grammar_vs_duckdb(ray_session, eq, sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(sql).df()
    out = esql.run(SF, eq).reset_index(drop=True)
    out = out[sorted(out.columns)]
    want = want[sorted(want.columns)]
    pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-9)
