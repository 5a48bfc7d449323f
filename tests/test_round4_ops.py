"""Round-4 operator gates: ES|QL grammar depth, Painless surface,
Brazilian RSLP, fvh offsets, and the minhash two-pass invariants."""

from __future__ import annotations

import numpy as np

from elasticsearch_ray.pipelines import ops

SF = "/root/testdata/sf0.001"


def test_esql_where_boolean_tree(ray_session):
    out = ops.esql_where_boolean(SF)
    assert set(out["event_type"]) <= {"click", "view"}
    # NOT (value < 20): per-group sum must be >= 20 * n
    assert (out["s"] >= 20 * out["n"]).all()


def test_esql_where_functions_disjunction(ray_session):
    out = ops.esql_where_functions(SF)
    for et in out["event_type"]:
        assert et.startswith("c") or len(et) == 4


def test_esql_eval_case_bands(ray_session):
    out = ops.esql_eval_case(SF)
    got = dict(zip(out["band"], out["m"]))
    if "low" in got:
        assert got["low"] < 25
    if "mid" in got:
        assert 25 <= got["mid"] < 75


def test_esql_where_in_like(ray_session):
    out = ops.esql_where_in_like(SF)
    assert set(out["lang"]) <= {"en", "de"}
    assert not any(s.startswith("src1") for s in out["source"])


def test_esql_eval_string_keys(ray_session):
    out = ops.esql_eval_string(SF)
    assert all(s.startswith("SRC") and len(s) <= 4 for s in out["s"])
    assert (out["wmax"] > 0).all()


def test_esql_where_date_buckets(ray_session):
    out = ops.esql_where_date(SF)
    # every bucket is a midnight timestamp
    assert (out["day"].dt.hour == 0).all()
    assert (out["n"] > 0).all()


def test_painless_string_methods_vectorized():
    from elasticsearch_ray.scripting import compile_painless, safe_eval_expr

    env = {"s": np.array(["Abc def", " xy ", ""], dtype=object),
           "params": {"q": "Abc"}, "where": np.where}
    def run(src):
        return safe_eval_expr(compile_painless(src), env)
    assert list(run("doc['s'].value.contains('bc')")) == [True, False, False]
    assert list(run("doc['s'].value.startsWith(params.q)")) == \
        [True, False, False]
    assert list(run("doc['s'].value.substring(0, 3)")) == ["Abc", " xy", ""]
    assert list(run("doc['s'].value.trim().length()")) == [7, 2, 0]
    assert list(run("doc['s'].value.isEmpty()")) == [False, False, True]
    assert list(run("doc['s'].value.indexOf('def')")) == [4, -1, -1]
    # ternary + boolean ops
    assert list(run("doc['s'].value.contains('x') ? 1 : 0")) == [0, 1, 0]
    assert list(run("!doc['s'].value.isEmpty() && "
                    "doc['s'].value.length() > 4")) == [True, False, False]


def test_painless_sandbox_rejects_escapes():
    import pytest

    from elasticsearch_ray.scripting import (
        ScriptError, compile_painless, safe_eval_expr)

    env = {"s": np.array(["a"], dtype=object), "params": {"k": 1}}
    for bad in ["().__class__", "s.__class__", "s.join('x')",
                "params.__class__", "__import__('os')",
                "s.encode()", "getattr(s, 'upper')"]:
        with pytest.raises(ScriptError):
            safe_eval_expr(compile_painless(bad), env)


def test_painless_gates_shapes(ray_session):
    out = ops.painless_substring_field(SF)
    assert (out["key"].str.startswith("SRC")).all()
    sc = ops.painless_ternary_score(SF)
    hi = sc[sc["score"] > 2.5]["score"]
    assert (hi > 20).all()  # above the cut, score = n_chars/10 > 20


def test_fvh_offsets_sidecar(ray_session, tmp_path):
    """fvh reads spans from the index's offsets sidecar: build a tiny
    index over docs including one LARGE doc, check the sidecar exists,
    and that highlights wrap exactly the indexed-position occurrences
    (offsets-sourced, not re-derived — the big doc's spans round-trip)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.search.engine import IndexSearcher

    big = ("filler words here . " * 5000) + "needle in the haystack " + \
          ("more filler . " * 5000) + "needle again"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["no match here", big, "a needle doc"], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, analyzer="simple", index_positions=True,
                docs_per_partition=10, num_buckets=4,
                content_column="text", meta_columns=(),
                store_offsets_column="text")
    assert os.path.exists(os.path.join(idx, "offsets", "_COMMITTED"))
    off = pq.read_table(os.path.join(idx, "offsets"))
    assert off.num_rows == 3
    # the large doc's stored spans match its true token spans
    import re

    starts = off.filter(pa.compute.equal(off["doc_id"], 1))["starts"][0]
    true_starts = [m.start() for m in re.finditer(r"[a-z0-9]+", big.lower())]
    assert starts.as_py() == true_starts

    s = IndexSearcher(idx, main_field="text", score_mode="exact64")
    ids, _ = s.search({"kind": "term", "term": "needle", "k": 3})
    assert set(int(i) for i in ids) == {1, 2}
    # reproduce the fvh span mapping for the big doc from the SIDECAR
    tp = s._get_term("needle")
    pos = dict(zip((int(i) for i in ids), s._positions_for(tp, ids)))
    ends = off.filter(pa.compute.equal(off["doc_id"], 1))["ends"][0].as_py()
    for p in pos[1]:
        a, b = true_starts[int(p)], ends[int(p)]
        assert big[a:b].lower() == "needle"


def test_sql_boolean_grammar(ray_session):
    out = ops.sql_where_or(SF)
    assert set(out["event_type"]) <= {"click", "view"}
    out2 = ops.sql_where_boolean_tree(SF)
    # every surviving group satisfies NOT(value<50): error or high-value
    assert set(out2["event_type"]) <= {"error", "click", "view", "purchase"}
    out3 = ops.sql_where_not_like(SF)
    assert (out3["doc_id"] >= 0).all()


def test_ml_surface_gates(ray_session):
    out = ops.ml_anomaly_mean_value(SF)
    assert (out["record_score"] >= 90.0).all()
    pv = ops.ml_datafeed_agg_preview(SF)
    assert len(pv) <= 5 and pv["time"].is_monotonic_increasing
    est = ops.ml_estimate_model_memory(SF)
    row = est.iloc[0]
    assert row["model_memory_estimate_bytes"] == (
        10 * 1024 * 1024 + 65536 * row["by_field_cardinality"]
        + 32768 * row["partition_field_cardinality"])


def test_painless_ternary_quote_safety():
    """? and : inside string literals must not confuse the ternary
    rewriter (quote-aware _find_top)."""
    from elasticsearch_ray.scripting import compile_painless, safe_eval_expr

    env = {"s": np.array(["a?b", "c:d"], dtype=object), "params": {},
           "where": np.where}
    out = safe_eval_expr(
        compile_painless("doc['s'].value.contains('?') ? 1 : 0"), env)
    assert list(out) == [1, 0]
    out = safe_eval_expr(
        compile_painless("doc['s'].value.contains(':') ? 'y:n' : 'q?'"), env)
    assert list(out) == ["q?", "y:n"]


def test_painless_multi_statement():
    from elasticsearch_ray.scripting import (
        ScriptError, compile_painless_script, safe_eval_script)
    import pytest

    env = {"v": np.array([10.0, 20.0]), "params": {"b": 1.0},
           "where": np.where}
    st = compile_painless_script(
        "def x = doc['v'].value * 2; long y = 3; x = x + y; return x + params.b")
    assert list(safe_eval_script(st, env)) == [24.0, 44.0]
    # caller env never mutated by locals
    assert "x" not in env and "y" not in env
    with pytest.raises(ScriptError):
        # no return reached for any row
        safe_eval_script(
            compile_painless_script("def x = 1; def y = 2;"), env)
    with pytest.raises(ScriptError):
        # loop-counter cap (Painless MAX_LOOP_COUNTER analog)
        safe_eval_script(compile_painless_script("while (true) {} return 1"),
                         env)
    with pytest.raises(ScriptError):
        safe_eval_script(compile_painless_script(
            "def x = __import__('os'); return x"), env)


def test_painless_control_flow():
    from elasticsearch_ray.scripting import (
        ScriptError, compile_painless_script, safe_eval_script)
    import pytest

    env = {"v": np.array([10.0, 20.0, 7.0]), "params": {},
           "where": np.where}

    # vectorized early return: rows take different paths
    st = compile_painless_script(
        "if (doc['v'].value >= 15) { return doc['v'].value * 2.0; }"
        "return doc['v'].value * 0.5;")
    assert list(safe_eval_script(st, env)) == [5.0, 40.0, 3.5]

    # else-if chain with assignment merge
    st = compile_painless_script(
        "def s = 0.0;"
        "if (doc['v'].value >= 18) { s = 100.0; }"
        "else if (doc['v'].value >= 9) { s = 50.0; }"
        "else { s = 1.0; }"
        "return s;")
    assert list(safe_eval_script(st, env)) == [50.0, 100.0, 1.0]

    # while with PER-ROW iteration counts (shrinking active mask)
    st = compile_painless_script(
        "def w = doc['v'].value; def n = 0;"
        "while (w >= 3) { w = w / 2.0; n += 1; }"
        "return n;")
    assert list(safe_eval_script(st, env)) == [2, 3, 2]
    # scalar env takes the same path (differential parity)
    for x, exp in ((10.0, 2), (20.0, 3), (7.0, 2)):
        assert safe_eval_script(
            st, {"v": x, "params": {}, "where": np.where}) == exp

    # C-style for + compound assignment + i++
    st = compile_painless_script(
        "def t = 0.0;"
        "for (def i = 0; i < 3; i++) { t += doc['v'].value / (i + 1.0); }"
        "return t;")
    got = safe_eval_script(st, env)
    exp = [sum(x / (i + 1.0) for i in range(3)) for x in (10.0, 20.0, 7.0)]
    assert list(got) == exp

    # for-each over a params list
    st = compile_painless_script(
        "def t = 0.0; for (w : params.ws) { t += w; } return t;")
    assert safe_eval_script(
        st, {"params": {"ws": [1.0, 2.5]}, "where": np.where}) == 3.5

    # block scoping: loop variable dies at block end
    with pytest.raises(ScriptError):
        safe_eval_script(compile_painless_script(
            "for (def i = 0; i < 2; i++) { def q = 1; } return i;"), env)
    # java.lang.Math statics: vectorized numpy kernels, Java half-up round
    st = compile_painless_script(
        "return Math.sqrt(Math.abs(doc['v'].value)) "
        "+ Math.round(Math.max(doc['v'].value, 0.5));")
    got = safe_eval_script(st, env)
    exp = [np.sqrt(abs(x)) + np.floor(max(x, 0.5) + 0.5)
           for x in (10.0, 20.0, 7.0)]
    assert np.allclose(np.asarray(got, np.float64), exp)
    with pytest.raises(ScriptError):
        safe_eval_script(
            compile_painless_script("return Math.getClass();"), env)

    # break / continue: per-row loop control (round-5 completion)
    st = compile_painless_script(
        "def p = 1.0;"
        "while (true) { if (p >= doc['v'].value) { break; } p = p * 2.0; }"
        "return p;")
    assert list(safe_eval_script(st, env)) == [16.0, 32.0, 8.0]
    st = compile_painless_script(
        "def t = 0.0;"
        "for (def i = 0; i < 6; i++) {"
        " if (i % 2 == 0) { continue; } t += i; }"
        "return t;")
    assert safe_eval_script(
        st, {"params": {}, "where": np.where}) == 9.0
    with pytest.raises(ScriptError):
        compile_painless_script("break; return 1;")  # outside a loop

    # user-defined functions: recursion capped, no script-local leakage
    st = compile_painless_script(
        "def fact(def n) { if (n <= 1) { return 1.0; }"
        " return n * fact(n - 1); }"
        "return fact(5) + doc['v'].value;")
    assert list(safe_eval_script(st, env)) == [130.0, 140.0, 127.0]
    with pytest.raises(ScriptError):
        safe_eval_script(compile_painless_script(
            "def secret = 1; def leak(def x) { return secret; }"
            "return leak(1);"), env)
    with pytest.raises(ScriptError):  # unbounded recursion
        safe_eval_script(compile_painless_script(
            "def f(def x) { return f(x); } return f(1);"), env)

    # escape still rejected inside blocks
    with pytest.raises(ScriptError):
        safe_eval_script(compile_painless_script(
            "if (true) { def z = ().__class__; } return 1;"), env)


def test_minhash_exact_prepass_parity(ray_session):
    """exact_prepass=True must produce the identical (doc_id, kept)
    frame as the direct path — exact cliques collapse to reps and
    expand back; near-dup merges ride representative pairs."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import minhash_dedup

    base = "query scan filter merge batch window column vector " * 30
    rows = [{"doc_id": i,
             "text": f"unique doc {i} " + "y" * 13 + f" c{i*104729}"}
            for i in range(20)]
    rows += [{"doc_id": 100, "text": base},
             {"doc_id": 101, "text": base + " tiny tail"},
             {"doc_id": 200, "text": rows[5]["text"]},   # exact dup of 5
             {"doc_id": 201, "text": rows[5]["text"]},   # 3-clique
             {"doc_id": 300, "text": base}]              # exact dup of 100
    ds = rd.from_items(rows)
    direct = minhash_dedup(ds, threshold=0.7)
    pre = minhash_dedup(ds, threshold=0.7, exact_prepass=True)
    assert direct.equals(pre)
    kept = dict(zip(pre["doc_id"], pre["kept"]))
    assert kept[200] == kept[201] == kept[5] == 5
    assert kept[300] == kept[101] == kept[100] == 100


def test_painless_vectorized_vs_scalar_fuzz():
    """Differential fuzz: every generated script must produce the same
    values evaluated VECTORIZED (numpy array env) and per-row SCALAR
    (python values env) — the two execution paths of _str_method and the
    ternary kernel."""
    import random

    from elasticsearch_ray.scripting import compile_painless, safe_eval_expr

    rng = random.Random(40404)
    words = ["alpha Beta", "  gamma ", "", "Data lake", "x?y:z", "abc"]
    nums = [0.0, 1.5, -2.0, 99.0, 7.25]

    def gen_str_expr():
        m = rng.choice([
            "doc['s'].value.contains({q})",
            "doc['s'].value.startsWith({q})",
            "doc['s'].value.endsWith({q})",
            "doc['s'].value.indexOf({q})",
            "doc['s'].value.trim().length()",
            "doc['s'].value.toUpperCase().equals({q})",
            "doc['s'].value.substring(0, 3).toLowerCase()",
            "doc['s'].value.replace({q}, \"_\").length()",
            "doc['s'].value.isEmpty()",
        ])
        return m.format(q=rng.choice(['"a"', '"Data"', '" "', '"?"', '"z"']))

    def gen_num_expr():
        return rng.choice([
            "doc['v'].value * 2 + 1",
            "doc['v'].value > 1.0 ? doc['v'].value : -doc['v'].value",
            "doc['v'].value >= 0 && doc['v'].value < 50",
            "!(doc['v'].value == 1.5)",
        ])

    for _ in range(120):
        src = rng.choice([gen_str_expr, gen_num_expr])()
        compiled = compile_painless(src)
        svals = [rng.choice(words) for _ in range(6)]
        nvals = [rng.choice(nums) for _ in range(6)]
        vec_env = {"s": np.array(svals, dtype=object),
                   "v": np.array(nvals, np.float64),
                   "params": {}, "where": np.where}
        vec = safe_eval_expr(compiled, vec_env)
        for i in range(6):
            sc_env = {"s": svals[i], "v": nvals[i], "params": {},
                      "where": lambda c, a, b: a if c else b}
            got = safe_eval_expr(compiled, sc_env)
            assert got == vec[i] or (
                isinstance(got, float) and np.isclose(got, vec[i])), \
                (src, i, got, vec[i])


def test_painless_statement_tree_fuzz():
    """Differential fuzz over random STATEMENT TREES (declarations,
    if/else chains, bounded while/for loops, compound assignment): the
    vectorized masked interpreter (array env) must equal per-row scalar
    interpretation (python-value env) on every generated script."""
    import random

    from elasticsearch_ray.scripting import (
        compile_painless_script, safe_eval_script)

    rng = random.Random(50505)
    nums = [0.0, 1.5, -2.0, 99.0, 7.25, 40.0, 12.5]

    def gen_expr(names):
        base = rng.choice(
            ["doc['v'].value", "doc['v'].value * 0.5 + 1"]
            + [n for n in names] * 2)
        op = rng.choice([" + 1.5", " * 2.0", " - 0.25", ""])
        return base + op

    def gen_cond(names):
        lhs = rng.choice(["doc['v'].value"] + list(names))
        return f"{lhs} {rng.choice(['>=', '<', '>'])} " \
               f"{rng.choice(['1.0', '10.0', '40.0'])}"

    def gen_script():
        parts = ["def a = doc['v'].value; def b = 0.0;"]
        names = ["a", "b"]
        for _ in range(rng.randrange(1, 4)):
            kind = rng.randrange(6)
            if kind == 0:
                parts.append(
                    f"if ({gen_cond(names)}) {{ b = {gen_expr(names)}; }}"
                    f" else {{ b = {gen_expr(names)}; }}")
            elif kind == 1:
                parts.append(
                    f"if ({gen_cond(names)}) {{ a = {gen_expr(names)}; }}")
            elif kind == 2:
                # convergent loop: halve until below a bound
                parts.append(
                    "while (a > 2.0) { a = a / 2.0; b += 1.0; }")
            elif kind == 3:
                parts.append(
                    f"for (def i = 0; i < {rng.randrange(1, 4)}; i++)"
                    f" {{ b += {gen_expr(['a'])}; }}")
            elif kind == 4:
                # while(true) + per-row data-dependent break
                bound = rng.choice(["3.0", "5.0", "8.0"])
                parts.append(
                    "while (true) { b += 1.0;"
                    f" if (b >= {bound}) {{ break; }} }}")
            else:
                # continue skips even iterations; update must still run
                parts.append(
                    "for (def i = 0; i < 5; i++)"
                    " { if (i % 2 == 0) { continue; } b += 0.25; }")
        parts.append("return a + b;")
        return " ".join(parts)

    for _ in range(80):
        src = gen_script()
        st = compile_painless_script(src)
        vals = [rng.choice(nums) for _ in range(5)]
        vec = safe_eval_script(
            st, {"v": np.array(vals, np.float64), "params": {},
                 "where": np.where})
        # a condition independent of doc values may legally collapse the
        # result to one scalar for every row — broadcast for comparison
        vec = np.broadcast_to(np.asarray(vec, np.float64), (len(vals),))
        for i, x in enumerate(vals):
            got = safe_eval_script(
                st, {"v": x, "params": {},
                     "where": lambda c, a, b: a if c else b})
            assert np.isclose(float(got), float(vec[i])), \
                (src, i, got, vec[i])


def test_merged_positions_parity(ray_session):
    """The merged-positions fast path must agree with the per-row loop
    (forced by resetting the merge cache to the fallback sentinel)."""
    from elasticsearch_ray.pipelines.fulltext import documents_searcher

    s = documents_searcher(SF)
    for text in ("data query", "slow merge", "query window data"):
        q = {"kind": "match_phrase", "text": text, "k": 10}
        ids_fast, sc_fast = s.search(q)
        # force per-row fallback on every involved term
        for tok in text.split():
            tp = s._get_term(tok)
            if tp is not None:
                tp._pos_merged = False
        ids_slow, sc_slow = s.search(q)
        for tok in text.split():
            tp = s._get_term(tok)
            if tp is not None:
                del tp._pos_merged
        assert list(ids_fast) == list(ids_slow)
        assert np.allclose(sc_fast, sc_slow)


def test_boilerplate_strip_semantics(ray_session):
    """Boilerplate chunks (df >= min_df) vanish from EVERY doc; rare
    chunks survive everywhere (distinct from keep-first dedup)."""
    import ray.data as rd

    from elasticsearch_ray.functions.dedup import boilerplate_strip

    bp = "copyright acme corp"
    rows = [{"doc_id": i, "text": f"{bp} unique body {i} stuff {i*7}"}
            for i in range(6)]
    rows.append({"doc_id": 99, "text": "totally original document here"})
    out = boilerplate_strip(rd.from_items(rows), chunk_words=3,
                            min_df=5).to_pandas().sort_values("doc_id")
    by = dict(zip(out["doc_id"], out["text_clean"]))
    for i in range(6):
        assert bp not in by[i]          # stripped everywhere
        assert f"unique body {i}" in by[i]
    assert by[99] == "totally original document here"
    assert (out[out["doc_id"] < 6]["n_removed"] >= 1).all()


def test_dangling_segment_recovery(ray_session, tmp_path):
    """_dangling_indices analog: a crashed build's manifest-less segment
    is listed, imported with a recovered manifest, and the index then
    searches with FULL parity vs the uncrashed build."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_ray.index.build import build_index
    from elasticsearch_ray.index.manifest import (
        committed_segments, dangling_segments, delete_dangling_segment,
        import_dangling_segment)
    from elasticsearch_ray.search.engine import IndexSearcher

    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array([f"alpha beta doc {i} token{i % 7}"
                          for i in range(40)], pa.string()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src, row_group_size=20)  # 2 fragments -> 2 segs
    idx = str(tmp_path / "idx")
    build_index(src, idx, analyzer="simple", docs_per_partition=20,
                num_buckets=4, content_column="text", meta_columns=())
    segs = sorted(committed_segments(idx))
    assert len(segs) == 2
    ref = IndexSearcher(idx, main_field="text", score_mode="exact64")
    q = {"kind": "term", "term": "alpha", "k": 40}
    ref_ids, ref_sc = ref.search(q)

    # simulate the crash: drop one segment's manifest
    victim = segs[1]
    os.remove(os.path.join(idx, victim, "manifest.json"))
    d = dangling_segments(idx)
    assert [x["segment_id"] for x in d] == [victim]
    assert d[0]["state"] == "uncommitted"

    m = import_dangling_segment(idx, victim)
    assert m.extra["recovered"] and m.doc_count == 20
    assert not dangling_segments(idx)
    s2 = IndexSearcher(idx, main_field="text", score_mode="exact64")
    ids2, sc2 = s2.search(q)
    assert list(ids2) == list(ref_ids)
    assert np.allclose(sc2, ref_sc)

    # delete path: refuses committed segments, removes dangling ones
    assert not delete_dangling_segment(idx, victim)  # now committed
    os.remove(os.path.join(idx, victim, "manifest.json"))
    assert delete_dangling_segment(idx, victim)
    assert victim not in committed_segments(idx)


def test_empty_result_edges(ray_session):
    """Zero-match WHERE must not crash any plan shape (round-4 fuzz
    findings): SQL group/global aggregates, ES|QL STATS and row-mode."""
    from elasticsearch_ray.functions import esql
    from elasticsearch_ray.functions.sql import run_sql
    from elasticsearch_ray.pipelines.ops import _ds

    out = run_sql("SELECT event_type, COUNT(*) AS n FROM events "
                  "WHERE value > 99999 GROUP BY event_type "
                  "ORDER BY event_type", SF, ds_factory=_ds)
    assert len(out) == 0 and list(out.columns) == ["event_type", "n"]
    g = run_sql("SELECT COUNT(*) AS n, AVG(value) AS a FROM events "
                "WHERE value > 99999", SF, ds_factory=_ds)
    assert len(g) == 1 and int(g["n"][0]) == 0 and np.isnan(g["a"][0])
    e = esql.run(SF, "FROM events | WHERE value > 99999 "
                     "| STATS n = COUNT(*) BY event_type | SORT event_type")
    assert len(e) == 0
    r = esql.run(SF, "FROM events | WHERE value > 99999 "
                     "| SORT value DESC | KEEP event_id, value | LIMIT 3")
    assert len(r) == 0 and list(r.columns) == ["event_id", "value"]


def test_unigram_tokenizer_trainer(ray_session):
    """Unigram-LM trainer (Kudo 2018): on a corpus with clear morphology
    the learned vocabulary contains the stems and suffixes, Viterbi
    segmentation splits words on them, and training is deterministic."""
    import pandas as pd
    import ray.data as rd

    from elasticsearch_ray.functions.bpe import (
        _viterbi_segment,
        fit_unigram_tokenizer,
        unigram_encode_counts,
    )

    rows = [{"doc_id": i,
             "text": "low lower lowest slow slower slowest "
                     "new newer newest fast faster fastest"}
            for i in range(8)]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    logp = fit_unigram_tokenizer(ds, vocab_size=40, em_iters=3)
    pieces = set(logp)
    # stems survive as whole pieces
    assert {"low", "slow", "new", "fast"} <= pieces
    # an UNSEEN compound segments into the learned stems (true Viterbi)
    assert _viterbi_segment("slowfast", logp, 6) == ["slow", "fast"]
    assert "".join(_viterbi_segment("lowest", logp, 6)) == "lowest"
    # deterministic across runs
    logp2 = fit_unigram_tokenizer(ds, vocab_size=40, em_iters=3)
    assert logp == logp2
    out = unigram_encode_counts(ds, logp, concurrency=2).to_pandas()
    assert (out["unigram_subwords"] > 12).all()  # 12 words, some split
    # unknown characters never crash segmentation
    assert "".join(_viterbi_segment("zq9", logp, 6)) == "zq9"


def test_painless_collections():
    """java.util List/Map whitelist: new ArrayList()/HashMap(),
    add/get/size/put/containsKey; escapes and unlisted methods still
    rejected; for-each iterates script-built lists."""
    import pytest

    from elasticsearch_ray.scripting import (
        ScriptError, compile_painless_script, safe_eval_script)

    env = {"v": np.array([10.0, 20.0]), "params": {"ws": [1.0, 2.0]},
           "where": np.where}
    st = compile_painless_script(
        "def l = new ArrayList();"
        "for (w : params.ws) { l.add(w * 2.0); }"
        "def m = new HashMap(); m.put('k', l.size());"
        "def t = 0.0; for (x : l) { t += x; }"
        "return doc['v'].value + t + m.get('k');")
    assert list(safe_eval_script(st, env)) == [18.0, 28.0]  # 6 + 2
    assert safe_eval_script(compile_painless_script(
        "def m = new HashMap(); m.put('a', 1);"
        "return m.containsKey('a') ? m.getOrDefault('a', 0) : -1;"),
        {"params": {}, "where": np.where}) == 1
    for bad in ["def l = new ArrayList(); return l.__class__;",
                "def l = new Object(); return 1;",
                "def l = new ArrayList(); l.append(1); return 1;",
                "def l = new ArrayList(); return l.get(5);"]:
        with pytest.raises(ScriptError):
            safe_eval_script(compile_painless_script(bad),
                             {"params": {}, "where": np.where})


def test_completion_automaton_parity():
    """The weighted prefix automaton (FST analog — best-first with
    per-node max-weight bounds) must return EXACTLY the sorted-array
    path's results for random corpora, prefixes, sizes, contexts and
    skip_duplicates — including weight ties resolved by input order."""
    import random

    from elasticsearch_ray.search.suggest import CompletionSuggester

    rng = random.Random(777)
    words = ["app", "apple", "apply", "applet", "ban", "band", "banana",
             "bat", "batch", "cat", "cater", "scan", "scatter", "scale"]
    for trial in range(30):
        entries = []
        for _ in range(rng.randrange(5, 40)):
            w = rng.choice(words) + rng.choice(["", "s", "er", "ing"])
            ctx = rng.choice([None, ["a"], ["b"], ["a", "b"]])
            entries.append((w, rng.randrange(1, 6), ctx))
        s = CompletionSuggester(entries)
        for _ in range(12):
            prefix = rng.choice(["a", "ap", "app", "b", "ba", "c", "sc",
                                 "z", ""])[:rng.randrange(1, 4)]
            size = rng.randrange(1, 6)
            ctx = rng.choice([None, "a", "b"])
            dup = rng.random() < 0.5
            fst = s.suggest(prefix, size=size, context=ctx,
                            skip_duplicates=dup)
            arr = s.suggest(prefix, size=size, context=ctx,
                            skip_duplicates=dup, _force_array=True)
            assert fst.to_dict("records") == arr.to_dict("records"), (
                trial, prefix, size, ctx, dup)
