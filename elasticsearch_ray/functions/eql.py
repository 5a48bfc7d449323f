"""EQL (Event Query Language) executor over Ray Data.

Reference surface: x-pack/plugin/eql — EqlParser grammar (single-event
`<category> where <condition>` queries, `sequence by ... with maxspan=...
[ step ]+ until [ step ]`, and the head/tail/count/unique/sort pipes).
From-scratch
parser; each form lowers onto the idiomatic Ray Data shape:

- single-event query  -> pruned read + vectorized predicate (the ES|QL
  expression engine's pyarrow lowering) + timestamp-ordered head/tail
  (per-batch partial top-k, driver merges batches x n candidates)
- sequence            -> ONE groupby(join key).map_groups; inside a group
  every step is a sorted int64 timestamp array and the step chain is a
  vectorized searchsorted cascade — no pairwise blowup, no driver loop.
  `until` events break a pending chain the same way the reference's
  state machine drops a sequence when the until event fires between the
  first and last step (TumblingWindow/SequenceMatcher semantics).
- pipes               -> applied to the (already bounded) result

Event categories map onto the harness's events table: a leading
`<category> where` means `event_type == "<category>" AND`; `any where`
places no category constraint.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_SPAN_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000,
            "d": 86_400_000_000}

_STEP_RX = re.compile(r"\[\s*(\w+)\s+where\s+(.*?)\s*\]", re.S)
# step with optional `with runs=N` repetition (SequenceMatcher runs, 8.0:
# the step must match N consecutive times — expanded to N chain steps)
_STEP_RUNS_RX = re.compile(
    r"\[\s*(\w+)\s+where\s+(.*?)\s*\](?:\s+with\s+runs\s*=\s*(\d+))?",
    re.S)


def _expand_steps(body: str) -> list[str]:
    out = []
    for cat, pred, runs in _STEP_RUNS_RX.findall(body):
        out.extend([_category_predicate(cat, pred)] * int(runs or 1))
    return out
_SEQ_RX = re.compile(
    r"^sequence(?:\s+by\s+([\w.]+(?:\s*,\s*[\w.]+)*))?"
    r"(?:\s+with\s+maxspan\s*=\s*(\d+)"
    r"([smhd]))?\s*(.*)$", re.I | re.S)
_SINGLE_RX = re.compile(r"^(\w+)\s+where\s+(.*)$", re.S)
_SAMPLE_RX = re.compile(r"^sample\s+by\s+([\w.]+)\s*(.*)$", re.I | re.S)


def _split_pipes(q: str) -> tuple[str, list[tuple[str, str]]]:
    """Split `query | pipe args | ...` at top level (not inside quotes or
    [] step brackets)."""
    segs, buf, inq, depth = [], [], False, 0
    for ch in q:
        if ch == '"':
            inq = not inq
            buf.append(ch)
        elif not inq and ch in "[]":
            depth += 1 if ch == "[" else -1
            buf.append(ch)
        elif ch == "|" and not inq and depth == 0:
            segs.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    segs.append("".join(buf))
    head = segs[0].strip()
    pipes = []
    for seg in segs[1:]:
        name, _, arg = seg.strip().partition(" ")
        pipes.append((name.lower(), arg.strip()))
    return head, pipes


def _category_predicate(category: str, cond: str) -> str:
    cond = _rewrite_insensitive(cond)
    if category.lower() == "any":
        return cond
    return f'event_type == "{category}" AND ({cond})'


_INSENSITIVE_RX = re.compile(r'([\w.]+)\s*:\s*"([^"]*)"')


def _rewrite_insensitive(cond: str) -> str:
    """EQL `field : "pattern"` operator (7.16: case-insensitive wildcard
    string match) -> TO_LOWER(field) LIKE "lowered-pattern" in the
    shared expression engine."""
    return _INSENSITIVE_RX.sub(
        lambda m: f'TO_LOWER({m.group(1)}) LIKE "{m.group(2).lower()}"',
        cond)


def parse(query: str) -> dict:
    """-> {"kind": "event", "predicate", "pipes"} or
    {"kind": "sequence", "by", "maxspan_us", "steps", "until", "pipes"}."""
    head, pipes = _split_pipes(query.strip())
    m = _SEQ_RX.match(head)
    if m:
        by, n, unit, body = m.groups()
        until = None
        um = re.search(r"\buntil\b(.*)$", body, re.I | re.S)
        if um:
            body = body[:um.start()]
            usteps = _STEP_RX.findall(um.group(1))
            if len(usteps) != 1:
                raise ValueError("until takes exactly one [ step ]")
            until = _category_predicate(*usteps[0])
        steps = _expand_steps(body)
        if len(steps) < 2:
            raise ValueError("sequence needs at least two [ step ]s")
        return {"kind": "sequence", "by": by or None,
                "maxspan_us": int(n) * _SPAN_US[unit] if n else None,
                "steps": steps, "until": until, "pipes": pipes}
    m = _SAMPLE_RX.match(head)
    if m:
        by, body = m.groups()
        steps = [_category_predicate(c, p) for c, p in
                 _STEP_RX.findall(body)]
        if len(steps) < 2:
            raise ValueError("sample needs at least two [ step ]s")
        return {"kind": "sample", "by": by, "steps": steps, "pipes": pipes}
    m = _SINGLE_RX.match(head)
    if m:
        return {"kind": "event",
                "predicate": _category_predicate(m.group(1), m.group(2)),
                "pipes": pipes}
    raise ValueError(f"unsupported EQL query: {head[:60]!r}")


def _used_columns(plan: dict) -> set[str]:
    out = {"event_id", "ts", "event_type"}
    texts = plan.get("steps", []) + [plan.get("predicate", ""),
                                     plan.get("until") or ""]
    for s in texts:
        out.update(re.findall(r"[A-Za-z_][\w.]*", s))
    if plan.get("by"):
        out.update(b.strip() for b in plan["by"].split(","))
    # unique/sort pipe keys must survive the column-pruned read
    for name, arg in plan.get("pipes", []):
        if name in ("unique", "sort"):
            out.update(k.strip() for k in arg.split(",") if k.strip())
    return out


def run(sf_dir: str, query: str, table: str = "events") -> pd.DataFrame:
    """Execute an EQL query; returns a bounded pandas result."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from .esql_expr import compile_predicate

    plan = parse(query)
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path).remove_metadata()
    cols = [c for c in schema.names if c in _used_columns(plan)]
    ds = rd.read_parquet(path, columns=cols,
                         schema=pa.schema([schema.field(c) for c in cols]))

    if plan["kind"] == "event":
        pred = compile_predicate(plan["predicate"])
        ds = ds.map_batches(pred, batch_format="pyarrow")
        return _apply_pipes_event(ds, plan["pipes"], cols)

    if plan["kind"] == "sample":
        # sample (x-pack eql SampleIterator, 8.6): join-key groups holding
        # at least one event per filter, event ORDER IRRELEVANT (unlike
        # sequence). The reference returns a bounded number of samples,
        # one event per filter each; here every qualifying key is returned
        # (the boundary-free-oracle convention used by all_matches), with
        # the deterministic representative per filter = earliest
        # (ts, event_id). Step masks are tagged per batch; ONE groupby
        # co-partitions each key; the per-group pick is a vectorized
        # idxmin per step.
        from .esql_expr import evaluate, parse_expr

        by = plan["by"]
        nsteps = len(plan["steps"])
        step_asts = [parse_expr(s) for s in plan["steps"]]

        def tag_s(t: pa.Table) -> pa.Table:
            ts = t["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            key = t[by].to_numpy(zero_copy_only=False)
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            keys, tss, eids, steps = [], [], [], []
            for i, ast in enumerate(step_asts):
                m = np.asarray(
                    evaluate(ast, t).to_numpy(zero_copy_only=False), bool)
                keys.append(key[m])
                tss.append(ts[m])
                eids.append(eid[m])
                steps.append(np.full(int(m.sum()), i, np.int8))
            cat = (lambda xs, dt: np.concatenate(xs) if xs else
                   np.empty(0, dt))
            return pa.table({
                "k": pa.array(cat(keys, np.int64), pa.int64()),
                "ts": pa.array(cat(tss, np.int64), pa.int64()),
                "event_id": pa.array(cat(eids, np.int64), pa.int64()),
                "step": pa.array(cat(steps, np.int8), pa.int8()),
            })

        def per_key_s(df: pd.DataFrame) -> pd.DataFrame:
            if df["step"].nunique() < nsteps:
                return pd.DataFrame({
                    "k": pd.Series([], dtype=np.int64),
                    "step": pd.Series([], dtype=np.int64),
                    "event_id": pd.Series([], dtype=np.int64)})
            d = df.sort_values(["step", "ts", "event_id"]) \
                  .groupby("step", as_index=False).first()
            return pd.DataFrame({
                "k": d["k"].astype(np.int64),
                "step": d["step"].astype(np.int64),
                "event_id": d["event_id"].astype(np.int64)})

        out = _sharded_per_key(
            ds.map_batches(tag_s, batch_format="pyarrow"),
            ["k"], per_key_s).to_pandas()
        if "k" not in out.columns:
            out = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                "step": pd.Series([], dtype=np.int64),
                                "event_id": pd.Series([], dtype=np.int64)})
        out = out.rename(columns={"k": by})
        out = out.sort_values([by, "step"]).reset_index(drop=True)
        return _apply_pipes_frame(out, plan["pipes"])

    # sequence: tag each row with its step index (vectorized masks evaluated
    # via the ES|QL expression ASTs), then ONE shuffle co-partitions a join
    # key's events; the in-group chain is a searchsorted cascade over
    # sorted int64 timestamps.
    from .esql_expr import evaluate, parse_expr

    by = plan["by"]
    span = plan["maxspan_us"]
    nsteps = len(plan["steps"])
    step_asts = [parse_expr(s) for s in plan["steps"]]
    until_ast = parse_expr(plan["until"]) if plan["until"] else None

    bys = [b.strip() for b in by.split(",")] if by else []
    if len(bys) >= 2:
        # `sequence by k1, k2, ...` (EqlParser joinKeys): composite join
        # key — same tag/chain shape, one key column per field through
        # the SAME single groupby exchange
        return _run_sequence_multi(ds, bys, span, nsteps, step_asts,
                                   until_ast, plan["pipes"])

    def tag(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        key = t[by].to_numpy(zero_copy_only=False) if by \
            else np.zeros(len(t), np.int64)
        keys, tss, steps = [], [], []
        for i, ast in enumerate(step_asts):
            m = np.asarray(evaluate(ast, t).to_numpy(zero_copy_only=False),
                           bool)
            keys.append(key[m])
            tss.append(ts[m])
            steps.append(np.full(int(m.sum()), i, np.int8))
        if until_ast is not None:
            m = np.asarray(
                evaluate(until_ast, t).to_numpy(zero_copy_only=False), bool)
            keys.append(key[m])
            tss.append(ts[m])
            steps.append(np.full(int(m.sum()), -1, np.int8))
        return pa.table({
            "k": pa.array(np.concatenate(keys) if keys else
                          np.empty(0, np.int64), pa.int64()),
            "ts": pa.array(np.concatenate(tss) if tss else
                           np.empty(0, np.int64), pa.int64()),
            "step": pa.array(np.concatenate(steps) if steps else
                             np.empty(0, np.int8), pa.int8()),
        })

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        k = int(df["k"].iloc[0])
        arrs = [np.sort(df.loc[df["step"] == i, "ts"].to_numpy())
                for i in range(nsteps)]
        unt = np.sort(df.loc[df["step"] == -1, "ts"].to_numpy())
        if any(a.size == 0 for a in arrs):
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "seqs": pd.Series([], dtype=np.int64)})
        # chain: for each step-1 anchor, the earliest strictly-later event
        # of each following step (the reference matcher is first-match)
        cur = arrs[0].copy()
        first = arrs[0]
        ok = np.ones(cur.size, bool)
        for nxt in arrs[1:]:
            pos = np.searchsorted(nxt, cur, side="right")
            hit = pos < nxt.size
            ok &= hit
            cur = np.where(hit, nxt[np.minimum(pos, nxt.size - 1)], cur)
        if span is not None:
            ok &= (cur - first) <= span
        if unt.size:
            # drop chains with an until event in (first, last]
            u_in = (np.searchsorted(unt, cur, side="right") -
                    np.searchsorted(unt, first, side="right")) > 0
            ok &= ~u_in
        n = int(ok.sum())
        if n == 0:
            return pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                                 "seqs": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"k": [k], "seqs": [n]})

    out = _sharded_per_key(
        ds.map_batches(tag, batch_format="pyarrow"),
        ["k"], per_key).to_pandas()
    if "k" not in out.columns:  # zero sequences anywhere -> typed empty
        out = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                            "seqs": pd.Series([], dtype=np.int64)})
    out["k"] = out["k"].astype(np.int64)
    out["seqs"] = out["seqs"].astype(np.int64)
    name = by or "key"
    out = out.rename(columns={"k": name})
    out = out.sort_values(name).reset_index(drop=True)
    return _apply_pipes_frame(out, plan["pipes"])


def _sharded_per_key(tagged, keycols, fn, num_shards: int = 64):
    """groupby(keycols).map_groups(fn) with the per-key calls looped
    INSIDE 64 hash shards: join-key cardinality ~ row cardinality (every
    user is a key), which is the per-GROUP-cost regime Ray's sort-based
    groupby mishandles (functions/exchange.py; SCALE.md Round-4). A
    shard holds complete key groups, so fn sees exactly the frames it
    saw before."""
    import zlib

    keycols = list(keycols)

    def _shard(t: pa.Table) -> pa.Table:
        n = t.num_rows
        hb = np.zeros(n, np.uint64)
        for kc in keycols:
            col = t[kc]
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                h = np.fromiter((zlib.crc32(x.encode())
                                 for x in col.to_pylist()), np.uint64, n)
            else:
                h = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            hb = hb * np.uint64(1000003) + h
        return t.append_column(
            "_ks", pa.array((hb % num_shards).astype(np.int64)))

    def _run(g: pd.DataFrame) -> pd.DataFrame:
        outs = [fn(sub) for _, sub in
                g.drop(columns=["_ks"]).groupby(keycols, sort=False)]
        outs = [o for o in outs if len(o)]
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame())

    return (tagged.map_batches(_shard, batch_format="pyarrow")
            .groupby("_ks").map_groups(_run, batch_format="pandas"))


def _schema_safe(cols, out: pd.DataFrame) -> pd.DataFrame:
    """A zero-match stream collapses to a columnless empty frame (the
    empty-block schema problem); rebuild it with the read's column list
    so downstream sorts/pipes keep working."""
    if not (out.empty and len(out.columns) == 0):
        return out
    return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})


def _apply_pipes_event(ds, pipes: list[tuple[str, str]],
                       cols: list[str] | None = None) -> pd.DataFrame:
    """head/tail/count over a (ts, event_id)-ordered event stream.
    head n  -> per-batch partial top-n ascending; driver merge
    tail n  -> per-batch partial top-n descending; driver merge"""
    if not pipes:
        pipes = [("head", "10")]  # the reference's default size
    (name, arg), rest = pipes[0], pipes[1:]
    if name == "count":
        n = ds.count()
        return pd.DataFrame({"count": pd.Series([n], dtype=np.int64)})
    if name == "unique":
        # `| unique f1[, f2]` (EQL pipes: UniquePipe): keep the FIRST
        # event (ts, event_id order) per distinct key combo. Distributed
        # as a per-batch first-per-key combiner (only per-batch champions
        # reach the driver) + one tiny final pass — min composes.
        keys = [k.strip() for k in arg.split(",") if k.strip()]

        def upart(t: pa.Table) -> pa.Table:
            df = t.to_pandas().sort_values(["ts", "event_id"],
                                           kind="mergesort")
            return pa.Table.from_pandas(
                df.drop_duplicates(subset=keys, keep="first"),
                preserve_index=False)

        out = _schema_safe(cols or [], ds.map_batches(
            upart, batch_format="pyarrow").to_pandas())
        out = (out.sort_values(["ts", "event_id"], kind="mergesort")
               .drop_duplicates(subset=keys, keep="first")
               .reset_index(drop=True))
        return _apply_pipes_frame(out, rest)
    if name not in ("head", "tail"):
        raise ValueError(f"unsupported EQL pipe: {name}")
    n = int(arg or 10)
    asc = name == "head"

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["ts", "event_id"], ascending=asc, kind="mergesort").head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = _schema_safe(cols or [], ds.map_batches(
        partial, batch_format="pyarrow").to_pandas())
    out = out.sort_values(["ts", "event_id"], ascending=asc,
                          kind="mergesort").head(n)
    out = out.sort_values(["ts", "event_id"]).reset_index(drop=True)
    return _apply_pipes_frame(out, rest)


def _apply_pipes_frame(out: pd.DataFrame,
                       pipes: list[tuple[str, str]]) -> pd.DataFrame:
    for name, arg in pipes:
        if name == "count":
            out = pd.DataFrame(
                {"count": pd.Series([len(out)], dtype=np.int64)})
        elif name == "head":
            out = out.head(int(arg or 10)).reset_index(drop=True)
        elif name == "tail":
            out = out.tail(int(arg or 10)).reset_index(drop=True)
        elif name == "unique":
            keys = [k.strip() for k in arg.split(",") if k.strip()]
            out = (out.drop_duplicates(subset=keys, keep="first")
                   .reset_index(drop=True))
        elif name == "sort":
            keys = [k.strip() for k in arg.split(",") if k.strip()]
            out = out.sort_values(keys, kind="mergesort").reset_index(
                drop=True)
        else:
            raise ValueError(f"unsupported EQL pipe: {name}")
    return out


def _run_sequence_multi(ds, bys, span, nsteps, step_asts, until_ast,
                        pipes):
    """Composite-join-key sequences (`sequence by a, b`): identical
    searchsorted-cascade semantics per (a, b) group; the multi-column
    groupby is still ONE exchange of tagged (keys, ts, step) rows."""
    from .esql_expr import evaluate

    def tag(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        masks = [np.asarray(
            evaluate(ast, t).to_numpy(zero_copy_only=False), bool)
            for ast in step_asts]
        if until_ast is not None:
            masks.append(np.asarray(
                evaluate(until_ast, t).to_numpy(zero_copy_only=False),
                bool))
        cols: dict[str, pa.Array] = {}
        for j, b in enumerate(bys):
            typ = t.schema.field(b).type
            parts = [t[b].filter(pa.array(m)) for m in masks]
            cols[f"k{j}"] = (pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray)
                 else p for p in parts]) if parts else
                pa.array([], typ))
        tss, steps = [], []
        for i, m in enumerate(masks):
            step_id = -1 if (until_ast is not None
                             and i == len(masks) - 1) else i
            tss.append(ts[m])
            steps.append(np.full(int(m.sum()), step_id, np.int8))
        cols["ts"] = pa.array(np.concatenate(tss) if tss else
                              np.empty(0, np.int64), pa.int64())
        cols["step"] = pa.array(np.concatenate(steps) if steps else
                                np.empty(0, np.int8), pa.int8())
        return pa.table(cols)

    kcols = [f"k{j}" for j in range(len(bys))]

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        empty = {c: pd.Series([], dtype=df[c].dtype) for c in kcols}
        empty["seqs"] = pd.Series([], dtype=np.int64)
        arrs = [np.sort(df.loc[df["step"] == i, "ts"].to_numpy())
                for i in range(nsteps)]
        unt = np.sort(df.loc[df["step"] == -1, "ts"].to_numpy())
        if any(a.size == 0 for a in arrs):
            return pd.DataFrame(empty)
        cur = arrs[0].copy()
        first = arrs[0]
        ok = np.ones(cur.size, bool)
        for nxt in arrs[1:]:
            pos = np.searchsorted(nxt, cur, side="right")
            hit = pos < nxt.size
            ok &= hit
            cur = np.where(hit, nxt[np.minimum(pos, nxt.size - 1)], cur)
        if span is not None:
            ok &= (cur - first) <= span
        if unt.size:
            u_in = (np.searchsorted(unt, cur, side="right") -
                    np.searchsorted(unt, first, side="right")) > 0
            ok &= ~u_in
        n = int(ok.sum())
        if n == 0:
            return pd.DataFrame(empty)
        row = {c: [df[c].iloc[0]] for c in kcols}
        row["seqs"] = [n]
        return pd.DataFrame(row)

    out = _sharded_per_key(
        ds.map_batches(tag, batch_format="pyarrow"),
        kcols, per_key).to_pandas()
    if "seqs" not in out.columns:
        out = pd.DataFrame({**{b: pd.Series([], dtype=object)
                               for b in bys},
                            "seqs": pd.Series([], dtype=np.int64)})
        return _apply_pipes_frame(out, pipes)
    out["seqs"] = out["seqs"].astype(np.int64)
    out = out.rename(columns=dict(zip(kcols, bys)))
    out = out.sort_values(bys).reset_index(drop=True)
    return _apply_pipes_frame(out, pipes)
