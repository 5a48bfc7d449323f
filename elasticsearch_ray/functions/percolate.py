"""Percolator: match incoming docs against a stored query set (reverse
search — modules/percolator/PercolateQueryBuilder.java).

The reference never evaluates every stored query per doc: QueryAnalyzer
(modules/percolator/.../QueryAnalyzer.java:56) extracts each stored query's
required terms at store time, indexes them, and only queries whose
extraction overlaps the doc's terms are verified. Same shape here:

  store time  — each query contributes gate terms to a term -> query_id
                inverted map (conjunction: one representative term gates;
                disjunction: every term gates);
  batch time  — docs explode to unique (doc, term) pairs once, one merge
                against the gate map yields candidates, and one
                merge+groupby against the required-term map counts matched
                terms per (doc, candidate query) — verified when matched >=
                minimum_should_match. Cost scales with matched pairs, not
                docs x queries.

Used as an actor-pool map_batches stage: the maps build once per actor in
__init__ (broadcast via the actor constructor), __call__ is per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class Percolator:
    """Callable map_batches stage: batch of docs -> (doc_id, query_id) hits.

    `queries` is a list of (query_id, spec) where spec is
    {"terms": [...], "minimum_should_match": k} — k defaults to all terms
    (conjunction); k=1 is a disjunction.
    """

    def __init__(self, queries, analyzer="simple", text_col: str = "text",
                 id_col: str = "doc_id"):
        from ..analyzer import get_analyzer

        self.an = get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        self.text_col, self.id_col = text_col, id_col
        gate_t, gate_q, req_t, req_q = [], [], [], []
        msm: dict[int, int] = {}
        # range extractions (QueryAnalyzer range handling: a stored range
        # clause becomes a numeric extraction verified against the doc's
        # field value; conjunctive with the query's term clauses). Queries
        # with ONLY ranges gate on the range itself.
        self.ranges: dict[int, list[tuple[str, float | None, float | None]]] = {}
        self.pure_range: list[int] = []
        for qid, spec in queries:
            for r in spec.get("ranges", []):
                self.ranges.setdefault(qid, []).append(
                    (r["field"], r.get("gte"), r.get("lte")))
            terms = list(dict.fromkeys(spec.get("terms", [])))
            if not terms:
                if qid in self.ranges:
                    self.pure_range.append(qid)
                continue
            k = int(spec.get("minimum_should_match", len(terms)))
            k = max(1, min(k, len(terms)))
            msm[qid] = k
            if k == len(terms):
                # conjunction: any one required term gates; the longest is a
                # cheap selectivity proxy (QueryAnalyzer picks the extraction
                # with the fewest docs)
                gates = [max(terms, key=len)]
            else:
                gates = terms
            for t in gates:
                gate_t.append(t)
                gate_q.append(qid)
            for t in terms:
                req_t.append(t)
                req_q.append(qid)
        self.gate = pd.DataFrame({"term": gate_t, "query_id": gate_q})
        self.required = pd.DataFrame({"term": req_t, "query_id": req_q})
        self.msm = msm
        self.n_queries = len(msm)
        # instrumentation: candidate pairs actually verified (sub-linearity
        # evidence vs docs x queries)
        self.candidate_pairs = 0
        self.docs_seen = 0

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy()
        texts = t[self.text_col].to_pylist()
        self.docs_seen += len(texts)
        di, dt = [], []
        for i, s in enumerate(texts):
            toks = set(self.an(s))
            di.extend([i] * len(toks))
            dt.extend(toks)
        doc_terms = pd.DataFrame({"i": np.asarray(di, np.int64), "term": dt})
        cand = (doc_terms.merge(self.gate, on="term")[["i", "query_id"]]
                .drop_duplicates())
        self.candidate_pairs += len(cand)
        if cand.empty and not self.pure_range:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "query_id": pa.array([], pa.int64())})
        hits = (doc_terms.merge(self.required, on="term")
                .groupby(["i", "query_id"]).size().reset_index(name="matched"))
        cand = cand.merge(hits, on=["i", "query_id"], how="left")
        cand["matched"] = cand["matched"].fillna(0).astype(np.int64)
        need = cand["query_id"].map(self.msm).astype(np.int64)
        ok = cand[cand["matched"] >= need]
        oi = ok["i"].to_numpy()
        oq = ok["query_id"].to_numpy()
        if self.ranges:
            # verify range extractions: vectorized per stored range, one
            # boolean column per range-bearing query
            rk: dict[int, np.ndarray] = {}
            for qid, rs in self.ranges.items():
                m = np.ones(len(ids), bool)
                for f, lo, hi in rs:
                    v = t[f].to_numpy(zero_copy_only=False)
                    if lo is not None:
                        m &= v >= lo
                    if hi is not None:
                        m &= v <= hi
                rk[qid] = m
            keep = np.array([qid not in rk or rk[qid][i]
                             for i, qid in zip(oi, oq)], bool) \
                if len(oi) else np.empty(0, bool)
            oi, oq = oi[keep], oq[keep]
            for qid in self.pure_range:
                hit_i = np.flatnonzero(rk[qid])
                self.candidate_pairs += hit_i.size
                oi = np.concatenate([oi, hit_i])
                oq = np.concatenate([oq, np.full(hit_i.size, qid,
                                                 oq.dtype if oq.size
                                                 else np.int64)])
        return pa.table({
            "doc_id": pa.array(ids[oi.astype(np.int64)], pa.int64()),
            "query_id": pa.array(oq.astype(np.int64), pa.int64()),
        })


def percolate_dataset(ds, queries, *, analyzer="simple", text_col="text",
                      id_col="doc_id", concurrency=2) -> pd.DataFrame:
    """Run the percolator over a Dataset; returns (doc_id, query_id) hits
    sorted for the gate. Stored-query maps build once per actor."""
    out = ds.map_batches(
        Percolator,
        max_restarts=0,
        fn_constructor_kwargs=dict(queries=queries, analyzer=analyzer,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    return out.sort_values(["doc_id", "query_id"]).reset_index(drop=True)
