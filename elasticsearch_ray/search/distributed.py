"""Distributed query-then-fetch over partitioned searchers.

Mirrors the reference's coordinator protocol (SURVEY.md §3.2):
  1. segment partitions assigned to long-lived searcher actors (the data-node
     role; shards -> actors);
  2. DFS stats phase — per-term local dfs gathered and summed so every actor
     scores with GLOBAL (N, avgdl, df) exactly like the reference's
     dfs_query_then_fetch (action/search/SearchDfsQueryThenFetchAsyncAction.java,
     DfsQueryPhase.java);
  3. query phase fan-out — each actor returns its local top-k;
  4. reduce — k-way merge of the tiny per-actor candidate sets by
     (score desc, doc_id asc) (SearchPhaseController.mergeTopDocs:221-243).

Results are identical to a single global searcher (asserted in tests) — the
partitioned path exists so query serving scales out with segments.
"""

from __future__ import annotations

import numpy as np


def _collect_query_terms(searcher_analyzer, q: dict) -> set[str]:
    kind = q.get("kind")
    out: set[str] = set()
    if kind == "term":
        out.add(q["term"])
    elif kind in ("match", "match_phrase", "match_phrase_prefix"):
        out.update(searcher_analyzer(q["text"]))
    elif kind == "more_like_this":
        out.update(searcher_analyzer(q["like"]))
    elif kind == "span_near":
        out.update(q.get("terms", []))
    elif kind == "terms_set":
        out.update(q.get("terms", []))
    elif kind == "dis_max":
        for sq in q.get("queries", []):
            out |= _collect_query_terms(searcher_analyzer, sq)
    elif kind in ("constant_score",):
        out |= _collect_query_terms(searcher_analyzer, q["filter"])
    elif kind == "boosting":
        out |= _collect_query_terms(searcher_analyzer, q["positive"])
        out |= _collect_query_terms(searcher_analyzer, q["negative"])
    elif kind == "function_score":
        out |= _collect_query_terms(searcher_analyzer, q["query"])
    elif kind == "bool":
        for cl in ("must", "should", "must_not", "filter"):
            for sq in q.get(cl, []):
                out |= _collect_query_terms(searcher_analyzer, sq)
    elif kind == "simple_query_string":
        from .engine import parse_simple_query_string

        out |= _collect_query_terms(
            searcher_analyzer, parse_simple_query_string(q["query"]))
    elif kind == "query_string":
        from .engine import parse_query_string

        out |= _collect_query_terms(
            searcher_analyzer, parse_query_string(q["query"]))
    elif kind == "multi_match":
        out.update(searcher_analyzer(q["text"]))
    elif kind == "common":
        out.update(searcher_analyzer(q["text"]))
    elif kind == "script_score":
        out |= _collect_query_terms(searcher_analyzer, q["query"])
    return out


class SearcherActor:
    """One data-node role: an IndexSearcher over a partition of segments."""

    def __init__(self, index_dir: str, segments: list[str], **kw):
        from .engine import IndexSearcher

        self.searcher = IndexSearcher(index_dir, segments=segments, **kw)

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        return self.searcher.local_term_dfs(terms)

    def local_stats(self) -> tuple[int, int]:
        return self.searcher.n_docs, self.searcher.sum_doc_len

    def set_stats(self, n_docs: int, sum_doc_len: int, df_map: dict) -> bool:
        self.searcher.set_global_stats(n_docs, sum_doc_len, df_map)
        return True

    def search(self, q: dict, use_wand: bool = True):
        ids, sc = self.searcher.search(q, use_wand=use_wand)
        return ids, np.asarray(sc, dtype=np.float64)


class DistributedSearcher:
    """Coordinator: round-robin segment assignment + DFS + fan-out + merge."""

    def __init__(self, index_dir: str, num_searchers: int = 2, **kw):
        import ray

        from ..index.manifest import committed_segments, live_segments
        from ..analyzer import get_analyzer

        live = live_segments(committed_segments(index_dir))
        seg_ids = sorted(live)
        num_searchers = max(1, min(num_searchers, len(seg_ids)))
        assign: list[list[str]] = [[] for _ in range(num_searchers)]
        for i, sid in enumerate(seg_ids):
            assign[i % num_searchers].append(sid)
        Actor = ray.remote(SearcherActor)
        self.actors = [
            Actor.remote(index_dir, segs, **kw) for segs in assign if segs
        ]
        stats = ray.get([a.local_stats.remote() for a in self.actors])
        self.n_docs = sum(s[0] for s in stats)
        self.sum_doc_len = sum(s[1] for s in stats)
        first = next(iter(live.values()))
        self.analyzer = get_analyzer(kw.get("analyzer") or first.analyzer)
        self._ray = ray

    def search(self, q: dict, use_wand: bool = True):
        ray = self._ray
        k = int(q.get("k", 10))
        # DFS phase: gather + sum per-term dfs, install global stats
        terms = sorted(_collect_query_terms(self.analyzer, q))
        df_parts = ray.get([a.term_dfs.remote(terms) for a in self.actors])
        df_map: dict[str, int] = {}
        for part in df_parts:
            for t, d in part.items():
                df_map[t] = df_map.get(t, 0) + d
        ray.get([
            a.set_stats.remote(self.n_docs, self.sum_doc_len, df_map)
            for a in self.actors
        ])
        # query phase fan-out + mergeTopDocs-style reduce
        results = ray.get([a.search.remote(q, use_wand) for a in self.actors])
        ids = np.concatenate([r[0] for r in results]) if results else np.empty(0, np.int64)
        sc = np.concatenate([r[1] for r in results]) if results else np.empty(0)
        if ids.size == 0:
            return ids.astype(np.int64), sc
        order = np.lexsort((ids, -sc))[:k]
        return ids[order].astype(np.int64), sc[order]
