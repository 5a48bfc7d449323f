"""Distributed query-then-fetch over partitioned searchers.

Mirrors the reference's coordinator protocol (SURVEY.md §3.2):
  1. segment partitions assigned to long-lived searcher actors (the data-node
     role; shards -> actors);
  2. DFS stats phase — per-dictionary-key local dfs gathered and summed so
     every actor scores with GLOBAL (N, avgdl, df) exactly like the
     reference's dfs_query_then_fetch
     (action/search/SearchDfsQueryThenFetchAsyncAction.java,
     DfsQueryPhase.java). Keys are field-qualified (fkey+term) and collected
     ON an actor (IndexSearcher.collect_query_keys) so per-field analyzers
     and aliases resolve exactly as at scoring time; per-field token totals
     ship alongside so per-field avgdl is global too.
  3. query phase fan-out — each actor returns its local top-k;
  4. reduce — k-way merge of the tiny per-actor candidate sets by
     (score desc, doc_id asc) (SearchPhaseController.mergeTopDocs:221-243).

Results are identical to a single global searcher (asserted in tests) — the
partitioned path exists so query serving scales out with segments.
"""

from __future__ import annotations

import numpy as np


class SearcherActor:
    """One data-node role: an IndexSearcher over a partition of segments."""

    def __init__(self, index_dir: str, segments: list[str], **kw):
        from .engine import IndexSearcher

        self.searcher = IndexSearcher(index_dir, segments=segments, **kw)

    def collect_keys(self, q: dict) -> list[str]:
        return sorted(self.searcher.collect_query_keys(q))

    def term_dfs(self, keys: list[str]) -> tuple[dict[str, int], dict[str, int]]:
        """(df, ttf) per key — ttf globalizes the alternative similarities'
        collection model (TermStatistics.totalTermFreq)."""
        return (self.searcher.local_term_dfs(keys),
                self.searcher.local_term_ttfs(keys))

    def local_stats(self) -> tuple[int, int, dict]:
        return (self.searcher.n_docs, self.searcher.sum_doc_len,
                self.searcher.local_field_sums())

    def set_stats(self, n_docs: int, sum_doc_len: int, df_map: dict,
                  field_sums: dict, ttf_map: dict | None = None) -> bool:
        self.searcher.set_global_stats(n_docs, sum_doc_len, df_map,
                                       field_sums, ttf_map)
        return True

    def search(self, q: dict, use_wand: bool = True):
        ids, sc = self.searcher.search(q, use_wand=use_wand)
        return ids, np.asarray(sc, dtype=np.float64)

    def dfs_for_query(self, q: dict):
        """One-round DFS: collect this query's field-qualified keys locally
        (analyzers are identical on every actor) and return local (df, ttf)
        for them — replaces the collect_keys + term_dfs round-trip pair."""
        keys = sorted(self.searcher.collect_query_keys(q))
        return (self.searcher.local_term_dfs(keys),
                self.searcher.local_term_ttfs(keys))

    def search_with_stats(self, q: dict, n_docs: int, sum_doc_len: int,
                          df_map: dict, field_sums: dict, ttf_map: dict,
                          use_wand: bool = True):
        """Install global stats and search in ONE round trip (the set_stats
        + search pair fused; the stats payload is the query's own term maps,
        a few hundred bytes)."""
        self.searcher.set_global_stats(n_docs, sum_doc_len, df_map,
                                       field_sums, ttf_map)
        ids, sc = self.searcher.search(q, use_wand=use_wand)
        return ids, np.asarray(sc, dtype=np.float64)

    def matched(self, named: dict):
        return self.searcher.matched_queries(named)


class DistributedSearcher:
    """Coordinator: round-robin segment assignment + DFS + fan-out + merge."""

    def __init__(self, index_dir: str, num_searchers: int = 2, **kw):
        import ray

        from ..index.manifest import committed_segments, live_segments

        live = live_segments(committed_segments(index_dir))
        seg_ids = sorted(live)
        num_searchers = max(1, min(num_searchers, len(seg_ids)))
        assign: list[list[str]] = [[] for _ in range(num_searchers)]
        for i, sid in enumerate(seg_ids):
            assign[i % num_searchers].append(sid)
        # data-node failover: the durable index lives on (shared) storage and
        # every query ships its own global stats (search_with_stats), so a
        # restarted actor is immediately correct after __init__ reloads its
        # segment partition — max_restarts + task retries make a searcher
        # crash invisible to the coordinator (the reference's shard-failover
        # analog, minus replica copies). max_restarts>0 is safe here because
        # the ctor args are plain small values (a path string + segment-id
        # list), never object-store refs — the ray#53727 restart-after-GC
        # hazard needs large/ref ctor args, which this actor never takes.
        Actor = ray.remote(max_restarts=2, max_task_retries=2)(SearcherActor)
        self.actors = [
            Actor.remote(index_dir, segs, **kw) for segs in assign if segs
        ]
        stats = ray.get([a.local_stats.remote() for a in self.actors])
        self.n_docs = sum(s[0] for s in stats)
        self.sum_doc_len = sum(s[1] for s in stats)
        self.field_sums: dict[str, int] = {}
        for s in stats:
            for f, tot in s[2].items():
                self.field_sums[f] = self.field_sums.get(f, 0) + tot
        self._ray = ray

    def search(self, q: dict, use_wand: bool = True):
        ray = self._ray
        k = int(q.get("k", 10))
        # DFS phase, ONE round: every actor collects the query's keys
        # itself (identical analyzers) and returns local (df, ttf); the
        # coordinator sums. Was collect_keys -> term_dfs -> set_stats ->
        # search = 4 round trips; now dfs_for_query -> search_with_stats
        # = 2, halving per-query coordination latency.
        df_parts = ray.get([a.dfs_for_query.remote(q) for a in self.actors])
        df_map: dict[str, int] = {}
        ttf_map: dict[str, int] = {}
        for dfs, ttfs in df_parts:
            for t, d in dfs.items():
                df_map[t] = df_map.get(t, 0) + d
            for t, f in ttfs.items():
                ttf_map[t] = ttf_map.get(t, 0) + f
        # query phase fan-out (stats ride along) + mergeTopDocs-style reduce
        results = ray.get([
            a.search_with_stats.remote(q, self.n_docs, self.sum_doc_len,
                                       df_map, self.field_sums, ttf_map,
                                       use_wand)
            for a in self.actors
        ])
        ids = np.concatenate([r[0] for r in results]) if results else np.empty(0, np.int64)
        sc = np.concatenate([r[1] for r in results]) if results else np.empty(0)
        if ids.size == 0:
            return ids.astype(np.int64), sc
        order = np.lexsort((ids, -sc))[:k]
        return ids[order].astype(np.int64), sc[order]

    def matched_queries(self, named: dict):
        """Fan-out matched_queries: each actor annotates its own partition;
        the reduce is a concat of (doc_id, matched) rows."""
        import pandas as pd

        ray = self._ray
        parts = ray.get([a.matched.remote(named) for a in self.actors])
        out = pd.concat(parts, ignore_index=True)
        return out.sort_values("doc_id").reset_index(drop=True)
