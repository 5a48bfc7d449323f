"""Async search (x-pack core AsyncSearchResponse / RestSubmitAsyncSearchAction
analog): submit returns an id immediately; the search accumulates per-shard
result chunks; GET polls observe partial hit sets with is_running=true until
every shard has reported, then the final response; DELETE drops the stored
response (further GETs raise ResourceNotFound, the reference's 404)."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np


class AsyncSearchMissing(KeyError):
    """GET/DELETE of an unknown or deleted async search id (404)."""


@dataclass
class _AsyncState:
    shard_results: list[tuple[np.ndarray, np.ndarray]]
    done: int = 0
    ids: np.ndarray = field(default_factory=lambda: np.array([], np.int64))
    scores: np.ndarray = field(default_factory=lambda: np.array([]))


class AsyncSearchRegistry:
    """Per-session store keyed by deterministic ids (content hash — no RNG,
    reproducible lifecycles). Shards here are doc_id ranges of one searcher;
    on a cluster each shard chunk is one actor's partial response."""

    def __init__(self, n_shards: int = 2):
        self.n_shards = n_shards
        self._store: dict[str, _AsyncState] = {}

    def submit(self, searcher, query: dict) -> str:
        ids, sc = searcher._eval(query)
        # deterministic shard split by doc_id range
        hi = int(ids.max()) + 1 if ids.size else 1
        bound = (hi + self.n_shards - 1) // self.n_shards
        chunks = []
        for s in range(self.n_shards):
            m = (ids >= s * bound) & (ids < (s + 1) * bound)
            chunks.append((ids[m], sc[m]))
        key = hashlib.sha1(repr(sorted(query.items())).encode()
                           ).hexdigest()[:16]
        self._store[key] = _AsyncState(chunks)
        return key

    def get(self, search_id: str) -> dict:
        """Each poll folds in the next completed shard (the reference's
        partial accumulation as shards respond)."""
        st = self._store.get(search_id)
        if st is None:
            raise AsyncSearchMissing(search_id)
        if st.done < len(st.shard_results):
            i, s = st.shard_results[st.done]
            st.ids = np.concatenate([st.ids, i.astype(np.int64)])
            st.scores = np.concatenate([st.scores, s])
            st.done += 1
        running = st.done < len(st.shard_results)
        return {"id": search_id, "is_running": running,
                "is_partial": running, "hits": int(st.ids.size),
                "ids": st.ids, "scores": st.scores}

    def delete(self, search_id: str) -> None:
        if search_id not in self._store:
            raise AsyncSearchMissing(search_id)
        del self._store[search_id]
