"""Completion suggester with weights, fuzzy prefix and category contexts
(search/suggest/completion/CompletionSuggester.java:41 — the reference backs
this with a weighted FST; a sorted input array + searchsorted prefix slices
gives identical results: top-N by (weight desc, input asc)).

Build path is distributed: entry weights aggregate via Ray groupby-sum and
only the (vocab-sized) dictionary lands in the suggester — the FST-build
analog. Query path is an in-memory lookup suitable for an actor pool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .engine import TERM_MAX, levenshtein_vec


class _TrieNode:
    __slots__ = ("children", "entries", "maxw")

    def __init__(self):
        self.children: dict = {}
        self.entries: list = []  # entry indices terminating here
        self.maxw = -1


class _WeightedPrefixAutomaton:
    """The FST analog proper (NRTSuggester / WFSTCompletionLookup):
    a character trie whose every node caches the MAX entry weight in
    its subtree (the weighted-arc bound), so top-N retrieval is a
    BEST-FIRST traversal popping at most O(N * depth) nodes instead of
    scoring every completion under the prefix. Result order is exactly
    the reference's (weight desc, input asc) — heap keys (-bound,
    path) make a node pop before any terminal it could beat, and a
    prefix sorts before its extensions, so lexicographic ties resolve
    identically to the exhaustive sort."""

    def __init__(self, inputs, weights):
        self.root = _TrieNode()
        for idx, (inp, w) in enumerate(zip(inputs, weights)):
            node = self.root
            node.maxw = max(node.maxw, int(w))
            for ch in str(inp):
                nxt = node.children.get(ch)
                if nxt is None:
                    nxt = node.children[ch] = _TrieNode()
                node = nxt
                node.maxw = max(node.maxw, int(w))
            node.entries.append(idx)
        self.weights = weights
        self.inputs = inputs

    def top(self, prefix: str, want):
        """Yield entry indices under `prefix` in (weight desc, input
        asc, entry-index asc) order; `want(idx)` -> bool filters
        (contexts / duplicates) without disturbing the bound."""
        import heapq

        node = self.root
        for ch in prefix:
            node = node.children.get(ch)
            if node is None:
                return
        out = []
        counter = 0
        heap = [(-node.maxw, prefix, 1, counter, node)]
        while heap:
            negw, path, tag, _, payload = heapq.heappop(heap)
            if tag == 0:  # terminal entry — final by heap ordering
                if want(payload):
                    out.append(payload)
                    yield payload
                continue
            n: _TrieNode = payload
            for idx in n.entries:
                counter += 1
                heapq.heappush(
                    heap, (-int(self.weights[idx]), path, 0, idx, idx))
            for ch, child in n.children.items():
                counter += 1
                heapq.heappush(
                    heap, (-child.maxw, path + ch, 1, counter, child))


class CompletionSuggester:
    """entries: iterable of (input, weight) or (input, weight, contexts)
    where contexts is an iterable of category strings (CategoryContextMapping
    analog). Exact-prefix lookups run on the weighted prefix automaton
    (_WeightedPrefixAutomaton — the FST analog, built lazily); fuzzy
    prefixes use the sorted-array edit-distance scan."""

    def __init__(self, entries):
        rows = []
        for e in entries:
            inp, weight = e[0], int(e[1])
            ctxs = frozenset(e[2]) if len(e) > 2 and e[2] is not None else frozenset()
            rows.append((inp, weight, ctxs))
        rows.sort(key=lambda r: r[0])
        self.inputs = np.array([r[0] for r in rows], dtype=object)
        self.weights = np.array([r[1] for r in rows], dtype=np.int64)
        self.contexts = [r[2] for r in rows]
        self._fst: _WeightedPrefixAutomaton | None = None

    def _automaton(self) -> _WeightedPrefixAutomaton:
        if self._fst is None:
            self._fst = _WeightedPrefixAutomaton(self.inputs, self.weights)
        return self._fst

    def _rank(self, idx: np.ndarray, size: int) -> np.ndarray:
        """top-`size` of candidate indices by (weight desc, input asc) —
        CompletionSuggester's SuggestDocPriorityQueue ordering."""
        if idx.size == 0:
            return idx
        order = np.lexsort((self.inputs[idx], -self.weights[idx]))
        return idx[order[:size]]

    def suggest(self, prefix: str, size: int = 5, fuzziness: int = 0,
                context: str | None = None,
                skip_duplicates: bool = False,
                _force_array: bool = False) -> pd.DataFrame:
        """skip_duplicates (CompletionSuggestionBuilder#skipDuplicates,
        6.1): when the same suggestion text exists as multiple entries
        (e.g. per-context duplicates), only the best-ranked occurrence
        is returned; `size` applies AFTER deduplication.

        `_force_array`: bypass the automaton and run the exhaustive
        sorted-array path (the parity test compares the two)."""
        if fuzziness <= 0 and not _force_array:
            # FST path: best-first over the weighted automaton, stopping
            # after `size` accepted results — never scores the whole
            # prefix range
            fst = self._automaton()
            seen: set = set()

            def want(idx: int) -> bool:
                if context is not None and context not in self.contexts[idx]:
                    return False
                if skip_duplicates:
                    s = str(self.inputs[idx])
                    if s in seen:
                        return False
                    seen.add(s)
                return True

            top_l: list[int] = []
            for idx in fst.top(prefix, want):
                top_l.append(int(idx))
                if len(top_l) == size:
                    break
            top = np.asarray(top_l, dtype=np.int64)
            return pd.DataFrame({
                "input": [str(self.inputs[int(i)]) for i in top],
                "weight": self.weights[top].astype(np.int64)
                if top.size else pd.Series([], dtype=np.int64),
            })
        if fuzziness <= 0:
            lo = np.searchsorted(self.inputs, prefix, side="left")
            hi = np.searchsorted(self.inputs, prefix + TERM_MAX, side="left")
            idx = np.arange(lo, hi)
        else:
            # FuzzyCompletionQuery analog: entries whose own prefix of the
            # query's length is within edit distance `fuzziness`
            n = len(prefix)
            heads = np.array([str(s)[:n] for s in self.inputs], dtype=object)
            d = levenshtein_vec(prefix, heads.astype(str))
            idx = np.nonzero(d <= fuzziness)[0]
        if context is not None and idx.size:
            mask = np.fromiter(
                (context in self.contexts[int(i)] for i in idx), bool, idx.size)
            idx = idx[mask]
        if skip_duplicates and idx.size:
            ranked = self._rank(idx, idx.size)
            seen: set = set()
            kept = []
            for i in ranked:
                s = str(self.inputs[int(i)])
                if s not in seen:
                    seen.add(s)
                    kept.append(int(i))
                if len(kept) == size:
                    break
            top = np.asarray(kept, dtype=np.int64)
        else:
            top = self._rank(idx, size)
        return pd.DataFrame({
            "input": [str(self.inputs[int(i)]) for i in top],
            "weight": self.weights[top].astype(np.int64)
            if top.size else pd.Series([], dtype=np.int64),
        })


def completion_from_dataset(ds, text_col: str = "text",
                            analyzer: str = "simple",
                            weight: str = "tf",
                            contexts_col: str | None = None) -> CompletionSuggester:
    """Build a suggester from a text column: token -> weight aggregated
    dataset-side (map_batches partial counts + groupby sum), only the reduced
    vocabulary reaches the driver. weight: 'tf' (total term frequency) or
    'df' (document frequency). With `contexts_col`, entries are built at
    (token, context) granularity — the CategoryContextMapping shape: a
    context-filtered suggest ranks tokens by their weight WITHIN that
    context, exactly what separate per-context entries give the reference."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..analyzer import get_analyzer

    an = get_analyzer(analyzer)

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        ctxs = (t[contexts_col].to_pylist() if contexts_col is not None
                else None)
        for ri, s in enumerate(t[text_col].to_pylist()):
            toks = an(s)
            ctx = ctxs[ri] if ctxs is not None else ""
            keys = ((tok, ctx) for tok in
                    (set(toks) if weight == "df" else toks))
            c.update(keys)
        items = sorted(c)
        return pa.table({"input": [k[0] for k in items],
                         "ctx": [k[1] for k in items],
                         "w": pa.array([c[k] for k in items], pa.int64())})

    # bucketed exchange, not groupby(input, ctx): completion inputs are
    # vocabulary-cardinality (functions/exchange.py; SCALE.md Round-4)
    from ..functions.exchange import bucketed_sum

    agg = bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       ["input", "ctx"], "w",
                       out_name="weight").to_pandas()
    if contexts_col is None:
        return CompletionSuggester(zip(agg["input"], agg["weight"]))
    return CompletionSuggester(
        (i, w, (c,)) for i, c, w in
        zip(agg["input"], agg["ctx"], agg["weight"]))
