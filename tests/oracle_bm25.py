"""Independent brute-force BM25 oracle (FIXTURES.md §3 rank-parity oracle).

Deliberately implemented with plain dicts/loops — no shared code with the
engine's codec or searcher — so agreement is meaningful. Reproduces the same
Lucene arithmetic contract: SmallFloat-quantized norms, float32 weight/score
steps, global stats scope, ties broken by doc_id.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from elasticsearch_ray.analyzer import get_analyzer
from elasticsearch_ray.smallfloat import byte4_to_int, int_to_byte4


class BruteForceBM25:
    def __init__(self, docs, analyzer="code", k1=1.2, b=0.75, mode="lucene"):
        """docs: iterable of (doc_id, text)."""
        self.an = get_analyzer(analyzer)
        self.k1, self.b, self.mode = k1, b, mode
        self.tf: dict[str, dict[int, int]] = {}
        self.pos: dict[str, dict[int, list[int]]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs:
            toks = self.an.positions(text)
            self.doc_len[doc_id] = len(toks)
            c = Counter(t for t, _ in toks)
            for t, n in c.items():
                self.tf.setdefault(t, {})[doc_id] = n
            for t, p in toks:
                self.pos.setdefault(t, {}).setdefault(doc_id, []).append(p)
        self.n_docs = len(self.doc_len)
        self.sum_len = sum(self.doc_len.values())
        self.avgdl = self.sum_len / max(1, self.n_docs)
        self.norm_b = {d: int(int_to_byte4(np.array([n]))[0]) for d, n in self.doc_len.items()}
        self.decoded = {d: int(byte4_to_int(np.array([v], np.uint8))[0]) for d, v in self.norm_b.items()}

    def _idf(self, df):
        v = np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
        return np.float32(v) if self.mode == "lucene" else float(v)

    def _score_one(self, freq, doc_id, weight):
        if self.mode == "lucene":
            dl = self.decoded[doc_id]
            k1, b = np.float32(self.k1), np.float32(self.b)
            # per-step float32, as the Java float expression evaluates
            norm = k1 * ((np.float32(1.0) - b) + b * np.float32(dl) / np.float32(self.avgdl))
            frac = np.float32(float(freq) / (float(freq) + float(norm)))
            return float(np.float32(weight) * frac)
        dl = self.doc_len[doc_id]
        denom = freq + self.k1 * ((1.0 - self.b) + self.b * dl / self.avgdl)
        return weight * freq / denom

    def _weight(self, df, boost=1.0):
        if self.mode == "lucene":
            # (boost*(k1+1))*idf — LegacyBM25Similarity grouping
            return float((np.float32(boost) * (np.float32(self.k1) + np.float32(1.0)))
                         * self._idf(df))
        return boost * self._idf(df) * (self.k1 + 1)

    # ---- query kinds: return dict doc_id -> float64 score ----

    def _eval(self, q) -> dict[int, float]:
        kind = q["kind"]
        boost = float(q.get("boost", 1.0))
        if kind == "term":
            return self._term_scores(q["term"], boost)
        if kind == "match":
            terms = self.an(q["text"])
            if not terms:
                return {}
            # one clause per analyzed-token OCCURRENCE (duplicates score
            # once per repetition, like MatchQuery's duplicate clauses)
            per = [self._term_scores(t, boost) for t in terms]
            if q.get("operator", "or") == "or":
                out: dict[int, float] = {}
                for m in per:
                    for d, s in m.items():
                        out[d] = out.get(d, 0.0) + s
                return out
            docs = set(per[0])
            for m in per[1:]:
                docs &= set(m)
            return {d: sum(m[d] for m in per) for d in docs}
        if kind == "match_phrase":
            if int(q.get("slop", 0)) > 0:
                return self._sloppy(q["text"], int(q["slop"]), boost)
            return self._phrase(q["text"], boost)
        if kind == "prefix":
            out = {}
            for t, posting in self.tf.items():
                if t.startswith(q["prefix"]):
                    for d in posting:
                        out[d] = boost
            return out
        if kind == "match_all":
            return {d: boost for d in self.doc_len}
        if kind == "intervals":
            return self._intervals(q["rule"], boost)
        if kind == "bool":
            return self._bool(q, boost)
        raise ValueError(kind)

    def _term_scores(self, term, boost=1.0):
        posting = self.tf.get(term, {})
        if not posting:
            return {}
        w = self._weight(len(posting), boost)
        return {d: self._score_one(f, d, w) for d, f in posting.items()}

    def _phrase(self, text, boost=1.0):
        tp = self.an.positions(text)
        if not tp:
            return {}
        base = tp[0][1]
        rel = [(t, p - base) for t, p in tp]
        docs = None
        for t, _ in rel:
            ds = set(self.tf.get(t, {}))
            docs = ds if docs is None else docs & ds
        out = {}
        idf_sum = np.float32(0.0) if self.mode == "lucene" else 0.0
        for t, _ in rel:
            df = len(self.tf[t]) if t in self.tf else 0
            idf_sum = np.float32(idf_sum + self._idf(df)) if self.mode == "lucene" else idf_sum + self._idf(df)
        if self.mode == "lucene":
            w = float((np.float32(boost) * (np.float32(self.k1) + np.float32(1.0))) * idf_sum)
        else:
            w = boost * idf_sum * (self.k1 + 1)
        for d in docs or ():
            first = set(self.pos[rel[0][0]][d])
            cand = {p - rel[0][1] for p in first}
            for t, off in rel[1:]:
                cand &= {p - off for p in self.pos[t][d]}
            freq = len(cand)
            if freq:
                out[d] = self._score_one(freq, d, w)
        return out

    def _bool(self, q, boost=1.0):
        must = [self._eval(c) for c in q.get("must", [])]
        should = [self._eval(c) for c in q.get("should", [])]
        filt = [self._eval(c) for c in q.get("filter", [])]
        must_not = [self._eval(c) for c in q.get("must_not", [])]
        if must or filt:
            docs = None
            for m in must + filt:
                docs = set(m) if docs is None else docs & set(m)
        else:
            docs = set()
            for m in should:
                docs |= set(m)
        for m in must_not:
            docs -= set(m)
        out = {}
        for d in docs:
            s = 0.0
            for m in must + should:
                if d in m:
                    s += m[d]
            out[d] = s * boost
        return out

    # ---- intervals (brute force: enumerate every position tuple) ----

    def _interval_set(self, rule) -> dict[int, list[tuple[int, int]]]:
        import itertools

        (rk, spec), = ((k, v) for k, v in rule.items() if k != "filter")
        assert rk == "match", rk
        terms = self.an(spec["query"])
        max_gaps = int(spec.get("max_gaps", 0))
        ordered = bool(spec.get("ordered", True))
        k = len(terms)
        plists = [self.pos.get(t, {}) for t in terms]
        docs = set(plists[0]) if plists else set()
        for pl in plists[1:]:
            docs &= set(pl)
        out: dict[int, list[tuple[int, int]]] = {}
        for d in docs:
            cands = []
            for combo in itertools.product(*(pl[d] for pl in plists)):
                if len(set(combo)) != k:
                    continue
                if ordered and list(combo) != sorted(combo):
                    continue
                s, e = min(combo), max(combo) + 1
                if (e - s) - k <= max_gaps:
                    cands.append((s, e))
            # minimal-interval prune
            cs = set(cands)
            kept = [a for a in cs
                    if not any(b != a and a[0] <= b[0] and b[1] <= a[1]
                               for b in cs)]
            if kept:
                out[d] = sorted(kept)
        flt = spec.get("filter")
        if flt:
            (fk, fsrc), = flt.items()
            fivs = self._interval_set(fsrc)
            neg = fk.startswith("not_")
            base = fk[4:] if neg else fk
            res: dict[int, list[tuple[int, int]]] = {}
            for d, ivs in out.items():
                fl = fivs.get(d, [])

                def hit(iv):
                    s, e = iv
                    for fs, fe in fl:
                        if base == "containing" and s <= fs and fe <= e:
                            return True
                        if base == "contained_by" and fs <= s and e <= fe:
                            return True
                        if base == "overlapping" and s < fe and fs < e:
                            return True
                        if base == "before" and e <= fs:
                            return True
                        if base == "after" and s >= fe:
                            return True
                    return False

                kept2 = [iv for iv in ivs if hit(iv) != neg]
                if kept2:
                    res[d] = kept2
            out = res
        return out

    def _intervals(self, rule, boost: float) -> dict[int, float]:
        return {d: boost for d in self._interval_set(rule)}

    def search(self, q) -> tuple[list[int], list[float]]:
        k = int(q.get("k", 10))
        scores = self._eval(q)
        if self.mode == "lucene":
            items = [(d, float(np.float32(s))) for d, s in scores.items()]
        else:
            items = list(scores.items())
        items.sort(key=lambda x: (-x[1], x[0]))
        top = items[:k]
        return [d for d, _ in top], [s for _, s in top]


    @staticmethod
    def _sloppy_freq_naive(lists, slop):
        """The published SloppyPhraseMatcher event rule simulated with plain
        lists and explicit min scans (no heap; independent mechanics from
        the engine implementation): advance the (value, term-index)-minimal
        term through its positions while they stay at or below the next
        minimum, tracking the smallest end-minus-position window; emit
        1/(1+matchLength) when it passes or exhausts."""
        k = len(lists)
        cur = [0] * k
        vals = [int(l[0]) for l in lists]
        end = max(vals)
        waiting = set(range(k))

        def pop_min():
            t = min(waiting, key=lambda i: (vals[i], i))
            waiting.discard(t)
            return t

        ti = pop_min()
        match_len = end - vals[ti]
        nxt = min((vals[t] for t in waiting), default=vals[ti])
        freq = 0.0
        while True:
            if cur[ti] + 1 < len(lists[ti]):
                cur[ti] += 1
                p = int(lists[ti][cur[ti]])
                vals[ti] = p
                end = max(end, p)
                if p > nxt:
                    if match_len <= slop:
                        freq += 1.0 / (1.0 + match_len)
                    waiting.add(ti)
                    ti = pop_min()
                    match_len = end - vals[ti]
                    nxt = min((vals[t] for t in waiting), default=vals[ti])
                else:
                    match_len = min(match_len, end - p)
            else:
                if match_len <= slop:
                    freq += 1.0 / (1.0 + match_len)
                return freq

    @staticmethod
    def _sloppy_freq_naive_grouped(lists, offsets, groups, slop):
        """The published SloppyPhraseMatcher with repeats, simulated with
        plain list records (no heap, no shared engine code): each pp is a
        dict {i, cur, pos, off, grp}; the queue is re-sorted every pop by
        (pos, off, i); collisions inside a repeat group (equal pos+off) are
        resolved by advancing the (pos, off)-lesser pp, following the pp
        that moved; exhaustion mid-resolution kills the doc (init) or emits
        the pending match (main loop)."""
        pps = [{"i": i, "cur": 0, "pos": int(lists[i][0]), "off": offsets[i],
                "grp": groups[i]} for i in range(len(lists))]
        end = max(p["pos"] for p in pps)
        has_rpts = any(p["grp"] >= 0 for p in pps)

        def adv(p):
            nonlocal end
            p["cur"] += 1
            if p["cur"] >= len(lists[p["i"]]):
                return False
            p["pos"] = int(lists[p["i"]][p["cur"]])
            end = max(end, p["pos"])
            return True

        def resolve(p):
            while True:
                other = None
                for q in pps:
                    if (q is not p and q["grp"] == p["grp"]
                            and q["pos"] + q["off"] == p["pos"] + p["off"]):
                        other = q
                        break
                if other is None:
                    return True
                mover = min((p, other), key=lambda r: (r["pos"], r["off"]))
                if not adv(mover):
                    return False
                p = mover

        if has_rpts:
            for p in pps:
                if p["grp"] >= 0 and not resolve(p):
                    return 0.0

        queue = sorted(pps, key=lambda r: (r["pos"], r["off"], r["i"]))
        freq = 0.0
        lead = queue.pop(0)
        match_len = end - lead["pos"]
        nxt = queue[0]["pos"]
        while True:
            if not adv(lead):
                break
            if has_rpts and not resolve(lead):
                break
            if lead["pos"] > nxt:
                if match_len <= slop:
                    freq += 1.0 / (1.0 + match_len)
                queue.append(lead)
                queue.sort(key=lambda r: (r["pos"], r["off"], r["i"]))
                lead = queue.pop(0)
                nxt = queue[0]["pos"]
                match_len = end - lead["pos"]
            else:
                match_len = min(match_len, end - lead["pos"])
        if match_len <= slop:
            freq += 1.0 / (1.0 + match_len)
        return freq

    def _sloppy(self, text, slop, boost=1.0):
        tp = self.an.positions(text)
        if len(tp) <= 1:
            return self._phrase(text, boost)
        base = tp[0][1]
        rel = [(t, p - base) for t, p in tp]
        docs = None
        for t, _ in rel:
            ds = set(self.tf.get(t, {}))
            docs = ds if docs is None else docs & ds
        idf_sum = np.float32(0.0) if self.mode == "lucene" else 0.0
        for t, _ in rel:
            df = len(self.tf[t]) if t in self.tf else 0
            idf_sum = np.float32(idf_sum + self._idf(df)) if self.mode == "lucene" else idf_sum + self._idf(df)
        if self.mode == "lucene":
            w = float((np.float32(boost) * (np.float32(self.k1) + np.float32(1.0))) * idf_sum)
        else:
            w = boost * idf_sum * (self.k1 + 1)
        members: dict[str, list[int]] = {}
        for i, (t, _) in enumerate(rel):
            members.setdefault(t, []).append(i)
        groups = [-1] * len(rel)
        for g, (_, idxs) in enumerate(sorted(members.items())):
            if len(idxs) > 1:
                for i in idxs:
                    groups[i] = g
        has_rpts = any(g >= 0 for g in groups)
        offsets = [off for _, off in rel]
        out = {}
        for d in docs or ():
            lists = [sorted(p - off for p in self.pos[t][d]) for t, off in rel]
            if has_rpts:
                freq = self._sloppy_freq_naive_grouped(lists, offsets, groups, slop)
            else:
                freq = self._sloppy_freq_naive(lists, slop)
            if freq > 0.0:
                out[d] = self._score_one(freq, d, w)
        return out
