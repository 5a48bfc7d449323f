"""Scroll contexts (search/internal/ScrollContext + ClearScrollController).

The reference keeps per-scroll server-side state (the frozen reader + the
last sort key) addressed by a scroll_id; _search/scroll advances it and
DELETE _search/scroll frees it (further use -> SearchContextMissingException
analog). Here the context holds the sort cursor; each page is a fresh
streaming pass with the cursor PUSHED INTO the scan filter (same
search_after core as the stateless scroll gate), so contexts stay tiny —
state per scroll is two scalars, never a materialized result set.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


class SearchContextMissing(Exception):
    """scroll_id not registered / already cleared."""


@dataclass
class _ScrollCtx:
    sf_dir: str
    table: str
    key_col: str
    sort_col: str
    page_size: int
    cursor: tuple | None = None
    seq: int = field(default=0)


class ScrollRegistry:
    def __init__(self):
        self._ctx: dict[str, _ScrollCtx] = {}
        # monotonic nonce: len(self._ctx) would REUSE a live scroll's id
        # after an older one is cleared (open a, open b, clear a, open c
        # -> c would clobber b's context)
        self._n = 0

    def open(self, sf_dir: str, *, table: str = "orders",
             key_col: str = "o_orderkey", sort_col: str = "o_totalprice",
             page_size: int = 15) -> str:
        ctx = _ScrollCtx(sf_dir, table, key_col, sort_col, page_size)
        self._n += 1
        sid = hashlib.sha1(
            f"{sf_dir}:{table}:{key_col}:{sort_col}:{page_size}:{self._n}"
            .encode()).hexdigest()[:24]
        self._ctx[sid] = ctx
        return sid

    def scroll(self, sid: str):
        """Next page (sort_col desc, key asc), advancing the cursor."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..pipelines.ops import _ds

        ctx = self._ctx.get(sid)
        if ctx is None:
            raise SearchContextMissing(sid)

        cur = ctx.cursor

        def keep(t: pa.Table) -> pa.Table:
            if cur is None:
                return t
            lp, lk = cur
            m = pc.or_(
                pc.less(t[ctx.sort_col], lp),
                pc.and_(pc.equal(t[ctx.sort_col], lp),
                        pc.greater(t[ctx.key_col], lk)),
            )
            return t.filter(m)

        page = (_ds(ctx.sf_dir, ctx.table, [ctx.key_col, ctx.sort_col])
                .map_batches(keep, batch_format="pyarrow")
                .sort([ctx.sort_col, ctx.key_col], descending=[True, False])
                .limit(ctx.page_size)
                .to_pandas())
        if len(page):
            last = page.iloc[-1]
            ctx.cursor = (last[ctx.sort_col], last[ctx.key_col])
        ctx.seq += 1
        return page

    def clear(self, sid: str) -> bool:
        """DELETE _search/scroll: True if a context was freed."""
        return self._ctx.pop(sid, None) is not None
