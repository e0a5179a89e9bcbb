"""Scroll contexts — stateful deep pagination.

Re-expresses the reference's scroll mechanism
(`quickwit-search/src/scroll_context.rs`, `docs/internals/scroll.md`):
a scroll fetches hits in large batches (SCROLL_BATCH_LEN) using the
cursor (`search_after`) pushdown and serves client-sized pages from the
cached batch, so N small pages cost N/batch real queries, not N. The
scroll id is an opaque token resolved through a registry (the reference
stores serialized contexts in its cluster KV store; a process-local
registry plays that role here — on a real deployment the serialized
dict would live in any shared KV).

Works for both BM25 order (cursor = (score, doc_key)) and fast-field
sort order (cursor = (sort_value, doc_key), missing-last semantics) —
the reference's scroll only supports its primary sort orders too.
"""

from __future__ import annotations

import uuid

SCROLL_BATCH_LEN = 1_000


class ScrollContext:
    def __init__(
        self,
        searcher,
        query,
        page_size: int = 10,
        mode: str = "parity",
        time_range=None,
        fetch: list[str] | None = None,
        sort_field: str | None = None,
        descending: bool = True,
        batch_len: int = SCROLL_BATCH_LEN,
    ):
        self.searcher = searcher
        self.query = query
        self.page_size = page_size
        self.mode = mode
        self.time_range = time_range
        self.fetch = fetch
        self.sort_field = sort_field
        self.descending = descending
        self.batch_len = max(batch_len, page_size)
        self.scroll_id = uuid.uuid4().hex
        self._cache: list = []
        self._served = 0  # global rank offset already handed out
        self._cursor = None
        self._exhausted = False

    # ------------------------------------------------------------ fetching

    def _fetch_batch(self) -> None:
        if self.sort_field is None:
            df = self.searcher.search(
                self.query,
                k=self.batch_len,
                mode=self.mode,
                time_range=self.time_range,
                fetch=self.fetch,
                search_after=self._cursor,
            )
            rows = df.collect()
            if rows:
                last = rows[-1]
                self._cursor = (last["score"], last["doc_key"])
        else:
            # tie_by_key on every batch: the cursor is (sort_value,
            # doc_key), so the first page must already use the same
            # engine-independent tie order as the cursored ones
            df = self.searcher.sort_by_field(
                self.query,
                self.sort_field,
                k=self.batch_len,
                descending=self.descending,
                time_range=self.time_range,
                fetch=self.fetch,
                tie_by_key=True,
                search_after=self._cursor,
            )
            rows = df.collect()
            if rows:
                last = rows[-1]
                self._cursor = (last["sort_value"], last["doc_key"])
        if len(rows) < self.batch_len:
            self._exhausted = True
        self._cache.extend(rows)

    # -------------------------------------------------------------- paging

    def next_page(self) -> list:
        """The next `page_size` hits (ranks continue across pages);
        empty list when the scroll is drained."""
        from pyspark.sql import Row

        while len(self._cache) < self.page_size and not self._exhausted:
            self._fetch_batch()
        page, self._cache = (
            self._cache[: self.page_size],
            self._cache[self.page_size :],
        )
        # each cursored batch numbers its ranks from 1 — rewrite them as
        # the scroll-global positions the caller sees
        out = []
        for i, r in enumerate(page):
            d = r.asDict()
            if "rank" in d:
                d["rank"] = self._served + i + 1
                r = Row(**d)
            out.append(r)
        self._served += len(page)
        return out


# process-local scroll registry (the reference's cluster KV analog)
_REGISTRY: dict[str, ScrollContext] = {}


def create_scroll(ctx: ScrollContext) -> str:
    _REGISTRY[ctx.scroll_id] = ctx
    return ctx.scroll_id


def fetch_scroll(scroll_id: str) -> ScrollContext:
    return _REGISTRY[scroll_id]


def delete_scroll(scroll_id: str) -> None:
    _REGISTRY.pop(scroll_id, None)
