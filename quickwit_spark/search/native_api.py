"""Native search REST surface — `GET {index}/search` without HTTP.

The reference's own (non-ES) search API
(`quickwit-serve/src/search_api/rest_handler.rs`: SearchRequestQueryString
→ SearchResponseRest) drives a query-string query with time-range
params and returns `{num_hits, hits: [docs], elapsed_time_micros,
errors}`. This adapter maps those params onto the engine:

  - `query`  — quickwit query-string syntax (default `*`)
  - `start_timestamp` / `end_timestamp` — epoch SECONDS, [start, end)
    against the index's timestamp field (manifest pruning included)
  - `max_hits` (default 20), `start_offset`
  - `sort_by` — comma list; bare name sorts DESCENDING (the reference
    default), `+` prefix flips to ascending, `_score` ranks by BM25
    (`docs/internals/sorting.md:8-25`)
  - `count_all` — `true` (default) exact counting, `false` lets the
    engine underestimate past `max_hits` (CountHits::Underestimate)

Hit payloads are the stored source JSON when the index keeps one,
else the docmap row of stored columns.
"""

from __future__ import annotations

import json


def _time_range(params: dict):
    lo = params.get("start_timestamp")
    hi = params.get("end_timestamp")
    if lo is None and hi is None:
        return None
    to_us = lambda v: int(v) * 1_000_000 if v is not None else None  # noqa: E731
    return (to_us(lo), to_us(hi))


def _sort_specs(sort_by: str) -> list[tuple]:
    specs = []
    for part in str(sort_by).split(","):
        part = part.strip()
        if not part:
            continue
        desc = True
        if part.startswith("+"):
            desc, part = False, part[1:]
        elif part.startswith("-"):
            # '-' makes the direction explicit descending (reference
            # sort_by grammar: descending is already the default)
            part = part[1:]
        specs.append((part, desc))
    return specs


def _doc_payload(row_dict: dict, searcher) -> dict:
    src_col = searcher.config.stored_source
    if src_col and row_dict.get(src_col) is not None:
        return json.loads(row_dict[src_col])
    drop = {"segment_id", "doc_id", "doc_key", "score", "rank",
            "sort_value", "sort_value2", src_col}
    return {k: v for k, v in row_dict.items() if k not in drop}


def _timestamp_field(searcher) -> str | None:
    """Dot path of the index's timestamp field (field_options entry
    whose physical column is the configured time column)."""
    tc = searcher.config.time_column
    if tc is None:
        return None
    for path, opt in (searcher.config.field_options or {}).items():
        if (opt or {}).get("column", path) == tc:
            return path
    return tc


def native_search(searcher, params: dict) -> dict:
    """One `{index}/search` request → response dict."""
    query = params.get("query") or "*"
    time_range = _time_range(params)
    if time_range is not None:
        # [start, end) doc-level filter on the timestamp field (the
        # manifest time pruning alone is segment-granular); reference
        # start/end params are epoch seconds, end exclusive
        from quickwit_spark.query.ast import Bool, Range
        from quickwit_spark.query.parser import parse_query

        base = parse_query(
            query,
            [f.name for f in searcher.config.fields],
            position_fields={
                f.name
                for f in searcher.config.fields
                if f.record == "position"
            },
        )
        tf = _timestamp_field(searcher)
        lo, hi = time_range
        kw = {}
        if lo is not None:
            kw["gte"] = int(lo // 1_000_000)
        if hi is not None:
            kw["lt"] = int(hi // 1_000_000)
        query = Bool(must=[base], filter=[Range(tf, **kw)])
    max_hits = int(params.get("max_hits", 20))
    start_offset = int(params.get("start_offset", 0))
    count_all = str(params.get("count_all", "true")).lower() != "false"

    if count_all:
        num_hits = searcher.count(query, time_range)
    else:
        num_hits, _exact = searcher.count_up_to(
            query, start_offset + max_hits, time_range
        )

    rows = []
    if max_hits > 0:
        sort_by = params.get("sort_by") or params.get("sort_by_field")
        k = start_offset + max_hits
        if sort_by and "_score" not in str(sort_by):
            specs = _sort_specs(sort_by)
            fetch = [searcher.config.stored_source] if searcher.config.stored_source else None
            df = searcher.sort_by_field(
                query, specs, k=k, time_range=time_range, fetch=fetch,
                tie_by_key=True,
            )
        else:
            fetch = (
                [searcher.config.stored_source]
                if searcher.config.stored_source
                else None
            )
            df = searcher.search(query, k=k, time_range=time_range, fetch=fetch)
        rows = df.collect()[start_offset:]
    hits = [_doc_payload(r.asDict(), searcher) for r in rows]
    return {"num_hits": num_hits, "hits": hits, "errors": []}
