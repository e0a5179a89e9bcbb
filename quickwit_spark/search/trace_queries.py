"""Jaeger-workflow trace queries over span docs.

The reference's Jaeger integration answers FindTraceIDs with a
dedicated tantivy collector
(qw/quickwit-search/src/find_trace_ids_collector.rs): among all spans
matching a query, select the `num_traces` most recent TRACES — i.e.
dedupe spans per trace id keeping each trace's max span timestamp,
order by that timestamp desc with trace id as tie-break ("top k
elements with duplicates", collector doc comment). Per segment it
keeps a bounded (term_ord → max timestamp) map and merge_fruits
re-merges the per-segment winners.

Spark-native re-expression: groupBy(trace_id).agg(max(ts)) + top-k —
the partial aggregation IS the per-segment bounded map (map-side
combine dedupes before the shuffle) and the final top-k is
merge_fruits, so the plan has the same two-level shape the collector
hand-codes, with the shuffle carrying one row per (partition, trace)
rather than per span. At 100 TB of spans that cardinality reduction
is what makes the query feasible; no window functions, no driver
work beyond the k winners.

Input: any span DataFrame with trace-id + timestamp columns — e.g.
`sources.otlp.otlp_traces_docs` output (trace_id,
span_start_timestamp_nanos), which is the same doc shape the
reference's otel-traces-v0_9 index stores. Callers pre-filter the
spans (service/tag/duration predicates) exactly like the collector
runs under a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _jaeger_tag(key: str, value) -> dict | None:
    """One OTel attribute value → Jaeger KeyValue
    (otlp_attributes_to_jaeger_tags, lib.rs:944-1026): arrays
    JSON-stringify, bools/ints/floats keep their type, nulls drop."""
    import json as _json

    if value is None:
        return None
    if isinstance(value, bool):
        return {"key": key, "v_type": "bool", "v_bool": value}
    if isinstance(value, int):
        return {"key": key, "v_type": "int64", "v_int64": value}
    if isinstance(value, float):
        return {"key": key, "v_type": "float64", "v_float64": value}
    if isinstance(value, list):
        return {
            "key": key,
            "v_type": "string",
            "v_str": _json.dumps(value, separators=(",", ":")),
        }
    return {"key": key, "v_type": "string", "v_str": str(value)}


def _attrs_to_tags(attrs: dict, parent_key: str | None = None) -> list[dict]:
    """Nested objects flatten with dot-joined keys (lib.rs:959-966)."""
    tags: list[dict] = []
    for key, value in (attrs or {}).items():
        full = f"{parent_key}.{key}" if parent_key else key
        if isinstance(value, dict):
            tags.extend(_attrs_to_tags(value, full))
        else:
            tag = _jaeger_tag(full, value)
            if tag is not None:
                tags.append(tag)
    return tags


def _ts(nanos: int) -> dict:
    return {"seconds": nanos // 1_000_000_000, "nanos": nanos % 1_000_000_000}


def to_jaeger_spans(rows, max_fetch_spans: int = 10_000) -> list[dict]:
    """Flattened span-doc rows (find_traces output / otlp_traces_docs
    shape) → Jaeger-model span dicts, reproducing
    qw_span_to_jaeger_span (qw/quickwit-jaeger/src/lib.rs:759-1089):
    typed tags with nested-object flattening, span.kind tag (INTERNAL
    and UNSPECIFIED omitted per the OTel→Jaeger spec), status →
    otel.status_code/_description + error:true, dropped-count tags,
    events → logs with the name→`event` field precedence rule, parent
    ChildOf reference before link FollowsFrom references.

    This is the presentation step of the serving path — it runs on the
    ≤ max_fetch_spans rows a query returns (reference
    default_max_fetch_spans = 10k), never over the corpus; the
    distributed phases live in find_traces."""
    import json as _json

    out: list[dict] = []
    for row in rows:
        if len(out) >= max_fetch_spans:
            break
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        loads = lambda s: _json.loads(s) if s else {}  # noqa: E731
        tags = _attrs_to_tags(loads(d.get("span_attributes")))
        for count, key in [
            (d.get("span_dropped_attributes_count"), "otel.dropped_attributes_count"),
            (d.get("span_dropped_events_count"), "otel.dropped_events_count"),
            (d.get("span_dropped_links_count"), "otel.dropped_links_count"),
        ]:
            if count:
                tags.append({"key": key, "v_type": "int64", "v_int64": count})
        kind = d.get("span_kind") or 0
        if 2 <= kind <= 5:
            tags.append(
                {
                    "key": "span.kind",
                    "v_type": "string",
                    "v_str": _JAEGER_KINDS[kind],
                }
            )
        status = loads(d.get("span_status")) or None
        if status:
            code = status.get("code")
            if code in ("ok", "error"):
                tags.append(
                    {
                        "key": "otel.status_code",
                        "v_type": "string",
                        "v_str": code.upper(),
                    }
                )
            if code == "error":
                if status.get("message"):
                    tags.append(
                        {
                            "key": "otel.status_description",
                            "v_type": "string",
                            "v_str": status["message"],
                        }
                    )
                tags.append({"key": "error", "v_type": "bool", "v_bool": True})
        logs = []
        for event in _json.loads(d.get("events") or "[]"):
            fields = _attrs_to_tags(event.get("event_attributes") or {})
            name = event.get("event_name") or ""
            if name and "event" not in (event.get("event_attributes") or {}):
                fields.append({"key": "event", "v_type": "string", "v_str": name})
            if event.get("event_dropped_attributes_count"):
                fields.append(
                    {
                        "key": "otel.dropped_attributes_count",
                        "v_type": "int64",
                        "v_int64": event["event_dropped_attributes_count"],
                    }
                )
            logs.append(
                {
                    "timestamp": _ts(event.get("event_timestamp_nanos") or 0),
                    "fields": fields,
                }
            )
        references = []
        if d.get("parent_span_id"):
            references.append(
                {
                    "trace_id": d["trace_id"],
                    "span_id": d["parent_span_id"],
                    "ref_type": "child_of",
                }
            )
        for link in _json.loads(d.get("links") or "[]"):
            references.append(
                {
                    "trace_id": link.get("link_trace_id"),
                    "span_id": link.get("link_span_id"),
                    "ref_type": "follows_from",
                }
            )
        start = d.get("span_start_timestamp_nanos") or 0
        end = d.get("span_end_timestamp_nanos") or start
        out.append(
            {
                "trace_id": d.get("trace_id"),
                "span_id": d.get("span_id"),
                "operation_name": d.get("span_name"),
                "references": references,
                "flags": 0,
                "start_time": _ts(start),
                "duration": _ts(end - start),
                "tags": tags,
                "logs": logs,
                "process": {
                    "service_name": d.get("service_name"),
                    "tags": _attrs_to_tags(loads(d.get("resource_attributes"))),
                },
                "warnings": [],
            }
        )
    return out


def trace_query_predicate(
    service: str | None = None,
    span_kind=None,
    span_name: str | None = None,
    tags: dict | None = None,
    min_start_nanos: int | None = None,
    max_start_nanos: int | None = None,
    min_duration_millis: int | None = None,
    max_duration_millis: int | None = None,
):
    """Jaeger TraceQueryParameters → one Column predicate over the
    flattened span docs (the build_search_query analog,
    qw/quickwit-jaeger/src/lib.rs:592-700):

      - service/kind/name → equality terms
      - tag "error"="true"/"false" → span_status.code is/isn't "error"
        (unset status counts as not-error, like the must_not term)
      - tag "event" → event-name membership (event_names column)
      - any other tag k=v → match in resource_attributes OR
        span_attributes OR any event's event_attributes (the
        reference's three-way should), values compared as strings via
        JSON extraction
      - start window on span_start_timestamp_nanos, duration window on
        span_duration_millis

    All JSON probing is get_json_object/from_json Column work — the
    predicate pushes into the span scan."""
    conds = []
    if service:
        conds.append(F.col("service_name") == service)
    if span_kind is not None and span_kind != "":
        conds.append(F.col("span_kind") == _kind_num(span_kind))
    if span_name:
        conds.append(F.col("span_name") == span_name)
    for key, value in sorted((tags or {}).items()):
        if key == "error" and value == "true":
            conds.append(
                F.get_json_object("span_status", "$.code") == "error"
            )
        elif key == "error" and value == "false":
            code = F.get_json_object("span_status", "$.code")
            conds.append(code.isNull() | (code != "error"))
        elif key == "event":
            conds.append(F.array_contains("event_names", value))
        else:
            # bracket form: OTel attribute keys are FLAT dotted strings
            # (http.method, service.version) — `$.http.method` would
            # probe a nested object and never match
            path = "$['" + key.replace("'", "\\'") + "']"
            in_events = F.exists(
                F.from_json(
                    F.col("events"),
                    "array<struct<event_attributes:map<string,string>>>",
                ),
                lambda e: e["event_attributes"].getItem(key) == value,
            )
            conds.append(
                (F.get_json_object("resource_attributes", path) == value)
                | (F.get_json_object("span_attributes", path) == value)
                | F.coalesce(in_events, F.lit(False))
            )
    if min_start_nanos is not None:
        conds.append(F.col("span_start_timestamp_nanos") >= min_start_nanos)
    if max_start_nanos is not None:
        conds.append(F.col("span_start_timestamp_nanos") <= max_start_nanos)
    if min_duration_millis is not None:
        conds.append(F.col("span_duration_millis") >= min_duration_millis)
    if max_duration_millis is not None:
        conds.append(F.col("span_duration_millis") <= max_duration_millis)
    pred = F.lit(True)
    for c in conds:
        pred = pred & c
    return pred


def find_traces(
    spans: DataFrame,
    num_traces: int,
    max_trace_duration_secs: int = 3600,
    timestamp_col: str = "span_start_timestamp_nanos",
    **query,
) -> DataFrame:
    """Jaeger FindTraces (lib.rs:184-214): two phases — (1) the
    predicate + FindTraceIds collector select the `num_traces` most
    recent matching traces, (2) ALL spans of those traces are fetched
    within [min winner timestamp - max_trace_duration, max winner
    timestamp + max_trace_duration] (reference default 3600 s, the
    assumed max trace length, node_config default_max_trace_duration).

    Spark shape: phase 1 is the groupBy-max top-k; phase 2 is a
    broadcast LEFT SEMI join on the ≤ num_traces winner ids plus the
    pushed-down time window — the docs' time column prunes segments
    the same way the reference narrows its second search."""
    matched = spans.filter(trace_query_predicate(**query))
    winners = find_trace_ids(matched, num_traces, timestamp_col=timestamp_col)
    bounds = winners.agg(
        F.min("span_timestamp").alias("lo"), F.max("span_timestamp").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return spans.filter(F.lit(False))
    pad = max_trace_duration_secs * 1_000_000_000
    return spans.filter(
        (F.col(timestamp_col) >= bounds["lo"] - pad)
        & (F.col(timestamp_col) <= bounds["hi"] + pad)
    ).join(
        F.broadcast(winners.select("trace_id")), "trace_id", "left_semi"
    )


def get_trace(
    spans: DataFrame,
    trace_id: str,
    lookback_secs: int | None = None,
    now_nanos: int | None = None,
    timestamp_col: str = "span_start_timestamp_nanos",
) -> DataFrame:
    """Jaeger GetTrace (lib.rs:216-243): every span of one trace,
    optionally bounded by the lookback window (the reference applies
    `lookback_period` when the request carries no time bounds). A
    single-trace equality predicate — pushed into the span scan."""
    out = spans.filter(F.col("trace_id") == trace_id)
    if lookback_secs is not None:
        if now_nanos is None:
            raise ValueError("get_trace: lookback needs now_nanos")
        out = out.filter(
            F.col(timestamp_col) >= now_nanos - lookback_secs * 1_000_000_000
        )
    return out


_JAEGER_KINDS = [
    "unspecified", "internal", "server", "client", "producer", "consumer",
]
_KIND_ALIASES = {
    **{str(i): i for i in range(6)},
    **{name: i for i, name in enumerate(_JAEGER_KINDS)},
    **{f"SPAN_KIND_{name.upper()}": i for i, name in enumerate(_JAEGER_KINDS)},
}


def _kind_num(span_kind) -> int:
    """Resolve a span-kind alias to its OTLP number, erroring on
    unknown values: a typo'd kind must not silently widen the query to
    every kind (the reference matches a term that doesn't exist and
    returns nothing — failing loudly is the honest analog)."""
    num = _KIND_ALIASES.get(str(span_kind))
    if num is None:
        raise ValueError(
            f"unknown span_kind {span_kind!r}: expected one of "
            f"{sorted(_KIND_ALIASES)}"
        )
    return num


def get_services(
    spans: DataFrame,
    lookback_secs: int | None = None,
    now_nanos: int | None = None,
    max_hits: int = 1000,
    service_col: str = "service_name",
    timestamp_col: str = "span_start_timestamp_nanos",
) -> DataFrame:
    """Jaeger GetServices (qw/quickwit-jaeger/src/lib.rs:89-119): the
    sorted distinct service names among spans in the lookback window,
    capped at 1000 terms like the reference's ListTerms call. Pass
    `now_nanos` explicitly for deterministic windows (the reference
    stamps wall-clock now)."""
    out = spans
    if lookback_secs is not None:
        if now_nanos is None:
            raise ValueError("get_services: lookback needs now_nanos")
        out = out.filter(
            F.col(timestamp_col) >= now_nanos - lookback_secs * 1_000_000_000
        )
    return (
        out.select(F.col(service_col).alias("service"))
        .where(F.col("service").isNotNull())
        .distinct()
        .orderBy("service")
        .limit(max_hits)
    )


def get_operations(
    spans: DataFrame,
    service: str | None = None,
    span_kind: str | None = None,
    lookback_secs: int | None = None,
    now_nanos: int | None = None,
    max_hits: int = 1000,
    fingerprint_col: str = "span_fingerprint",
    timestamp_col: str = "span_start_timestamp_nanos",
) -> DataFrame:
    """Jaeger GetOperations (lib.rs:122-161): operations =
    (span name, jaeger span-kind string) pairs decoded from the
    span_fingerprint terms (service\\x00kind\\x00name,
    SpanFingerprint::start_key/end_key prefix range), optionally
    filtered by service and kind, sorted, capped at 1000. The
    fingerprint prefix filter IS the reference's term-dictionary
    [start_key, end_key) range — here it prunes before the distinct's
    shuffle."""
    out = spans.select(F.col(fingerprint_col).alias("fp"), timestamp_col)
    if lookback_secs is not None:
        if now_nanos is None:
            raise ValueError("get_operations: lookback needs now_nanos")
        out = out.filter(
            F.col(timestamp_col) >= now_nanos - lookback_secs * 1_000_000_000
        )
    if service:
        prefix = service + "\x00"
        if span_kind is not None and span_kind != "":
            prefix += f"{_kind_num(span_kind)}\x00"
        out = out.filter(F.col("fp").startswith(prefix))
    parts = F.split(F.col("fp"), "\x00")
    decoded = out.select(
        F.element_at(parts, 3).alias("name"),
        F.element_at(parts, 2).cast("int").alias("_kind_num"),
    ).where(F.col("name").isNotNull() & F.col("_kind_num").isNotNull())
    kind_str = F.element_at(
        F.array(*[F.lit(k) for k in _JAEGER_KINDS]),
        F.col("_kind_num") + 1,
    )
    return (
        decoded.select("name", kind_str.alias("span_kind"))
        .distinct()
        .orderBy("name", "span_kind")
        .limit(max_hits)
    )


def find_trace_ids(
    spans: DataFrame,
    num_traces: int,
    trace_id_col: str = "trace_id",
    timestamp_col: str = "span_start_timestamp_nanos",
) -> DataFrame:
    """→ (trace_id, span_timestamp): the `num_traces` most recent
    traces among the given (already query-filtered) spans, each with
    its latest matching span's timestamp; ordered most-recent-first,
    trace id ascending on ties (find_trace_ids_collector.rs Span::cmp:
    timestamp.reverse().then(trace_id))."""
    if num_traces <= 0:
        raise ValueError("find_trace_ids: num_traces must be positive")
    return (
        spans.groupBy(F.col(trace_id_col).alias("trace_id"))
        .agg(F.max(timestamp_col).alias("span_timestamp"))
        .orderBy(F.desc("span_timestamp"), "trace_id")
        .limit(num_traces)
    )
