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
        kind_num = _KIND_ALIASES.get(str(span_kind))
        if kind_num is not None:
            conds.append(F.col("span_kind") == kind_num)
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
            path = f"$.{key}"
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


_JAEGER_KINDS = [
    "unspecified", "internal", "server", "client", "producer", "consumer",
]
_KIND_ALIASES = {
    **{str(i): i for i in range(6)},
    **{name: i for i, name in enumerate(_JAEGER_KINDS)},
    **{f"SPAN_KIND_{name.upper()}": i for i, name in enumerate(_JAEGER_KINDS)},
}


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
            kind_num = _KIND_ALIASES.get(str(span_kind))
            if kind_num is not None:
                prefix += f"{kind_num}\x00"
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
