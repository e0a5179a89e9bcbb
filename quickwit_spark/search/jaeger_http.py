"""Jaeger HTTP query API — the reference's `{index}/jaeger/api/*`
routes re-expressed over the trace-query operators.

The reference mounts four GET routes
(qw/quickwit-serve/src/jaeger_api/rest_handler.rs:56-165, all under
`/api/v1/{otel-traces-index-id}/jaeger/api/`):

    services                          → {"data": [service names]}
    services/{service}/operations     → {"data": [operation names]}
    traces?service=&operation=&start=&end=&tags=&minDuration=&
           maxDuration=&lookback=&limit=
                                      → {"data": [JaegerTrace]}
    traces/{trace-id}                 → {"data": [JaegerTrace]}

and converts the span stream into the Jaeger **UI** JSON model
(jaeger_api/model.rs:68-310: camelCase, hex trace/span ids,
microsecond times, typed {key,type,value} tags, per-trace p1/p2...
process map). This module does the same conversion over
`trace_queries` results, plus the query-param plumbing:

  - `start`/`end` are MICROseconds; the reference converts them to
    whole seconds before filtering (TraceQueryParameters start_time_*
    → `.seconds`, quickwit-jaeger/src/lib.rs:251-252), so we truncate
    to second precision too,
  - `minDuration`/`maxDuration` are unit-suffixed strings ("1.2s",
    "100ms", "500us"; jaeger_api/parse_duration.rs), converted to
    whole milliseconds; a duration that rounds to 0 ms means "no
    bound" (to_duration_millis, lib.rs:808-815),
  - `tags` is a JSON object string,
  - `limit` defaults to 20 traces (model.rs DEFAULT_NUMBER_OF_TRACES),
  - unknown params are a 400 (TracesSearchQueryParams is
    deny_unknown_fields).

The reference windows services/operations by a config lookback from
wall-clock now; a deterministic library surface takes the lookback as
an explicit option instead (None = all retained spans).

Scale shape: everything distributed runs inside `trace_queries`
(groupBy-max top-k + broadcast semi-join); this module only converts
the ≤ max_fetch_spans rows a query returns.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame

from quickwit_spark.search.trace_queries import (
    find_traces,
    get_operations,
    get_services,
    get_trace,
    to_jaeger_spans,
)

DEFAULT_NUMBER_OF_TRACES = 20

# every column flatten_traces_request emits (sources/otlp.py) — the
# otel-traces-v0_9 doc shape; spans_frame selects whichever of these
# the docmap actually holds, so older/sparser indexes still serve
_SPAN_DOC_COLUMNS = [
    "trace_id", "trace_state", "service_name",
    "resource_attributes", "resource_dropped_attributes_count",
    "scope_name", "scope_version", "scope_attributes",
    "scope_dropped_attributes_count",
    "span_id", "span_kind", "span_name", "span_fingerprint",
    "span_start_timestamp_nanos", "span_end_timestamp_nanos",
    "span_duration_millis", "span_attributes",
    "span_dropped_attributes_count", "span_dropped_events_count",
    "span_dropped_links_count", "span_status", "parent_span_id",
    "is_root", "events", "event_names", "links",
]

_TRACES_PARAMS = {
    "service", "operation", "start", "end", "tags",
    "minDuration", "maxDuration", "lookback", "limit",
}


def spans_frame(searcher) -> DataFrame:
    """The searcher's docmap projected to the span-doc columns the
    trace queries expect. OTLP-ingested indexes store these under
    their own names, so this is a plain column-pruned select — the
    scan reads only the span columns."""
    cols = set(searcher.docs().columns)
    keep = [c for c in _SPAN_DOC_COLUMNS if c in cols]
    if "trace_id" not in keep or "span_start_timestamp_nanos" not in keep:
        raise ValueError(
            "index does not look like an OTel traces index "
            "(missing trace_id/span_start_timestamp_nanos columns)"
        )
    return searcher.docs().select(*keep)


def parse_duration_millis(s: str) -> int | None:
    """Unit-suffixed duration string → whole milliseconds, or None
    when it rounds to 0 ms (reference parse_duration_nanos +
    to_duration_millis: a sub-millisecond bound is no bound). Valid
    units: ns, us/µs, ms, s, m, h."""
    m = re.fullmatch(r"\s*(-?[\d.]+)\s*(ns|us|µs|ms|s|m|h)\s*", str(s))
    if not m:
        raise ValueError(f"failed to parse duration {s!r}")
    num = float(m.group(1))
    nanos = num * {
        "ns": 1, "us": 1e3, "µs": 1e3, "ms": 1e6,
        "s": 1e9, "m": 60e9, "h": 3600e9,
    }[m.group(2)]
    millis = int(round(nanos)) // 1_000_000
    return millis if millis else None


def _micros(ts: dict | None) -> int:
    """{seconds, nanos} → microseconds since epoch
    (convert_timestamp_to_microsecs, model.rs)."""
    if not ts:
        return 0
    return ts["seconds"] * 1_000_000 + ts["nanos"] // 1_000


_MAX_SAFE_INT = 9007199254740991  # 2^53-1: larger int64s serialize as strings


def _ui_tag(kv: dict) -> dict:
    """Internal KeyValue → UI {key, type, value}
    (JaegerKeyValue::from, model.rs:211-261)."""
    vt = kv.get("v_type", "string")
    if vt == "bool":
        value = kv.get("v_bool")
    elif vt == "int64":
        value = kv.get("v_int64", 0)
        if abs(value) > _MAX_SAFE_INT:
            value = str(value)
    elif vt == "float64":
        value = kv.get("v_float64")
    else:
        vt = "string"
        value = kv.get("v_str", "")
    return {"key": kv["key"], "type": vt, "value": value}


def _ui_span(span: dict) -> dict:
    """to_jaeger_spans output dict → Jaeger UI span
    (JaegerSpan::try_from, model.rs:123-177). `processID` is assigned
    later by the per-trace process map."""
    return {
        "traceID": span["trace_id"],
        "spanID": span["span_id"],
        "operationName": span["operation_name"],
        "references": [
            {
                "traceID": r["trace_id"],
                "spanID": r["span_id"],
                "refType": r["ref_type"].upper(),
            }
            for r in span["references"]
        ],
        "flags": span.get("flags", 0),
        "startTime": _micros(span.get("start_time")),
        "duration": _micros(span.get("duration")),
        "tags": [_ui_tag(t) for t in span["tags"]],
        "logs": [
            {
                "timestamp": _micros(lg.get("timestamp")),
                "fields": [_ui_tag(f) for f in lg["fields"]],
            }
            for lg in span["logs"]
        ],
        "processID": None,
        "warnings": span.get("warnings", []),
        # carried for the process map, stripped before serialization
        # (model.rs skip_serializing on `process`)
        "_process": span.get("process") or {},
    }


def build_ui_traces(spans: list[dict]) -> list[dict]:
    """Internal span dicts → [JaegerTrace] with the per-trace process
    map (JaegerTrace::build_process_map, model.rs:95-118: first-seen
    service_name → p1, p2, ..., counter restarting per trace).
    Spans group by trace id keeping first-seen trace order."""
    by_trace: dict[str, list[dict]] = {}
    for span in spans:
        by_trace.setdefault(span["trace_id"], []).append(_ui_span(span))
    traces = []
    for trace_id, ui_spans in by_trace.items():
        service_to_pid: dict[str, str] = {}
        processes: dict[str, dict] = {}
        for s in ui_spans:
            proc = s.pop("_process")
            service = proc.get("service_name") or "none"
            pid = service_to_pid.get(service)
            if pid is None:
                pid = f"p{len(service_to_pid) + 1}"
                service_to_pid[service] = pid
                processes[pid] = {
                    "serviceName": service,
                    "key": pid,
                    "tags": [_ui_tag(t) for t in proc.get("tags", [])],
                }
            s["processID"] = pid
        traces.append(
            {
                "traceID": trace_id,
                "spans": ui_spans,
                "processes": processes,
                "warnings": [],
            }
        )
    return traces


def _collect_traces(spans_df: DataFrame, max_fetch_spans: int) -> list[dict]:
    """Fetched span rows → UI traces: traces most-recent-first (the
    FindTraceIds winner order), spans within a trace by start time
    then span id. The sort runs on the ≤ max_fetch_spans result."""
    rows = spans_df.collect()
    # order traces by their latest span desc (collector order),
    # trace_id tie-break ascending
    latest: dict[str, int] = {}
    for r in rows:
        ts = r["span_start_timestamp_nanos"] or 0
        key = r["trace_id"]
        if key not in latest or ts > latest[key]:
            latest[key] = ts
    order = {
        t: i
        for i, (t, _) in enumerate(
            sorted(latest.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    rows.sort(
        key=lambda r: (
            order[r["trace_id"]],
            r["span_start_timestamp_nanos"] or 0,
            r["span_id"] or "",
        )
    )
    return build_ui_traces(to_jaeger_spans(rows, max_fetch_spans))


def handle_jaeger(
    spans: DataFrame,
    parts: list[str],
    params: dict,
    lookback_secs: int | None = None,
    now_nanos: int | None = None,
    max_fetch_spans: int = 10_000,
) -> dict:
    """One `{index}/jaeger/api/...` request. `parts` is the path after
    `jaeger/api/` (e.g. ["services"], ["traces"],
    ["traces", "<hex id>"]); `params` the parsed query params. Raises
    ValueError for 400s and LookupError for 404 routes."""
    if parts == ["services"]:
        names = [
            r["service"]
            for r in get_services(
                spans, lookback_secs=lookback_secs, now_nanos=now_nanos
            ).collect()
        ]
        return {"data": names}
    if len(parts) == 3 and parts[0] == "services" and parts[2] == "operations":
        ops = get_operations(
            spans,
            service=parts[1],
            lookback_secs=lookback_secs,
            now_nanos=now_nanos,
        ).collect()
        # the HTTP route returns operation NAMES only
        # (jaeger_service_operations, rest_handler.rs:195-221)
        return {"data": [r["name"] for r in ops]}
    if parts == ["traces"]:
        unknown = sorted(set(params) - _TRACES_PARAMS)
        if unknown:
            raise ValueError(
                f"unknown trace search parameter(s): {', '.join(unknown)}"
            )
        tags = {}
        if params.get("tags"):
            try:
                tags = json.loads(params["tags"])
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"failed to deserialize tags {params['tags']!r}: {e}"
                ) from e
            if not isinstance(tags, dict) or not all(
                isinstance(v, str) for v in tags.values()
            ):
                # the reference deserializes tags as HashMap<String,
                # String> — a bool/number/null value is a 400, never a
                # silent never-matches coercion (str(True) == "True")
                raise ValueError(
                    f"failed to deserialize tags {params['tags']!r}: "
                    "expected a JSON object with string values"
                )
        query: dict = {}
        if params.get("service"):
            query["service"] = params["service"]
        if params.get("operation"):
            query["span_name"] = params["operation"]
        if tags:
            query["tags"] = dict(tags)
        # start/end are µs; the reference truncates to whole seconds
        for name, kw in (("start", "min_start_nanos"), ("end", "max_start_nanos")):
            if params.get(name) is not None:
                try:
                    micros = int(params[name])
                except (TypeError, ValueError) as e:
                    raise ValueError(f"invalid {name!r}: {params[name]!r}") from e
                query[kw] = (micros * 1_000 // 1_000_000_000) * 1_000_000_000
        if params.get("minDuration"):
            query["min_duration_millis"] = parse_duration_millis(
                params["minDuration"]
            )
        if params.get("maxDuration"):
            query["max_duration_millis"] = parse_duration_millis(
                params["maxDuration"]
            )
        query = {k: v for k, v in query.items() if v is not None}
        limit = int(params.get("limit") or DEFAULT_NUMBER_OF_TRACES)
        found = find_traces(spans, limit, **query)
        return {"data": _collect_traces(found, max_fetch_spans)}
    if len(parts) == 2 and parts[0] == "traces":
        trace_id = parts[1]
        if not re.fullmatch(r"(?:[0-9a-fA-F]{2})+", trace_id):
            raise ValueError(f"failed to decode trace id {trace_id!r}")
        one = get_trace(spans, trace_id.lower())
        return {"data": _collect_traces(one, max_fetch_spans)}
    raise LookupError(f"no jaeger route for {'/'.join(parts)!r}")
