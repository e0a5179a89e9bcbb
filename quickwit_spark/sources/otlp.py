"""OTLP logs/traces input formats → flat doc DataFrames.

The reference ships OpenTelemetry ingestion as a first-class source:
`SourceInputFormat::OtlpLogsJson/OtlpLogsProtobuf/OtlpTraceJson/
OtlpTraceProtobuf` feed the doc processor
(qw/quickwit-indexing/src/actors/doc_processor.rs:27-35), and the
payloads are flattened into the fixed `otel-logs-v0_9` /
`otel-traces-v0_9` doc mappings by
qw/quickwit-opentelemetry/src/otlp/logs.rs (LogRecord +
parse_otlp_logs) and traces.rs (Span::from_otlp). This module is the
Spark-native re-expression: a DataFrame of OTLP export-request
payloads (one request per row, many records per request — the same
batch granularity the reference's gRPC/HTTP endpoints receive) is
flattened into one row per log record / span with exactly the
reference's field set and coercions.

Formats:
  json      OTLP/JSON per the opentelemetry-proto JSON mapping
            (camelCase keys, u64 as decimal strings, trace/span ids as
            hex strings, enums as name or number).
  protobuf  OTLP binary protobuf, decoded by the descriptor-driven
            wire reader below (protobuf wire format is public and
            small: varint / fixed32 / fixed64 / length-delimited; no
            external protobuf dependency needed). `encode_*` inverses
            exist so tests can round-trip without a generator lib.

Reference semantics reproduced (logs.rs:400-510, traces.rs:247-330,
mod.rs:108-175):
  - service_name is pulled (and removed) from resource attribute
    "service.name", defaulting to "unknown_service".
  - observed_timestamp_nanos==0 → caller-supplied default (the
    reference stamps wall-clock "now"; a deterministic engine takes it
    as a parameter). timestamp_nanos==0 → observed_timestamp_nanos.
  - all-zero trace/span ids → NULL; ids render as lowercase hex
    (`output_format: hex` in the reference mappings).
  - empty severity_text/trace_state/span scope name/version → NULL;
    empty span name → "unknown".
  - string log bodies wrap as {"message": ...}; other AnyValues pass
    through; bytes attribute values are dropped (mod.rs:158-161).
  - per-request dedup via the reference's BTreeSet insert (first
    record wins): logs on (service_name, timestamp_nanos)
    (logs.rs OrdLogRecord), spans on (trace_id, span_name,
    span_start_timestamp_nanos, span_id) (traces.rs OrdSpan).
  - span_fingerprint = service\\x00kind\\x00name (traces.rs:441-455),
    span_duration_millis = (end-start)//1e6, is_root = parent absent,
    span_status Unset is omitted (NULL here).

Scale design: payload parsing is an Arrow-batched flatMap
(`mapInArrow`) — Python runs once per *request payload* (each
carrying a whole batch of records, exactly the unit the reference
parses server-side per gRPC call), never per record; downstream
everything is columnar. JSON object fields (attributes, body, events,
links, span_status) are emitted as canonical JSON strings (sorted
keys) — the engine's `json`-typed doc-mapping columns — so equal
payloads always produce byte-equal docs.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# minimal protobuf wire codec (public wire format; field numbers from the
# public opentelemetry-proto .proto files)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(n: int) -> bytes:
    if n < 0:
        # two's-complement handling happens at the field level (i64v);
        # a negative here would arithmetic-shift forever
        raise ValueError("varint: negative value reached the wire writer")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_fields(buf: bytes):
    """→ yields (field_number, wire_type, value): varint int, fixed64
    raw 8 bytes, length-delimited bytes, fixed32 raw 4 bytes."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 1:
            v, pos = buf[pos : pos + 8], pos + 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v, pos = buf[pos : pos + ln], pos + ln
        elif wt == 5:
            v, pos = buf[pos : pos + 4], pos + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _field(fnum: int, wt: int, payload: bytes) -> bytes:
    return _write_varint((fnum << 3) | wt) + payload


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _field(fnum, 2, _write_varint(len(payload)) + payload)


# Descriptors: {field_number: (name, kind)} with kind ∈
# {"msg:<Desc>", "rep:<Desc>", "str", "bytes", "u64v" (unsigned
#  varint), "i64v" (int64 varint, two's-complement on the wire),
#  "f64t" (fixed64 timestamp), "f32" (fixed32), "dbl", "bool"}.
# Names are the protojson camelCase keys so both decode paths produce
# the same dict shape.

_ANY_VALUE = "AnyValue"
_DESCRIPTORS: dict[str, dict[int, tuple[str, str]]] = {
    "AnyValue": {
        1: ("stringValue", "str"),
        2: ("boolValue", "bool"),
        3: ("intValue", "i64v"),
        4: ("doubleValue", "dbl"),
        5: ("arrayValue", "msg:ArrayValue"),
        6: ("kvlistValue", "msg:KeyValueList"),
        7: ("bytesValue", "bytes"),
    },
    "ArrayValue": {1: ("values", "rep:AnyValue")},
    "KeyValueList": {1: ("values", "rep:KeyValue")},
    "KeyValue": {1: ("key", "str"), 2: ("value", "msg:AnyValue")},
    "Resource": {
        1: ("attributes", "rep:KeyValue"),
        2: ("droppedAttributesCount", "u64v"),
    },
    "InstrumentationScope": {
        1: ("name", "str"),
        2: ("version", "str"),
        3: ("attributes", "rep:KeyValue"),
        4: ("droppedAttributesCount", "u64v"),
    },
    # --- logs ---
    "ExportLogsServiceRequest": {1: ("resourceLogs", "rep:ResourceLogs")},
    "ResourceLogs": {
        1: ("resource", "msg:Resource"),
        2: ("scopeLogs", "rep:ScopeLogs"),
        3: ("schemaUrl", "str"),
    },
    "ScopeLogs": {
        1: ("scope", "msg:InstrumentationScope"),
        2: ("logRecords", "rep:LogRecord"),
        3: ("schemaUrl", "str"),
    },
    "LogRecord": {
        1: ("timeUnixNano", "f64t"),
        2: ("severityNumber", "u64v"),
        3: ("severityText", "str"),
        5: ("body", "msg:AnyValue"),
        6: ("attributes", "rep:KeyValue"),
        7: ("droppedAttributesCount", "u64v"),
        8: ("flags", "f32"),
        9: ("traceId", "bytes"),
        10: ("spanId", "bytes"),
        11: ("observedTimeUnixNano", "f64t"),
    },
    # --- traces ---
    "ExportTraceServiceRequest": {1: ("resourceSpans", "rep:ResourceSpans")},
    "ResourceSpans": {
        1: ("resource", "msg:Resource"),
        2: ("scopeSpans", "rep:ScopeSpans"),
        3: ("schemaUrl", "str"),
    },
    "ScopeSpans": {
        1: ("scope", "msg:InstrumentationScope"),
        2: ("spans", "rep:Span"),
        3: ("schemaUrl", "str"),
    },
    "Span": {
        1: ("traceId", "bytes"),
        2: ("spanId", "bytes"),
        3: ("traceState", "str"),
        4: ("parentSpanId", "bytes"),
        5: ("name", "str"),
        6: ("kind", "u64v"),
        7: ("startTimeUnixNano", "f64t"),
        8: ("endTimeUnixNano", "f64t"),
        9: ("attributes", "rep:KeyValue"),
        10: ("droppedAttributesCount", "u64v"),
        11: ("events", "rep:SpanEvent"),
        12: ("droppedEventsCount", "u64v"),
        13: ("links", "rep:SpanLink"),
        14: ("droppedLinksCount", "u64v"),
        15: ("status", "msg:Status"),
    },
    "SpanEvent": {
        1: ("timeUnixNano", "f64t"),
        2: ("name", "str"),
        3: ("attributes", "rep:KeyValue"),
        4: ("droppedAttributesCount", "u64v"),
    },
    "SpanLink": {
        1: ("traceId", "bytes"),
        2: ("spanId", "bytes"),
        3: ("traceState", "str"),
        4: ("attributes", "rep:KeyValue"),
        5: ("droppedAttributesCount", "u64v"),
    },
    "Status": {2: ("message", "str"), 3: ("code", "u64v")},
}


def _decode_msg(desc_name: str, buf: bytes) -> dict:
    """Wire bytes → protojson-shaped dict (camelCase keys, ids as hex
    strings, 64-bit timestamps as ints)."""
    desc = _DESCRIPTORS[desc_name]
    out: dict = {}
    for fnum, wt, raw in _decode_fields(buf):
        if fnum not in desc:
            continue  # unknown field: skip, like any proto decoder
        name, kind = desc[fnum]
        if kind == "str":
            v = raw.decode("utf-8")
        elif kind == "bytes":
            v = raw.hex()  # protojson for OTLP ids is hex
        elif kind == "u64v":
            v = raw if wt == 0 else int.from_bytes(raw, "little")
        elif kind == "i64v":
            v = raw if wt == 0 else int.from_bytes(raw, "little")
            if v >= 1 << 63:  # int64 negatives arrive as 10-byte varints
                v -= 1 << 64
        elif kind == "bool":
            v = bool(raw)
        elif kind == "dbl":
            v = struct.unpack("<d", raw)[0]
        elif kind == "f64t":
            v = (
                int.from_bytes(raw, "little")
                if wt == 1
                else raw  # tolerate varint encoding
            )
        elif kind == "f32":
            v = struct.unpack("<I", raw)[0] if wt == 5 else raw
        elif kind.startswith("msg:"):
            v = _decode_msg(kind[4:], raw)
        elif kind.startswith("rep:"):
            out.setdefault(name, []).append(_decode_msg(kind[4:], raw))
            continue
        else:  # pragma: no cover
            raise AssertionError(kind)
        out[name] = v
    return out


def _encode_msg(desc_name: str, obj: dict) -> bytes:
    """protojson-shaped dict → wire bytes (test/round-trip inverse)."""
    desc = _DESCRIPTORS[desc_name]
    out = bytearray()
    for fnum, (name, kind) in desc.items():
        if name not in obj or obj[name] is None:
            continue
        v = obj[name]
        if kind == "str":
            out += _len_field(fnum, str(v).encode("utf-8"))
        elif kind == "bytes":
            out += _len_field(fnum, bytes.fromhex(v) if isinstance(v, str) else v)
        elif kind in ("u64v", "i64v"):
            if isinstance(v, str) and not v.lstrip("-").isdigit():
                # protojson allows enum *names*; resolve before encoding
                if v.startswith("SEVERITY_NUMBER_"):
                    v = _severity_number(v)
                else:
                    v = _SPAN_KINDS.get(v, _STATUS_CODES.get(v, 0))
            v = int(v)
            if v < 0:
                v += 1 << 64  # int64 two's-complement wire form
            out += _field(fnum, 0, _write_varint(v))
        elif kind == "bool":
            out += _field(fnum, 0, _write_varint(1 if v else 0))
        elif kind == "dbl":
            out += _field(fnum, 1, struct.pack("<d", float(v)))
        elif kind == "f64t":
            out += _field(fnum, 1, int(v).to_bytes(8, "little"))
        elif kind == "f32":
            out += _field(fnum, 5, struct.pack("<I", int(v)))
        elif kind.startswith("msg:"):
            out += _len_field(fnum, _encode_msg(kind[4:], v))
        elif kind.startswith("rep:"):
            for item in v:
                out += _len_field(fnum, _encode_msg(kind[4:], item))
    return bytes(out)


def encode_logs_request(request: dict) -> bytes:
    return _encode_msg("ExportLogsServiceRequest", request)


def encode_traces_request(request: dict) -> bytes:
    return _encode_msg("ExportTraceServiceRequest", request)


# ---------------------------------------------------------------------------
# protojson value coercions
# ---------------------------------------------------------------------------

_SEVERITY_NAMES = {"TRACE": 1, "DEBUG": 5, "INFO": 9, "WARN": 13, "ERROR": 17, "FATAL": 21}
_SPAN_KINDS = {
    "SPAN_KIND_UNSPECIFIED": 0,
    "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2,
    "SPAN_KIND_CLIENT": 3,
    "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
}
_STATUS_CODES = {
    "STATUS_CODE_UNSET": 0,
    "STATUS_CODE_OK": 1,
    "STATUS_CODE_ERROR": 2,
}


def _u64(v) -> int:
    """protojson encodes (u)int64 as decimal strings; accept both."""
    if v is None:
        return 0
    return int(v)


def _severity_number(v) -> int:
    if isinstance(v, str) and not v.isdigit():
        # "SEVERITY_NUMBER_WARN2" → WARN base 13 + (2-1)
        name = v.removeprefix("SEVERITY_NUMBER_")
        base, mult = name.rstrip("1234"), name[len(name.rstrip("1234")):]
        n = _SEVERITY_NAMES.get(base, 0)
        return n + int(mult) - 1 if n and mult else n
    return _u64(v)


def _enum(v, table: dict[str, int]) -> int:
    if isinstance(v, str) and not v.isdigit():
        return table.get(v, 0)
    return _u64(v)


def _hex_id(v) -> str | None:
    """hex string (protojson) or raw hex from the wire decoder;
    all-zero / empty → None (reference drops zero ids)."""
    if not v:
        return None
    h = v.lower()
    if set(h) <= {"0"}:
        return None
    return h


def _any_value(v: dict):
    """AnyValue protojson dict → python value; bytesValue → None
    (reference mod.rs:158 drops bytes attribute values)."""
    if v is None:
        return None
    if "stringValue" in v:
        return v["stringValue"]
    if "boolValue" in v:
        return bool(v["boolValue"])
    if "intValue" in v:
        return _u64(v["intValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "arrayValue" in v:
        vals = (v["arrayValue"] or {}).get("values") or []
        return [x for x in (_any_value(e) for e in vals) if x is not None]
    if "kvlistValue" in v:
        vals = (v["kvlistValue"] or {}).get("values") or []
        return {
            kv["key"]: av
            for kv in vals
            if kv.get("key")
            for av in [_any_value(kv.get("value"))]
            if av is not None
        }
    return None


def _attrs(kvs) -> dict:
    """extract_attributes analog: skip empty keys and None values."""
    out = {}
    for kv in kvs or []:
        key = kv.get("key")
        if not key:
            continue
        v = _any_value(kv.get("value"))
        if v is not None:
            out[key] = v
    return out


def _jstr(obj) -> str | None:
    if obj is None:
        return None
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


# ---------------------------------------------------------------------------
# request flattening (shared by json + protobuf inputs)
# ---------------------------------------------------------------------------

LOGS_DOC_SCHEMA = (
    "timestamp_nanos long, observed_timestamp_nanos long, "
    "service_name string, severity_text string, severity_number long, "
    "body string, attributes string, dropped_attributes_count long, "
    "trace_id string, span_id string, trace_flags long, "
    "resource_attributes string, resource_dropped_attributes_count long, "
    "scope_name string, scope_version string, scope_attributes string, "
    "scope_dropped_attributes_count long"
)

TRACES_DOC_SCHEMA = (
    "trace_id string, trace_state string, service_name string, "
    "resource_attributes string, resource_dropped_attributes_count long, "
    "scope_name string, scope_version string, scope_attributes string, "
    "scope_dropped_attributes_count long, span_id string, span_kind long, "
    "span_name string, span_fingerprint string, "
    "span_start_timestamp_nanos long, span_end_timestamp_nanos long, "
    "span_duration_millis long, span_attributes string, "
    "span_dropped_attributes_count long, span_dropped_events_count long, "
    "span_dropped_links_count long, span_status string, "
    "parent_span_id string, is_root boolean, events string, "
    "event_names array<string>, links string"
)


def flatten_logs_request(request: dict, default_observed_nanos: int = 0) -> list[dict]:
    """ExportLogsServiceRequest (protojson dict) → LogRecord doc rows,
    reproducing parse_otlp_logs (logs.rs:395-510) including the
    BTreeSet first-wins dedup on (service_name, timestamp_nanos)."""
    seen: set[tuple] = set()
    docs: list[dict] = []
    for rlog in request.get("resourceLogs") or []:
        resource = rlog.get("resource") or {}
        res_attrs = _attrs(resource.get("attributes"))
        service_name = res_attrs.pop("service.name", None)
        if not isinstance(service_name, str):
            service_name = "unknown_service"
        res_dropped = _u64(resource.get("droppedAttributesCount"))
        for slog in rlog.get("scopeLogs") or []:
            scope = slog.get("scope") or {}
            scope_name = scope.get("name") or None
            scope_version = scope.get("version") or None
            scope_attrs = _attrs(scope.get("attributes"))
            scope_dropped = _u64(scope.get("droppedAttributesCount"))
            for rec in slog.get("logRecords") or []:
                observed = _u64(rec.get("observedTimeUnixNano"))
                if observed == 0:
                    observed = default_observed_nanos
                ts = _u64(rec.get("timeUnixNano")) or observed
                key = (service_name, ts)
                if key in seen:
                    continue  # BTreeSet insert: first record wins
                seen.add(key)
                body = _any_value(rec.get("body"))
                if isinstance(body, str):
                    body = {"message": body}
                sev_text = rec.get("severityText") or None
                docs.append(
                    {
                        "timestamp_nanos": ts,
                        "observed_timestamp_nanos": observed,
                        "service_name": service_name,
                        "severity_text": sev_text,
                        "severity_number": _severity_number(
                            rec.get("severityNumber")
                        ),
                        "body": _jstr(body),
                        "attributes": _jstr(_attrs(rec.get("attributes"))),
                        "dropped_attributes_count": _u64(
                            rec.get("droppedAttributesCount")
                        ),
                        "trace_id": _hex_id(rec.get("traceId")),
                        "span_id": _hex_id(rec.get("spanId")),
                        "trace_flags": _u64(rec.get("flags")),
                        "resource_attributes": _jstr(res_attrs),
                        "resource_dropped_attributes_count": res_dropped,
                        "scope_name": scope_name,
                        "scope_version": scope_version,
                        "scope_attributes": _jstr(scope_attrs),
                        "scope_dropped_attributes_count": scope_dropped,
                    }
                )
    return docs


def flatten_traces_request(request: dict) -> list[dict]:
    """ExportTraceServiceRequest (protojson dict) → Span doc rows,
    reproducing Span::from_otlp + parse_otlp_spans (traces.rs:247-380)
    incl. the OrdSpan first-wins dedup on
    (trace_id, span_name, start_ts, span_id)."""
    seen: set[tuple] = set()
    docs: list[dict] = []
    for rspan in request.get("resourceSpans") or []:
        resource = rspan.get("resource") or {}
        res_attrs = _attrs(resource.get("attributes"))
        service_name = res_attrs.pop("service.name", None)
        if not isinstance(service_name, str):
            service_name = "unknown_service"
        res_dropped = _u64(resource.get("droppedAttributesCount"))
        for sspan in rspan.get("scopeSpans") or []:
            scope = sspan.get("scope") or {}
            scope_name = scope.get("name") or None
            scope_version = scope.get("version") or None
            scope_attrs = _attrs(scope.get("attributes"))
            scope_dropped = _u64(scope.get("droppedAttributesCount"))
            for span in sspan.get("spans") or []:
                trace_id = _hex_id(span.get("traceId"))
                span_id = _hex_id(span.get("spanId"))
                if trace_id is None or span_id is None:
                    continue  # reference errors the record; we skip it
                span_name = span.get("name") or "unknown"
                start = _u64(span.get("startTimeUnixNano"))
                key = (trace_id, span_name, start, span_id)
                if key in seen:
                    continue
                seen.add(key)
                end = _u64(span.get("endTimeUnixNano"))
                kind = _enum(span.get("kind"), _SPAN_KINDS)
                parent = _hex_id(span.get("parentSpanId"))
                events = [
                    {
                        "event_timestamp_nanos": _u64(ev.get("timeUnixNano")),
                        "event_name": ev.get("name") or "",
                        "event_attributes": _attrs(ev.get("attributes")),
                        "event_dropped_attributes_count": _u64(
                            ev.get("droppedAttributesCount")
                        ),
                    }
                    for ev in span.get("events") or []
                ]
                links = [
                    {
                        "link_trace_id": _hex_id(ln.get("traceId")),
                        "link_span_id": _hex_id(ln.get("spanId")),
                        "link_trace_state": ln.get("traceState") or None,
                        "link_attributes": _attrs(ln.get("attributes")),
                        "link_dropped_attributes_count": _u64(
                            ln.get("droppedAttributesCount")
                        ),
                    }
                    for ln in span.get("links") or []
                ]
                status = span.get("status") or {}
                code = _enum(status.get("code"), _STATUS_CODES)
                if code == 1:
                    span_status = {"code": "ok"}
                elif code == 2:
                    span_status = {"code": "error"}
                    if status.get("message"):
                        span_status["message"] = status["message"]
                else:
                    span_status = None  # Unset is skipped (is_unset)
                docs.append(
                    {
                        "trace_id": trace_id,
                        "trace_state": span.get("traceState") or None,
                        "service_name": service_name,
                        "resource_attributes": _jstr(res_attrs),
                        "resource_dropped_attributes_count": res_dropped,
                        "scope_name": scope_name,
                        "scope_version": scope_version,
                        "scope_attributes": _jstr(scope_attrs),
                        "scope_dropped_attributes_count": scope_dropped,
                        "span_id": span_id,
                        "span_kind": kind,
                        "span_name": span_name,
                        "span_fingerprint": f"{service_name}\x00{kind}\x00{span_name}",
                        "span_start_timestamp_nanos": start,
                        "span_end_timestamp_nanos": end,
                        "span_duration_millis": (end - start) // 1_000_000,
                        "span_attributes": _jstr(_attrs(span.get("attributes"))),
                        "span_dropped_attributes_count": _u64(
                            span.get("droppedAttributesCount")
                        ),
                        "span_dropped_events_count": _u64(
                            span.get("droppedEventsCount")
                        ),
                        "span_dropped_links_count": _u64(
                            span.get("droppedLinksCount")
                        ),
                        "span_status": _jstr(span_status),
                        "parent_span_id": parent,
                        "is_root": parent is None,
                        "events": _jstr(events),
                        "event_names": [ev["event_name"] for ev in events],
                        "links": _jstr(links),
                    }
                )
    return docs


# ---------------------------------------------------------------------------
# DataFrame API
# ---------------------------------------------------------------------------


def _docs_df(
    payloads: DataFrame,
    payload_col: str,
    fmt: str,
    schema: str,
    root_desc: str,
    flatten,
) -> DataFrame:
    if fmt not in ("json", "protobuf"):
        raise ValueError(f"otlp: unknown format {fmt!r}")
    dtype = dict(payloads.dtypes).get(payload_col)
    if dtype is None:
        raise ValueError(f"otlp: no column {payload_col!r}")
    src = payloads.select(payload_col)

    pa_types = {
        "long": "int64",
        "string": "string",
        "boolean": "bool",
        "array<string>": "list<string>",
    }
    col_specs = [
        (part.rsplit(" ", 1)[0], pa_types[part.rsplit(" ", 1)[1]])
        for part in schema.split(", ")
    ]

    def parse(batches):
        import pyarrow as pa

        pa_map = {
            "int64": pa.int64(),
            "string": pa.string(),
            "bool": pa.bool_(),
            "list<string>": pa.list_(pa.string()),
        }
        out_schema = pa.schema([(n, pa_map[t]) for n, t in col_specs])
        for batch in batches:
            col = batch.column(0)
            rows: list[dict] = []
            for payload in col.to_pylist():
                if payload is None:
                    continue
                if fmt == "json":
                    if isinstance(payload, (bytes, bytearray)):
                        payload = payload.decode("utf-8")
                    request = json.loads(payload)
                else:
                    if isinstance(payload, str):
                        payload = payload.encode("latin-1")
                    request = _decode_msg(root_desc, bytes(payload))
                rows.extend(flatten(request))
            if rows:
                yield pa.RecordBatch.from_pylist(rows, schema=out_schema)

    return src.mapInArrow(parse, schema)


def otlp_logs_docs(
    payloads: DataFrame,
    payload_col: str = "payload",
    fmt: str = "json",
    default_observed_nanos: int = 0,
) -> DataFrame:
    """OTLP ExportLogsServiceRequest payloads (one per row; string or
    binary) → one row per log record with the reference's
    otel-logs-v0_9 field set (logs.rs:47-127)."""
    flatten = lambda req: flatten_logs_request(req, default_observed_nanos)  # noqa: E731
    return _docs_df(
        payloads, payload_col, fmt, LOGS_DOC_SCHEMA,
        "ExportLogsServiceRequest", flatten,
    )


def otlp_traces_docs(
    payloads: DataFrame,
    payload_col: str = "payload",
    fmt: str = "json",
) -> DataFrame:
    """OTLP ExportTraceServiceRequest payloads → one row per span with
    the reference's otel-traces-v0_9 field set (traces.rs:53-170)."""
    return _docs_df(
        payloads, payload_col, fmt, TRACES_DOC_SCHEMA,
        "ExportTraceServiceRequest", flatten_traces_request,
    )
