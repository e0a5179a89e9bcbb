"""OTLP logs/traces input formats (reference
qw/quickwit-opentelemetry/src/otlp/{logs,traces}.rs): flattening
semantics, JSON/protobuf parity, and the Spark source plumbing."""

import json

import pytest

from quickwit_spark.sources.otlp import (
    encode_logs_request,
    encode_traces_request,
    flatten_logs_request,
    flatten_traces_request,
    otlp_logs_docs,
    otlp_traces_docs,
)


def _sv(s):
    return {"stringValue": s}


def _logs_request():
    return {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": _sv("checkout")},
                        {"key": "host", "value": _sv("h1")},
                        {"key": "", "value": _sv("dropped-empty-key")},
                    ],
                    "droppedAttributesCount": 2,
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "lib", "version": "1.2"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1700000000000000001",
                                "observedTimeUnixNano": "1700000000000000099",
                                "severityNumber": "SEVERITY_NUMBER_WARN2",
                                "severityText": "WARN",
                                "body": _sv("disk low"),
                                "attributes": [
                                    {"key": "n", "value": {"intValue": "7"}},
                                    {
                                        "key": "nested",
                                        "value": {
                                            "kvlistValue": {
                                                "values": [
                                                    {
                                                        "key": "a",
                                                        "value": {"boolValue": True},
                                                    }
                                                ]
                                            }
                                        },
                                    },
                                    {
                                        "key": "blob",
                                        "value": {"bytesValue": "00ff"},
                                    },
                                ],
                                "traceId": "0102030405060708090a0b0c0d0e0f10",
                                "spanId": "0102030405060708",
                                "flags": 1,
                            },
                            # zero timestamps + zero ids + empty severity
                            {
                                "body": {
                                    "kvlistValue": {
                                        "values": [
                                            {"key": "k", "value": {"doubleValue": 1.5}}
                                        ]
                                    }
                                },
                                "traceId": "0" * 32,
                                "severityText": "",
                            },
                            # dup of record 1 on (service, ts): dropped
                            {
                                "timeUnixNano": "1700000000000000001",
                                "body": _sv("DUPLICATE"),
                            },
                        ],
                    }
                ],
            },
            # resource without service.name
            {
                "scopeLogs": [
                    {
                        "logRecords": [
                            {"timeUnixNano": "5", "body": _sv("orphan")}
                        ]
                    }
                ]
            },
        ]
    }


def test_flatten_logs_reference_semantics():
    docs = flatten_logs_request(_logs_request(), default_observed_nanos=42)
    assert len(docs) == 3  # duplicate dropped
    d = docs[0]
    assert d["service_name"] == "checkout"
    # service.name removed from resource attrs, empty key skipped
    assert json.loads(d["resource_attributes"]) == {"host": "h1"}
    assert d["resource_dropped_attributes_count"] == 2
    assert d["timestamp_nanos"] == 1700000000000000001
    assert d["observed_timestamp_nanos"] == 1700000000000000099
    assert d["severity_number"] == 14  # WARN2 = 13 + 1
    # string body wraps as {"message": ...}; bytes attr value dropped
    assert json.loads(d["body"]) == {"message": "disk low"}
    assert json.loads(d["attributes"]) == {"n": 7, "nested": {"a": True}}
    assert d["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert d["span_id"] == "0102030405060708"
    assert (d["scope_name"], d["scope_version"]) == ("lib", "1.2")

    z = docs[1]
    # observed 0 → default; ts 0 → observed; zero trace id → NULL
    assert z["observed_timestamp_nanos"] == 42
    assert z["timestamp_nanos"] == 42
    assert z["trace_id"] is None and z["span_id"] is None
    assert z["severity_text"] is None and z["severity_number"] == 0
    assert json.loads(z["body"]) == {"k": 1.5}  # non-string body unwrapped

    assert docs[2]["service_name"] == "unknown_service"
    assert json.loads(docs[2]["body"]) == {"message": "orphan"}


def _traces_request():
    return {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": _sv("cart")}
                    ]
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "lib"},
                        "spans": [
                            {
                                "traceId": "ab" * 16,
                                "spanId": "cd" * 8,
                                "name": "GET /x",
                                "kind": "SPAN_KIND_SERVER",
                                "startTimeUnixNano": "1000000000",
                                "endTimeUnixNano": "1003500000",
                                "attributes": [
                                    {"key": "code", "value": {"intValue": 200}}
                                ],
                                "events": [
                                    {
                                        "timeUnixNano": "1001000000",
                                        "name": "resolved",
                                        "attributes": [
                                            {"key": "ip", "value": _sv("10.0.0.1")}
                                        ],
                                    }
                                ],
                                "links": [
                                    {
                                        "traceId": "ef" * 16,
                                        "spanId": "01" * 8,
                                    }
                                ],
                                "status": {
                                    "code": "STATUS_CODE_ERROR",
                                    "message": "boom",
                                },
                            },
                            # nameless root span, unset status
                            {
                                "traceId": "ab" * 16,
                                "spanId": "ee" * 8,
                                "startTimeUnixNano": "1",
                                "endTimeUnixNano": "2",
                            },
                            # dup on (trace, name, start, span): dropped
                            {
                                "traceId": "ab" * 16,
                                "spanId": "cd" * 8,
                                "name": "GET /x",
                                "startTimeUnixNano": "1000000000",
                                "endTimeUnixNano": "9999999999",
                            },
                            # zero span id: skipped
                            {
                                "traceId": "ab" * 16,
                                "spanId": "0" * 16,
                                "startTimeUnixNano": "1",
                            },
                        ],
                    }
                ],
            }
        ]
    }


def test_flatten_traces_reference_semantics():
    docs = flatten_traces_request(_traces_request())
    assert len(docs) == 2
    s = docs[0]
    assert s["service_name"] == "cart"
    assert s["span_kind"] == 2
    assert s["span_fingerprint"] == "cart\x002\x00GET /x"
    assert s["span_duration_millis"] == 3  # 3.5 ms truncated
    assert s["parent_span_id"] is None and s["is_root"] is True
    assert json.loads(s["span_status"]) == {"code": "error", "message": "boom"}
    assert s["event_names"] == ["resolved"]
    ev = json.loads(s["events"])[0]
    assert ev["event_name"] == "resolved"
    assert ev["event_attributes"] == {"ip": "10.0.0.1"}
    ln = json.loads(s["links"])[0]
    assert ln["link_trace_id"] == "ef" * 16

    r = docs[1]
    assert r["span_name"] == "unknown"
    assert r["span_status"] is None  # Unset is omitted


def test_protobuf_wire_round_trip_matches_json_path():
    """encode → wire decode → flatten must equal flattening the
    original protojson dict, for both signals (the protobuf and JSON
    input formats are the same documents in the reference)."""
    req = _logs_request()
    wire = encode_logs_request(req)
    from quickwit_spark.sources.otlp import _decode_msg

    decoded = _decode_msg("ExportLogsServiceRequest", wire)
    assert flatten_logs_request(decoded, 42) == flatten_logs_request(req, 42)

    treq = _traces_request()
    twire = encode_traces_request(treq)
    tdec = _decode_msg("ExportTraceServiceRequest", twire)
    assert flatten_traces_request(tdec) == flatten_traces_request(treq)


def test_spark_logs_source_json_and_protobuf(spark):
    payload = json.dumps(_logs_request())
    df = spark.createDataFrame([(payload,)] * 6, ["payload"]).repartition(3)
    docs = otlp_logs_docs(df, fmt="json", default_observed_nanos=42)
    assert docs.count() == 18
    got = docs.filter("service_name = 'checkout'").select(
        "timestamp_nanos", "severity_number"
    ).distinct().collect()
    assert {(r[0], r[1]) for r in got} == {(1700000000000000001, 14), (42, 0)}

    wire = encode_logs_request(_logs_request())
    bdf = spark.createDataFrame([(bytearray(wire),)], "payload binary")
    pdocs = otlp_logs_docs(bdf, fmt="protobuf", default_observed_nanos=42)
    a = sorted(map(tuple, docs.distinct().collect()))
    b = sorted(map(tuple, pdocs.collect()))
    assert a == b


def test_spark_traces_source_schema(spark):
    payload = json.dumps(_traces_request())
    df = spark.createDataFrame([(payload,)], ["payload"])
    docs = otlp_traces_docs(df)
    rows = docs.collect()
    assert len(rows) == 2
    assert docs.schema["event_names"].dataType.simpleString() == "array<string>"
    assert rows[0]["span_fingerprint"].count("\x00") == 2


def test_unknown_format_rejected(spark):
    df = spark.createDataFrame([("x",)], ["payload"])
    with pytest.raises(ValueError):
        otlp_logs_docs(df, fmt="yaml")


def test_negative_int_attributes_protobuf_parity():
    """int64 negatives are 10-byte two's-complement varints on the
    wire; decode must sign-extend and encode must not hang."""
    req = {
        "resourceLogs": [
            {
                "scopeLogs": [
                    {
                        "logRecords": [
                            {
                                "timeUnixNano": "5",
                                "attributes": [
                                    {"key": "delta", "value": {"intValue": -7}},
                                    {"key": "big", "value": {"intValue": 3}},
                                ],
                            }
                        ]
                    }
                ]
            }
        ]
    }
    from quickwit_spark.sources.otlp import _decode_msg

    wire = encode_logs_request(req)
    docs_wire = flatten_logs_request(
        _decode_msg("ExportLogsServiceRequest", wire), 42
    )
    docs_json = flatten_logs_request(req, 42)
    assert docs_wire == docs_json
    assert json.loads(docs_wire[0]["attributes"]) == {"delta": -7, "big": 3}
