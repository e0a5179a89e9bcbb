"""Jaeger query surface (quickwit-jaeger/src/lib.rs): FindTraceIds
dedup/order, GetServices window, GetOperations fingerprint decode +
service/kind prefix filtering."""

import pytest

from quickwit_spark.search.trace_queries import (
    find_trace_ids,
    get_operations,
    get_services,
)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        # service, kind, name, start_ns
        ("cart", 2, "GET /x", 100),
        ("cart", 2, "GET /x", 900),
        ("cart", 3, "call-pay", 500),
        ("pay", 2, "POST /p", 700),
        ("pay", 2, "POST /p", 300),
    ]
    return spark.createDataFrame(
        [
            (
                svc,
                f"{svc}\x00{kind}\x00{name}",
                f"t{svc}",
                ns,
            )
            for svc, kind, name, ns in rows
        ],
        "service_name string, span_fingerprint string, trace_id string, "
        "span_start_timestamp_nanos long",
    )


def test_find_trace_ids_dedup_and_order(spans):
    out = find_trace_ids(spans, 10).collect()
    assert [(r["trace_id"], r["span_timestamp"]) for r in out] == [
        ("tcart", 900),  # trace's LATEST span wins
        ("tpay", 700),
    ]
    with pytest.raises(ValueError):
        find_trace_ids(spans, 0)


def test_get_services_window(spans):
    assert [r["service"] for r in get_services(spans).collect()] == [
        "cart", "pay",
    ]
    recent = get_services(
        spans, lookback_secs=1, now_nanos=1_000_000_500
    ).collect()
    # window = [now - 1s, ...] in nanos → only spans with ns >= 500
    assert [r["service"] for r in recent] == ["cart", "pay"]
    none = get_services(spans, lookback_secs=0, now_nanos=10_000).collect()
    assert none == []
    with pytest.raises(ValueError):
        get_services(spans, lookback_secs=5)


def test_get_operations_decode_and_filters(spans):
    allops = get_operations(spans).collect()
    assert [(r["name"], r["span_kind"]) for r in allops] == [
        ("GET /x", "server"),
        ("POST /p", "server"),
        ("call-pay", "client"),
    ]
    cart = get_operations(spans, service="cart").collect()
    assert [(r["name"], r["span_kind"]) for r in cart] == [
        ("GET /x", "server"),
        ("call-pay", "client"),
    ]
    # kind accepts jaeger names, numbers, and OTLP enum names
    for kind in ("server", "2", "SPAN_KIND_SERVER"):
        got = get_operations(spans, service="cart", span_kind=kind).collect()
        assert [(r["name"], r["span_kind"]) for r in got] == [
            ("GET /x", "server")
        ]
    # a service that prefixes another must not match it
    assert get_operations(spans, service="car").collect() == []


@pytest.fixture(scope="module")
def otlp_span_docs(spark):
    """Realistic flattened span docs via the OTLP flattener itself."""
    from quickwit_spark.sources.otlp import (
        TRACES_DOC_SCHEMA,
        flatten_traces_request,
    )

    def span(tid, sid, name, start, dur_ms, attrs=None, status=None,
             events=None):
        s = {
            "traceId": tid, "spanId": sid, "name": name,
            "kind": 2,
            "startTimeUnixNano": str(start),
            "endTimeUnixNano": str(start + dur_ms * 1_000_000),
        }
        if attrs:
            s["attributes"] = [
                {"key": k, "value": {"stringValue": v}} for k, v in attrs.items()
            ]
        if status:
            s["status"] = status
        if events:
            s["events"] = events
        return s

    t1, t2, t3 = "a1" * 16, "b2" * 16, "c3" * 16
    base = 1_000_000_000_000
    req = {
        "resourceSpans": [
            {
                "resource": {"attributes": [
                    {"key": "service.name", "value": {"stringValue": "cart"}},
                    {"key": "region", "value": {"stringValue": "eu"}},
                ]},
                "scopeSpans": [{"spans": [
                    span(t1, "01" * 8, "checkout", base, 30,
                         attrs={"user": "u1"},
                         status={"code": 2, "message": "boom"}),
                    span(t1, "02" * 8, "db-call", base + 5_000_000, 5),
                    # same trace, way outside the max-duration window
                    span(t1, "03" * 8, "late-straggler",
                         base + 10_000 * 1_000_000_000, 1),
                    span(t2, "04" * 8, "checkout", base + 1_000_000, 20,
                         events=[{"timeUnixNano": str(base), "name": "retry",
                                  "attributes": [{"key": "cause",
                                                  "value": {"stringValue": "timeout"}}]}]),
                ]}],
            },
            {
                "resource": {"attributes": [
                    {"key": "service.name", "value": {"stringValue": "pay"}},
                ]},
                "scopeSpans": [{"spans": [
                    span(t3, "05" * 8, "charge", base + 2_000_000, 10,
                         attrs={"user": "u1"}),
                ]}],
            },
        ]
    }
    docs = flatten_traces_request(req)
    return spark.createDataFrame(docs, TRACES_DOC_SCHEMA)


def test_find_traces_two_phase(otlp_span_docs):
    from quickwit_spark.search.trace_queries import find_traces

    # tag matches span 01 (trace a1) only; phase 2 must pull the OTHER
    # spans of that trace inside the window and drop the straggler
    out = find_traces(
        otlp_span_docs, 10, service="cart", tags={"user": "u1"},
        max_trace_duration_secs=3600,
    ).collect()
    names = sorted(r["span_name"] for r in out)
    assert names == ["checkout", "db-call"]
    assert {r["trace_id"] for r in out} == {"a1" * 16}


def test_trace_query_tag_routing(otlp_span_docs):
    from quickwit_spark.search.trace_queries import trace_query_predicate

    df = otlp_span_docs

    def names(**q):
        return sorted(
            r["span_name"]
            for r in df.filter(trace_query_predicate(**q)).collect()
        )

    assert names(tags={"error": "true"}) == ["checkout"]
    assert names(service="cart", tags={"error": "false"}) == [
        "checkout", "db-call", "late-straggler",
    ]
    assert names(tags={"event": "retry"}) == ["checkout"]
    # resource attr OR span attr OR event attr (three-way should)
    assert names(tags={"region": "eu"}) == [
        "checkout", "checkout", "db-call", "late-straggler",
    ]
    assert names(tags={"user": "u1"}) == ["charge", "checkout"]
    assert names(tags={"cause": "timeout"}) == ["checkout"]
    assert names(span_name="charge") == ["charge"]
    assert names(span_kind="server", service="pay") == ["charge"]
    assert names(min_duration_millis=20, max_duration_millis=25) == ["checkout"]


def test_to_jaeger_spans_conversion(otlp_span_docs):
    """qw_span_to_jaeger_span parity (lib.rs:759-1089) on real
    flattened docs: typed tags, kind/status/dropped injection, events
    → logs with the name→event precedence, references ordering."""
    from quickwit_spark.search.trace_queries import to_jaeger_spans

    rows = otlp_span_docs.filter("span_name = 'checkout'").orderBy(
        "trace_id"
    ).collect()
    spans = to_jaeger_spans(rows)
    assert len(spans) == 2
    s = spans[0]  # trace a1: error status + user attr
    assert s["operation_name"] == "checkout"
    assert s["process"]["service_name"] == "cart"
    # service.name is stripped; region remains as a process tag
    assert s["process"]["tags"] == [
        {"key": "region", "v_type": "string", "v_str": "eu"}
    ]
    by_key = {t["key"]: t for t in s["tags"]}
    assert by_key["user"]["v_str"] == "u1"
    assert by_key["span.kind"]["v_str"] == "server"
    assert by_key["otel.status_code"]["v_str"] == "ERROR"
    assert by_key["otel.status_description"]["v_str"] == "boom"
    assert by_key["error"]["v_bool"] is True
    assert s["duration"] == {"seconds": 0, "nanos": 30_000_000}

    s2 = spans[1]  # trace b2: retry event, no status
    keys2 = {t["key"] for t in s2["tags"]}
    assert "otel.status_code" not in keys2 and "error" not in keys2
    (log,) = s2["logs"]
    fields = {f["key"]: f for f in log["fields"]}
    assert fields["cause"]["v_str"] == "timeout"
    assert fields["event"]["v_str"] == "retry"  # name → `event` field


def test_to_jaeger_spans_typed_and_nested_tags():
    from quickwit_spark.search.trace_queries import to_jaeger_spans

    rows = [
        {
            "trace_id": "t", "span_id": "s", "span_name": "op",
            "service_name": "svc", "span_kind": 1,  # INTERNAL: no tag
            "span_start_timestamp_nanos": 1_500_000_007,
            "span_end_timestamp_nanos": 2_500_000_007,
            "span_attributes": '{"n":7,"f":1.5,"b":true,"arr":[1,"x"],'
                               '"nested":{"a":{"b":"deep"}},"nul":null}',
            "parent_span_id": "p",
            "links": '[{"link_trace_id":"lt","link_span_id":"ls"}]',
            "span_dropped_events_count": 3,
        }
    ]
    (s,) = to_jaeger_spans(rows)
    by_key = {t["key"]: t for t in s["tags"]}
    assert by_key["n"] == {"key": "n", "v_type": "int64", "v_int64": 7}
    assert by_key["f"] == {"key": "f", "v_type": "float64", "v_float64": 1.5}
    assert by_key["b"] == {"key": "b", "v_type": "bool", "v_bool": True}
    assert by_key["arr"]["v_str"] == '[1,"x"]'
    assert by_key["nested.a.b"]["v_str"] == "deep"
    assert "nul" not in by_key
    assert "span.kind" not in by_key  # INTERNAL omitted per spec
    assert by_key["otel.dropped_events_count"]["v_int64"] == 3
    assert s["start_time"] == {"seconds": 1, "nanos": 500_000_007}
    assert s["duration"] == {"seconds": 1, "nanos": 0}
    # parent ChildOf reference comes BEFORE link references
    assert [r["ref_type"] for r in s["references"]] == [
        "child_of", "follows_from",
    ]


def test_get_trace(otlp_span_docs):
    from quickwit_spark.search.trace_queries import get_trace

    rows = get_trace(otlp_span_docs, "a1" * 16).collect()
    assert sorted(r["span_name"] for r in rows) == [
        "checkout", "db-call", "late-straggler",
    ]
    # lookback bounds the PAST only: with now at the straggler's
    # timestamp and a 100 s window, the two early spans fall out
    windowed = get_trace(
        otlp_span_docs, "a1" * 16, lookback_secs=100,
        now_nanos=1_000_000_000_000 + 10_000 * 1_000_000_000,
    ).collect()
    assert [r["span_name"] for r in windowed] == ["late-straggler"]
    assert get_trace(otlp_span_docs, "ff" * 16).collect() == []


def test_dotted_tag_keys_match_flat_attributes(spark):
    """OTel attribute keys are flat dotted strings; the tag predicate
    must probe $['http.method'], not a nested $.http.method path."""
    from quickwit_spark.search.trace_queries import trace_query_predicate

    df = spark.createDataFrame(
        [("t1", '{"http.method":"GET","service.version":"1.2"}', "{}", None),
         ("t2", '{"http.method":"POST"}', "{}", None)],
        "trace_id string, span_attributes string, resource_attributes string, "
        "events string",
    )
    got = df.filter(
        trace_query_predicate(tags={"http.method": "GET"})
    ).collect()
    assert [r["trace_id"] for r in got] == ["t1"]
    got2 = df.filter(
        trace_query_predicate(tags={"service.version": "1.2"})
    ).collect()
    assert [r["trace_id"] for r in got2] == ["t1"]
