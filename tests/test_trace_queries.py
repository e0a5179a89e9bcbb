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
