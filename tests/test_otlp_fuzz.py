"""Property-based round-trip fuzz for the OTLP wire codec: for ANY
protojson-shaped request, encode→decode→flatten must equal flattening
the original dict (the protobuf and JSON input formats are the same
documents in the reference)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from quickwit_spark.sources.otlp import (
    _decode_msg,
    encode_logs_request,
    encode_traces_request,
    flatten_logs_request,
    flatten_traces_request,
)

_keys = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=8
)
_texts = st.text(max_size=12)

_any_value = st.recursive(
    st.one_of(
        st.fixed_dictionaries({"stringValue": _texts}),
        st.fixed_dictionaries({"boolValue": st.booleans()}),
        st.fixed_dictionaries(
            {"intValue": st.integers(min_value=-(2**63), max_value=2**63 - 1)}
        ),
        st.fixed_dictionaries(
            {
                "doubleValue": st.floats(
                    allow_nan=False, allow_infinity=False, width=32
                )
            }
        ),
    ),
    lambda children: st.one_of(
        st.fixed_dictionaries(
            {"arrayValue": st.fixed_dictionaries({"values": st.lists(children, max_size=3)})}
        ),
        st.fixed_dictionaries(
            {
                "kvlistValue": st.fixed_dictionaries(
                    {
                        "values": st.lists(
                            st.fixed_dictionaries(
                                {"key": _keys, "value": children}
                            ),
                            max_size=3,
                        )
                    }
                )
            }
        ),
    ),
    max_leaves=6,
)

_attrs = st.lists(
    st.fixed_dictionaries({"key": _keys, "value": _any_value}), max_size=4
)

_log_record = st.fixed_dictionaries(
    {},
    optional={
        "timeUnixNano": st.integers(min_value=0, max_value=2**62),
        "observedTimeUnixNano": st.integers(min_value=0, max_value=2**62),
        "severityNumber": st.integers(min_value=0, max_value=24),
        "severityText": _texts,
        "body": _any_value,
        "attributes": _attrs,
        "droppedAttributesCount": st.integers(min_value=0, max_value=99),
        "traceId": st.binary(min_size=16, max_size=16).map(bytes.hex),
        "spanId": st.binary(min_size=8, max_size=8).map(bytes.hex),
        "flags": st.integers(min_value=0, max_value=255),
    },
)

_logs_request = st.fixed_dictionaries(
    {
        "resourceLogs": st.lists(
            st.fixed_dictionaries(
                {},
                optional={
                    "resource": st.fixed_dictionaries(
                        {}, optional={"attributes": _attrs}
                    ),
                    "scopeLogs": st.lists(
                        st.fixed_dictionaries(
                            {},
                            optional={
                                "scope": st.fixed_dictionaries(
                                    {},
                                    optional={
                                        "name": _texts,
                                        "version": _texts,
                                        "attributes": _attrs,
                                    },
                                ),
                                "logRecords": st.lists(_log_record, max_size=3),
                            },
                        ),
                        max_size=2,
                    ),
                },
            ),
            max_size=2,
        )
    }
)

_span = st.fixed_dictionaries(
    {
        "traceId": st.binary(min_size=16, max_size=16).map(bytes.hex),
        "spanId": st.binary(min_size=8, max_size=8).map(bytes.hex),
    },
    optional={
        "name": _texts,
        "kind": st.integers(min_value=0, max_value=5),
        "startTimeUnixNano": st.integers(min_value=0, max_value=2**62),
        "endTimeUnixNano": st.integers(min_value=0, max_value=2**62),
        "attributes": _attrs,
        "traceState": _texts,
        "parentSpanId": st.binary(min_size=8, max_size=8).map(bytes.hex),
        "status": st.fixed_dictionaries(
            {}, optional={"code": st.integers(0, 2), "message": _texts}
        ),
        "events": st.lists(
            st.fixed_dictionaries(
                {},
                optional={
                    "timeUnixNano": st.integers(min_value=0, max_value=2**62),
                    "name": _texts,
                    "attributes": _attrs,
                },
            ),
            max_size=2,
        ),
        "links": st.lists(
            st.fixed_dictionaries(
                {
                    "traceId": st.binary(min_size=16, max_size=16).map(bytes.hex),
                    "spanId": st.binary(min_size=8, max_size=8).map(bytes.hex),
                },
                optional={"traceState": _texts, "attributes": _attrs},
            ),
            max_size=2,
        ),
    },
)

_traces_request = st.fixed_dictionaries(
    {
        "resourceSpans": st.lists(
            st.fixed_dictionaries(
                {},
                optional={
                    "resource": st.fixed_dictionaries(
                        {}, optional={"attributes": _attrs}
                    ),
                    "scopeSpans": st.lists(
                        st.fixed_dictionaries(
                            {}, optional={"spans": st.lists(_span, max_size=3)}
                        ),
                        max_size=2,
                    ),
                },
            ),
            max_size=2,
        )
    }
)


@settings(max_examples=150, deadline=None)
@given(_logs_request)
def test_logs_wire_round_trip(req):
    wire = encode_logs_request(req)
    decoded = _decode_msg("ExportLogsServiceRequest", wire)
    assert flatten_logs_request(decoded, 7) == flatten_logs_request(req, 7)


@settings(max_examples=150, deadline=None)
@given(_traces_request)
def test_traces_wire_round_trip(req):
    wire = encode_traces_request(req)
    decoded = _decode_msg("ExportTraceServiceRequest", wire)
    assert flatten_traces_request(decoded) == flatten_traces_request(req)
