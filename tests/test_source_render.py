"""`_source` output formatting — the reference rebuilds fetched docs
from the typed doc store and serializes each mapped leaf through its
`output_format` (`tantivy_val_to_json.rs`, `date_time_format.rs`).
Unit tests here; the facade wire path is covered in test_api.py."""

import pytest

from quickwit_spark.search.source_render import (
    build_source_renderers,
    format_datetime_out,
    parse_datetime,
    render_source_doc,
    validate_binary_format,
    validate_datetime_output_format,
    validate_numeric_output_format,
)


def _render_one(kind, value, **spec):
    r = build_source_renderers({"f": {"render": {"kind": kind, **spec}}})
    return render_source_doc({"f": value}, r)["f"]


def test_datetime_default_rfc3339():
    # unix input (any magnitude) renders as rfc3339, like the reference
    assert _render_one("datetime", 1700000000) == "2023-11-14T22:13:20Z"
    assert _render_one("datetime", 1700000000000) == "2023-11-14T22:13:20Z"
    assert _render_one("datetime", 1700000000.5) == "2023-11-14T22:13:20.5Z"
    # rfc3339 input round-trips byte-identically (whole seconds)
    assert (
        _render_one("datetime", "2015-02-01T00:00:00Z")
        == "2015-02-01T00:00:00Z"
    )
    # offset input normalizes to UTC like the reference's into_utc()
    assert (
        _render_one("datetime", "2015-02-01T02:30:00+02:30")
        == "2015-02-01T00:00:00Z"
    )
    # fractional part printed only when non-zero, trailing zeros trimmed
    assert (
        _render_one("datetime", "2015-02-01T00:00:00.120Z")
        == "2015-02-01T00:00:00.12Z"
    )
    # tantivy keeps NANOSECONDS — sub-microsecond input round-trips
    # (the reference's multi_splits/0001 scenario asserts exactly this)
    assert (
        _render_one("datetime", "2015-01-10T14:00:00.000000001Z")
        == "2015-01-10T14:00:00.000000001Z"
    )
    assert _render_one(
        "datetime", "2015-01-10T14:00:00.000000001Z",
        output="unix_timestamp_nanos",
    ) == 1420898400000000001


def test_datetime_output_formats():
    v = 1700000000
    assert _render_one("datetime", v, output="unix_timestamp_secs") == v
    assert (
        _render_one("datetime", v, output="unix_timestamp_millis")
        == v * 1000
    )
    assert (
        _render_one("datetime", v, output="unix_timestamp_micros")
        == v * 1_000_000
    )
    assert (
        _render_one("datetime", v, output="unix_timestamp_nanos")
        == v * 1_000_000_000
    )
    assert (
        _render_one("datetime", v, output="rfc2822")
        == "Tue, 14 Nov 2023 22:13:20 +0000"
    )
    assert _render_one("datetime", v, output="%Y/%m/%d") == "2023/11/14"


def test_datetime_input_format_order():
    # declared input formats tried in order, like ingest
    assert (
        _render_one(
            "datetime", "20/11/2023", formats=("rfc3339",), output="rfc3339"
        )
        == "20/11/2023"  # unparseable under the declared formats: verbatim
    )
    dt = parse_datetime("Tue, 14 Nov 2023 22:13:20 +0000", ("rfc2822",))
    assert format_datetime_out(dt, "unix_timestamp_secs") == 1700000000


def test_numeric_rendering():
    assert _render_one("u64", "5") == 5           # coerced input → number
    assert _render_one("u64", 5) == 5
    assert _render_one("u64", 18446744073709551615) == 18446744073709551615
    assert _render_one("u64", 5, output="string") == "5"
    assert _render_one("i64", "-7", output="string") == "-7"
    assert _render_one("f64", "2.5") == 2.5
    assert _render_one("f64", 2, output="string") == "2.0"  # serde f64 Display
    assert _render_one("u64", "not-a-number") == "not-a-number"


def test_bool_ip_bytes_rendering():
    assert _render_one("bool", "true") is True
    assert _render_one("bool", 0) is False
    assert _render_one("bool", 2) == 2  # not coercible: verbatim
    assert _render_one("ip", "::ffff:192.168.0.1") == "192.168.0.1"
    assert _render_one("ip", "192.168.0.1") == "192.168.0.1"
    assert (
        _render_one("ip", "2001:0DB8:0:0:0:0:0:1") == "2001:db8::1"
    )
    assert _render_one("bytes", "aGVsbG8=") == "aGVsbG8="
    assert _render_one("bytes", "aGVsbG8=", output="hex") == "68656c6c6f"
    assert (
        _render_one("bytes", "68656c6c6f", input="hex", output="base64")
        == "aGVsbG8="
    )
    assert _render_one("bytes", "!!!not-base64") == "!!!not-base64"


def test_paths_arrays_and_nesting():
    renderers = build_source_renderers(
        {
            "a.ts": {"render": {"kind": "datetime"}},
            "n": {"render": {"kind": "u64"}},
            "absent": {"render": {"kind": "u64"}},
        }
    )
    doc = {
        "a": {"ts": [1700000000, 1700000001]},
        "n": "9",
        "other": "untouched",
    }
    out = render_source_doc(doc, renderers)
    assert out["a"]["ts"] == ["2023-11-14T22:13:20Z", "2023-11-14T22:13:21Z"]
    assert out["n"] == 9 and out["other"] == "untouched"
    # arrays of OBJECTS render element-wise too
    doc2 = {"a": [{"ts": 1700000000}, {"ts": None}, {}]}
    out2 = render_source_doc(doc2, build_source_renderers(
        {"a.ts": {"render": {"kind": "datetime"}}}))
    assert out2["a"][0]["ts"] == "2023-11-14T22:13:20Z"
    assert out2["a"][1]["ts"] is None and out2["a"][2] == {}


def test_validators():
    assert validate_datetime_output_format("rfc3339") == "rfc3339"
    assert validate_datetime_output_format("%Y-%m-%d") == "%Y-%m-%d"
    with pytest.raises(ValueError):
        validate_datetime_output_format("bogus")
    assert validate_numeric_output_format("string") == "string"
    with pytest.raises(ValueError):
        validate_numeric_output_format("hex")
    assert validate_binary_format("hex") == "hex"
    with pytest.raises(ValueError):
        validate_binary_format("utf8")


def test_unix_millis_micros_integer_exactness():
    """unix_timestamp_{millis,micros} integers must not round-trip
    through float: 1700000000123 ms × 1e6 exceeds f64's 2^53 exact
    range and float math picks up ~100 ns of noise in the rendered
    rfc3339 fraction."""
    ns = parse_datetime(1700000000123, ("unix_timestamp_millis",))
    assert ns == 1700000000123_000_000
    assert format_datetime_out(ns, "rfc3339") == "2023-11-14T22:13:20.123Z"
    ns = parse_datetime("1700000000123", ("unix_timestamp_millis",))
    assert ns == 1700000000123_000_000
    ns = parse_datetime(1700000000123456, ("unix_timestamp_micros",))
    assert ns == 1700000000123456_000
    assert (
        format_datetime_out(ns, "rfc3339") == "2023-11-14T22:13:20.123456Z"
    )
    # fractional float input still supported; bools are not timestamps
    assert parse_datetime(1.5, ("unix_timestamp_millis",)) == 1_500_000
    assert parse_datetime(True, ("unix_timestamp_millis",)) is None


def test_rust_numeric_grammar_on_string_timestamps():
    """Python int()/float() accept `_` separators and Unicode digits;
    Rust's FromStr (the reference parser) rejects both."""
    for bad in ("1_0", "١٢٣", "1_000_000"):
        assert parse_datetime(bad, ("unix_timestamp",)) is None
        assert parse_datetime(bad, ("unix_timestamp_millis",)) is None
