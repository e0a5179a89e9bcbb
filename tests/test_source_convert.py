"""Cross-type value conversion for doc-mapping updates — mirrors the
reference's `tantivy_val_to_json.rs` value_to_* matrix and the
cardinality rules of `docs/reference/updating-mapper.md` ("Type update
reference" table + Example 3)."""

import pytest

from quickwit_spark.search.source_convert import (
    OMIT,
    convert_value,
    interpret,
)

TEXT = {"kind": "text"}
U64 = {"kind": "u64"}
I64 = {"kind": "long"}
F64 = {"kind": "double"}
BOOL = {"kind": "bool"}
IP = {"kind": "text", "caps": "ip"}
BYTES = {"kind": "text", "caps": "bytes"}
DT = {"kind": "datetime", "formats": ["rfc3339", "unix_timestamp"]}


def conv(value, old, new):
    return convert_value(value, old, new)


# ---------------------------------------------------------- to text


def test_numbers_to_text():
    assert conv(456, U64, TEXT) == "456"
    assert conv(-5, I64, TEXT) == "-5"
    assert conv(10.5, F64, TEXT) == "10.5"
    # Rust f64 Display: integral floats print without a trailing .0
    assert conv(456.0, F64, TEXT) == "456"


def test_bool_and_date_to_text():
    assert conv(True, BOOL, TEXT) == "true"
    assert conv(False, BOOL, TEXT) == "false"
    # date -> text renders rfc3339 (DateTimeOutputFormat::default())
    assert conv("2023-11-14T22:13:20Z", DT, TEXT) == "2023-11-14T22:13:20Z"
    assert conv(1700000000, DT, TEXT) == "2023-11-14T22:13:20Z"


def test_ip_to_text_is_ipv6_representation():
    # updating-mapper.md: "For IPv4, convert to IPv4-mapped IPv6
    # address (`::ffff:1.2.3.4`)" — the Rust Ipv6Addr Display form
    assert conv("1.2.3.4", IP, TEXT) == "::ffff:1.2.3.4"
    assert conv("2001:db8::1", IP, TEXT) == "2001:db8::1"


def test_bytes_to_text_omits():
    # value_to_string has no Bytes arm (`_ => None`)
    assert conv("AQID", BYTES, TEXT) is OMIT


# ---------------------------------------------------------- to bool


def test_to_bool():
    assert conv("true", TEXT, BOOL) is True
    assert conv("false", TEXT, BOOL) is False
    # Rust bool::FromStr is case-sensitive
    assert conv("True", TEXT, BOOL) is OMIT
    assert conv(0, U64, BOOL) is False
    assert conv(1, U64, BOOL) is True
    assert conv(2, U64, BOOL) is OMIT
    assert conv(1.0, F64, BOOL) is True
    assert conv(0.5, F64, BOOL) is OMIT


# ---------------------------------------------------------- numerics


def test_text_to_numbers():
    assert conv("123", TEXT, U64) == 123
    assert conv("123", TEXT, I64) == 123
    assert conv("-7", TEXT, I64) == -7
    assert conv("-7", TEXT, U64) is OMIT
    assert conv("10.5", TEXT, F64) == 10.5
    assert conv("message", TEXT, U64) is OMIT  # Example 3: omitted
    assert conv(" 12", TEXT, U64) is OMIT  # Rust FromStr: no whitespace


def test_numeric_ranges():
    # i64 -> u64 only when >= 0; u64 -> i64 only when <= i64::MAX
    assert conv(-1, I64, U64) is OMIT
    assert conv(2**63, U64, I64) is OMIT
    assert conv(2**63 - 1, U64, I64) == 2**63 - 1
    # text -> u64 within 0..2**64
    assert conv(str(2**64 - 1), TEXT, U64) == 2**64 - 1
    assert conv(str(2**64), TEXT, U64) is OMIT
    # f64 -> i64/u64 with truncation, range-checked
    assert conv(12.9, F64, I64) == 12
    assert conv(-0.5, F64, U64) is OMIT
    assert conv(1e300, F64, I64) is OMIT


def test_bool_to_numbers():
    assert conv(True, BOOL, F64) == 1.0
    assert conv(False, BOOL, I64) == 0
    assert conv(True, BOOL, U64) == 1


def test_numeric_output_format_string():
    assert conv(456, U64, {"kind": "u64", "output": "string"}) == "456"
    assert conv(1.5, F64, {"kind": "double", "output": "string"}) == "1.5"


# ---------------------------------------------------------- ip / bytes


def test_text_to_ip():
    # ip targets print IPv4-mapped as the dotted quad (tantivy
    # serialization, same as source_render._render_ip)
    assert conv("1.2.3.4", TEXT, IP) == "1.2.3.4"
    assert conv("::ffff:1.2.3.4", TEXT, IP) == "1.2.3.4"
    assert conv("2001:DB8::1", TEXT, IP) == "2001:db8::1"
    assert conv("not-an-ip", TEXT, IP) is OMIT
    assert conv(123, U64, IP) is OMIT


def test_bytes_roundtrip_and_refusals():
    b64 = {"kind": "text", "caps": "bytes", "input": "base64"}
    hx = {
        "kind": "text",
        "caps": "bytes",
        "input": "base64",
        "output": "hex",
    }
    assert conv("AQID", b64, hx) == "010203"
    # text (non-bytes old kind) -> bytes is NOT converted ("TODO we
    # could cast str to bytes" — the reference omits)
    assert conv("AQID", TEXT, b64) is OMIT


# ---------------------------------------------------------- datetime


def test_to_datetime_parses_with_current_formats():
    assert conv("2023-11-14T22:13:20Z", TEXT, DT) == "2023-11-14T22:13:20Z"
    assert conv(1700000000, U64, DT) == "2023-11-14T22:13:20Z"
    assert conv("nope", TEXT, DT) is OMIT
    out_unix = {
        "kind": "datetime",
        "formats": ["rfc3339"],
        "output": "unix_timestamp_secs",
    }
    assert conv("2023-11-14T22:13:20Z", TEXT, out_unix) == 1700000000


# ---------------------------------------------------------- cardinality


def test_array_to_array_skips_failures():
    multi_u64 = {"kind": "u64", "card": "multi"}
    arr_text = {"kind": "text", "card": "multi"}
    assert conv(["1", "x", "3"], arr_text, multi_u64) == [1, 3]


def test_scalar_to_array_wraps():
    multi_u64 = {"kind": "u64", "card": "multi"}
    assert conv("12", TEXT, multi_u64) == [12]
    assert conv("x", TEXT, multi_u64) == []  # empty array when failed


def test_array_to_scalar_keeps_first_convertible():
    arr_text = {"kind": "text", "card": "multi"}
    # Example 3: ["abc", "def"] under text target -> "abc"
    assert conv(["abc", "def"], arr_text, TEXT) == "abc"
    # first element unconvertible -> next one
    assert conv(["abc", "12"], arr_text, U64) == 12
    assert conv(["abc", "def"], arr_text, U64) is OMIT


def test_example_3_rows():
    """updating-mapper.md Example 3, both documents, all three fields."""
    arr_text = {"kind": "text", "card": "multi"}
    # doc 1
    assert conv("123", TEXT, U64) == 123
    assert conv(456, U64, TEXT) == "456"
    assert conv(["abc", "def"], arr_text, TEXT) == "abc"
    # doc 2
    assert conv("message", TEXT, U64) is OMIT
    assert conv(987, U64, TEXT) == "987"
    assert conv(["ghi"], arr_text, TEXT) == "ghi"


def test_null_and_nested_omit():
    assert conv(None, TEXT, U64) is OMIT
    assert conv({"a": 1}, TEXT, TEXT) is OMIT


def test_interpret_coerced_numeric_strings():
    # a u64 field that stored a coerced "123" string interprets as U64,
    # so u64 -> text yields "123" (numeric-typed), not the raw echo
    assert interpret("123", {"kind": "u64"}) == ("u64", 123)
    assert interpret("1.5", {"kind": "double"}) == ("f64", 1.5)
    assert interpret("x", {"kind": "u64"}) == ("str", "x")


# ------------------------------------------------- document application


def test_convert_source_doc_example_3():
    from quickwit_spark.search.source_convert import (
        build_converters,
        convert_source_doc,
    )

    old = {
        "field1": {"mapspec": {"kind": "text", "normalizer": "raw"}},
        "field2": {"mapspec": {"kind": "u64", "output": "number"}},
        "field3": {
            "mapspec": {"kind": "text", "normalizer": "raw", "card": "multi"}
        },
    }
    new = {
        "field1": {"mapspec": {"kind": "u64", "output": "number"}},
        "field2": {"mapspec": {"kind": "text", "normalizer": "raw"}},
        "field3": {"mapspec": {"kind": "text", "normalizer": "raw"}},
    }
    conv = build_converters(new, old)
    d1 = {"field1": "123", "field2": 456, "field3": ["abc", "def"]}
    d2 = {"field1": "message", "field2": 987, "field3": ["ghi"]}
    assert convert_source_doc(d1, conv) == {
        "field1": 123,
        "field2": "456",
        "field3": "abc",
    }
    assert convert_source_doc(d2, conv) == {"field2": "987", "field3": "ghi"}


def test_convert_source_doc_unchanged_paths_untouched():
    from quickwit_spark.search.source_convert import (
        build_converters,
        convert_source_doc,
    )

    same = {"a": {"mapspec": {"kind": "u64", "output": "number"}}}
    assert build_converters(same, same) == {}
    # dynamic (unmapped) values stay verbatim
    conv = build_converters(
        {"a": {"mapspec": {"kind": "u64", "output": "number"}}}, {}
    )
    d = {"a": "7", "free": "keep"}
    assert convert_source_doc(d, conv) == {"a": 7, "free": "keep"}


def test_drop_missing_non_dynamic():
    from quickwit_spark.search.source_convert import (
        build_converters,
        convert_source_doc,
    )

    old = {"gone": {"mapspec": {"kind": "text"}}}
    conv = build_converters({}, old, drop_missing=True)
    assert convert_source_doc({"gone": "x", "other": 1}, conv) == {"other": 1}


def test_nested_path_and_array_of_objects():
    from quickwit_spark.search.source_convert import (
        build_converters,
        convert_source_doc,
    )

    old = {"a.b": {"mapspec": {"kind": "text"}}}
    new = {"a.b": {"mapspec": {"kind": "u64", "output": "number"}}}
    conv = build_converters(new, old)
    d = {"a": [{"b": "1"}, {"b": "x"}, {"c": 0}]}
    assert convert_source_doc(d, conv) == {"a": [{"b": 1}, {}, {"c": 0}]}


def test_reference_unit_cases_verbatim():
    """The reference's own `tantivy_val_to_json.rs` test block
    (lines 283-428), ported case for case: bytes base64/hex, f64 from
    F64/U64/Str with number+string output, i64/u64 number+string."""
    b64 = {"kind": "text", "caps": "bytes", "input": "base64"}
    hx = {"kind": "text", "caps": "bytes", "input": "base64", "output": "hex"}
    # Bytes([1,2,3]) -> "AQID" / "010203"
    assert conv("AQID", b64, b64) == "AQID"
    assert conv("AQID", b64, hx) == "010203"
    # F64 targets
    f64n = {"kind": "double", "output": "number"}
    f64s = {"kind": "double", "output": "string"}
    assert conv(0.1, F64, f64n) == 0.1
    assert conv(1, U64, f64n) == 1.0
    assert conv("0.1", TEXT, f64n) == 0.1
    assert conv(0.1, F64, f64s) == "0.1"
    # I64 targets
    i64n = {"kind": "long", "output": "number"}
    i64s = {"kind": "long", "output": "string"}
    assert conv(-1, I64, i64n) == -1
    assert conv(1, I64, i64n) == 1
    assert conv(-1, I64, i64s) == "-1"
    # U64 targets
    u64n = {"kind": "u64", "output": "number"}
    u64s = {"kind": "u64", "output": "string"}
    assert conv(1, U64, u64n) == 1
    assert conv(1, I64, u64n) == 1
    assert conv(1, U64, u64s) == "1"


# ------------------------------------------------- robustness fuzz


from hypothesis import given, settings
from hypothesis import strategies as st

_SPECS = [
    TEXT, U64, I64, F64, BOOL, IP, BYTES, DT,
    {"kind": "u64", "output": "string"},
    {"kind": "text", "card": "multi"},
    {"kind": "u64", "card": "multi"},
    {"kind": "datetime", "formats": ["unix_timestamp"]},
    None,  # dynamic old path
]

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**80), max_value=2**80),
    st.floats(allow_nan=True, allow_infinity=True),
    st.text(max_size=30),
)
_value = st.one_of(_scalar, st.lists(_scalar, max_size=4))


@given(
    _value,
    st.sampled_from(_SPECS),
    st.sampled_from([s for s in _SPECS if s is not None]),
)
@settings(max_examples=400, deadline=None)
def test_convert_value_never_raises(v, old, new):
    """Any JSON-shaped stored value through any (old, new) spec pair
    either converts to a JSON-serializable value or omits — never
    raises (the reference logs-and-omits, `tantivy_val_to_json.rs:
    270-279`)."""
    import json as _json

    out = convert_value(v, old, new)
    if out is not OMIT:
        _json.dumps(out, allow_nan=True)


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=100, deadline=None)
def test_u64_text_roundtrip(n):
    """u64 -> text -> u64 is the identity over the whole u64 range."""
    as_text = conv(n, U64, TEXT)
    assert conv(as_text, TEXT, U64) == n


def test_f64_rust_fromstr_grammar():
    """Rust f64::FromStr rejects `_` separators, Unicode digits, and
    embedded whitespace — Python float() accepts all three, which would
    fabricate numbers the reference omits."""
    f64n = {"kind": "double", "output": "number"}
    assert conv("1_0", TEXT, f64n) is OMIT      # float("1_0") == 10.0(!)
    assert conv("١٢٣", TEXT, f64n) is OMIT      # unicode digits
    assert conv(" 1 ", TEXT, f64n) is OMIT      # whitespace
    # the Rust grammar's own specials still parse
    assert conv("2.5e3", TEXT, f64n) == 2500.0
    assert conv("-0.5", TEXT, f64n) == -0.5
    # interpret's double-kind stored-string reparse: a non-Rust-numeric
    # string stays a string (renders verbatim under a text target)
    assert interpret("1_0", F64) == ("str", "1_0")
    assert interpret("2.5", F64) == ("f64", 2.5)
