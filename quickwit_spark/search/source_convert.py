"""Best-effort cross-type value conversion for doc-mapping updates.

The reference lets an index's doc mapping be REPLACED (not just
extended): older splits keep their data, and fetched documents are
rebuilt by converting each stored typed value to the CURRENT mapping's
type on a best-effort basis — unconvertible values are omitted from the
returned document (`docs/reference/updating-mapper.md` "Type update
reference"; the conversion matrix itself is
`quickwit-doc-mapper/src/doc_mapper/tantivy_val_to_json.rs:57-279`
`value_to_{string,bool,ip,float,u64,i64}` plus the cardinality rules in
the doc table: `array<T> -> array<U>` converts element-wise skipping
failures, `T -> array<U>` wraps (empty array when unconvertible),
`array<T> -> U` keeps the first convertible element).

This module reproduces that matrix driver-side over the parsed stored
`_source` values of the <= k winning docs (never in an executor).  A
stored JSON value is first interpreted as the OLD mapping's tantivy
type (`("str"|"u64"|"i64"|"f64"|"bool"|"date"|"ip"|"bytes", payload)`),
then converted to the NEW mapping's leaf type, then formatted through
the new field's output options — the same
reparse -> convert -> output_format pipeline as the reference's
`formatted_tantivy_value_to_json`.

Only used when a path's old and new mapped specs differ (i.e. after a
non-additive mapping update); unchanged paths keep the plain
`source_render` output-format pass, whose single-mapping leniency
(verbatim on parse failure) is preserved.
"""

from __future__ import annotations

import base64
import binascii
import ipaddress
import math
import re
from decimal import Decimal

from quickwit_spark.search.source_render import (
    _rustlike_numeric,
    format_datetime_out,
    parse_datetime,
)

# sentinel: conversion failed -> omit the key (rate-limited warn + None
# in the reference, `tantivy_val_to_json.rs:270-279`)
OMIT = object()

_U64_MAX = 2**64 - 1
_I64_MAX = 2**63 - 1
_I64_MIN = -(2**63)

# Rust's u64/i64 FromStr: optional sign, decimal digits, no whitespace
_U64_RE = re.compile(r"\+?[0-9]+\Z")
_I64_RE = re.compile(r"[+-]?[0-9]+\Z")


def _f64_display(v: float) -> str:
    """Rust `f64::Display` (`number.to_string()` in `value_to_string`):
    shortest round-trip digits, never exponent notation, integral
    values without a trailing `.0`."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    s = format(Decimal(repr(v)), "f")
    if s.endswith(".0"):
        s = s[:-2]
    return s


def _parse_ip(value):
    """`IpAddr` parse: IPv6 form, else IPv4 mapped to IPv6
    (`value_to_ip`, `tantivy_val_to_json.rs:101-118`)."""
    if not isinstance(value, str):
        return None
    try:
        ip = ipaddress.ip_address(value.strip())
    except ValueError:
        return None
    if isinstance(ip, ipaddress.IPv4Address):
        return ipaddress.IPv6Address("::ffff:" + str(ip))
    return ip


def _ipv6_display(ip: ipaddress.IPv6Address) -> str:
    """Rust `Ipv6Addr::Display`: an IPv4-mapped address prints the
    dotted-quad tail (`::ffff:1.2.3.4`) — Python's `str()` prints
    `::ffff:102:304` instead, so format manually."""
    v4 = ip.ipv4_mapped
    if v4 is not None:
        return f"::ffff:{v4}"
    return str(ip)


def _decode_bytes(value, input_format: str):
    if not isinstance(value, str):
        return None
    try:
        if input_format == "hex":
            return bytes.fromhex(value.strip())
        return base64.b64decode(value.strip(), validate=True)
    except (ValueError, binascii.Error):
        return None


# ------------------------------------------------- typed interpretation


def interpret(value, old_spec: dict | None):
    """Stored JSON value -> the old mapping's tantivy value (tagged
    tuple), or None when uninterpretable.  JSON-type-directed except
    where the old kind carries a richer representation (datetime / ip /
    bytes — the types tantivy stores in non-JSON form)."""
    spec = old_spec or {}
    kind = spec.get("kind")
    caps = spec.get("caps")
    if value is None:
        return None
    if kind == "datetime":
        nanos = parse_datetime(value, tuple(spec.get("formats") or ()))
        return None if nanos is None else ("date", nanos)
    if caps == "ip":
        ip = _parse_ip(value)
        return None if ip is None else ("ip", ip)
    if caps == "bytes":
        raw = _decode_bytes(value, spec.get("input", "base64"))
        return None if raw is None else ("bytes", raw)
    if isinstance(value, bool):
        return ("bool", value)
    if isinstance(value, int):
        if kind in ("double", "f64"):
            return ("f64", float(value))
        # tantivy parses non-negative JSON ints as u64 first; ints
        # outside the u64/i64 ranges only reach serde as f64 (JSON
        # numbers cap at u64::MAX / i64::MIN), so tag them the same way
        if 0 <= value <= _U64_MAX:
            return ("u64", value)
        if _I64_MIN <= value < 0:
            return ("i64", value)
        return ("f64", float(value))
    if isinstance(value, float):
        return ("f64", value)
    if isinstance(value, str):
        # numeric kinds may have stored coerced strings — reparse them
        # so e.g. u64->text stringification stays numeric-typed
        if kind in ("u64", "long"):
            if _I64_RE.match(value):
                n = int(value, 10)
                return ("u64", n) if n >= 0 else ("i64", n)
            return ("str", value)
        if kind in ("double", "f64"):
            if not _rustlike_numeric(value):
                return ("str", value)  # Rust f64::FromStr would fail
            try:
                return ("f64", float(value))
            except ValueError:
                return ("str", value)
        return ("str", value)
    return None  # nested object/array under a leaf path


# ------------------------------------------------------- conversions


def _to_string(tag, v):
    """`value_to_string` (`tantivy_val_to_json.rs:57-74`)."""
    if tag == "str":
        return v
    if tag in ("u64", "i64"):
        return str(v)
    if tag == "f64":
        return _f64_display(v)
    if tag == "bool":
        return "true" if v else "false"
    if tag == "date":
        # DateTimeOutputFormat::default() == Rfc3339
        return format_datetime_out(v, "rfc3339")
    if tag == "ip":
        return _ipv6_display(v)
    return OMIT  # bytes -> text is not converted (`_ => None`)


def _to_bool(tag, v):
    """`value_to_bool` — strings must be exactly "true"/"false"
    (Rust `bool::FromStr` is case-sensitive), numbers only 0/1."""
    if tag == "bool":
        return v
    if tag == "str":
        if v == "true":
            return True
        if v == "false":
            return False
        return OMIT
    if tag in ("u64", "i64"):
        return {0: False, 1: True}.get(v, OMIT)
    if tag == "f64":
        if v == 0.0:
            return False
        if v == 1.0:
            return True
        return OMIT
    return OMIT


def _to_ip(tag, v):
    """`value_to_ip`: tantivy's IpAddr serialization prints IPv4-mapped
    addresses as the dotted quad (matches `source_render._render_ip`)."""
    if tag == "ip":
        ip = v
    elif tag == "str":
        ip = _parse_ip(v)
        if ip is None:
            return OMIT
    else:
        return OMIT
    v4 = ip.ipv4_mapped
    return str(v4) if v4 is not None else str(ip)


def _num_out(n, output: str):
    """`NumToJson`: JSON number, or its decimal string under
    `output_format: "string"`."""
    if output == "string":
        return _f64_display(n) if isinstance(n, float) else str(n)
    if isinstance(n, float) and (math.isnan(n) or math.isinf(n)):
        return OMIT  # serde Number::from_f64 -> None
    return n


def _to_f64(tag, v, output):
    if tag == "str":
        s = v.strip()
        if s != v or not _rustlike_numeric(s):
            # Rust f64::FromStr takes no whitespace, no `_` separators,
            # no non-ASCII digits (float() accepts all three)
            return OMIT
        try:
            f = float(v)
        except ValueError:
            return OMIT
        return _num_out(f, output)
    if tag in ("u64", "i64"):
        return _num_out(float(v), output)
    if tag == "f64":
        return _num_out(v, output)
    if tag == "bool":
        return _num_out(1.0 if v else 0.0, output)
    return OMIT


def _to_u64(tag, v, output):
    if tag == "str":
        if not _U64_RE.match(v):
            return OMIT
        n = int(v, 10)
        return _num_out(n, output) if n <= _U64_MAX else OMIT
    if tag == "u64":
        return _num_out(v, output)
    if tag == "i64":
        return _num_out(v, output) if v >= 0 else OMIT
    if tag == "f64":
        if 0.0 <= v <= float(_U64_MAX):
            return _num_out(int(v), output)
        return OMIT
    if tag == "bool":
        return _num_out(int(v), output)
    return OMIT


def _to_i64(tag, v, output):
    if tag == "str":
        if not _I64_RE.match(v):
            return OMIT
        n = int(v, 10)
        return _num_out(n, output) if _I64_MIN <= n <= _I64_MAX else OMIT
    if tag == "u64":
        return _num_out(v, output) if v <= _I64_MAX else OMIT
    if tag == "i64":
        return _num_out(v, output)
    if tag == "f64":
        if float(_I64_MIN) <= v <= float(_I64_MAX):
            return _num_out(int(v), output)
        return OMIT
    if tag == "bool":
        return _num_out(int(v), output)
    return OMIT


def _to_bytes(tag, v, spec):
    # only Bytes converts ("TODO we could cast str to bytes" — the
    # reference does NOT, `tantivy_val_to_json.rs:252-260`)
    if tag != "bytes":
        return OMIT
    if spec.get("output", "base64") == "hex":
        return v.hex()
    return base64.b64encode(v).decode("ascii")


def _to_datetime(tag, v, spec):
    """`reparse_tantivy_value` + output format: Date passes through;
    Str/U64/I64/F64 parse under the CURRENT input_formats
    (updating-mapper.md: "parse according to current input_format")."""
    if tag == "date":
        nanos = v
    elif tag in ("str", "u64", "i64", "f64"):
        nanos = parse_datetime(v, tuple(spec.get("formats") or ()))
        if nanos is None:
            return OMIT
    else:
        return OMIT
    return format_datetime_out(nanos, spec.get("output", "rfc3339"))


def convert_typed(tv, new_spec: dict):
    """One old-typed value -> the new leaf type + output format
    (`formatted_tantivy_value_to_json`)."""
    tag, v = tv
    kind = new_spec.get("kind")
    caps = new_spec.get("caps")
    if caps == "ip":
        return _to_ip(tag, v)
    if caps == "bytes":
        return _to_bytes(tag, v, new_spec)
    if kind == "datetime":
        return _to_datetime(tag, v, new_spec)
    if kind == "text":
        return _to_string(tag, v)
    if kind == "bool":
        return _to_bool(tag, v)
    output = new_spec.get("output", "number")
    if kind in ("double", "f64"):
        return _to_f64(tag, v, output)
    if kind == "u64":
        return _to_u64(tag, v, output)
    if kind in ("long", "i64"):
        return _to_i64(tag, v, output)
    return OMIT


def _inner(spec: dict | None) -> dict:
    """Leaf spec of a possibly-multivalued mapped spec."""
    return spec or {}


def convert_value(value, old_spec: dict | None, new_spec: dict):
    """Full cardinality-aware conversion of one stored leaf value.

    Returns the converted JSON value or OMIT (drop the key).  The
    cardinality rules are the updating-mapper.md table:
      array<T> -> array<U>  element-wise, failures skipped
      T        -> array<U>  single-element array, empty when failed
      array<T> -> U         first convertible element, else omit
      T        -> U         convert, else omit
    """
    multi = new_spec.get("card") == "multi"
    vals = value if isinstance(value, list) else [value]
    out = []
    for v in vals:
        tv = interpret(v, _inner(old_spec))
        c = OMIT if tv is None else convert_typed(tv, new_spec)
        if c is not OMIT:
            out.append(c)
            if not multi:
                break  # array<T> -> U keeps the FIRST convertible
    if multi:
        return out
    return out[0] if out else OMIT


# ------------------------------------------------- document application


def build_converters(
    new_field_options: dict | None,
    old_field_options: dict | None,
    drop_missing: bool = False,
) -> dict:
    """Per-path conversion plan between two mapping generations.

    `path -> ("convert", old_spec, new_spec)` for every path mapped in
    the NEW generation whose mapped spec differs from the OLD one (a
    path the old generation left dynamic gets `old_spec=None`:
    JSON-type-directed interpretation).  With `drop_missing` (mapper
    mode != dynamic), old-only mapped paths become `("drop",)` —
    "if fields are deleted, they will stop appearing ... unless mapper
    mode is Dynamic" (`updating-mapper.md`)."""

    def specs(opts):
        return {
            p: (o or {}).get("mapspec")
            for p, o in (opts or {}).items()
            if (o or {}).get("mapspec")
        }

    new_specs = specs(new_field_options)
    old_specs = specs(old_field_options)
    out: dict = {}
    for p, ns in new_specs.items():
        os_ = old_specs.get(p)
        if os_ is not None and os_ == ns:
            continue  # unchanged mapping: plain output-format render
        out[p] = ("convert", os_, ns)
    if drop_missing:
        for p in old_specs:
            if p not in new_specs:
                out[p] = ("drop",)
    return out


def _walk_convert(node, parts: list, old_spec, new_spec):
    """Descend dicts along the dot path (arrays of objects element-wise)
    and convert the LEAF value whole — the leaf list/scalar shape is the
    cardinality input, so lists must NOT auto-descend at the leaf."""
    if parts:
        if isinstance(node, list):
            return [_walk_convert(v, parts, old_spec, new_spec) for v in node]
        if isinstance(node, dict) and parts[0] in node:
            sub = _walk_convert(node[parts[0]], parts[1:], old_spec, new_spec)
            if sub is OMIT:
                del node[parts[0]]
            else:
                node[parts[0]] = sub
        return node
    return convert_value(node, old_spec, new_spec)


def _drop_at_path(node, parts: list):
    if isinstance(node, list):
        for v in node:
            _drop_at_path(v, parts)
        return
    if not isinstance(node, dict) or parts[0] not in node:
        return
    if len(parts) == 1:
        del node[parts[0]]
    else:
        _drop_at_path(node[parts[0]], parts[1:])


def convert_source_doc(doc, converters: dict):
    """Apply a `build_converters` plan to one parsed `_source` dict
    (mutates and returns it).  Top-level omission deletes the key, the
    reference's `formatted_tantivy_value_to_json -> None` behavior."""
    if not converters or not isinstance(doc, dict):
        return doc
    for path, action in converters.items():
        parts = path.split(".")
        if action[0] == "drop":
            _drop_at_path(doc, parts)
        else:
            _, old_spec, new_spec = action
            _walk_convert(doc, parts, old_spec, new_spec)
    return doc
