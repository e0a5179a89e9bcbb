"""Wire-output value formatting for stored `_source` documents.

The reference does not return the ingested JSON verbatim: fetched docs
are rebuilt from the typed doc store, and every explicitly mapped leaf
is re-serialized through its field's `output_format`
(`quickwit-doc-mapper/src/doc_mapper/tantivy_val_to_json.rs`,
`quickwit-datetime/src/date_time_format.rs:97-146`,
`field_mapping_entry.rs:97-188,236-241`):

  - datetime renders as rfc3339 by default regardless of the input
    form (`1700000000` ingested under `unix_timestamp` comes back as
    `"2023-11-14T22:13:20Z"`), or any of iso8601/rfc2822/
    unix_timestamp_{secs,millis,micros,nanos}/strftime pattern;
  - u64/i64/f64 render as JSON numbers, or strings with
    `output_format: "string"` (`NumericOutputFormat`);
  - bytes re-encode between base64 (default) and hex (`BinaryFormat`);
  - ip prints the canonical address — IPv4-mapped IPv6 as the dotted
    quad, everything else as compressed lowercase IPv6 (`value_to_ip`);
  - bool coerces 0/1/"true"/"false" to a JSON bool (`value_to_bool`).

This module reproduces that at hit-assembly time: one renderer per
mapped dot path (carried in `IndexConfig.field_options[path]["render"]`
by `sources.qw_config`), applied on the driver to the parsed source
dicts of the <= k winning docs — never in an executor hot path.
Unparseable values are returned verbatim (ingest already validated
them; leniency here only protects pre-render index versions).

Format approximations vs the reference (documented, driver-side only):
iso8601 output renders like rfc3339 (identical for whole seconds, which
is also what the reference's own scenario corpus exercises), and
strftime output patterns use Python `strftime` token semantics.
"""

from __future__ import annotations

import base64
import binascii
import math
from datetime import datetime, timedelta, timezone
from email.utils import format_datetime, parsedate_to_datetime

DATETIME_OUTPUT_FORMATS = {
    "iso8601",
    "rfc2822",
    "rfc3339",
    "unix_timestamp_secs",
    "unix_timestamp_millis",
    "unix_timestamp_micros",
    "unix_timestamp_nanos",
}
NUMERIC_OUTPUT_FORMATS = {"number", "string"}
BINARY_FORMATS = {"base64", "hex"}


def validate_datetime_output_format(fmt: str) -> str:
    """`DateTimeOutputFormat::from_str` (`date_time_format.rs:155-176`):
    a known name, else a strftime pattern (must contain a `%`
    conversion, like the reference's StrptimeParser validation)."""
    if fmt in DATETIME_OUTPUT_FORMATS:
        return fmt
    if "%" in fmt:
        return fmt
    raise ValueError(
        f"invalid datetime output_format {fmt!r}: expected one of "
        f"{sorted(DATETIME_OUTPUT_FORMATS)} or a strftime pattern"
    )


def validate_numeric_output_format(fmt: str) -> str:
    if fmt not in NUMERIC_OUTPUT_FORMATS:
        raise ValueError(
            f"invalid numeric output_format {fmt!r}: expected "
            "'number' or 'string'"
        )
    return fmt


def validate_binary_format(fmt: str) -> str:
    if fmt not in BINARY_FORMATS:
        raise ValueError(
            f"invalid bytes format {fmt!r}: expected 'base64' or 'hex'"
        )
    return fmt


# --------------------------------------------------------------- datetime
#
# tantivy's DateTime is an i64 of NANOSECONDS since epoch, and the
# reference's Rfc3339 output round-trips sub-microsecond input
# (`multi_splits/0001` expects "...00.000000001Z" back) — so parsed
# datetimes are carried as integer epoch-nanos, not Python datetimes.

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_FRAC_RE = __import__("re").compile(r"\.(\d{7,9})(?=[Z+\-]|$)")


def _parse_unix(value) -> int | None:
    """Reference magnitude auto-detect (`parse_timestamp_int`): seconds
    below 1e11, millis below 1e14, micros below 1e17, else nanos —
    mirrors `_datetime_col` in `index/mapping.py`. Returns epoch
    nanos."""
    if isinstance(value, str) and not value.strip():
        return None
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        n = value  # exact: no float round-trip for large nanos
    elif isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            return None
        n = value
    elif isinstance(value, str):
        if not _rustlike_numeric(value.strip()):
            return None
        try:
            n = int(value, 10)  # exact path for integer strings
        except ValueError:
            try:
                n = float(value)
            except ValueError:
                return None
            if math.isnan(n) or math.isinf(n):
                return None
    else:
        return None
    mag = abs(n)
    if mag < 1e11:
        return round(n * 1_000_000_000)
    if mag < 1e14:
        return round(n * 1_000_000)
    if mag < 1e17:
        return round(n * 1_000)
    return round(n)


def _parse_scaled(value, scale: int) -> int | None:
    """Exact epoch scaling for unix_timestamp_{millis,micros}: ints and
    integer strings never round-trip through float — a modern
    epoch-millis value times 1e6 exceeds f64's 2^53 exact-integer range
    and would pick up ~100 ns of rounding noise in the rendered
    rfc3339 fraction. Floats keep fractional-input support; bools are
    not timestamps (mirrors `_parse_unix`)."""
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        return value * scale
    if isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            return None
        return round(value * scale)
    if isinstance(value, str):
        s = value.strip()
        if not _rustlike_numeric(s):
            return None
        try:
            return int(s, 10) * scale
        except ValueError:
            pass
        try:
            f = float(s)
        except ValueError:
            return None
        if math.isnan(f) or math.isinf(f):
            return None
        return round(f * scale)
    return None


def _rustlike_numeric(s: str) -> bool:
    """Python's int()/float() accept `_` separators and non-ASCII
    Unicode digits; Rust's FromStr (what the reference parses numbers
    with) accepts neither. Gate string→number paths on the Rust
    grammar's alphabet."""
    return bool(s) and s.isascii() and "_" not in s


def _parse_iso(value) -> int | None:
    """RFC3339/ISO8601 → epoch nanos; fractions beyond Python's 6
    microsecond digits (tantivy keeps 9) are split off and re-added."""
    if not isinstance(value, str):
        return None
    text = value.strip()
    extra_nanos = 0
    m = _FRAC_RE.search(text)
    if m:
        digits = m.group(1).ljust(9, "0")
        extra_nanos = int(digits[6:9])
        text = text[: m.start()] + "." + digits[:6] + text[m.end():]
    try:
        dt = datetime.fromisoformat(text.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    micros = round((dt - _EPOCH) / timedelta(microseconds=1))
    return micros * 1_000 + extra_nanos


def parse_datetime(value, formats: tuple) -> int | None:
    """First-successful input format, in declared order (the same
    contract as the ingest-side `_datetime_col`); default
    rfc3339 + unix auto-magnitude. Returns epoch NANOSECONDS."""
    for fmt in formats or ("rfc3339", "unix_timestamp"):
        nanos = None
        if fmt in ("iso8601", "rfc3339"):
            nanos = _parse_iso(value)
        elif fmt == "rfc2822":
            if isinstance(value, str):
                try:
                    dt = parsedate_to_datetime(value)
                    if dt.tzinfo is None:
                        dt = dt.replace(tzinfo=timezone.utc)
                    nanos = (
                        round((dt - _EPOCH) / timedelta(microseconds=1))
                        * 1_000
                    )
                except (TypeError, ValueError):
                    nanos = None
        elif fmt == "unix_timestamp":
            nanos = _parse_unix(value)
        elif fmt == "unix_timestamp_secs":
            nanos = _parse_unix(value) if abs(_num(value)) < 1e11 else None
        elif fmt == "unix_timestamp_millis":
            nanos = _parse_scaled(value, 1_000_000)
        elif fmt == "unix_timestamp_micros":
            nanos = _parse_scaled(value, 1_000)
        elif isinstance(value, str):
            # ingest uses Spark datetime patterns; at render time a
            # plain fromisoformat attempt covers the common ones, and
            # failures fall through to verbatim output
            nanos = _parse_iso(value)
        if nanos is not None:
            # tantivy DateTime is i64 nanoseconds — values outside the
            # representable range fail to parse in the reference
            # (index-config.md documents the supported window)
            if not (-(2**63) <= nanos < 2**63):
                return None
            return nanos
    return None


def _num(value) -> float:
    try:
        return float(value)
    except (TypeError, ValueError):
        return float("inf")


def format_datetime_out(nanos: int, fmt: str):
    """`DateTimeOutputFormat::format_to_json`
    (`date_time_format.rs:123-146`) from epoch nanos. rfc3339/iso8601
    print whole seconds with a `Z` suffix and the fractional part only
    when non-zero, trailing zeros trimmed (the `time` crate's Rfc3339
    behavior — which is what preserves a `.000000001` input)."""
    if fmt == "unix_timestamp_secs":
        return nanos // 1_000_000_000
    if fmt == "unix_timestamp_millis":
        return nanos // 1_000_000
    if fmt == "unix_timestamp_micros":
        return nanos // 1_000
    if fmt == "unix_timestamp_nanos":
        return nanos
    secs, sub = divmod(nanos, 1_000_000_000)
    dt = _EPOCH + timedelta(seconds=secs)
    if fmt in ("rfc3339", "iso8601"):
        base = dt.strftime("%Y-%m-%dT%H:%M:%S")
        if sub:
            frac = f"{sub:09d}".rstrip("0")
            return f"{base}.{frac}Z"
        return f"{base}Z"
    if fmt == "rfc2822":
        return format_datetime(dt)
    return dt.strftime(fmt)


# ---------------------------------------------------------------- leaves


def _render_datetime(value, spec):
    nanos = parse_datetime(value, tuple(spec.get("formats") or ()))
    if nanos is None:
        return value
    return format_datetime_out(nanos, spec.get("output", "rfc3339"))


def _render_int(value, spec):
    # reference NumToJson for u64/i64: numbers stay integers; strings
    # ingested under coerce come back as numbers (or strings when
    # output_format == "string")
    if isinstance(value, bool):
        return value
    try:
        n = int(str(value), 10)
    except (TypeError, ValueError):
        return value
    if spec.get("output") == "string":
        return str(n)
    return n


def _render_float(value, spec):
    if isinstance(value, bool):
        return value
    try:
        n = float(value)
    except (TypeError, ValueError):
        return value
    if math.isnan(n) or math.isinf(n):
        return value
    if spec.get("output") == "string":
        # serde f64 Display: integral floats print with a trailing .0,
        # which str() reproduces for Python floats
        return str(n)
    return n


def _render_bool(value, spec):
    """`value_to_bool` coercions: 0/1 (any numeric type) and parseable
    strings become JSON bools; anything else stays verbatim."""
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        if value == 0:
            return False
        if value == 1:
            return True
        return value
    if isinstance(value, str):
        if value.lower() == "true":
            return True
        if value.lower() == "false":
            return False
    return value


def _render_ip(value, spec):
    """`value_to_ip`: canonical form, IPv4-mapped printed as IPv4
    (tantivy's IpAddr serialization)."""
    import ipaddress

    if not isinstance(value, str):
        return value
    try:
        ip = ipaddress.ip_address(value.strip())
    except ValueError:
        return value
    if isinstance(ip, ipaddress.IPv6Address) and ip.ipv4_mapped is not None:
        return str(ip.ipv4_mapped)
    return str(ip)


def _render_bytes(value, spec):
    if not isinstance(value, str):
        return value
    try:
        if spec.get("input", "base64") == "hex":
            raw = bytes.fromhex(value.strip())
        else:
            raw = base64.b64decode(value.strip(), validate=True)
    except (ValueError, binascii.Error):
        return value
    if spec.get("output", "base64") == "hex":
        return raw.hex()
    return base64.b64encode(raw).decode("ascii")


_LEAF_RENDERERS = {
    "datetime": _render_datetime,
    "u64": _render_int,
    "i64": _render_int,
    "f64": _render_float,
    "bool": _render_bool,
    "ip": _render_ip,
    "bytes": _render_bytes,
}


def build_source_renderers(field_options: dict | None) -> dict:
    """path -> unary leaf renderer, from the `render` specs
    `sources.qw_config.reference_index_config` stamped into
    `IndexConfig.field_options`."""
    out = {}
    for path, opt in (field_options or {}).items():
        spec = (opt or {}).get("render")
        if not spec:
            continue
        fn = _LEAF_RENDERERS.get(spec.get("kind"))
        if fn is None:
            continue
        out[path] = (fn, spec)
    return out


def _apply_at_path(node, parts: list, fn, spec):
    """Descend dict/list structure along dot-path `parts`, rewriting the
    leaf (lists element-wise, at any level — multivalued fields and
    arrays of objects both)."""
    if isinstance(node, list):
        return [_apply_at_path(v, parts, fn, spec) for v in node]
    if not parts:
        return node if node is None else fn(node, spec)
    if isinstance(node, dict) and parts[0] in node:
        node[parts[0]] = _apply_at_path(node[parts[0]], parts[1:], fn, spec)
    return node


def render_source_doc(doc, renderers: dict):
    """Apply every path renderer to one parsed `_source` dict
    (mutates and returns it; no-op when `renderers` is empty)."""
    if not renderers or not isinstance(doc, dict):
        return doc
    for path, (fn, spec) in renderers.items():
        _apply_at_path(doc, path.split("."), fn, spec)
    return doc
