"""Doc mapping: typed field coercion + unmapped-field modes.

Re-expresses the reference's doc-mapping layer
(`quickwit-doc-mapper/src/doc_mapping.rs:23-70` modes,
`field_mapping_entry.rs` typed entries with `coerce`,
`field_mapping_type.rs:28-109` the type set incl. multivalued arrays,
`mapping_tree.rs:629-690` coercions,
`quickwit-datetime/src/date_time_format.rs:30-62` datetime input
formats): input documents pass through the mapping before indexing,
which

- casts declared fields to their target types (`coerce: true` accepts
  convertible representations — "123" → 123 — producing NULL when a
  value can't convert; `coerce: false` requires the input column's
  native type and rejects the mapping otherwise),
- handles unmapped columns per mode:
    lenient  drop them
    strict   raise (the columnar analog of per-doc rejection: with an
             explicit schema the whole frame either conforms or not)
    dynamic  capture them into a `_dynamic` map<string,string> column
             AND a `_dynamic_text` column of "path.token" tokens, so a
             whitespace-analyzed FieldConfig("_dynamic_text") makes them
             searchable as Term("_dynamic_text", "col.value") — the
             Spark shape of the reference's dynamic JSON field
             (`doc_mapping.rs:31-35`, path:value queries).

Typed coverage beyond the scalar five:

  u64        Decimal(20,0) — Spark has no unsigned 64-bit; the decimal
             holds the full range with correct ordering
  bytes      base64 input → BinaryType (reference bytes fields take
             base64 strings, `field_mapping_type.rs`)
  ip         IPv4 dotted-quad normalized to the reference's
             IPv6-mapped canonical form (`::ffff:a.b.c.d`) plus a
             `<name>_key` fixed-width 32-hex-digit sort key whose
             LEXICOGRAPHIC order equals numeric u128 order — range
             queries lower to plain string ranges on a fast column
             (the reference stores ip as a u128 fast field). Full
             IPv6 textual forms go through an Arrow-batched pandas
             UDF (`ipv6=True`) — the declared slow path; the dotted-
             quad case stays pure Column expressions.
  datetime   multiple accepted input formats tried in order
             (`date_time_format.rs`): iso8601/rfc3339 (native parse),
             rfc2822, unix_timestamp (magnitude auto-detect
             secs/millis/micros like the reference), explicit
             unix_timestamp_{secs,millis,micros}, or any Spark
             datetime pattern (the strptime analog)
  json       flattens a JSON-object column into
             - `<name>_text`: a "path.token" stream down to
               `json_depth` levels (all JVM: per-level
               `from_json(map<string,...>)` + higher-order funcs),
               searchable via a whitespace-analyzed FieldConfig —
               the reference's dynamic JSON field search
             - one typed fast column per declared dot-path subfield
               (`subfields={"a.n": "long"}` → column `<name>_a_n`) —
               the reference's typed json/object subtrees
  array=True multivalued leaf (reference Cardinality::MultiValued):
             the value stays an ArrayType column; the index builder
             tokenizes each element into the same posting stream

Everything except the opt-in IPv6 parser lowers to Column expressions —
no Python in the ingest path.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPARK_TYPES = {
    "text": "string",
    "string": "string",
    "long": "bigint",
    "i64": "bigint",
    "u64": "decimal(20,0)",
    "double": "double",
    "f64": "double",
    "bool": "boolean",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "bytes": "binary",
}

DYNAMIC_COL = "_dynamic"
DYNAMIC_TEXT_COL = "_dynamic_text"

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def ip_sort_key(ip: str) -> str:
    """Driver-side helper: the 32-hex-digit sort key for a literal IP —
    use as Range bounds against a mapped `<name>_key` column."""
    import ipaddress

    a = ipaddress.ip_address(ip)
    if isinstance(a, ipaddress.IPv4Address):
        a = ipaddress.IPv6Address(f"::ffff:{a}")
    return format(int(a), "032x")


def _ipv4_cols(c: Column) -> tuple[Column, Column]:
    """(canonical, sort_key) for dotted-quad input — pure Column exprs.
    Non-IPv4 strings map to NULL (coerce semantics)."""
    ok = c.rlike(_IPV4_RE)
    parts = F.split(c, r"\.")
    # bigint arithmetic: an out-of-range octet like 999 must yield NULL
    # via the validity mask, not an ANSI int32 overflow mid-expression
    octets = [parts.getItem(i).try_cast("bigint") for i in range(4)]
    valid = ok
    for o in octets:
        valid = valid & (o <= 255)
    num = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
    canonical = F.when(valid, F.concat(F.lit("::ffff:"), c))
    key = F.when(
        valid,
        F.concat(
            F.lit("00000000000000000000ffff"),
            F.lpad(F.lower(F.hex(num)), 8, "0"),
        ),
    )
    return canonical, key


def _ip_udf_cols(c: Column) -> tuple[Column, Column]:
    """Full IPv4/IPv6 textual parsing (compressed forms, mapped
    notation) via an Arrow-batched pandas UDF over Python's ipaddress —
    the declared slow path for ip columns that aren't dotted quads."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def parse(s: pd.Series) -> pd.Series:
        import ipaddress

        def one(v):
            if v is None:
                return None
            try:
                a = ipaddress.ip_address(v.strip())
            except ValueError:
                return None
            if isinstance(a, ipaddress.IPv4Address):
                a = ipaddress.IPv6Address(f"::ffff:{a}")
            return f"{a}|{int(a):032x}"

        return s.map(one)

    both = F.split(parse(c), r"\|")
    return both.getItem(0), both.getItem(1)


def _datetime_col(c: Column, formats: tuple) -> Column:
    """First-successful-format parse (reference tries input formats in
    order, `date_time_format.rs:30-62`)."""
    attempts = []
    for fmt in formats or ("rfc3339", "unix_timestamp"):
        if fmt in ("iso8601", "rfc3339"):
            attempts.append(F.try_to_timestamp(c.cast("string")))
        elif fmt == "rfc2822":
            attempts.append(
                F.try_to_timestamp(
                    c.cast("string"), F.lit("EEE, dd MMM yyyy HH:mm:ss Z")
                )
            )
        elif fmt == "unix_timestamp":
            # magnitude auto-detect like the reference (secs < 10^11,
            # millis < 10^14, micros < 10^17, else nanos)
            n = c.try_cast("decimal(38,6)")
            mag = F.abs(n)
            attempts.append(
                F.when(mag < 1e11, F.timestamp_seconds(n.cast("double")))
                .when(mag < 1e14, F.timestamp_millis(n.cast("long")))
                .when(mag < 1e17, F.timestamp_micros(n.cast("long")))
                .otherwise(F.timestamp_micros((n / 1000).cast("long")))
            )
        elif fmt == "unix_timestamp_secs":
            attempts.append(F.timestamp_seconds(c.try_cast("double")))
        elif fmt == "unix_timestamp_millis":
            attempts.append(F.timestamp_millis(c.try_cast("long")))
        elif fmt == "unix_timestamp_micros":
            attempts.append(F.timestamp_micros(c.try_cast("long")))
        else:  # Spark datetime pattern — the strptime analog
            attempts.append(F.try_to_timestamp(c.cast("string"), F.lit(fmt)))
    return F.coalesce(*attempts) if len(attempts) > 1 else attempts[0]


def _path_tokens(prefix: Column, value: Column) -> Column:
    """array<string> of '<prefix>.<token>' for one scalar JSON value —
    whitespace-split + lowercase, like the dynamic-field stream."""
    toks = F.filter(
        F.split(F.lower(value), r"\s+"), lambda t: t != ""
    )
    return F.transform(toks, lambda t: F.concat(prefix, F.lit("."), t))


def json_text_col(c: Column, depth: int = 2) -> Column:
    """'path.token' stream for a JSON-object string column, to
    `depth` levels of nesting — all JVM expressions.

    Recursive descent without exploding rows: level 1 is
    `map_entries(from_json(c, map<string,string>))` — nested objects
    surface as their '{'-prefixed JSON text; each deeper level
    re-parses exactly the object-valued entries of the previous level
    inside a `transform` lambda, extending the dot-path. Scalar leaves
    are tokenized (whitespace + lowercase) and emitted once with their
    full path — the searchable shape of the reference's dynamic JSON
    field (`doc_mapping.rs:26-47`, path:value queries).
    """
    if depth < 1:
        raise ValueError("json_depth must be >= 1")

    def is_object(v: Column) -> Column:
        return v.isNotNull() & F.startswith(F.trim(v), F.lit("{"))

    def is_scalar(v: Column) -> Column:
        return v.isNotNull() & ~F.startswith(F.trim(v), F.lit("{"))

    def entry(path: Column, value: Column) -> Column:
        return F.struct(path.alias("path"), value.alias("value"))

    def scalar_tokens(entries: Column) -> Column:
        return F.flatten(
            F.transform(
                F.filter(entries, lambda e: is_scalar(e["value"])),
                lambda e: _path_tokens(e["path"], e["value"]),
            )
        )

    cur = F.transform(
        F.map_entries(F.from_json(c, "map<string,string>")),
        lambda kv: entry(kv["key"], kv["value"]),
    )
    out = scalar_tokens(cur)
    for _ in range(depth - 1):
        cur = F.flatten(
            F.transform(
                F.filter(cur, lambda e: is_object(e["value"])),
                lambda e: F.transform(
                    F.map_entries(F.from_json(e["value"], "map<string,string>")),
                    lambda kv: entry(
                        F.concat(e["path"], F.lit("."), kv["key"]), kv["value"]
                    ),
                ),
            )
        )
        out = F.concat(out, scalar_tokens(cur))
    return F.concat_ws(" ", out)


@dataclass
class TypedField:
    name: str
    type: str = "text"  # see _SPARK_TYPES + ip + json
    coerce: bool = True  # reference default (`field_mapping_entry.rs` coerce)
    # datetime: accepted input formats tried in order
    formats: tuple = ()
    # json: flatten depth for the "path.token" stream (1..3)
    json_depth: int = 2
    # json: {dot_path: scalar type} typed fast subcolumns
    subfields: dict = dc_field(default_factory=dict)
    # multivalued (array of the leaf type)
    array: bool = False
    # ip: route non-dotted-quad forms through the full parser UDF
    ipv6: bool = False


@dataclass
class DocMapping:
    fields: list[TypedField]
    mode: str = "dynamic"  # lenient | strict | dynamic (reference default)
    exclude: tuple = ()  # columns never mapped nor captured (e.g. doc_key)

    def apply(self, df: DataFrame) -> DataFrame:
        declared = {f.name for f in self.fields}
        unmapped = [
            c for c in df.columns if c not in declared and c not in self.exclude
        ]
        cols = [F.col(c) for c in self.exclude if c in df.columns]
        in_types = dict(df.dtypes)
        for f in self.fields:
            c = F.col(f.name)
            if f.type == "ip":
                canonical, key = (
                    _ip_udf_cols(c) if f.ipv6 else _ipv4_cols(c.cast("string"))
                )
                cols.append(canonical.alias(f.name))
                cols.append(key.alias(f"{f.name}_key"))
                continue
            if f.type == "json":
                cols.append(c.cast("string").alias(f.name))
                cols.append(
                    json_text_col(c.cast("string"), f.json_depth).alias(
                        f"{f.name}_text"
                    )
                )
                for path, typ in (f.subfields or {}).items():
                    sub = F.get_json_object(c, f"$.{path}").try_cast(
                        _SPARK_TYPES.get(typ, typ)
                    )
                    cols.append(
                        sub.alias(f"{f.name}_{path.replace('.', '_')}")
                    )
                continue
            if f.type in ("datetime", "timestamp") and f.formats:
                cols.append(_datetime_col(c, f.formats).alias(f.name))
                continue
            target = _SPARK_TYPES[f.type]
            if f.type == "bytes" and in_types.get(f.name) == "string":
                # base64 text input, like the reference's bytes fields
                cols.append(F.unbase64(c).alias(f.name))
                continue
            if f.array:
                target = f"array<{target}>"
                if not f.coerce and in_types.get(f.name) != target:
                    raise TypeError(
                        f"field {f.name!r}: input type {in_types.get(f.name)!r}"
                        f" != {target!r} and coerce is false"
                    )
                cols.append(c.try_cast(target).alias(f.name))
                continue
            if not f.coerce and in_types.get(f.name) != target:
                raise TypeError(
                    f"field {f.name!r}: input type {in_types.get(f.name)!r} != "
                    f"{target!r} and coerce is false"
                )
            cols.append(c.try_cast(target).alias(f.name))
        if self.mode == "strict":
            if unmapped:
                raise ValueError(f"strict doc mapping: unmapped columns {unmapped}")
        elif self.mode == "dynamic" and unmapped:
            pairs = []
            for c in unmapped:
                pairs += [F.lit(c), F.col(c).cast("string")]
            cols.append(F.create_map(*pairs).alias(DYNAMIC_COL))
            # "path.token" stream: tokens of each captured column,
            # prefixed with the column name (JVM higher-order funcs)
            parts = [
                F.concat_ws(
                    " ",
                    F.transform(
                        F.filter(
                            F.split(F.lower(F.col(c).cast("string")), r"\s+"),
                            lambda t: t != "",
                        ),
                        lambda t: F.concat(F.lit(f"{c}."), t),
                    ),
                )
                for c in unmapped
            ]
            cols.append(F.concat_ws(" ", *parts).alias(DYNAMIC_TEXT_COL))
        elif self.mode not in ("lenient", "dynamic", "strict"):
            raise ValueError(f"unknown mode {self.mode!r}")
        return df.select(*cols)
