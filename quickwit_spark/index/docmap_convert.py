"""Cross-generation docmap alignment for doc-mapping updates.

After a non-additive mapping update (`api.update_index`), an index's
splits span doc-mapping generations whose docmap (fast-field) datasets
may disagree on a column's type — e.g. `field1` stored `bigint` under
generation 0 and `string` under generation 1.  The reference searches
old splits "as correctly as possible" under the NEWEST mapping
(`docs/reference/updating-mapper.md`), converting stored values
best-effort per `tantivy_val_to_json.rs`'s value_to_* matrix.

Spark shape: each generation is its own parquet dataset
(`builder.docs_path`), read with its own schema; every non-current
generation's conflicting columns are converted to the current type with
BUILT-IN column expressions (the same range rules as
`search.source_convert`, which handles the driver-side `_source`
rendering of the <= k winners), then the per-generation frames union by
name with missing columns as null.  All conversion work stays inside
whole-stage codegen — no UDF, no shuffle added; each branch keeps its
own pushed filters.

Approximations vs the driver-side matrix (documented): string->number
accepts Spark `try_cast` syntax, string->timestamp accepts Spark
timestamp syntax rather than the field's input_formats,
timestamp->string renders whole-second UTC, and double->string renders
the plain-decimal expansion through decimal(38,9) (fractions beyond 9
digits round; magnitudes past 29 integer digits fall back to Spark's
scientific-notation cast).  Fast columns feed
match/sort/range — the wire `_source` goes through the exact
`source_convert` matrix instead.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_I64_MAX = 2**63 - 1
_I64_MIN = -(2**63)
_U64_MAX = 2**64 - 1


def _is_num(t: str) -> bool:
    return (
        t in ("bigint", "int", "smallint", "tinyint", "double", "float")
        or t.startswith("decimal")
    )


def _is_ts(t: str) -> bool:
    return t in ("timestamp", "timestamp_ntz")


def _leaf_convert(c: Column, src: str, dst: str) -> Column:
    """One scalar column `src` type -> `dst` type, null on failure
    (the OMIT analog; docmap consumers treat null as missing-value)."""
    if src == dst:
        return c
    if dst == "string":
        if src == "boolean":
            return F.when(c, F.lit("true")).when(~c, F.lit("false"))
        if _is_ts(src):
            return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if src in ("double", "float"):
            # plain decimal expansion, trailing zeros stripped — Spark's
            # double->string cast would render scientific notation
            # ("1.0E10"), disagreeing with the driver-side _source
            # matrix and the reference's Display form; values past
            # decimal(38,9) fall back to the cast form
            d = c.try_cast("decimal(38,9)")
            s = F.regexp_replace(
                F.regexp_replace(
                    d.cast("string"), r"(\.[0-9]*?)0+$", r"$1"
                ),
                r"\.$",
                "",
            )
            return F.when(d.isNotNull(), s).otherwise(c.cast("string"))
        return c.cast("string")
    if dst == "boolean":
        if src == "string":
            return F.when(c == "true", F.lit(True)).when(
                c == "false", F.lit(False)
            )
        if _is_num(src):
            return F.when(c == 0, F.lit(False)).when(c == 1, F.lit(True))
        return F.lit(None).cast("boolean")
    if dst == "bigint":  # i64 with range rules
        if src == "string":
            d = F.when(
                c.rlike(r"^[+-]?[0-9]+$"), c
            ).otherwise(F.lit(None)).try_cast("decimal(38,0)")
            return F.when(
                (d >= _I64_MIN) & (d <= _I64_MAX), d.cast("bigint")
            )
        if src.startswith("decimal"):
            return F.when(c <= _I64_MAX, c.cast("bigint"))
        if src in ("double", "float"):
            return F.when(
                (c >= float(_I64_MIN)) & (c <= float(_I64_MAX)),
                c.cast("bigint"),
            )
        if src == "boolean" or _is_num(src):
            return c.cast("bigint")
        return F.lit(None).cast("bigint")
    if dst.startswith("decimal"):  # u64 (decimal(20,0)) and friends
        if src == "string":
            # decimal(20,0) holds up to 10^20-1 — wider than u64, so
            # the reference's 0..2^64 range needs an explicit bound
            d = F.when(c.rlike(r"^\+?[0-9]+$"), c).try_cast(dst)
            # u64::MAX exceeds a JVM long — bound via a decimal literal
            u64max = F.lit(str(_U64_MAX)).cast("decimal(20,0)")
            return F.when(d <= u64max, d)
        if src in ("double", "float"):
            # truncate via decimal: F.floor on a double yields a LONG,
            # which would saturate at i64::MAX for u64 values in
            # (2^63, 2^64)
            return F.when(
                (c >= 0) & (c <= float(_U64_MAX)),
                F.floor(c.try_cast("decimal(38,9)")),
            ).try_cast(dst)
        if src == "boolean":
            return c.cast("int").cast(dst)
        if _is_num(src):
            return F.when(c >= 0, c).try_cast(dst)
        return F.lit(None).cast(dst)
    if dst in ("double", "float"):
        if src == "string":
            # Spark's try_cast trims whitespace; Rust f64::FromStr does
            # not — only exact, non-empty strings convert
            return F.when((c == F.trim(c)) & (c != ""), c).try_cast(dst)
        if src == "boolean" or _is_num(src):
            return c.cast(dst)
        return F.lit(None).cast(dst)
    if _is_ts(dst):
        if src == "string":
            return c.try_cast(dst)
        if _is_num(src):
            # reference unix auto-magnitude (parse_timestamp_int):
            # secs < 1e11 <= millis < 1e14 <= micros < 1e17 <= nanos
            d = c.cast("double")
            a = F.abs(d)
            out = (
                F.when(a < 1e11, F.timestamp_micros((d * 1e6).cast("bigint")))
                .when(a < 1e14, F.timestamp_micros((d * 1e3).cast("bigint")))
                .when(a < 1e17, F.timestamp_micros(d.cast("bigint")))
                # try_cast: magnitudes past i64 nanos would throw
                # CAST_OVERFLOW under ANSI instead of omitting to null
                .otherwise(F.timestamp_micros((d / 1e3).try_cast("bigint")))
            )
            return out.cast(dst)
        return F.lit(None).cast(dst)
    return c.try_cast(dst)


def convert_column(c: Column, src: str, dst: str) -> Column:
    """Type conversion with the cardinality rules of the update matrix:
    array->array element-wise skipping failures, scalar->array wraps,
    array->scalar keeps the first convertible element."""
    s_arr = src.startswith("array<")
    d_arr = dst.startswith("array<")
    if s_arr and d_arr:
        s_el, d_el = src[6:-1], dst[6:-1]
        return F.filter(
            F.transform(c, lambda x: _leaf_convert(x, s_el, d_el)),
            lambda x: x.isNotNull(),
        )
    if s_arr:
        s_el = src[6:-1]
        # F.get is 0-based and null-safe — element_at(arr, 1) THROWS
        # under ANSI mode when every element fails to convert
        return F.get(
            F.filter(
                F.transform(c, lambda x: _leaf_convert(x, s_el, dst)),
                lambda x: x.isNotNull(),
            ),
            0,
        )
    if d_arr:
        d_el = dst[6:-1]
        return F.filter(
            F.array(_leaf_convert(c, src, d_el)), lambda x: x.isNotNull()
        )
    return _leaf_convert(c, src, dst)


# spark type per declared mapped kind — MUST match what the builder
# writes for those columns (`sources/dynamic.py` _CAST + datetime)
_DECLARED = {
    "text": "string",
    "u64": "decimal(20,0)",
    "long": "bigint",
    "i64": "bigint",
    "double": "double",
    "f64": "double",
    "bool": "boolean",
    "datetime": "timestamp",
}


def declared_types(cfg) -> dict[str, str]:
    """column -> spark type for every explicitly mapped path of an
    IndexConfig (from the `mapspec` stamped by
    `sources.qw_config.reference_index_config`)."""
    out: dict[str, str] = {}
    for path, opt in (cfg.field_options or {}).items():
        spec = (opt or {}).get("mapspec")
        if not spec:
            continue
        t = _DECLARED.get(spec.get("kind"))
        if t is None:
            continue
        if spec.get("caps") in ("ip", "bytes"):
            t = "string"  # stored as canonical/encoded strings
        if spec.get("card") == "multi":
            t = f"array<{t}>"
        out[(opt or {}).get("column", path)] = t
    return out


def align_generations(
    frames: dict[int, DataFrame],
    current_uid: int,
    cfg_by_uid: dict,
) -> DataFrame:
    """Union the per-generation docmap frames under the CURRENT
    mapping's column types.

    Target type per column: the current config's declared type when the
    column is explicitly mapped, else the dtype observed in the newest
    generation that has the column (dynamic columns keep their newest
    shape; older conflicting generations convert)."""
    targets: dict[str, str] = {}
    for g in sorted(frames, reverse=True):
        for name, t in frames[g].dtypes:
            targets.setdefault(name, t)
    cur_cfg = cfg_by_uid.get(current_uid)
    if cur_cfg is not None:
        targets.update(declared_types(cur_cfg))
    out = []
    for g, df in sorted(frames.items(), reverse=True):
        cols = []
        for name, t in df.dtypes:
            dst = targets.get(name, t)
            if dst == t:
                cols.append(F.col(name))
            else:
                cols.append(convert_column(F.col(name), t, dst).alias(name))
        out.append(df.select(*cols))
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), out
    )
