"""Dynamic JSON doc mapping — per-dot-path fields from nested documents.

The reference's default doc-mapping mode is `dynamic`
(`quickwit-doc-mapper/src/doc_mapping.rs:26-47`): unmapped JSON subtrees
are indexed under their dot path (`expand_dots`), every path is
searchable with the dynamic tokenizer (term/phrase/prefix), scalar
leaves get fast columns (with an optional normalizer,
`doc_mapping.rs:49-70` QuickwitJsonOptions), and `index_field_presence`
serves `exists` queries on any path
(`doc_mapper/field_presence.rs:30-80`).

Spark re-expression (schema-first, not per-doc):

  1. `spark.read.json` infers the corpus' nested schema once —
     a distributed scan, the analog of the reference building its
     mapping tree per doc, amortized to per-corpus.
  2. `flatten_dynamic` lowers the nested frame to ONE COLUMN PER LEAF
     DOT PATH, entirely with Column expressions (`getField`,
     `transform`, `flatten` — arrays are traversed like the reference's
     multivalued JSON values; no Python touches row data):
       string leaf   →  `path` string / array<string> column
       long/double/
       bool leaf     →  typed column (the fast column) — indexed as a
                        single `raw` token of its canonical string form,
                        which is how a typed term query
                        (`term: {actor.id: 1762355}`) matches
       datetime      →  declared via `mapped` (input format + fast
                        precision truncation, like `fast_precision`)
  3. a `_field_presence` array<string> column collects every present
     path INCLUDING intermediate objects (null leaves and empty objects
     contribute nothing — ES `exists` semantics); the index maps it as
     a `raw` multivalued field so `Exists(path)` lowers to
     `Term(_field_presence, path)` in any bool position.

At 10^12-doc scale this is the columnar shape the reference itself
uses (one fast column per path, one postings field per path); the
flatten is a single projection over the scan — no shuffle, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PRESENCE_FIELD = "_field_presence"
SOURCE_COLUMN = "_source_json"


@dataclass
class DynField:
    path: str            # dot path — the FIELD name queries use
    kind: str            # "text" | "long" | "double" | "bool" | "datetime"
    # physical flat column name ("." → "__"): PySpark's own column
    # resolution (mapInArrow feeding, F.col) treats dots as struct
    # access, so the dot path cannot BE the column name
    column: str = ""
    array: bool = False
    # fast-column normalizer for text leaves: the reference's dynamic
    # mapping lowercases fast values (`_setup.quickwit.yaml`
    # dynamic_mapping.fast.normalizer), while explicitly mapped text
    # fast fields stay raw (`field_mapping_entry.rs:469-475`)
    normalizer: str = "lowercase"
    # datetime fast-value truncation ("seconds"|"milliseconds"|None)
    precision: str | None = None
    # explicit field_mappings layered over dynamic mode may override the
    # term tokenizer ('raw' text fields) and the positions record
    tokenizer: str | None = None
    record: str | None = None
    # reference `indexed: false`: fast/stored column only, no postings
    indexed: bool = True
    # mixed-typed dynamic paths (heterogeneous JSON values — the
    # reference creates one tantivy column per value type under the
    # path): `column` is the numeric coercion used for sort/range,
    # `orig_column` keeps each value's original JSON token for the wire
    orig_column: str | None = None


_NUM_LONG = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_NUM_DOUBLE = (T.DoubleType, T.FloatType, T.DecimalType)


def _leaf_kind(dt: T.DataType) -> str | None:
    if isinstance(dt, (T.StringType, T.NullType)):
        return "text"
    if isinstance(dt, _NUM_LONG):
        return "long"
    if isinstance(dt, _NUM_DOUBLE):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampType):
        return "datetime"
    return None


def _truncate_ts(c: Column, precision: str | None) -> Column:
    """Truncate a timestamp to the declared fast precision (the
    reference truncates BOTH stored values and range bounds,
    `fast_precision`)."""
    if precision in (None, "microseconds"):
        return c
    if precision == "milliseconds":
        return F.timestamp_millis(F.floor(F.unix_micros(c) / 1000).cast("long"))
    if precision == "seconds":
        return F.timestamp_seconds(
            F.floor(F.unix_micros(c) / 1_000_000).cast("long")
        )
    raise ValueError(f"unknown datetime precision {precision!r}")


def scan_dynamic(df: DataFrame, exclude: tuple = ()) -> list[DynField]:
    """Leaf inventory of a nested frame: one DynField per scalar dot
    path, arrays traversed transparently (reference multivalued JSON)."""
    out: list[DynField] = []

    def walk(dt: T.DataType, path: str, in_array: bool):
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}" if path else f.name, in_array)
            return
        if isinstance(dt, T.ArrayType):
            walk(dt.elementType, path, True)
            return
        if isinstance(dt, T.MapType):
            return  # JSON objects surface as structs from read.json
        kind = _leaf_kind(dt)
        if kind is not None:
            out.append(DynField(path, kind, array=in_array))

    for f in df.schema.fields:
        if f.name in exclude:
            continue
        walk(f.dataType, f.name, False)
    return out


def _leaf_exprs(df: DataFrame, exclude: tuple):
    """[(path, kind, array, expr)] — expression per leaf path; arrays of
    structs become arrays of the leaf via `transform`, nested arrays are
    flattened."""
    out = []

    def _getter(name):
        # NOTE: a two-arg lambda would make F.transform pass the element
        # INDEX as the second argument — keep it unary via this closure
        return lambda x: x[name]

    def walk(expr: Column, dt: T.DataType, path: str, in_array: bool):
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                child = (
                    F.transform(expr, _getter(f.name))
                    if in_array
                    else expr[f.name]
                )
                walk(child, f.dataType, f"{path}.{f.name}", in_array)
            return
        if isinstance(dt, T.ArrayType):
            walk(F.flatten(expr) if in_array else expr, dt.elementType, path, True)
            return
        if isinstance(dt, T.MapType):
            return
        kind = _leaf_kind(dt)
        if kind is not None:
            out.append((path, kind, in_array, expr))

    for f in df.schema.fields:
        if f.name in exclude:
            continue
        walk(F.col(f"`{f.name}`"), f.dataType, f.name, False)
    return out


_CAST = {
    "text": "string",
    "long": "bigint",
    "double": "double",
    "bool": "boolean",
    # u64 needs the full unsigned range (> i64::MAX values appear in
    # the reference's own search_after corpus) — exact decimal, not
    # lossy double
    "u64": "decimal(20,0)",
}

# a JSON scalar token that is numeric or boolean (what the reference's
# dynamic mapper would type as i64/u64/f64/bool rather than text)
_NUMBOOL_RE = r"^([+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?|true|false)$"


def detect_mixed_paths(
    df: DataFrame, exclude: tuple = (), mapped: dict | None = None
) -> set[str]:
    """Dynamic string leaves whose every non-null value is a numeric or
    boolean JSON token — the reference types these per value (its
    dynamic mapping makes one column per type under the path); Spark's
    schema inference collapses the conflict to StringType, so one
    corpus-level aggregate recovers the classification (run ONCE on the
    full corpus so every batch flattens identically)."""
    mapped = mapped or {}
    leaves = _leaf_exprs(df, exclude)
    probes = []
    cands = []
    for path, kind, is_array, expr in leaves:
        if kind != "text" or is_array or path in mapped:
            continue
        v = expr.cast("string")
        probes.append(
            (
                F.max(F.when(~v.rlike(_NUMBOOL_RE), 1).otherwise(0))
                == F.lit(0)
            ).alias(f"p{len(cands)}")
        )
        probes.append(
            (F.count(v) > 0).alias(f"n{len(cands)}")
        )
        cands.append(path)
    if not cands:
        return set()
    row = df.agg(*probes).collect()[0]
    return {
        p
        for i, p in enumerate(cands)
        if row[f"p{i}"] and row[f"n{i}"]
    }


def flatten_dynamic(
    df: DataFrame,
    exclude: tuple = (),
    mapped: dict | None = None,
    presence_field: str | None = PRESENCE_FIELD,
    dynamic_normalizer: str = "lowercase",
    mixed_paths: set | None = None,
) -> tuple[DataFrame, list[DynField]]:
    """Nested frame → (flat frame with one column per leaf dot path
    [+ presence column], field inventory).

    `exclude` columns pass through unchanged (doc key, raw-source
    column). `mapped` overrides per path, e.g.
    `{"created_at": {"kind": "datetime", "precision": "milliseconds"},
      "repo.name": {"normalizer": "raw"}}` — the analog of explicit
    field_mappings layered over dynamic mode.
    """
    mapped = mapped or {}
    leaves = _leaf_exprs(df, exclude)
    cols = [F.col(f"`{c}`") for c in exclude if c in df.columns]
    fields: list[DynField] = []
    used = set(exclude) | ({presence_field} if presence_field else set())

    def _sanitize(path: str) -> str:
        base = path.replace(".", "__")
        name, i = base, 2
        while name in used:
            name = f"{base}_{i}"
            i += 1
        used.add(name)
        return name
    # presence: token per present path, including intermediate objects —
    # an object is "present" iff any leaf under it has a value (an empty
    # object or all-null subtree contributes nothing, matching the
    # reference's per-value presence hashes, `field_presence.rs:30-80`).
    # Shape: ONE shallow `when(cond, [path prefixes...])` per leaf +
    # flatten + distinct — a deep OR-fold per intermediate prefix
    # overflows Catalyst's analysis stack at a few hundred leaves.
    presence_parts: list[Column] = []
    _empty = F.array().cast("array<string>")

    for path, kind, is_array, expr in leaves:
        spec = mapped.get(path, {})
        kind = spec.get("kind", kind)
        if mixed_paths and path in mixed_paths and kind == "text" and not is_array:
            # heterogeneous JSON values: keep the original token string
            # (wire output) plus an exact numeric coercion for
            # sort/range (bool orders as 1/0 — the reference's own
            # mixed-column scenario sorts 0 < true < 10.5 < 1.8e19)
            # NOTE: the orig column must NOT shadow the field path —
            # the engine's field→column map would redirect a fetch of
            # it to the numeric column
            orig = _sanitize(path + "__qorig")
            numcol = _sanitize(path + "__qnum")
            v = expr.cast("string")
            num = (
                F.when(F.lower(v) == "true", F.lit(1).cast("decimal(38,9)"))
                .when(F.lower(v) == "false", F.lit(0).cast("decimal(38,9)"))
                .otherwise(v.try_cast("decimal(38,9)"))
            )
            cols.append(v.alias(orig))
            cols.append(num.alias(numcol))
            fields.append(
                DynField(
                    path, "mixed", column=numcol, orig_column=orig,
                    normalizer="raw",
                )
            )
            if presence_field is not None:
                parts = path.split(".")
                prefixes = [".".join(parts[: i + 1]) for i in range(len(parts))]
                presence_parts.append(
                    F.when(
                        v.isNotNull(),
                        F.array(*[F.lit(p) for p in prefixes]),
                    ).otherwise(_empty)
                )
            continue
        fld = DynField(
            path,
            kind,
            column=_sanitize(path),
            array=is_array,
            normalizer=spec.get(
                "normalizer", dynamic_normalizer if kind == "text" else "raw"
            ),
            precision=spec.get("precision"),
            tokenizer=spec.get("tokenizer"),
            record=spec.get("record"),
            indexed=spec.get("indexed", True),
        )
        if kind == "datetime":
            from quickwit_spark.index.mapping import _datetime_col

            c = expr if not is_array else expr.getItem(0)
            # accepted input formats tried in order (default rfc3339 +
            # unix epoch with magnitude auto-detect, like the reference
            # when input_formats is unspecified)
            c = _truncate_ts(
                _datetime_col(c, tuple(spec.get("formats") or ())),
                fld.precision,
            )
            present = c.isNotNull()
        else:
            target = _CAST[kind]
            # try_cast: a value that no longer fits a pinned kind
            # coerces to null (the reference's lenient coercion) rather
            # than failing the batch under ANSI mode
            c = expr.try_cast(f"array<{target}>" if is_array else target)
            if kind == "u64":
                # decimal(20,0) happily holds negatives but Rust u64
                # deserialization rejects them — coerce to null (and
                # null out negative array elements) like any other
                # kind misfit
                if is_array:
                    c = F.transform(c, lambda e: F.when(e >= 0, e))
                else:
                    c = F.when(c >= 0, c)
            if kind == "text":
                # presence follows the INDEXED tokens, not raw nullness:
                # a value whose every token exceeds the tokenizer's
                # 255-byte cap (or is empty) indexes nothing and does
                # not "exist" — observable in the reference's own test
                # corpus (gharchive `exists: payload.commits.message`
                # = 59 of 60 non-empty values)
                def has_tok(v: Column) -> Column:
                    return F.exists(
                        F.split(v, r"[^\p{L}\p{N}]+"),
                        lambda t: (F.octet_length(t) >= 1)
                        & (F.octet_length(t) <= 255),
                    )

                present = (
                    F.exists(c, lambda x: has_tok(x))
                    if is_array
                    else has_tok(c)
                )
            else:
                present = (
                    F.exists(c, lambda x: x.isNotNull())
                    if is_array
                    else c.isNotNull()
                )
        cols.append(c.alias(fld.column))
        fields.append(fld)
        if presence_field is not None:
            parts = path.split(".")
            prefixes = [".".join(parts[: i + 1]) for i in range(len(parts))]
            presence_parts.append(
                F.when(
                    F.coalesce(present, F.lit(False)),
                    F.array(*[F.lit(p) for p in prefixes]),
                ).otherwise(_empty)
            )

    if presence_field is not None:
        if presence_parts:
            presence = F.array_distinct(F.flatten(F.array(*presence_parts)))
        else:
            # zero-field frame (an empty-mapping index's create-time
            # publish): a bare F.array() is ARRAY<VOID> and flatten
            # rejects it — emit a typed empty array instead
            presence = F.array().cast("array<string>")
        cols.append(presence.alias(presence_field))
    return df.select(*cols), fields


def dynamic_index_config(
    fields: list[DynField],
    doc_key: str,
    presence_field: str | None = PRESENCE_FIELD,
    source_column: str | None = None,
    time_field: str | None = None,
    num_partitions: int = 2,
    record: str = "position",
):
    """IndexConfig for a flattened dynamic corpus: every text path is a
    `default`-tokenized positional field (the setup's dynamic_mapping
    `record: position`), every typed leaf is a `raw` single-token field
    plus a fast docmap column; `field_options` carries the per-path fast
    metadata the searcher needs (normalizer, datetime precision)."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig

    fcs = []
    options: dict = {}
    stored = []
    for f in fields:
        col = f.column or f.path
        if not f.indexed:
            pass  # `indexed: false` — fast/stored column, no postings
        elif f.kind == "text":
            tok = f.tokenizer or "default"
            rec = f.record or (record if tok != "raw" else "basic")
            fcs.append(
                FieldConfig(f.path, tokenizer=tok, record=rec, column=col)
            )
        elif f.kind == "datetime":
            pass  # fast column only — range/sort field, not a term field
        elif f.kind == "mixed":
            # terms index the ORIGINAL token; sort/range use the numeric
            # coercion column
            fcs.append(
                FieldConfig(
                    f.path, tokenizer="raw", record="basic",
                    column=f.orig_column,
                )
            )
        else:
            fcs.append(
                FieldConfig(f.path, tokenizer="raw", record="basic", column=col)
            )
        opt = {"fast": True, "normalizer": f.normalizer, "column": col}
        if not f.indexed:
            opt["indexed"] = False
        if f.kind == "datetime" and f.precision:
            opt["datetime_precision"] = f.precision
        if f.kind == "mixed":
            opt["mixed"] = True
            opt["orig_column"] = f.orig_column
        options[f.path] = opt
        stored.append(col)
        if f.orig_column:
            stored.append(f.orig_column)
    if presence_field is not None:
        fcs.append(FieldConfig(presence_field, tokenizer="raw", record="basic"))
    if source_column is not None:
        stored.append(source_column)
    time_col = options.get(time_field, {}).get("column", time_field) if time_field else None
    return IndexConfig(
        fields=fcs,
        doc_key=doc_key,
        num_partitions=num_partitions,
        stored_columns=tuple(c for c in stored if c != time_col),
        time_column=time_col,
        field_options=options,
        presence_field=presence_field,
        stored_source=source_column,
    )
