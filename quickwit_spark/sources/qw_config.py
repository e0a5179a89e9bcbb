"""Reference index-config ingestion — build an index FROM a quickwit
`doc_mapping` document.

A user of the reference carries an index config (`index_id`,
`doc_mapping.field_mappings`, `tag_fields`, `timestamp_field`,
`search_settings.default_search_fields`). This module translates that
public config shape (`quickwit-doc-mapper/src/doc_mapping.rs:26-47`,
`field_mapping_type.rs:28-109`) onto the dynamic flattener + builder:

  - explicit `field_mappings` become `mapped` overrides for
    `flatten_dynamic` (datetime input formats + fast precision, raw
    tokenizers, typed leaves); `object` entries recurse into dot paths;
    `json` subtrees stay dynamic,
  - `concatenate` entries become builder concat fields with parent-path
    source expansion and `include_dynamic_fields`,
  - `tag_fields` are validated with the reference's type rules (raw
    text / u64 / i64 only — `default_doc_mapper.rs` tag validation,
    exercised by `rest-api-tests/scenarii/tag_fields/_setup`) and
    mapped to their physical columns,
  - `timestamp_field` drives manifest time pruning.

Everything lowers to the same schema-first Column pipeline as
`sources.dynamic` — no per-doc Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from quickwit_spark.search.source_render import (
    validate_binary_format,
    validate_datetime_output_format,
    validate_numeric_output_format,
)


def _num_out(ent: dict) -> str:
    """`NumericOutputFormat` (`field_mapping_entry.rs:236-241`)."""
    return validate_numeric_output_format(ent.get("output_format", "number"))


# tag fields must be raw-term single-token types (the reference rejects
# anything an analyzer would split or that has no total term order)
_TAG_OK_NUMERIC = {"u64", "i64"}
_TAG_BAD_TYPES = {"f64", "bool", "json", "object", "ip", "bytes", "datetime"}
_RAW_TOKENIZERS = {"raw", "raw_lowercase"}


@dataclass
class ConcatSpec:
    name: str
    sources: tuple
    tokenizer: str = "default"
    include_dynamic: bool = False


@dataclass
class MappingSpecs:
    mapped: dict = dc_field(default_factory=dict)  # path -> flatten spec
    concat: list = dc_field(default_factory=list)  # [ConcatSpec]
    tag_fields: tuple = ()
    timestamp_field: str | None = None
    explicit_roots: tuple = ()  # top-level names with explicit mappings


def _walk_entries(entries: list, prefix: str, mapped: dict, concat: list):
    for ent in entries or []:
        name = ent["name"]
        path = f"{prefix}.{name}" if prefix else name
        typ = ent.get("type", "text")
        card = None
        if typ.startswith("array<") and typ.endswith(">"):
            # reference Cardinality::MultiValued (`field_mapping_type.rs`
            # `Array(..)` — any leaf type, not object/concatenate)
            inner = typ[6:-1]
            if inner in ("object", "json", "concatenate") or inner.startswith(
                "array<"
            ):
                raise ValueError(
                    f"unsupported field type {typ!r} for {path!r}"
                )
            typ = inner
            card = "multi"
        if typ == "object":
            _walk_entries(ent.get("field_mappings"), path, mapped, concat)
        elif typ == "concatenate":
            concat.append(
                ConcatSpec(
                    name=path,
                    sources=tuple(ent.get("concatenate_fields") or ()),
                    tokenizer=ent.get("tokenizer", "default"),
                    include_dynamic=bool(ent.get("include_dynamic_fields")),
                )
            )
        elif typ == "json":
            pass  # subtree stays dynamic (per-leaf dot paths)
        elif typ == "datetime":
            mapped[path] = {
                "kind": "datetime",
                # the reference's fast datetime precision defaults to
                # seconds (`date_time_format.rs` DateTimePrecision)
                "precision": ent.get("fast_precision", "seconds"),
                "formats": tuple(ent.get("input_formats") or ()),
                "output": validate_datetime_output_format(
                    ent.get("output_format", "rfc3339")
                ),
            }
        elif typ == "text":
            spec: dict = {"kind": "text", "normalizer": "raw"}
            if ent.get("tokenizer"):
                spec["tokenizer"] = ent["tokenizer"]
            if ent.get("record"):
                spec["record"] = ent["record"]
            fast = ent.get("fast")
            if isinstance(fast, dict) and fast.get("normalizer"):
                spec["normalizer"] = fast["normalizer"]
            mapped[path] = spec
        elif typ == "u64":
            # full unsigned range: exact decimal(20,0), not lossy i64
            mapped[path] = {"kind": "u64", "output": _num_out(ent)}
        elif typ == "i64":
            mapped[path] = {"kind": "long", "output": _num_out(ent)}
        elif typ == "f64":
            mapped[path] = {"kind": "double", "output": _num_out(ent)}
        elif typ == "bool":
            mapped[path] = {"kind": "bool"}
        elif typ in ("ip", "bytes"):
            # indexed as raw string terms; ip range math uses the
            # engine's ip sort-key normalization (`index/mapping.py`);
            # `caps` drives the _field_caps type report
            mapped[path] = {"kind": "text", "normalizer": "raw", "caps": typ}
            if typ == "bytes":
                mapped[path]["input"] = validate_binary_format(
                    ent.get("input_format", "base64")
                )
                mapped[path]["output"] = validate_binary_format(
                    ent.get("output_format", "base64")
                )
        else:
            raise ValueError(f"unsupported field type {typ!r} for {path!r}")
        if card and path in mapped:
            mapped[path]["card"] = card
        if ent.get("indexed") is False and path in mapped:
            # reference `indexed: false` (field_mapping_entry.rs): the
            # field keeps its fast/stored column but gets NO postings;
            # term-level queries on it are rejected at planning time
            mapped[path]["indexed"] = False


DOC_LENGTH_FIELD = "_doc_length"


def add_document_size(flat_df, fields: list, source_column: str):
    """`store_document_size: true` — a fast-only `{DOC_LENGTH_FIELD}`
    long per doc (byte size of the ingested JSON line), aggregatable
    but never part of `_source` (reference doc_mapping option; its
    `aggregations/0002-doc-len` scenario sums it)."""
    from pyspark.sql import functions as F

    from quickwit_spark.sources.dynamic import DynField

    flat = flat_df.withColumn(
        DOC_LENGTH_FIELD,
        F.octet_length(F.col(source_column)).cast("long"),
    )
    return flat, list(fields) + [
        DynField(DOC_LENGTH_FIELD, "long", column=DOC_LENGTH_FIELD)
    ]


def parse_doc_mapping(dm: dict) -> MappingSpecs:
    """Validate + translate a reference `doc_mapping` dict."""
    mapped: dict = {}
    concat: list = []
    _walk_entries(dm.get("field_mappings"), "", mapped, concat)

    by_name = {}

    def index_entries(entries, prefix):
        for ent in entries or []:
            path = f"{prefix}.{ent['name']}" if prefix else ent["name"]
            by_name[path] = ent
            if ent.get("type") == "object":
                index_entries(ent.get("field_mappings"), path)

    index_entries(dm.get("field_mappings"), "")

    tag_fields = tuple(dm.get("tag_fields") or ())
    for tf in tag_fields:
        ent = by_name.get(tf)
        if ent is None:
            raise ValueError(
                f"tag field {tf!r} must be an explicitly mapped field "
                "(dynamic paths cannot be tags)"
            )
        typ = ent.get("type", "text")
        if typ.startswith("array<") and typ.endswith(">"):
            # tags extract term VALUES — multivalued fields contribute
            # each element, same rules as the single-valued inner type
            typ = typ[6:-1]
        if typ in _TAG_BAD_TYPES:
            raise ValueError(f"tag field {tf!r} has disallowed type {typ!r}")
        if typ == "text":
            tok = ent.get("tokenizer", "default")
            if tok not in _RAW_TOKENIZERS:
                raise ValueError(
                    f"tag field {tf!r} uses analyzing tokenizer {tok!r}; "
                    "tags require raw text"
                )
        elif typ not in _TAG_OK_NUMERIC:
            raise ValueError(f"tag field {tf!r} has disallowed type {typ!r}")

    # timestamp-field validation (reference `validate_timestamp_field`,
    # `doc_mapper_impl.rs:100-126`): must be an explicitly mapped
    # single-valued datetime FAST field — a dynamic path doesn't count
    ts = dm.get("timestamp_field")
    if ts:
        if ts.startswith((".", "\\.")) or ts.endswith("."):
            raise ValueError(
                f"timestamp field {ts!r} should not start or end with a `.`"
            )
        ent = by_name.get(ts)
        if ent is None:
            raise ValueError(
                f"could not find timestamp field {ts!r} in field mappings"
            )
        typ = ent.get("type", "text")
        if typ == "array<datetime>":
            raise ValueError(f"timestamp field {ts!r} should be single-valued")
        if typ != "datetime":
            raise ValueError(f"timestamp field {ts!r} should be a datetime field")
        if not ent.get("fast", False):
            raise ValueError(f"timestamp field {ts!r} should be a fast field")

    return MappingSpecs(
        mapped=mapped,
        concat=concat,
        tag_fields=tag_fields,
        timestamp_field=dm.get("timestamp_field"),
        explicit_roots=tuple(
            {(ent["name"].split(".")[0]) for ent in dm.get("field_mappings") or []}
        ),
    )


def validate_search_settings(dm: dict, search_settings: dict | None):
    """Reference default_search_fields validation
    (`default_doc_mapper.rs` build errors, asserted by
    `scenarii/default_search_fields/0002`): a default field must be an
    explicitly mapped indexed field, a path under a `json` field, or —
    in dynamic mode with an indexed dynamic mapping — any free path."""
    if not search_settings:
        return
    mode = dm.get("mode", "dynamic")
    dyn = dm.get("dynamic_mapping") or {}
    dyn_indexed = dyn.get("indexed", True)

    entries: dict[str, dict] = {}

    def walk(fms, prefix):
        for ent in fms or []:
            path = f"{prefix}.{ent['name']}" if prefix else ent["name"]
            entries[path] = ent
            if ent.get("type") == "object":
                walk(ent.get("field_mappings"), path)

    walk(dm.get("field_mappings"), "")

    for f in search_settings.get("default_search_fields") or []:
        ent = entries.get(f)
        if ent is not None:
            if ent.get("indexed") is False:
                raise ValueError(
                    f"default search field `{f}` is not indexed"
                )
            continue
        # longest explicit prefix decides: under json → fine; under any
        # other explicit type → unknown even in dynamic mode
        prefix_ent = None
        parts = f.split(".")
        for i in range(len(parts) - 1, 0, -1):
            prefix_ent = entries.get(".".join(parts[:i]))
            if prefix_ent is not None:
                break
        if prefix_ent is not None:
            if prefix_ent.get("type") == "json":
                continue
            raise ValueError(f"unknown default search field `{f}`")
        if mode != "dynamic":
            raise ValueError(f"unknown default search field `{f}`")
        if not dyn_indexed:
            raise ValueError(
                f"default search field `{f}` is not indexed"
            )


def _expand_sources(spec: ConcatSpec, fields, specs: MappingSpecs) -> list:
    """Concat source names → physical leaf columns: a name matches its
    own path and every dot path under it (json/object subtrees);
    `include_dynamic_fields` adds every leaf not rooted in an explicit
    mapping. Datetime leaves are excluded (the reference's concatenate
    does not accept datetime sources)."""
    roots = set(specs.explicit_roots)
    cols: list[str] = []
    for f in fields:
        if f.kind == "datetime":
            continue
        under = any(
            f.path == s or f.path.startswith(s + ".") for s in spec.sources
        )
        is_dynamic = f.path.split(".")[0] not in roots
        if under or (spec.include_dynamic and is_dynamic):
            if f.kind == "mixed" and getattr(f, "orig_column", None):
                # a mixed field's `column` is its numeric-coercion
                # decimal — concatenating that would index
                # "1.000000000" instead of the document's own token;
                # the reference's concatenate indexes the original
                # JSON tokens, kept in orig_column
                cols.append(f.orig_column)
            else:
                cols.append(f.column or f.path)
    return cols


def _render_spec(spec: dict) -> dict | None:
    """`_source` leaf-render spec for one mapped field (consumed by
    `search.source_render.build_source_renderers`): the reference
    re-serializes every explicitly mapped leaf through its type +
    output_format when rebuilding fetched docs
    (`tantivy_val_to_json.rs`); dynamic paths stay verbatim."""
    kind = spec.get("kind")
    if kind == "datetime":
        return {
            "kind": "datetime",
            "output": spec.get("output", "rfc3339"),
            "formats": list(spec.get("formats") or ()),
        }
    if kind == "u64":
        return {"kind": "u64", "output": spec.get("output", "number")}
    if kind == "long":
        return {"kind": "i64", "output": spec.get("output", "number")}
    if kind == "double":
        return {"kind": "f64", "output": spec.get("output", "number")}
    if kind == "bool":
        return {"kind": "bool"}
    caps = spec.get("caps")
    if caps == "ip":
        return {"kind": "ip"}
    if caps == "bytes":
        return {
            "kind": "bytes",
            "input": spec.get("input", "base64"),
            "output": spec.get("output", "base64"),
        }
    return None


def reference_index_config(
    dm: dict,
    fields,
    doc_key: str,
    source_column: str | None = None,
    num_partitions: int = 1,
    record: str = "position",
):
    """IndexConfig for a flattened corpus under a reference doc_mapping.
    `fields` is the DynField inventory from `flatten_dynamic` (called
    with `parse_doc_mapping(dm).mapped`)."""
    from quickwit_spark.index.builder import FieldConfig
    from quickwit_spark.sources.dynamic import (
        PRESENCE_FIELD,
        dynamic_index_config,
    )

    specs = parse_doc_mapping(dm)
    cfg = dynamic_index_config(
        fields,
        doc_key=doc_key,
        presence_field=PRESENCE_FIELD,
        source_column=source_column,
        time_field=specs.timestamp_field,
        num_partitions=num_partitions,
        record=record,
    )
    cfg.mapping_mode = dm.get("mode", "dynamic")
    for path, spec in specs.mapped.items():
        if spec.get("caps") and path in (cfg.field_options or {}):
            cfg.field_options[path]["caps"] = spec["caps"]
        render = _render_spec(spec)
        if render is not None:
            cfg.field_options.setdefault(path, {})["render"] = render
        # full mapped spec (kind/card/formats/output), persisted with the
        # config so a LATER mapping generation can build the
        # old-type -> new-type converters of `search.source_convert`
        # (tuples normalized for a stable json round-trip)
        mapspec = {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in spec.items()
        }
        cfg.field_options.setdefault(path, {})["mapspec"] = mapspec
    by_path = {f.path: f for f in fields}
    for cs in specs.concat:
        srcs = _expand_sources(cs, fields, specs)
        if srcs:
            cfg.fields.append(
                FieldConfig(
                    cs.name,
                    tokenizer=cs.tokenizer,
                    record="basic",
                    sources=tuple(srcs),
                )
            )
    cfg.tag_fields = tuple(
        (by_path[tf].column or tf) if tf in by_path else tf
        for tf in specs.tag_fields
    )
    return cfg
