"""Doc mapping: typed field coercion + unmapped-field modes.

Re-expresses the reference's doc-mapping layer
(`quickwit-doc-mapper/src/doc_mapping.rs:23-70` modes,
`field_mapping_entry.rs` typed entries with `coerce`): input documents
pass through the mapping before indexing, which

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

Everything lowers to Column expressions — no Python in the ingest path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPARK_TYPES = {
    "text": "string",
    "string": "string",
    "long": "bigint",
    "i64": "bigint",
    "double": "double",
    "f64": "double",
    "bool": "boolean",
    "timestamp": "timestamp",
}

DYNAMIC_COL = "_dynamic"
DYNAMIC_TEXT_COL = "_dynamic_text"


@dataclass
class TypedField:
    name: str
    type: str = "text"  # text | long | double | bool | timestamp
    coerce: bool = True  # reference default (`field_mapping_entry.rs` coerce)


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
            target = _SPARK_TYPES[f.type]
            if not f.coerce and in_types.get(f.name) != target:
                raise TypeError(
                    f"field {f.name!r}: input type {in_types.get(f.name)!r} != "
                    f"{target!r} and coerce is false"
                )
            cols.append(F.col(f.name).try_cast(target).alias(f.name))
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
