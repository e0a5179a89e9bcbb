"""Ingest-time document transforms — the VRL processing hook.

The reference pipes every ingested doc through an optional VRL program
before doc mapping (`quickwit-indexing/src/actors/vrl_processing.rs`:
parse → transform → re-emit, aborting the doc on error). The
Spark-first re-expression keeps the same pipeline position (between
source and doc mapping / index build) but two execution tiers:

- declarative steps (`with_columns`, `rename`, `drop`, `where`) lower
  to Column expressions — Catalyst sees through them, so they fold into
  the scan (predicate pushdown, column pruning, codegen). This covers
  the bulk of real VRL programs (field renames, parsing via builtin
  functions, filtering).
- `map_batches(fn, schema)` is the escape hatch for genuinely
  imperative logic: an Arrow-batched `mapInPandas` hook (pandas
  DataFrame → pandas DataFrame per batch, never per-row Python).

Example — the moral equivalent of the VRL program
``.severity = upcase(.severity); del(.password); . = filter(.status != 404)``::

    t = (Transform()
         .with_columns(severity=F.upper("severity"))
         .drop("password")
         .where(F.col("status") != 404))
    build_index(spark, t(df), index_dir, cfg)     # or build_index(..., transform=t)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Transform:
    """Ordered document-transform pipeline. Steps apply in call order."""

    def __init__(self):
        self._steps: list = []

    # ------------------------------------------------------------ builders

    def with_columns(self, **exprs) -> "Transform":
        """Add/replace columns. Values are Columns or SQL expression
        strings (`F.expr`)."""
        cols = {
            k: (v if isinstance(v, Column) else F.expr(v)) for k, v in exprs.items()
        }
        self._steps.append(("with_columns", cols))
        return self

    def rename(self, **mapping) -> "Transform":
        """rename(old=new, ...)"""
        self._steps.append(("rename", dict(mapping)))
        return self

    def drop(self, *cols: str) -> "Transform":
        self._steps.append(("drop", cols))
        return self

    def where(self, cond) -> "Transform":
        """Keep docs matching `cond` (Column or SQL string) — the VRL
        `filter`/abort analog."""
        self._steps.append(("where", cond if isinstance(cond, Column) else F.expr(cond)))
        return self

    def map_batches(self, fn, schema) -> "Transform":
        """Imperative hook: `fn(pandas.DataFrame) -> pandas.DataFrame`
        applied per Arrow batch (`mapInPandas`). `schema` is the output
        schema (DDL string or StructType). Use only when the logic
        can't be a Column expression — this tier breaks codegen."""
        self._steps.append(("map_batches", (fn, schema)))
        return self

    # ------------------------------------------------------------- applier

    def __call__(self, df: DataFrame) -> DataFrame:
        for kind, arg in self._steps:
            if kind == "with_columns":
                df = df.withColumns(arg)
            elif kind == "rename":
                for old, new in arg.items():
                    df = df.withColumnRenamed(old, new)
            elif kind == "drop":
                df = df.drop(*arg)
            elif kind == "where":
                df = df.filter(arg)
            else:
                fn, schema = arg

                def run(batches, _fn=fn):
                    for pdf in batches:
                        yield _fn(pdf)

                df = df.mapInPandas(run, schema)
        return df
