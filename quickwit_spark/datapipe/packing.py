"""Token-budget shard packing for training-data pipelines.

Assigns documents to contiguous shards of ≈`budget` tokens in a
deterministic global order — the layout step before writing training
shards (sequence packing). shard_id = floor(running_token_total_before
/ budget), i.e. a document starts in the shard where its first token
lands; a document may straddle a boundary (the downstream packer deals
with intra-document splits). `key` values must be unique — they define
the global order (ties would make "running total before" ambiguous).

Scale design — the distributed prefix sum, NOT a global window:
a naive `Window.orderBy(key)` with no partitionBy funnels the whole
corpus through ONE task. Instead:

1. deterministic range bucketing: partition boundaries come from
   `percentile_approx(key)` — a mergeable sketch computed in one
   deterministic aggregation — NOT from `repartitionByRange`, whose
   per-execution boundary *sampling* could disagree between the two
   passes below and silently misalign the offsets;
2. per-bucket token totals (one tiny row per bucket) are collected and
   prefix-summed on the driver — O(#buckets), not O(#rows);
3. the within-bucket running sum is a window partitioned BY the bucket
   id with an explicit ROWS frame (bounded state per task) plus the
   broadcast bucket offset.

The result equals the single-partition global window (a cumulative sum
over a global order does not depend on where it is cut), and the
DuckDB oracle checks exactly that equivalence with a plain
`SUM() OVER (ORDER BY key)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def pack_token_shards(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ input columns + (cum_tokens_before, shard_id), ordered-by-key
    semantics. Null/negative token counts count as 0; `key` must be
    unique."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = F.greatest(F.coalesce(F.col(token_col), F.lit(0)), F.lit(0)).cast(
        "long"
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if not isinstance(df.schema[key].dataType, NumericType):
        raise TypeError(
            f"pack_token_shards needs a numeric key for deterministic "
            f"range bucketing; got {df.schema[key].dataType}"
        )
    # deterministic bucket boundaries: an exact-enough quantile sketch
    # (mergeable, no row sampling — same boundaries on every pass)
    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = df.select(
            F.percentile_approx(key, qs, 100_000).alias("b")
        ).first()["b"] or []
    else:
        bounds = []
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(key) > F.lit(b)).cast("int")
    part = (
        df.withColumn("_toks", toks)
        .withColumn("_bkt", bucket)
        .repartition(max(n, 1), "_bkt")
    )
    # one row per bucket → driver prefix sum (the tiny side)
    totals = {
        r["_bkt"]: r["t"]
        for r in part.groupBy("_bkt").agg(F.sum("_toks").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for bkt in sorted(totals):
        offsets[bkt] = acc
        acc += totals[bkt] or 0
    if offsets:
        off = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
                ),
                F.col("_bkt"),
            ),
            F.lit(0),
        )
    else:  # empty input
        off = F.lit(0)
    w = (
        Window.partitionBy("_bkt")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("_toks").over(w) - F.col("_toks") + off).cast("long")
    return (
        part.withColumn("cum_tokens_before", cum_before)
        .withColumn(
            "shard_id", F.floor(F.col("cum_tokens_before") / budget).cast("long")
        )
        .drop("_toks", "_bkt")
    )


def shard_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard doc/token totals for the packed layout."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.coalesce(F.col(token_col), F.lit(0)), F.lit(0))
        ).cast("long").alias("n_tokens"),
    )
