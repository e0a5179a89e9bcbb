"""Token-budget shard packing for training-data pipelines.

Assigns documents to contiguous shards of ≈`budget` tokens in a
deterministic global order — the layout step before writing training
shards (sequence packing). shard_id = floor(running_token_total_before
/ budget), i.e. a document starts in the shard where its first token
lands; a document may straddle a boundary (the downstream packer deals
with intra-document splits).

Scale design — the distributed prefix sum, NOT a global window:
a naive `Window.orderBy(key)` with no partitionBy funnels the whole
corpus through ONE task. Instead:

1. `repartitionByRange(key)` so partitions hold contiguous key ranges;
2. per-partition token totals (one tiny row per partition) are
   collected and prefix-summed on the driver — O(#partitions), not
   O(#rows);
3. the within-partition running sum is a window partitioned BY the
   partition id (bounded state per task) plus the broadcast offset.

The result is identical to the single-partition window (the cumulative
sum over a global order does not depend on partition boundaries), and
the DuckDB oracle checks exactly that equivalence with a plain
`SUM() OVER (ORDER BY key)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_token_shards(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """→ input columns + (cum_tokens_before, shard_id), ordered-by-key
    semantics. Null/negative token counts count as 0."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = F.greatest(F.coalesce(F.col(token_col), F.lit(0)), F.lit(0)).cast(
        "long"
    )
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.withColumn("_toks", toks).repartitionByRange(
        n, F.col(key)
    ).withColumn("_pid", F.spark_partition_id())
    # one row per partition → driver prefix sum (the tiny side)
    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid").agg(F.sum("_toks").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    if offsets:
        off = F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
    else:  # empty input
        off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(key)
    cum_before = (F.sum("_toks").over(w) - F.col("_toks") + off).cast("long")
    return (
        part.withColumn("cum_tokens_before", cum_before)
        .withColumn(
            "shard_id", F.floor(F.col("cum_tokens_before") / budget).cast("long")
        )
        .drop("_toks", "_pid")
    )


def shard_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard doc/token totals for the packed layout."""
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.greatest(F.coalesce(F.col(token_col), F.lit(0)), F.lit(0))
        ).cast("long").alias("n_tokens"),
    )
