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


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    seq_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fixed-length context-window packing: lay the corpus out as one
    token stream in key order and split it into training sequences of
    exactly `seq_len` tokens. Each output row maps one contiguous
    token span of one document into one sequence:

        (seq_id, key, doc_tok_start, doc_tok_end, seq_pos_start)

    with `doc_tok_end` exclusive and
    `seq_pos_start = (global span start) mod seq_len`. A document
    whose tokens straddle a boundary emits one row per touched
    sequence (the standard concat-and-chunk pretraining packer —
    downstream slices token arrays by these spans; attention-mask
    resets at each span start are the reader's choice). Zero-token
    docs emit nothing.

    Scale: offsets come from `pack_token_shards`' distributed prefix
    sum (no global window); the span fan-out is `explode(sequence(
    first_seq, last_seq))` — a document adds ⌈n/seq_len⌉ rows, all
    arithmetic JVM-side.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    packed = pack_token_shards(
        df, key, token_col, budget=seq_len, num_partitions=num_partitions
    ).drop("shard_id")
    toks = F.greatest(F.coalesce(F.col(token_col), F.lit(0)), F.lit(0)).cast(
        "long"
    )
    off = F.col("cum_tokens_before")
    first_seq = F.floor(off / seq_len)
    last_seq = F.floor((off + toks - 1) / seq_len)
    out = (
        packed.withColumn("_n", toks)
        .filter(F.col("_n") > 0)
        .withColumn(
            "seq_id", F.explode(F.sequence(first_seq, last_seq))
        )
    )
    span_start = F.greatest(F.col("seq_id") * seq_len - off, F.lit(0))
    span_end = F.least(
        (F.col("seq_id") + 1) * seq_len - off, F.col("_n")
    )
    return out.select(
        F.col("seq_id").cast("long"),
        key,
        span_start.cast("long").alias("doc_tok_start"),
        span_end.cast("long").alias("doc_tok_end"),
        F.pmod(off + span_start, F.lit(seq_len))
        .cast("long")
        .alias("seq_pos_start"),
    )
