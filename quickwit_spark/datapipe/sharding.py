"""Deterministic global shuffle into training shards.

The last step of a training-data pipeline: write the curated corpus
as N shards whose concatenation is a pseudo-random permutation of the
documents (so a sequential reader sees well-mixed data), with the
placement DETERMINISTIC — a function of (key, seed) only — so reruns,
task retries, and incremental rebuilds produce byte-identical shards
(the property TFRecord/WebDataset-style pipelines get from seeded
shuffles, here without any single-node materialization).

    shard_id(key) = mix(key, seed) mod num_shards
    pos(key)      = rank of mix(key, seed) within the shard
                    (ties broken by key — total order, no
                    partitioning ambiguity)

Scale design: the mix is a pure JVM column expression (engine-portable
hash + full-period LCG stride, as in `mixing._uniform`), so shard
assignment happens at scan speed with NO shuffle; the within-shard
rank is a window PARTITIONED BY shard — one task per shard, bounded
state ≈ corpus/num_shards rows. Choose num_shards ≳ executor count
(you want that anyway for training-reader parallelism) and no task
sees more than one shard's rows. There is exactly one shuffle — the
hash repartition into shards — which the subsequent
`write.partitionBy` reuses. Never a global `orderBy`.

Determinism is also what makes the DuckDB oracle possible: the gate
replays every row's (shard_id, pos) from the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickwit_spark.datapipe.portable import P31, perm_constants, portable_hash


def _mix(key_col, seed: int):
    """Deterministic 31-bit mix of (key, seed): portable string hash
    of 'key:seed', strided by a full-period LCG step so consecutive
    keys scatter (see mixing._uniform for why the stride matters)."""
    a, b = perm_constants(seed + 1)[seed]
    h = portable_hash(F.concat(key_col.cast("string"), F.lit(f":{seed}")))
    return (F.pmod(h, F.lit(P31)) * F.lit(a) + F.lit(b)) % F.lit(P31)


def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    key: str = "doc_id",
    *,
    seed: int = 0,
    marks: bool = False,
) -> DataFrame:
    """Assign every row a (shard_id, pos) under the deterministic
    global shuffle. Default: input columns + shard_id + pos;
    `marks=True` returns only (key, shard_id, pos) for auditing/
    oracle checks."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    clash = {"shard_id", "pos", "_mix"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)}; rename them "
            "— shuffle_shards writes shard_id/pos and would silently "
            "overwrite"
        )
    mixed = _mix(F.col(key), seed)
    w = Window.partitionBy("shard_id").orderBy("_mix", key)
    out = (
        df.withColumn("_mix", mixed)
        .withColumn(
            "shard_id", F.pmod(F.col("_mix"), F.lit(num_shards)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_mix")
    )
    if marks:
        return out.select(key, "shard_id", "pos")
    return out


def write_shards(
    df: DataFrame,
    out_dir: str,
    num_shards: int,
    key: str = "doc_id",
    *,
    seed: int = 0,
) -> None:
    """Materialize the shuffled shards: one directory per shard_id,
    rows stored in pos order (`sortWithinPartitions` after a hash
    repartition ON shard_id — the single shuffle; the writer then
    splits by the same column without another exchange)."""
    out = shuffle_shards(df, num_shards, key, seed=seed)
    (
        out.repartition(num_shards, "shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


def surrogate_key(
    df: DataFrame,
    order_cols: list[str],
    out: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Dense 1-based numeric surrogate key in `order_cols` order —
    WITHOUT a global window. The first order column must be numeric
    (use a hash); remaining columns break ties.

    The distributed rank is the same two-pass shape as
    `packing.pack_token_shards`: deterministic bucket boundaries from
    a `percentile_approx` sketch of the first column (mergeable, no
    row sampling — identical boundaries on every pass), per-bucket
    counts prefix-summed on the driver (#buckets rows), then a
    row_number window PARTITIONED BY bucket. Bounded state per task;
    never one task ranking the whole corpus."""
    lead = order_cols[0]
    from pyspark.sql.types import NumericType

    if not isinstance(df.schema[lead].dataType, NumericType):
        raise TypeError(
            f"surrogate_key needs a numeric first order column, got "
            f"{lead}: {df.schema[lead].dataType}"
        )
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    if n > 1:
        qs = [i / n for i in range(1, n)]
        bounds = df.select(
            F.percentile_approx(lead, qs, 100_000).alias("b")
        ).first()["b"] or []
    else:
        bounds = []
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(lead) > F.lit(b)).cast("int")
    part = df.withColumn("_bkt", bucket).repartition(max(n, 1), "_bkt")
    totals = {
        r["_bkt"]: r["c"]
        for r in part.groupBy("_bkt").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for bkt in sorted(totals):
        offsets[bkt] = acc
        acc += totals[bkt]
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
    else:
        off = F.lit(0)
    w = Window.partitionBy("_bkt").orderBy(*order_cols)
    return (
        part.withColumn(
            out, (F.row_number().over(w) + off).cast("long")
        ).drop("_bkt")
    )
