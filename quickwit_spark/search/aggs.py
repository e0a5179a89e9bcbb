"""Aggregations over query matches (reference §2.7 surface).

The reference delegates aggregations to tantivy's ES-compatible module
(`quickwit-search/src/collector.rs:601-628`), computing per-split
intermediate states merged at the root (`collector.rs:565-585`) —
exactly Spark's partial/final hash aggregation. Supported set per
`docs/reference/aggregation.md:96-112`: bucket (histogram,
date_histogram, range, terms) and metric (avg/count/max/min/sum/stats,
percentiles, cardinality).

Every function takes the match DataFrame already joined to the docmap
(the "fast fields" — `matches(searcher, query)` builds it) and returns
a plain DataFrame, so Catalyst plans the whole thing: the posting scan,
the docmap join, and a 2-phase groupBy aggregation, with column pruning
down to the aggregated field only.

Scale note: at 10^12 docs the match set for sparse queries is small
(posting-driven); for match-all aggregations the plan degenerates to a
straight scan+groupBy of the docmap Parquet — the same shape the
reference handles with per-split aggregation workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def matches(searcher, query, time_range=None, columns: list[str] | None = None) -> DataFrame:
    """Matching docs joined to their docmap (fast-field) columns."""
    m = searcher.match_docs(query, time_range=time_range)
    docs = searcher.docs()
    if columns is not None:
        docs = docs.select("segment_id", "doc_id", "doc_key", *columns)
    return docs.join(m.select("segment_id", "doc_id"), ["segment_id", "doc_id"], "inner")


def terms_agg(df: DataFrame, field: str, size: int = 10) -> DataFrame:
    """ES `terms` bucket agg: top `size` values by doc_count.

    Deterministic order: doc_count desc, key asc (the reference breaks
    count ties by key). → (key, doc_count)."""
    return (
        df.groupBy(F.col(field).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def date_histogram(df: DataFrame, field: str, unit: str = "day") -> DataFrame:
    """ES `date_histogram` with calendar interval `unit` (day/hour/...).

    → (bucket timestamp, doc_count), min_doc_count=1 semantics (empty
    buckets omitted, like the reference's default)."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(field)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("bucket")
    )


def histogram(df: DataFrame, field: str, interval: float, offset: float = 0.0) -> DataFrame:
    """ES numeric `histogram`: bucket key = floor((v-offset)/interval)*interval+offset."""
    key = (
        F.floor((F.col(field) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    return (
        df.groupBy(key.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("bucket")
    )


def range_agg(df: DataFrame, field: str, ranges: list[tuple]) -> DataFrame:
    """ES `range` agg: half-open buckets [lo, hi). ranges = [(label, lo, hi)],
    lo/hi None = unbounded. → (key, doc_count) in given order."""
    expr = None
    c = F.col(field)
    for label, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= lo)
        if hi is not None:
            cond = cond & (c < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    order = {label: i for i, (label, _, _) in enumerate(ranges)}
    mapping = F.create_map(*[F.lit(x) for kv in order.items() for x in kv])
    return (
        df.select(expr.alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("_ord", mapping[F.col("key")])
        .orderBy("_ord")
        .drop("_ord")
    )


def stats_agg(df: DataFrame, field: str) -> DataFrame:
    """ES `stats` metric: one row (count, min, max, sum, avg)."""
    c = F.col(field).cast("double")
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
    )


def cardinality(df: DataFrame, field: str, exact: bool = False) -> DataFrame:
    """ES `cardinality` metric. exact=False uses HLL++ (the reference uses
    a sketch too); exact=True is the oracle-comparable variant."""
    c = F.col(field)
    agg = F.countDistinct(c) if exact else F.approx_count_distinct(c)
    return df.agg(agg.cast("long").alias("value"))


def terms_with_metrics(
    df: DataFrame,
    field: str,
    metrics: dict[str, tuple[str, str]],
    size: int = 10,
) -> DataFrame:
    """ES sub-aggregation: a `terms` bucket with nested metric aggs —
    `metrics` maps output name → (metric, column), metric ∈
    {avg,sum,min,max,count}. One 2-phase groupBy; the reference nests
    per-bucket aggregation states the same way (partial → final merge).
    → (key, doc_count, <metric cols…>)."""
    fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}
    aggs_ = [F.count(F.lit(1)).alias("doc_count")] + [
        fns[m](F.col(c).cast("double")).cast("double").alias(name)
        for name, (m, c) in metrics.items()
    ]
    return (
        df.groupBy(F.col(field).cast("string").alias("key"))
        .agg(*aggs_)
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def percentiles(
    df: DataFrame,
    field: str,
    qs: list[float] | None = None,
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """ES `percentiles` metric. The default mirrors the reference's
    t-digest sketch with Spark's mergeable `percentile_approx` — the
    right shape at scale (bounded per-group state, partial/final merge,
    never a full per-group sort/materialize). `exact=True` switches to
    `percentile` (linear interpolation, matches SQL percentile_cont) —
    the oracle-comparable variant, mirroring `cardinality(exact=)`."""
    qs = qs or [0.5, 0.9, 0.99]
    fn = (
        (lambda q: F.expr(f"percentile({field}, {q})"))
        if exact
        else (lambda q: F.percentile_approx(F.col(field), q, accuracy))
    )
    cols = [fn(q).cast("double").alias(f"p{int(q*100)}") for q in qs]
    return df.agg(*cols)
