"""ES `aggs` JSON → DataFrame aggregation plans.

The reference accepts the ES aggregation DSL in `_search` bodies and
hands it to tantivy's aggregation module
(`quickwit-search/src/collector.rs:601-628`; supported set
`docs/reference/aggregation.md:96-112`, exercised by
`rest-api-tests/scenarii/es_compatibility/0004-term_aggregations.yaml`,
`0020-stats.yaml`). Here each top-level aggregation lowers to ONE
Catalyst plan: bucket expression → 2-phase groupBy → metric
expressions, so sub-aggregated metrics ride the same shuffle as their
bucket (the partial/final state merge the reference implements by
hand).

Supported: bucket terms / histogram / date_histogram / range, metric
avg / min / max / sum / value_count / stats / percentiles /
cardinality; one level of metric sub-aggs under a bucket (the
reference's common shape). Deeper bucket-in-bucket nesting raises
NotImplementedError.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_METRICS = {"avg", "min", "max", "sum", "value_count", "stats", "percentiles", "cardinality"}
_BUCKETS = {"terms", "histogram", "date_histogram", "range"}


def _metric_cols(kind: str, spec: dict, name: str) -> list[Column]:
    c = F.col(spec["field"])
    d = c.cast("double")
    if kind == "avg":
        return [F.avg(d).alias(name)]
    if kind == "min":
        return [F.min(d).alias(name)]
    if kind == "max":
        return [F.max(d).alias(name)]
    if kind == "sum":
        return [F.sum(d).alias(name)]
    if kind == "value_count":
        return [F.count(c).cast("long").alias(name)]
    if kind == "cardinality":
        return [F.approx_count_distinct(c).cast("long").alias(name)]
    if kind == "stats":
        return [
            F.count(d).alias(f"{name}_count"),
            F.min(d).alias(f"{name}_min"),
            F.max(d).alias(f"{name}_max"),
            F.sum(d).alias(f"{name}_sum"),
            F.avg(d).alias(f"{name}_avg"),
        ]
    if kind == "percentiles":
        pcts = spec.get("percents", [1, 5, 25, 50, 75, 95, 99])
        return [
            F.expr(f"percentile({spec['field']}, {p / 100.0})")
            .cast("double")
            .alias(f"{name}_p{p}".replace(".", "_"))
            for p in pcts
        ]
    raise NotImplementedError(f"metric aggregation {kind!r}")


def _sub_metric_cols(sub_aggs: dict) -> list[Column]:
    out: list[Column] = []
    for name, clause in (sub_aggs or {}).items():
        entries = {k: v for k, v in clause.items() if k != "aggs"}
        if "aggs" in clause or set(entries) - _METRICS:
            raise NotImplementedError(
                "only metric sub-aggregations are supported under a bucket"
            )
        (kind, spec), = entries.items()
        out.extend(_metric_cols(kind, spec, name))
    return out


def _one_agg(df: DataFrame, clause: dict) -> DataFrame:
    sub = clause.get("aggs")
    entries = {k: v for k, v in clause.items() if k != "aggs"}
    if len(entries) != 1:
        raise ValueError(f"aggregation clause needs exactly one type, got {sorted(entries)}")
    (kind, spec), = entries.items()

    if kind in _METRICS:
        if sub:
            raise NotImplementedError("metric aggregations take no sub-aggs")
        return df.agg(*_metric_cols(kind, spec, "value"))

    if kind not in _BUCKETS:
        raise NotImplementedError(f"aggregation {kind!r}")
    metric_cols = _sub_metric_cols(sub)
    count_col = F.count(F.lit(1)).alias("doc_count")

    if kind == "terms":
        key = F.col(spec["field"]).cast("string").alias("key")
        size = int(spec.get("size", 10))
        return (
            df.groupBy(key)
            .agg(count_col, *metric_cols)
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size)
        )
    if kind == "histogram":
        interval = float(spec["interval"])
        offset = float(spec.get("offset", 0.0))
        key = (
            F.floor((F.col(spec["field"]) - F.lit(offset)) / F.lit(interval))
            * F.lit(interval)
            + F.lit(offset)
        ).cast("double").alias("key")
        return df.groupBy(key).agg(count_col, *metric_cols).orderBy("key")
    if kind == "date_histogram":
        unit = spec.get("calendar_interval") or spec.get("fixed_interval") or "day"
        key = F.date_trunc(unit, F.col(spec["field"])).alias("key")
        return df.groupBy(key).agg(count_col, *metric_cols).orderBy("key")
    # range
    c = F.col(spec["field"])
    expr = None
    order: dict[str, int] = {}
    for i, r in enumerate(spec["ranges"]):
        lo, hi = r.get("from"), r.get("to")
        label = r.get("key") or f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= lo)
        if hi is not None:
            cond = cond & (c < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        order[label] = i
    mapping = F.create_map(*[F.lit(x) for kv in order.items() for x in kv])
    return (
        df.withColumn("key", expr)
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(count_col, *metric_cols)
        .withColumn("_ord", mapping[F.col("key")])
        .orderBy("_ord")
        .drop("_ord")
    )


def run_es_aggs(df: DataFrame, aggs: dict) -> dict[str, DataFrame]:
    """`df` = matches joined to fast fields (`aggs.matches`); `aggs` =
    the ES `aggs` body. → {agg name: result DataFrame}."""
    return {name: _one_agg(df, clause) for name, clause in aggs.items()}
