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
cardinality; metric sub-aggs under a bucket, and ONE bucket-in-bucket
level (outer×inner keys become a single composite groupBy — one
shuffle — with the inner rows flattened into (key, <inner> columns);
per-outer-bucket truncation for inner `terms` runs as a rank window).
Deeper nesting raises NotImplementedError.
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
        # approx (t-digest-like sketch, mergeable partial/final state) is
        # the scale default — the reference also answers percentiles from
        # a sketch; {"exact": true} opts into the full-sort variant for
        # oracle comparison (mirrors `cardinality`'s design)
        pcts = spec.get("percents", [1, 5, 25, 50, 75, 95, 99])
        if spec.get("exact"):
            mk = lambda p: F.expr(f"percentile({spec['field']}, {p / 100.0})")  # noqa: E731
        else:
            acc = int(spec.get("accuracy", 10000))
            mk = lambda p: F.percentile_approx(c, p / 100.0, acc)  # noqa: E731
        return [
            mk(p).cast("double").alias(f"{name}_p{p}".replace(".", "_"))
            for p in pcts
        ]
    raise NotImplementedError(f"metric aggregation {kind!r}")


def _sub_metric_cols(sub_aggs: dict) -> list[Column]:
    out: list[Column] = []
    for name, clause in (sub_aggs or {}).items():
        entries = {k: v for k, v in clause.items() if k != "aggs"}
        if "aggs" in clause or set(entries) - _METRICS:
            raise NotImplementedError(
                "only metric sub-aggregations are supported at this depth"
            )
        (kind, spec), = entries.items()
        out.extend(_metric_cols(kind, spec, name))
    return out


def _range_labels(spec: dict) -> list[str]:
    out = []
    for r in spec["ranges"]:
        lo, hi = r.get("from"), r.get("to")
        out.append(
            r.get("key")
            or f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        )
    return out


def _bucket_key(kind: str, spec: dict, alias: str) -> Column:
    """The group-key expression for a bucket aggregation."""
    if kind == "terms":
        return F.col(spec["field"]).cast("string").alias(alias)
    if kind == "histogram":
        interval = float(spec["interval"])
        offset = float(spec.get("offset", 0.0))
        return (
            F.floor((F.col(spec["field"]) - F.lit(offset)) / F.lit(interval))
            * F.lit(interval)
            + F.lit(offset)
        ).cast("double").alias(alias)
    if kind == "date_histogram":
        unit = spec.get("calendar_interval") or spec.get("fixed_interval") or "day"
        return F.date_trunc(unit, F.col(spec["field"])).alias(alias)
    if kind == "range":
        c = F.col(spec["field"])
        expr = None
        for r, label in zip(spec["ranges"], _range_labels(spec)):
            lo, hi = r.get("from"), r.get("to")
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (c >= lo)
            if hi is not None:
                cond = cond & (c < hi)
            expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        return expr.alias(alias)
    raise NotImplementedError(f"bucket aggregation {kind!r}")


def _nested_agg(
    df: DataFrame,
    outer_kind: str,
    outer_spec: dict,
    inner_name: str,
    inner_clause: dict,
) -> DataFrame:
    """Bucket-in-bucket: ONE composite groupBy on (outer, inner) keys,
    then window-based truncation — outer `terms` keeps its top `size`
    buckets by TOTAL doc_count, inner `terms` keeps top `size` rows per
    outer bucket. → (key, doc_count, <inner>_key, <inner>_doc_count,
    leaf metric cols…)."""
    from pyspark.sql import Window

    inner_entries = {k: v for k, v in inner_clause.items() if k != "aggs"}
    (inner_kind, inner_spec), = inner_entries.items()
    if inner_kind in _METRICS:
        raise ValueError("metric clause routed to _nested_agg")
    leaf_metrics = _sub_metric_cols(inner_clause.get("aggs"))
    okey = _bucket_key(outer_kind, outer_spec, "key")
    ikey = _bucket_key(inner_kind, inner_spec, f"{inner_name}_key")
    # docs with a NULL inner key still belong to their outer bucket (ES
    # counts them in the outer doc_count; they just form no inner
    # bucket) — group them too, compute outer totals, then surface them
    # as a null-keyed inner row rather than silently shrinking the outer
    grouped = (
        df.withColumn("key", okey)
        .withColumn(f"{inner_name}_key", ikey)
        .filter(F.col("key").isNotNull())
        .groupBy("key", f"{inner_name}_key")
        .agg(F.count(F.lit(1)).alias(f"{inner_name}_doc_count"), *leaf_metrics)
    )
    if outer_kind == "terms":
        # outer top-`size` selection must NOT rank all (outer×inner)
        # grouped rows through one unpartitioned window (a WindowExec
        # funnels everything into a single task at high-cardinality
        # outer keys). Instead: partial/final groupBy → global
        # TakeOrderedAndProject over ≤ |outer| total rows → broadcast
        # the ≤ size winners (with their totals) back — the same shape
        # the engine uses for top-k hits.
        size = int(outer_spec.get("size", 10))
        winners = (
            grouped.groupBy("key")
            .agg(F.sum(f"{inner_name}_doc_count").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size)
        )
        grouped = grouped.join(F.broadcast(winners), "key")
        outer_order = [F.col("doc_count").desc(), F.col("key").asc()]
    else:
        # non-terms outer buckets are never truncated; the per-key total
        # rides a key-partitioned window (parallel — no global funnel)
        w_tot = Window.partitionBy("key")
        grouped = grouped.withColumn(
            "doc_count", F.sum(f"{inner_name}_doc_count").over(w_tot)
        )
        outer_order = [F.col("key").asc()]
    if inner_kind == "terms":
        isize = int(inner_spec.get("size", 10))
        w_inner = Window.partitionBy("key").orderBy(
            F.col(f"{inner_name}_doc_count").desc(),
            F.col(f"{inner_name}_key").asc_nulls_last(),
        )
        grouped = grouped.withColumn("_ir", F.row_number().over(w_inner)).filter(
            F.col("_ir") <= isize
        )
    else:
        grouped = grouped.withColumn("_ir", F.col(f"{inner_name}_key").cast("string"))
    out_cols = ["key", "doc_count", f"{inner_name}_key", f"{inner_name}_doc_count"] + [
        c for c in grouped.columns
        if c not in (
            "key", "doc_count", f"{inner_name}_key", f"{inner_name}_doc_count",
            "_ir",
        )
    ]
    return grouped.orderBy(*outer_order, F.col("_ir").asc()).select(*out_cols)


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
    bucket_subs = {
        n: c
        for n, c in (sub or {}).items()
        if set(k for k in c if k != "aggs") & _BUCKETS
    }
    if bucket_subs:
        if len(bucket_subs) > 1 or len(bucket_subs) != len(sub):
            raise NotImplementedError(
                "exactly one bucket sub-aggregation (no metric siblings) supported"
            )
        (inner_name, inner_clause), = bucket_subs.items()
        return _nested_agg(df, kind, spec, inner_name, inner_clause)
    metric_cols = _sub_metric_cols(sub)
    count_col = F.count(F.lit(1)).alias("doc_count")
    key = _bucket_key(kind, spec, "key")

    if kind == "terms":
        size = int(spec.get("size", 10))
        return (
            df.groupBy(key)
            .agg(count_col, *metric_cols)
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size)
        )
    if kind in ("histogram", "date_histogram"):
        return df.groupBy(key).agg(count_col, *metric_cols).orderBy("key")
    # range: output in the declared range order
    order = {label: i for i, label in enumerate(_range_labels(spec))}
    mapping = F.create_map(*[F.lit(x) for kv in order.items() for x in kv])
    return (
        df.withColumn("key", key)
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
