"""Jaeger-workflow trace queries over span docs.

The reference's Jaeger integration answers FindTraceIDs with a
dedicated tantivy collector
(qw/quickwit-search/src/find_trace_ids_collector.rs): among all spans
matching a query, select the `num_traces` most recent TRACES — i.e.
dedupe spans per trace id keeping each trace's max span timestamp,
order by that timestamp desc with trace id as tie-break ("top k
elements with duplicates", collector doc comment). Per segment it
keeps a bounded (term_ord → max timestamp) map and merge_fruits
re-merges the per-segment winners.

Spark-native re-expression: groupBy(trace_id).agg(max(ts)) + top-k —
the partial aggregation IS the per-segment bounded map (map-side
combine dedupes before the shuffle) and the final top-k is
merge_fruits, so the plan has the same two-level shape the collector
hand-codes, with the shuffle carrying one row per (partition, trace)
rather than per span. At 100 TB of spans that cardinality reduction
is what makes the query feasible; no window functions, no driver
work beyond the k winners.

Input: any span DataFrame with trace-id + timestamp columns — e.g.
`sources.otlp.otlp_traces_docs` output (trace_id,
span_start_timestamp_nanos), which is the same doc shape the
reference's otel-traces-v0_9 index stores. Callers pre-filter the
spans (service/tag/duration predicates) exactly like the collector
runs under a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_trace_ids(
    spans: DataFrame,
    num_traces: int,
    trace_id_col: str = "trace_id",
    timestamp_col: str = "span_start_timestamp_nanos",
) -> DataFrame:
    """→ (trace_id, span_timestamp): the `num_traces` most recent
    traces among the given (already query-filtered) spans, each with
    its latest matching span's timestamp; ordered most-recent-first,
    trace id ascending on ties (find_trace_ids_collector.rs Span::cmp:
    timestamp.reverse().then(trace_id))."""
    if num_traces <= 0:
        raise ValueError("find_trace_ids: num_traces must be positive")
    return (
        spans.groupBy(F.col(trace_id_col).alias("trace_id"))
        .agg(F.max(timestamp_col).alias("span_timestamp"))
        .orderBy(F.desc("span_timestamp"), "trace_id")
        .limit(num_traces)
    )
