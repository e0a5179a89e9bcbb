"""Streaming analytics over the ingest stream.

The reference's ingest path feeds dashboards with per-source doc/
byte-rate metrics (`quickwit-indexing` IndexerMetrics); on Spark the
same signals are Structured Streaming plans:

- `windowed_doc_counts`: watermarked tumbling-window counts per group —
  late events inside the watermark still land in their (closed-late)
  window, older ones are dropped, state is bounded by the watermark.
- `streaming_dedup`: exact streaming dedup on a content key using the
  built-in watermark-aware `dropDuplicatesWithinWatermark` (state
  bounded; JVM path — no Python).
- `sessionize`: gap-based session windows per key via
  `applyInPandasWithState` — the custom-stateful-operator escape hatch
  (Arrow-batched; state = open session per key, closed by timeout when
  a key goes quiet).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_doc_counts(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: tuple = ("lang",),
    content_col: str = "text",
) -> DataFrame:
    """→ streaming (window, *group_cols, doc_count, n_bytes)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.octet_length(content_col)).alias("n_bytes"),
        )
    )


def streaming_dedup(
    stream_df: DataFrame,
    content_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-ingested duplicate docs (same content hash) arriving
    within the watermark — the streaming face of `datapipe.exact_dedup`.
    State is the seen-hash set bounded by the watermark; all JVM."""
    return (
        stream_df.withColumn("content_hash", F.xxhash64(F.col(content_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        # restore the input schema: the helper column must not leak
        # into fixed-schema sinks downstream
        .drop("content_hash")
    )


SESSION_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, n_docs long"
)
_STATE_SCHEMA = "start long, end long, n long"


def _session_fn(key, pdfs, state: GroupState, gap_ms: int):
    """One group = one key. State = the open session (start, end, n) in
    epoch-millis. Emits closed sessions; the timeout closes the last."""
    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(end, unit="ms")],
                "n_docs": [n],
            }
        )
        return
    ts = pd.concat([pdf["_ts_ms"] for pdf in pdfs]).dropna().sort_values()
    ts = ts.to_numpy()
    # late-data drop: events at/below the current event-time watermark
    # are discarded (the watermark column is kept through the
    # projection so Spark tracks it into this operator; 0 = no
    # watermark configured)
    wm = state.getCurrentWatermarkMs()
    if wm:
        ts = ts[ts > wm]
    if len(ts) == 0 and not state.exists:
        return
    out = []
    if state.exists:
        start, end, n = state.get
    elif len(ts):
        start, end, n = int(ts[0]), int(ts[0]), 0
    else:
        return
    for t in ts:
        t = int(t)
        if t - end > gap_ms:
            out.append((start, end, n))
            start, end, n = t, t, 1
        else:
            end = max(end, t)
            n += 1
    state.update((start, end, n))
    state.setTimeoutDuration(gap_ms)
    if out:
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in out],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in out],
                "n_docs": [n for _, _, n in out],
            }
        )


def sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str = "warc_ts",
    gap: str = "30 seconds",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Gap-based session windows per key (custom stateful operator via
    applyInPandasWithState). A session closes when `gap` passes without
    an event for the key (processing-time timeout) or when a later
    event for the key arrives beyond the gap.
    → streaming (key, session_start, session_end, n_docs)."""
    gap_ms = int(_duration_ms(gap))
    prepared = (
        # null event times cannot be sessionized (NaN would crash the
        # int() conversion and crash-loop the replayed micro-batch)
        stream_df.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).cast("string").alias("key"),
            # keep the WATERMARKED column itself (same name, no alias)
            # so event-time tracking reaches the stateful operator —
            # projecting it away made the watermark parameter inert
            F.col(ts_col),
            (F.col(ts_col).cast("double") * 1000).cast("long").alias("_ts_ms"),
        )
    )
    return prepared.groupBy("key").applyInPandasWithState(
        lambda key, pdfs, state: _session_fn(key, pdfs, state, gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _duration_ms(spec: str) -> float:
    n, unit = spec.split()
    mult = {
        "millisecond": 1,
        "milliseconds": 1,
        "second": 1000,
        "seconds": 1000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
    }[unit]
    return float(n) * mult
