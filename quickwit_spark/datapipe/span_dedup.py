"""Exact-substring dedup via duplicated token windows.

The public Lee et al. 2021 stage ("Deduplicating Training Data Makes
Language Models Better"): long verbatim repeats across a corpus
(boilerplate, licenses, mirrored passages) are removed at SUBSTRING
granularity, not document granularity. The suffix-array construction
of the paper is approximated here the standard distributed way: every
`window`-token sliding window is matched corpus-wide; all occurrences
beyond the globally first (by key, then window start) are marked, and
per document the marked windows are merged into maximal spans
(interval union) that get cut from the text.

Semantics (mirrored by the DuckDB oracle in `__spark_entry__` for the
stats; char-level surgery is pytest-verified):

- tokens: ASCII-whitespace split, case-SENSITIVE (verbatim repeats),
  empties dropped; documents shorter than `window` tokens emit no
  windows and are never cut.
- a window occurrence is ``(key, start)`` with ``start`` the 0-based
  token index; the kept occurrence of a duplicated window string is
  the smallest (key, start).
- spans: marked starts merged while next_start < current_span_end
  (same-length windows ⇒ the classic gaps-and-islands running-max);
  ``tokens_removed`` = Σ span lengths, ``n_spans_cut`` = island count.
- the cut removes the chars from the first token's start through the
  last token's end of each span plus any whitespace run immediately
  after (so two cuts never leave doubled separators).

Scale: winner selection is a groupBy on the window string (map-side
partial min collapses hot boilerplate windows before the shuffle); the
occurrence-marking join is also keyed by the window string, so a
mega-hot window concentrates its occurrence rows in one join partition
— AQE skew-join splitting (enabled in `session.get_spark`) is the
mitigation there; spans then collect per document (skew-free key) and
the char surgery is an Arrow batch pass.
Window strings are ~window·5 bytes of shuffle key — at 10^12 docs,
shuffle an 8-byte hash of the window instead (collisions only cause
over-removal; Lee et al. accept this) — kept as the raw string here so
the oracle reproduces the grouping exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _windows(df: DataFrame, key: str, text_col: str, window: int) -> DataFrame:
    """One row per token window: (key, start, wstr)."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    cnt = F.size(toks) - F.lit(window - 1)
    wins = F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.struct(
                (i - 1).cast("int").alias("start"),
                F.concat_ws(" ", F.slice(toks, i, window)).alias("wstr"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,wstr:string>>"))
    ex = df.select(F.col(key), F.explode(wins).alias("w"))
    return ex.select(key, F.col("w.start").alias("start"), F.col("w.wstr").alias("wstr"))


def _marked_starts(
    df: DataFrame, key: str, text_col: str, window: int
) -> DataFrame:
    """(key, start) of every duplicated-window occurrence that is NOT
    the global first occurrence of its window string."""
    wins = _windows(df, key, text_col, window)
    firsts = (
        wins.groupBy("wstr")
        .agg(
            F.min(F.struct(F.col(key), F.col("start"))).alias("_first"),
            F.count(F.lit(1)).alias("_c"),
        )
        .filter(F.col("_c") > 1)
        .select(
            "wstr",
            F.col("_first")[key].alias("_fk"),
            F.col("_first")["start"].alias("_fs"),
        )
    )
    return (
        wins.join(firsts, "wstr")
        .filter((F.col(key) != F.col("_fk")) | (F.col("start") != F.col("_fs")))
        .select(key, "start")
    )


def _merge_spans(starts: list, window: int) -> list:
    spans = []
    for s in sorted(starts):
        if spans and s < spans[-1][1]:
            spans[-1][1] = max(spans[-1][1], s + window)
        else:
            spans.append([s, s + window])
    return spans


def duplicate_span_stats(
    df: DataFrame, key: str, text_col: str = "text", window: int = 50
) -> DataFrame:
    """→ (key, n_windows, n_dup_windows, n_spans_cut, tokens_removed)
    for every input document (zeros for untouched docs)."""
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: t != "",
    )
    base = df.select(
        F.col(key),
        F.greatest(F.size(toks) - F.lit(window - 1), F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )
    marked = _marked_starts(df, key, text_col, window)
    # gaps-and-islands over the sorted starts (array fold — the marked
    # set per doc is small)
    per_doc = marked.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_dup_windows"),
        F.sort_array(F.collect_list("start")).alias("_starts"),
    )
    zero = F.struct(
        F.lit(-1).cast("long").alias("end"),
        F.lit(0).cast("long").alias("spans"),
        F.lit(0).cast("long").alias("toks"),
    )

    def step(a, s):
        overlap = s < a["end"]
        new_end = F.greatest(a["end"], (s + window).cast("long"))
        return F.struct(
            F.when(overlap, new_end)
            .otherwise((s + window).cast("long"))
            .alias("end"),
            (a["spans"] + F.when(overlap, 0).otherwise(1)).alias("spans"),
            (
                a["toks"]
                + F.when(overlap, new_end - a["end"]).otherwise(F.lit(window))
            ).alias("toks"),
        )

    folded = per_doc.select(
        key,
        "n_dup_windows",
        F.aggregate(F.col("_starts"), zero, step).alias("_agg"),
    ).select(
        key,
        "n_dup_windows",
        F.col("_agg.spans").alias("n_spans_cut"),
        F.col("_agg.toks").alias("tokens_removed"),
    )
    return (
        base.join(folded, key, "left")
        .select(
            key,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("n_spans_cut", F.lit(0)).cast("long").alias("n_spans_cut"),
            F.coalesce("tokens_removed", F.lit(0)).cast("long").alias("tokens_removed"),
        )
    )


def duplicate_span_dedup(
    df: DataFrame, key: str, text_col: str = "text", window: int = 50
) -> DataFrame:
    """→ (key, text_dedup, n_spans_cut, tokens_removed): documents with
    their duplicated spans cut out (char-exact surgery; see module
    docstring)."""
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    marked = _marked_starts(df, key, text_col, window).groupBy(key).agg(
        F.sort_array(F.collect_list("start")).alias("_starts")
    )
    src = df.select(F.col(key), F.col(text_col)).join(marked, key, "left")

    schema = T.StructType(
        [
            df.schema[key],
            T.StructField("text_dedup", T.StringType()),
            T.StructField("n_spans_cut", T.LongType()),
            T.StructField("tokens_removed", T.LongType()),
        ]
    )

    def cut(batches):
        tok_re = _re.compile(r"\S+", _re.ASCII)
        for pdf in batches:
            texts, spans_out, toks_out = [], [], []
            for text, starts in zip(pdf[text_col], pdf["_starts"]):
                text = text if isinstance(text, str) else ""
                if starts is None or len(starts) == 0:
                    texts.append(text)
                    spans_out.append(0)
                    toks_out.append(0)
                    continue
                toks = list(tok_re.finditer(text))
                spans = _merge_spans(list(starts), window)
                pieces, pos, removed = [], 0, 0
                for a, b in spans:
                    cut_from = toks[a].start()
                    cut_to = toks[b - 1].end()
                    # swallow the following ASCII-whitespace run ONLY —
                    # a Unicode space (NBSP etc.) is a token character
                    # under the ASCII \s+ tokenization, so str.isspace()
                    # here would eat the first chars of a KEPT token
                    while cut_to < len(text) and text[cut_to] in " \t\n\r\f\v":
                        cut_to += 1
                    pieces.append(text[pos:cut_from])
                    pos = cut_to
                    removed += b - a
                pieces.append(text[pos:])
                texts.append("".join(pieces))
                spans_out.append(len(spans))
                toks_out.append(removed)
            yield pd.DataFrame(
                {
                    schema[0].name: pdf[key].values,
                    "text_dedup": texts,
                    "n_spans_cut": spans_out,
                    "tokens_removed": toks_out,
                }
            )

    return src.mapInPandas(cut, schema)
