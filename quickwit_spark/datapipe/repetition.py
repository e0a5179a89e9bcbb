"""Gopher-style repetition statistics + filters for corpus curation.

Web-scale training pipelines drop documents dominated by repeated
lines/paragraphs/n-grams (the public Gopher rules — Rae et al. 2021,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", Table A1). The reference engine has no analog; this belongs to
the training-data pipeline surface alongside `textstats`/`dedup`.

Design: per-document stats, no shuffle in either implementation — at
100 TB these run inside whatever scan/projection the quality pipeline
already does, unlike an explode→groupBy shape which would shuffle
every n-gram occurrence. Two interchangeable implementations:

- ``impl="arrow"`` (default): Arrow-batched `mapInPandas`, Counter
  per document. Chosen after measuring the column path: Spark
  evaluates higher-order array lambdas interpreted per element (they
  are excluded from whole-stage codegen), costing ~10 ms/doc for the
  full 13-stat family vs ~50 µs/doc here.
- ``impl="column"``: pure Column expressions — split, `array_sort`,
  run-length folds (`F.aggregate` with a struct accumulator). This is
  the executable spec the DuckDB oracles mirror; the test suite
  asserts arrow == column to the last bit.

Definitions (documented because conventions vary between public
implementations; the DuckDB oracles in `__spark_entry__` reproduce
these exactly):

- lines / paragraphs: regex-split on `\\n` / `\\n{2,}`, blank
  (whitespace-only) parts dropped, lengths measured untrimmed.
- ``dup_line_frac`` / ``dup_para_frac``: fraction of line (paragraph)
  occurrences beyond the first of an identical line — i.e.
  ``1 − distinct/total``.
- ``dup_line_char_frac`` / ``dup_para_char_frac``: character-weighted
  version (characters in occurrences beyond the first / all line
  characters).
- ``top_{n}gram_char_frac``: max over n-grams of
  ``count × chars(gram) / total token chars`` clamped to 1 — the
  character coverage of the most repeated word n-gram (tokens =
  lowercased whitespace split; chars(gram) excludes separators).
- ``dup_{n}gram_char_frac``: ``Σ_{gram: count>1} count × chars(gram) /
  total token chars`` clamped to 1 — ALL occurrences of repeated
  n-grams count, per the Gopher convention for n ≥ 5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.textstats import _tokens  # shared tokenization

# Gopher Table A1 thresholds (public): a doc is dropped when a stat
# EXCEEDS its threshold.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}



def _nonblank_parts(col: Column, sep: str) -> Column:
    return F.filter(F.split(col, sep), lambda p: F.trim(p) != "")


def _char_sum(items: Column) -> Column:
    return F.aggregate(
        items, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    )


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams joined with a single space; empty when < n tokens."""
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------- sorted run-length folds
# Items are sorted so equal elements are adjacent; the fold carries
# (prev, run, acc). Blank items never occur (filtered above), so "" is
# a safe initial `prev` sentinel.


def _fold_dup_chars(items: Column, charlen, include_first: bool) -> Column:
    """Characters in repeated items over sorted `items`.

    include_first=False: occurrences 2..c of an item each add its
    length (lines/paragraphs convention). include_first=True: a run
    reaching 2 retroactively adds the first occurrence too, so all c
    occurrences count (dup-n-gram convention)."""
    srt = F.array_sort(items)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(1).cast("long").alias("run"),
        F.lit(0.0).alias("dup"),
    )

    def merge(a, x):
        same = a["prev"] == x
        run = F.when(same, a["run"] + 1).otherwise(F.lit(1).cast("long"))
        dup_add = charlen(x)
        if include_first:
            dup_add = F.when(a["run"] == 1, charlen(x) * 2).otherwise(charlen(x))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (a["dup"] + F.when(same, dup_add).otherwise(F.lit(0.0))).alias("dup"),
        )

    return F.aggregate(srt, zero, merge, lambda a: a["dup"])


def _fold_top_coverage(items: Column, charlen) -> Column:
    """max over distinct items of count × charlen, via sorted runs."""
    srt = F.array_sort(items)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("best"),
    )

    def merge(a, x):
        run = F.when(a["prev"] == x, a["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        best = F.greatest(a["best"], run.cast("double") * charlen(x))
        return F.struct(x.alias("prev"), run.alias("run"), best.alias("best"))

    return F.aggregate(srt, zero, merge, lambda a: a["best"])


def _frac(num: Column, den: Column, clamp: bool = True) -> Column:
    out = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    if clamp:
        out = F.least(out, F.lit(1.0))
    return out.cast("double")


def _part_stats(df: DataFrame, col: Column, sep: str, prefix: str) -> DataFrame:
    parts = _nonblank_parts(col, sep)
    n = F.size(parts)
    total_chars = _char_sum(parts)
    dup_chars = _fold_dup_chars(parts, lambda x: F.length(x).cast("double"), False)
    return df.withColumn(
        f"dup_{prefix}_frac",
        _frac((n - F.size(F.array_distinct(parts))).cast("double"), n.cast("double")),
    ).withColumn(f"dup_{prefix}_char_frac", _frac(dup_chars, total_chars))


def _stat_names(top_ngrams: tuple, dup_ngrams: tuple) -> list[str]:
    return (
        ["dup_line_frac", "dup_line_char_frac",
         "dup_para_frac", "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top_ngrams]
        + [f"dup_{n}gram_char_frac" for n in dup_ngrams]
    )


def _py_repetition_stats(
    text: str, line_sep: str, para_sep: str, top_ngrams: tuple, dup_ngrams: tuple
) -> dict[str, float]:
    """Pure-Python mirror of the column expressions (Arrow fast path).

    Parity notes: ``p.strip(" ")`` matches F.trim (spaces only, NOT all
    whitespace); regexes run under re.ASCII because Java's ``\\s`` is
    the ASCII class [ \\t\\n\\x0B\\f\\r] while Python's default is all
    of Unicode whitespace (NBSP etc. would diverge); counts are exact
    integers so the double divisions are bit-identical to the JVM's."""
    import re as _re
    from collections import Counter

    out: dict[str, float] = {}
    for prefix, sep in (("line", line_sep), ("para", para_sep)):
        parts = [
            p for p in _re.split(sep, text, flags=_re.ASCII)
            if p.strip(" ") != ""
        ]
        n = len(parts)
        chars = sum(map(len, parts))
        c = Counter(parts)
        dupch = sum((k - 1) * len(p) for p, k in c.items() if k > 1)
        out[f"dup_{prefix}_frac"] = min((n - len(c)) / n, 1.0) if n else 0.0
        out[f"dup_{prefix}_char_frac"] = (
            min(dupch / chars, 1.0) if chars else 0.0
        )
    toks = [t for t in _re.split(r"\s+", text.lower(), flags=_re.ASCII) if t]
    # prefix sums of token lengths: chars(gram i..i+n) = pre[i+n]-pre[i]
    pre = [0]
    for t in toks:
        pre.append(pre[-1] + len(t))
    tc = pre[-1]
    grams: dict[int, Counter] = {}
    for n in sorted(set(top_ngrams) | set(dup_ngrams)):
        grams[n] = Counter(
            (tuple(toks[i : i + n]), pre[i + n] - pre[i])
            for i in range(len(toks) - n + 1)
        )
    for n in top_ngrams:
        cov = max((k * g[1] for g, k in grams[n].items()), default=0)
        out[f"top_{n}gram_char_frac"] = min(cov / tc, 1.0) if tc else 0.0
    for n in dup_ngrams:
        dup = sum(k * g[1] for g, k in grams[n].items() if k > 1)
        out[f"dup_{n}gram_char_frac"] = min(dup / tc, 1.0) if tc else 0.0
    return out


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = r"\n",
    para_sep: str = r"\n{2,}",
    top_ngrams: tuple = (2, 3, 4),
    dup_ngrams: tuple = (5, 6, 7, 8, 9, 10),
    impl: str = "arrow",
) -> DataFrame:
    """Adds the full Gopher repetition-stat column family (see module
    docstring for exact definitions). NULL text behaves as ''.

    impl="arrow" (default): Arrow-batched mapInPandas — Counter-based
    stats per document. Spark's higher-order array functions are
    interpreted per element (never whole-stage-codegen'd), which makes
    the pure-column fold ~200× slower per doc than this batch path;
    the gates run the arrow path against the DuckDB oracle and the
    test suite asserts arrow == column. impl="column": the pure
    Column-expression reference implementation."""
    if impl == "column":
        txt = F.coalesce(F.col(text_col), F.lit(""))
        df = _part_stats(df, txt, line_sep, "line")
        df = _part_stats(df, txt, para_sep, "para")
        toks = _tokens(txt)
        tok_chars = _char_sum(toks)
        # chars(gram) = length minus the n−1 separator spaces
        for n in top_ngrams:
            cov = _fold_top_coverage(
                _ngrams(toks, n),
                lambda x, n=n: (F.length(x) - F.lit(n - 1)).cast("double"),
            )
            df = df.withColumn(f"top_{n}gram_char_frac", _frac(cov, tok_chars))
        for n in dup_ngrams:
            dup = _fold_dup_chars(
                _ngrams(toks, n),
                lambda x, n=n: (F.length(x) - F.lit(n - 1)).cast("double"),
                True,
            )
            df = df.withColumn(f"dup_{n}gram_char_frac", _frac(dup, tok_chars))
        return df
    if impl != "arrow":
        raise ValueError(f"impl must be 'arrow' or 'column', got {impl!r}")

    from pyspark.sql import types as T

    names = _stat_names(top_ngrams, dup_ngrams)
    # overwrite semantics like the column impl's withColumn: an input
    # already carrying a stat column must not yield duplicate fields
    schema = T.StructType(
        [f for f in df.schema.fields if f.name not in names]
        + [T.StructField(nm, T.DoubleType()) for nm in names]
    )
    out_cols = [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            stats = [
                _py_repetition_stats(
                    s if isinstance(s, str) else "",
                    line_sep, para_sep, top_ngrams, dup_ngrams,
                )
                for s in pdf[text_col]
            ]
            for nm in names:
                pdf[nm] = [st[nm] for st in stats]
            yield pdf[out_cols]

    return df.mapInPandas(gen, schema)


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    thresholds: dict | None = None,
    keep_stats: bool = False,
    impl: str = "arrow",
) -> DataFrame:
    """Keeps documents whose repetition stats are all ≤ their Gopher
    thresholds (override per-stat via `thresholds`)."""
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    orig = df.columns
    top = tuple(
        int(k.split("_")[1][:-4]) for k in th if k.startswith("top_")
    )
    dup = tuple(
        int(k.split("_")[1][:-4]) for k in th if k.startswith("dup_") and "gram" in k
    )
    out = repetition_stats(
        df, text_col, top_ngrams=tuple(sorted(top)),
        dup_ngrams=tuple(sorted(dup)), impl=impl,
    )
    cond = F.lit(True)
    for k, v in th.items():
        cond = cond & (F.col(k) <= F.lit(v))
    out = out.filter(cond)
    return out if keep_stats else out.select(*orig)
