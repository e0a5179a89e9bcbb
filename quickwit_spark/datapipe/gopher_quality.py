"""Gopher quality rules for corpus curation (non-repetition family).

The public Gopher filtering rules (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", Table A1)
beyond the repetition stats in `repetition.py`: word-count bounds,
mean word length, symbol-to-word ratio, bullet/ellipsis line
fractions, alphabetic-word fraction, and the required-stopword rule.

Like `repetition`, per-document and shuffle-free with two
interchangeable implementations: an Arrow-batched fast path (default —
Spark interprets higher-order array lambdas per element, so the column
form is ~30× slower per doc) and the pure Column-expression reference
(`impl="column"`) that the DuckDB oracles mirror; the tests assert the
two agree bit-for-bit.

Exact conventions (mirrored by the DuckDB oracles in
`__spark_entry__`):

- words: whitespace-split tokens of the lowercased text, empties
  dropped (same tokenization as `textstats._tokens`).
- ``symbol_word_ratio``: (# of ``#`` occurrences + # of ellipses,
  where an ellipsis is ``…`` or a non-overlapping ``...``) / words.
- lines: split on ``\\n``, whitespace-only lines dropped.
- ``bullet_line_frac``: fraction of lines whose first non-space char
  is one of ``• - *``.
- ``ellipsis_line_frac``: fraction of lines ending (after rtrim) in
  ``…`` or ``...``.
- ``alpha_word_frac``: fraction of words containing at least one
  ``a-z`` character.
- ``stopword_hits``: how many DISTINCT words of
  `REQUIRED_STOPWORDS` appear in the document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.textstats import _tokens as _words  # shared

# Gopher Table A1: "contain at least two of the following English
# words: the, be, to, of, and, that, have, with"
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

BULLET_CHARS = ("•", "-", "*")

# A document is KEPT when every bound below holds.
GOPHER_QUALITY_BOUNDS: dict[str, float] = {
    "min_word_count": 50,
    "max_word_count": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.10,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
    "min_alpha_word_frac": 0.80,
    "min_stopword_hits": 2,
}



def _count_occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length delta (identical
    replace semantics in Spark and DuckDB)."""
    gone = F.replace(col, F.lit(needle), F.lit(""))
    return ((F.length(col) - F.length(gone)) / len(needle)).cast("long")


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0)).cast("double")


_STAT_NAMES = (
    "word_count", "mean_word_len", "symbol_word_ratio",
    "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
    "stopword_hits",
)


def _py_gopher_stats(text: str) -> tuple:
    """Pure-Python mirror of the column expressions (Arrow fast path).

    Parity pins: re.ASCII keeps \\s at Java's ASCII class;
    strip/lstrip/rstrip(" ") match F.trim/ltrim/rtrim (spaces only);
    str.count is non-overlapping like the length-delta replace trick."""
    import re as _re

    words = [t for t in _re.split(r"\s+", text.lower(), flags=_re.ASCII) if t]
    n = len(words)
    word_chars = sum(map(len, words))
    symbols = text.count("#") + text.count("…") + text.count("...")
    lines = [p for p in text.split("\n") if p.strip(" ") != ""]
    nl = len(lines)
    bullet = sum(1 for p in lines if p.lstrip(" ")[:1] in ("•", "-", "*"))
    ellipsis = sum(
        1 for p in lines
        if p.rstrip(" ").endswith("…") or p.rstrip(" ").endswith("...")
    )
    alpha = sum(1 for w in words if _re.search(r"[a-z]", w))
    wordset = set(words)
    stop_hits = sum(1 for s in REQUIRED_STOPWORDS if s in wordset)
    return (
        n,
        word_chars / n if n else 0.0,
        symbols / n if n else 0.0,
        bullet / nl if nl else 0.0,
        ellipsis / nl if nl else 0.0,
        alpha / n if n else 0.0,
        stop_hits,
    )


def gopher_quality_stats(
    df: DataFrame, text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """Adds the Gopher quality-stat columns (see module docstring).
    NULL text behaves as ''.

    impl="arrow" (default): Arrow-batched mapInPandas — the
    higher-order array lambdas of the column form are interpreted per
    element by Spark, ~30× slower per doc. impl="column": the pure
    Column-expression reference the DuckDB oracles mirror; the test
    suite asserts arrow == column bit-for-bit."""
    if impl == "arrow":
        from pyspark.sql import types as T

        longs = {"word_count", "stopword_hits"}
        # overwrite semantics like the column impl's withColumn: an
        # input already carrying a stat column must not yield
        # duplicate fields
        schema = T.StructType(
            [f for f in df.schema.fields if f.name not in _STAT_NAMES]
            + [
                T.StructField(
                    nm, T.LongType() if nm in longs else T.DoubleType()
                )
                for nm in _STAT_NAMES
            ]
        )
        out_cols = [f.name for f in schema.fields]

        def gen(batches):
            for pdf in batches:
                stats = [
                    _py_gopher_stats(s if isinstance(s, str) else "")
                    for s in pdf[text_col]
                ]
                for i, nm in enumerate(_STAT_NAMES):
                    pdf[nm] = [st[i] for st in stats]
                yield pdf[out_cols]

        return df.mapInPandas(gen, schema)
    if impl != "column":
        raise ValueError(f"impl must be 'arrow' or 'column', got {impl!r}")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(txt)
    n = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    symbols = (
        _count_occurrences(txt, "#")
        + _count_occurrences(txt, "…")
        + _count_occurrences(txt, "...")
    )
    lines = F.filter(F.split(txt, r"\n"), lambda p: F.trim(p) != "")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda p: F.substring(F.ltrim(p), 1, 1).isin(*BULLET_CHARS),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda p: F.rtrim(p).endswith("…") | F.rtrim(p).endswith("..."),
        )
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    )
    return (
        df.withColumn("word_count", n.cast("long"))
        .withColumn("mean_word_len", _frac(word_chars, n))
        .withColumn("symbol_word_ratio", _frac(symbols, n))
        .withColumn("bullet_line_frac", _frac(bullet, n_lines))
        .withColumn("ellipsis_line_frac", _frac(ellipsis, n_lines))
        .withColumn("alpha_word_frac", _frac(alpha_words, n))
        .withColumn("stopword_hits", stop_hits.cast("long"))
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    bounds: dict | None = None,
    keep_stats: bool = False,
    impl: str = "arrow",
) -> DataFrame:
    """Keeps documents passing every Gopher quality bound (override
    individual bounds via `bounds`)."""
    b = dict(GOPHER_QUALITY_BOUNDS)
    b.update(bounds or {})
    orig = df.columns
    out = gopher_quality_stats(df, text_col, impl=impl)
    cond = (
        (F.col("word_count") >= b["min_word_count"])
        & (F.col("word_count") <= b["max_word_count"])
        & (F.col("mean_word_len") >= b["min_mean_word_len"])
        & (F.col("mean_word_len") <= b["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= b["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= b["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= b["max_ellipsis_line_frac"])
        & (F.col("alpha_word_frac") >= b["min_alpha_word_frac"])
        & (F.col("stopword_hits") >= b["min_stopword_hits"])
    )
    out = out.filter(cond)
    return out if keep_stats else out.select(*orig)
