"""Benchmark decontamination for training corpora.

The public GPT-3/PaLM/Llama pipeline stage: a training document is
contaminated when it shares at least `min_hits` distinct word n-grams
(GPT-3 used 13-grams) with any document of an evaluation benchmark;
contaminated documents are flagged or dropped.

Scale design: the benchmark side is tiny relative to the corpus (MBs
of eval sets vs 100 TB of training text), so its distinct-n-gram set
is BROADCAST — the expensive side (one exploded row per distinct
corpus n-gram) joins map-side with no shuffle; the only shuffle is the
skew-free per-document hit count. Tokenization matches
`textstats._tokens` (lowercase, whitespace split) and the n-gram shape
matches `dedup.shingles`, so the DuckDB oracle reuses those exact
conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dedup import shingles


def contamination_marks(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Adds (contaminated_ngrams, is_contaminated) to every input row.

    contaminated_ngrams = how many DISTINCT n-grams of the document
    also occur anywhere in the benchmark; is_contaminated = that count
    ≥ min_hits. Documents shorter than n tokens can never be flagged
    (the reference GPT-3 procedure applies a smaller n for short eval
    docs — pass a smaller `n` for that sweep)."""
    bench_grams = (
        shingles(benchmark.select(bench_text_col), text_col=bench_text_col,
                 k=n, out="_gram")
        .select("_gram")
        .distinct()
    )
    doc_grams = shingles(
        df.select(key, text_col), text_col=text_col, k=n, out="_gram"
    ).select(key, "_gram")
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_gram")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    return (
        df.join(hits, key, "left")
        .withColumn(
            "contaminated_ngrams",
            F.coalesce("contaminated_ngrams", F.lit(0)).cast("long"),
        )
        .withColumn(
            "is_contaminated", F.col("contaminated_ngrams") >= F.lit(min_hits)
        )
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Drops contaminated documents; schema = input schema."""
    orig = df.columns
    marked = contamination_marks(
        df, benchmark, key, text_col, bench_text_col, n, min_hits
    )
    return marked.filter(~F.col("is_contaminated")).select(*orig)
