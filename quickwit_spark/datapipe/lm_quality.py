"""LM-perplexity quality scoring (the CCNet stage, simplified).

CCNet (Wenzek et al. 2020, public) buckets web documents by the
perplexity of a language model trained on clean text; low-perplexity
docs are "head" quality. The model here is an add-one-smoothed
CHARACTER TRIGRAM model — deliberately simple so the whole stage
(training included) is expressible in ANSI SQL and the gate can
value-hash it; swap in a real KenLM via the same join shape when the
runtime has one.

Semantics (mirrored by the DuckDB oracle):
- trigrams: all substr(lower(text), i, 3) for i = 1..len−2 (spaces and
  punctuation included — they carry signal); docs with < 3 chars score
  lp_mean = 0, perplexity = 1.
- model from `train_df`: P(t) = (c_t + 1) / (N + V + 1) with c_t the
  trigram's occurrence count, N total training trigram occurrences,
  V the number of DISTINCT training trigrams (+1 = the unseen bucket);
  an unseen trigram scores (0 + 1) / (N + V + 1).
- lp_mean = mean over the doc's trigram OCCURRENCES of ln P;
  perplexity = exp(−lp_mean).

Scale: the model is one groupBy over the training subset's exploded
trigrams and is tiny (≤ charset³ distinct rows — broadcastable), so
scoring is explode → broadcast join → skew-free per-doc average; one
shuffle on the doc key. Everything JVM-side column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trigrams(text_col: str):
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.length(t)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: t.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_trigram_model(
    train_df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, float]:
    """→ (model DataFrame of (trigram, logp), denom = N + V + 1).

    Training runs as exactly ONE Spark job (the groupBy collected to
    the driver — the model is ≤ charset³ rows); the returned model
    DataFrame is locally created, so downstream joins never re-execute
    the training lineage. An empty training corpus gives denom = 1:
    every trigram is unseen with P = 1 ⇒ perplexity 1, matching the
    documented formula and the SQL oracle."""
    import math

    spark = train_df.sparkSession
    counts = (
        train_df.select(F.explode(_trigrams(text_col)).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n_total = sum(r["c"] for r in counts)
    denom = float(n_total + len(counts) + 1)
    rows = [(r["trigram"], math.log((r["c"] + 1) / denom)) for r in counts]
    model = spark.createDataFrame(rows, "trigram string, logp double")
    return model, denom


def lm_perplexity(
    df: DataFrame,
    train_df: DataFrame | None = None,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Adds (lp_mean, perplexity). `train_df` defaults to `df` itself
    (self-trained — the common bootstrap when no clean LM corpus is
    at hand; pass a curated subset for the CCNet-faithful setup).
    NB: model training runs one eager Spark job at plan-build time."""
    model, denom = char_trigram_model(
        train_df if train_df is not None else df, text_col
    )
    unseen = F.log(F.lit(1.0) / F.lit(denom))
    grams = df.select(
        F.col(key), F.explode(_trigrams(text_col)).alias("trigram")
    )
    scored = (
        grams.join(F.broadcast(model.select("trigram", "logp")), "trigram", "left")
        .groupBy(key)
        .agg(F.avg(F.coalesce(F.col("logp"), unseen)).alias("lp_mean"))
    )
    return (
        df.join(scored, key, "left")
        .withColumn("lp_mean", F.coalesce("lp_mean", F.lit(0.0)).cast("double"))
        .withColumn("perplexity", F.exp(-F.col("lp_mean")).cast("double"))
    )
