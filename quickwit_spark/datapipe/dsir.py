"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The public DSIR recipe ("Data Selection for Language Models via
Importance Resampling", NeurIPS 2023) picks raw web pages that look
like a small target corpus:

1. featurize every page as hashed n-gram bucket counts (unigrams +
   bigrams hashed into ``num_buckets``),
2. fit two smoothed bag-of-buckets models — p from the target corpus,
   q from (a sample of) the raw corpus,
3. score each raw page with the importance log-weight
   ``log w(x) = Σ_g  log p[b(g)] − log q[b(g)]`` over its n-grams,
4. resample k pages without replacement via Gumbel top-k
   (``argtop_k  log w(x) + Gumbel(0,1)``).

Spark-first shape (scales to 10^12 docs):

- n-gram hashing is pure Column expressions — `transform` over the
  token array, `xxhash64` (or the engine-portable `portable.PH` so the
  DuckDB oracle can replay bit-for-bit) — no Python, no shuffle.
- model fitting aggregates bucket counts with one partial-agg shuffle
  bounded by ``num_buckets`` rows (map-side combine does the heavy
  lifting), then collects the tiny (≤10^5 doubles) vector to the
  driver.
- scoring broadcasts ``log p − log q`` (~80 KB) inside an Arrow-batched
  pandas UDF: one `np.take`/`reduceat` gather per batch, never per-row
  Python in the hot loop.
- resampling is deterministic: the Gumbel noise derives from a
  portable integer mix of the doc key (no RNG state), and top-k is
  `orderBy().limit(k)` — TakeOrderedAndProject (per-partition top-k +
  driver merge), not a global sort.

The reference engine (`/root/reference`) has no analog; this belongs to
the training-data curation surface (SURVEY.md "LLM-data-pipeline
operators").
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.portable import P31, perm_constants, portable_hash
from quickwit_spark.datapipe.textstats import _tokens

DEFAULT_BUCKETS = 10_000


def _gram_strings(text: Column, ns: tuple[int, ...]) -> Column:
    """Array of n-gram strings (space-joined lowercase tokens)."""
    toks = _tokens(text)
    parts = []
    for n in ns:
        if n == 1:
            parts.append(toks)
        else:
            # slide a window: gram i = toks[i..i+n-1], 1-based
            # element_at. Guarded: sequence(1, 0) would count DOWN.
            grams_n = F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
            parts.append(
                F.when(F.size(toks) >= n, grams_n).otherwise(
                    F.array().cast("array<string>")
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def ngram_buckets(
    df: DataFrame,
    text_col: str = "text",
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = DEFAULT_BUCKETS,
    portable: bool = False,
    out: str = "buckets",
) -> DataFrame:
    """Adds `out` = array<int> of hashed n-gram buckets (with
    multiplicity — DSIR counts occurrences). Column-only, no shuffle."""
    grams = _gram_strings(F.col(text_col), ns)
    hasher = portable_hash if portable else F.xxhash64
    buckets = F.transform(grams, lambda g: F.pmod(hasher(g), F.lit(num_buckets)))
    # null text -> empty bucket list (not null)
    return df.withColumn(
        out, F.coalesce(buckets, F.array().cast("array<bigint>"))
    )


def fit_bucket_model(
    df_buckets: DataFrame,
    *,
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1e-4,
    buckets_col: str = "buckets",
) -> np.ndarray:
    """Smoothed bucket log-probabilities from a featurized corpus:
    ``log (count_b + alpha) / (total + alpha·B)``. One bounded
    aggregation; the result is a driver-side float64[num_buckets]."""
    rows = (
        df_buckets.select(F.explode(buckets_col).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = np.zeros(num_buckets, dtype=np.float64)
    for r in rows:
        counts[int(r["b"])] = float(r["count"])
    return np.log(counts + alpha) - math.log(counts.sum() + alpha * num_buckets)


def _gather_sums(vec: np.ndarray, arrs) -> np.ndarray:
    """Per row of an array-of-buckets column, Σ vec[buckets] — one flat
    gather + reduceat per batch."""
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    out = np.zeros(len(arrs), dtype=np.float64)
    nz = np.flatnonzero(lens)
    if len(nz):
        flat = np.concatenate([np.asarray(arrs[i], dtype=np.int64) for i in nz])
        starts = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        out[nz] = np.add.reduceat(vec[flat], starts)
    return out


def _score_map(df_buckets: DataFrame, vec: np.ndarray, out: str) -> DataFrame:
    """Replace the `buckets` column with `out` = Σ vec[buckets] via
    mapInPandas. A plan NODE rather than a pandas_udf column expression:
    Spark 4.1's ExtractPythonUDFs intermittently leaves a scalar pandas
    UDF inline in a Project under TakeOrderedAndProject (second query of
    a session), which then dies with INTERNAL_ERROR 'Cannot generate
    code for expression' — mapInPandas is immune."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    keep = [f for f in df_buckets.schema.fields if f.name != "buckets"]
    schema = StructType(keep + [StructField(out, DoubleType(), False)])
    names = [f.name for f in keep]
    v = vec  # captured; shipped with the serialized function (~80 KB)

    def score(batches):
        for pdf in batches:
            res = pdf[names].copy()
            res[out] = _gather_sums(v, pdf["buckets"].to_numpy())
            yield res

    return df_buckets.mapInPandas(score, schema)


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1e-4,
    portable: bool = False,
    out: str = "dsir_logw",
) -> DataFrame:
    """raw + `out` column = importance log-weight log p(x) − log q(x)
    under hashed-n-gram bag models fit on target (p) and raw (q)."""
    feat = dict(ns=ns, num_buckets=num_buckets, portable=portable)
    logp = fit_bucket_model(
        ngram_buckets(target, text_col, **feat), num_buckets=num_buckets, alpha=alpha
    )
    raw_b = ngram_buckets(raw, text_col, **feat)
    logq = fit_bucket_model(raw_b, num_buckets=num_buckets, alpha=alpha)
    return _score_map(raw_b, logp - logq, out)


def gumbel_noise(key: Column, *, seed: int = 0) -> Column:
    """Deterministic Gumbel(0,1) from an integer doc key: a portable
    LCG-style mix → u ∈ (0,1) → −ln(−ln u). No RNG state, identical in
    any engine — replayable by the SQL oracle."""
    a, b = perm_constants(seed + 1)[seed]
    mix = F.pmod(
        F.lit(a).cast("long") * F.pmod(key.cast("long"), F.lit(P31)) + F.lit(b),
        F.lit(P31),
    )
    u = (mix.cast("double") + F.lit(1.0)) / F.lit(float(P31 + 2))
    return -F.log(-F.log(u))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    *,
    k: int,
    seed: int = 0,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1e-4,
    portable: bool = False,
) -> DataFrame:
    """Gumbel top-k importance resample of `raw` toward `target`:
    the k rows (input schema + `dsir_logw`) maximizing
    logweight + Gumbel(key). Deterministic given (corpora, seed)."""
    scored = dsir_logweights(
        raw, target, text_col,
        ns=ns, num_buckets=num_buckets, alpha=alpha, portable=portable,
    )
    pick = F.col("dsir_logw") + gumbel_noise(F.col(key), seed=seed)
    return (
        scored.withColumn("_pick", pick)
        .orderBy(F.desc("_pick"), key)
        .limit(k)
        .drop("_pick")
    )
