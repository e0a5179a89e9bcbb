"""Linear quality classifier over hashed n-gram features.

The public GPT-3/LLaMA-style curation step ("Language Models are
Few-Shot Learners" appendix A; LLaMA 1 §2) trains a linear classifier
(fastText-like) to score raw web pages against a high-quality reference
corpus, keeps high scorers, and optionally Pareto-samples the threshold
so the kept set isn't a hard cliff.

Spark-first shapes:

- features reuse `dsir.ngram_buckets` (hashed uni+bigram counts, pure
  Column expressions; `portable=True` for the oracle-replayable hash).
- training is full-batch logistic regression by gradient descent,
  distributed the `treeAggregate` way: each iteration broadcasts the
  (num_buckets+1)-double weight vector inside a mapInPandas closure,
  every partition emits ONE partial-gradient row (array<double>), the
  driver sums partials and steps. Iteration count × one bounded
  aggregation — no shuffle of per-doc data, scales with executors.
  Feature vectors are L1-normalized (fastText's mean-of-embeddings
  analog) so the learning rate is document-length invariant.
- scoring is one broadcast-vector gather per Arrow batch
  (`dsir._gather_sums`) + sigmoid — mapInPandas, no per-row Python.
- `pareto_keep` reproduces GPT-3's documented acceptance rule
  ``keep if score > 1 - x, x ~ Pareto(alpha=9)`` with a DETERMINISTIC
  Pareto draw from a portable integer mix of the doc key
  (x = u^(-1/alpha) − 1), so runs are reproducible and the DuckDB
  oracle can replay the decision bit-for-bit.

The reference engine (`/root/reference`) has no analog; this belongs to
the training-data curation surface (SURVEY.md "LLM-data-pipeline
operators").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dsir import DEFAULT_BUCKETS, _gather_sums, ngram_buckets
from quickwit_spark.datapipe.portable import P31, perm_constants


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _featurize(
    df: DataFrame, text_col: str, *, ns, num_buckets, portable
) -> DataFrame:
    return ngram_buckets(
        df, text_col, ns=ns, num_buckets=num_buckets, portable=portable
    )


def _partial_gradients(batches, w: np.ndarray, nb: int):
    """One gradient row per partition: d/dw Σ logloss(σ(w·x + b), y)
    over the partition's docs, x = L1-normalized bucket counts.
    Emitted as [grad(nb), grad_bias, count]."""
    import pandas as pd

    g = np.zeros(nb + 2, dtype=np.float64)
    for pdf in batches:
        arrs = pdf["buckets"].to_numpy()
        ys = pdf["label"].to_numpy(dtype=np.float64)
        lens = np.fromiter(
            (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
        )
        margins = _gather_sums(w[:nb], arrs)
        nzl = np.maximum(lens, 1)
        margins = margins / nzl + w[nb]
        err = _sigmoid(margins) - ys  # dloss/dmargin
        nz = np.flatnonzero(lens)
        if len(nz):
            flat = np.concatenate(
                [np.asarray(arrs[i], dtype=np.int64) for i in nz]
            )
            coef = np.repeat(err[nz] / lens[nz], lens[nz])
            np.add.at(g, flat, coef)
        g[nb] += err.sum()
        g[nb + 1] += len(ys)
    yield pd.DataFrame({"g": [g.tolist()]})


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int = DEFAULT_BUCKETS,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-6,
    portable: bool = False,
) -> np.ndarray:
    """Distributed logistic regression: positive = quality reference,
    negative = raw/web sample. Returns float64[num_buckets + 1]
    (weights + bias). Deterministic given the corpora."""
    feat = (
        _featurize(positive, text_col, ns=ns, num_buckets=num_buckets,
                   portable=portable)
        .select("buckets", F.lit(1.0).alias("label"))
        .unionByName(
            _featurize(negative, text_col, ns=ns, num_buckets=num_buckets,
                       portable=portable)
            .select("buckets", F.lit(0.0).alias("label"))
        )
        .persist()
    )
    try:
        w = np.zeros(num_buckets + 1, dtype=np.float64)
        nb = num_buckets
        schema = "g array<double>"
        for _ in range(iters):
            cur = w  # rebind: the closure ships this iteration's w
            rows = feat.mapInPandas(
                lambda it, _w=cur: _partial_gradients(it, _w, nb), schema
            ).collect()
            total = np.zeros(nb + 2, dtype=np.float64)
            for r in rows:
                total += np.asarray(r["g"], dtype=np.float64)
            n = max(total[nb + 1], 1.0)
            grad = total[: nb + 1] / n
            grad[:nb] += l2 * w[:nb]
            w = w - lr * grad
        return w
    finally:
        feat.unpersist()


def quality_score(
    df: DataFrame,
    weights: np.ndarray,
    text_col: str = "text",
    *,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int | None = None,
    portable: bool = False,
    out: str = "quality_score",
) -> DataFrame:
    """df + `out` = σ(w·x̄ + b), x̄ = L1-normalized bucket counts.
    `num_buckets` defaults to len(weights) − 1 — the bucket space the
    model was trained in."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    w = np.asarray(weights, dtype=np.float64)
    nb = (len(w) - 1) if num_buckets is None else num_buckets
    if len(w) != nb + 1:
        raise ValueError(
            f"weights has {len(w)} entries; expected num_buckets+1 = {nb + 1}"
        )
    feat = _featurize(df, text_col, ns=ns, num_buckets=nb, portable=portable)
    keep = [f for f in feat.schema.fields if f.name != "buckets"]
    schema = StructType(keep + [StructField(out, DoubleType(), False)])
    names = [f.name for f in keep]

    def score(batches):
        for pdf in batches:
            arrs = pdf["buckets"].to_numpy()
            lens = np.fromiter(
                (len(a) for a in arrs), dtype=np.int64, count=len(arrs)
            )
            m = _gather_sums(w[:nb], arrs) / np.maximum(lens, 1) + w[nb]
            res = pdf[names].copy()
            res[out] = _sigmoid(m)
            yield res

    return feat.mapInPandas(score, schema)


def pareto_keep(
    key: Column, score: Column, *, alpha: float = 9.0, seed: int = 0
) -> Column:
    """GPT-3's documented acceptance rule, deterministic: keep a doc iff
    ``score > 1 − x`` with ``x = u^(−1/alpha) − 1`` a Pareto(alpha) draw
    from a portable integer mix of the doc key. High scores always
    survive; low scores survive with small probability (keeps some tail
    so the corpus isn't a hard threshold cliff)."""
    a, b = perm_constants(seed + 1)[seed]
    mix = F.pmod(
        F.lit(a).cast("long") * F.pmod(key.cast("long"), F.lit(P31)) + F.lit(b),
        F.lit(P31),
    )
    u = (mix.cast("double") + F.lit(1.0)) / F.lit(float(P31 + 2))
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return score > (F.lit(1.0) - x)


def quality_filter(
    df: DataFrame,
    weights: np.ndarray,
    key: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float | None = None,
    pareto_alpha: float | None = 9.0,
    seed: int = 0,
    ns: tuple[int, ...] = (1, 2),
    num_buckets: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Rows surviving the classifier: hard `threshold` if given, else
    the Pareto acceptance rule. Returns input schema + quality_score."""
    scored = quality_score(
        df, weights, text_col, ns=ns, num_buckets=num_buckets,
        portable=portable,
    )
    if threshold is not None:
        return scored.filter(F.col("quality_score") > threshold)
    return scored.filter(
        pareto_keep(F.col(key), F.col("quality_score"),
                    alpha=pareto_alpha or 9.0, seed=seed)
    )
