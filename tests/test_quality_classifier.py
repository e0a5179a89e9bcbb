"""Linear quality classifier (datapipe/quality_classifier.py).

Distributed GD training vs a single-process numpy reference, holdout
separation on constructed corpora, scoring math by hand, and the
deterministic Pareto acceptance rule.
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dsir import ngram_buckets
from quickwit_spark.datapipe.portable import P31, perm_constants
from quickwit_spark.datapipe.quality_classifier import (
    _sigmoid,
    pareto_keep,
    quality_filter,
    quality_score,
    train_quality_classifier,
)

A = "spark shuffle executor broadcast join stage task codegen".split()
B = "butter flour oven sugar bake whisk dough icing".split()


def _doc(vocab, rng, n=20):
    return " ".join(rng.choice(vocab) for _ in range(n))


def _corpora(spark, n=60):
    rng = random.Random(11)
    pos = spark.createDataFrame(
        [(i, _doc(A, rng)) for i in range(n)], ["doc_id", "text"])
    neg = spark.createDataFrame(
        [(i, _doc(B, rng)) for i in range(n)], ["doc_id", "text"])
    return pos, neg


def _numpy_reference(pos_bk, neg_bk, nb, iters, lr, l2):
    """Single-process full-batch GD identical to the distributed spec."""
    docs = [(b, 1.0) for b in pos_bk] + [(b, 0.0) for b in neg_bk]
    w = np.zeros(nb + 1)
    for _ in range(iters):
        g = np.zeros(nb + 1)
        for bk, y in docs:
            m = (w[np.asarray(bk, dtype=int)].sum() / max(len(bk), 1)) + w[nb]
            err = 1.0 / (1.0 + math.exp(-m)) - y
            for b in bk:
                g[b] += err / len(bk)
            g[nb] += err
        g /= len(docs)
        g[:nb] += l2 * w[:nb]
        w = w - lr * g
    return w


def test_training_matches_numpy_reference(spark):
    pos, neg = _corpora(spark, n=25)
    nb, iters, lr, l2 = 512, 5, 1.0, 1e-6
    w = train_quality_classifier(
        pos, neg, num_buckets=nb, iters=iters, lr=lr, l2=l2)
    pos_bk = [r["buckets"] for r in
              ngram_buckets(pos, num_buckets=nb).orderBy("doc_id").collect()]
    neg_bk = [r["buckets"] for r in
              ngram_buckets(neg, num_buckets=nb).orderBy("doc_id").collect()]
    ref = _numpy_reference(pos_bk, neg_bk, nb, iters, lr, l2)
    assert np.allclose(w, ref, rtol=1e-9, atol=1e-12)


def test_classifier_separates_holdout(spark):
    pos, neg = _corpora(spark)
    w = train_quality_classifier(pos, neg, num_buckets=2048, iters=30)
    rng = random.Random(99)
    hold = spark.createDataFrame(
        [(i, _doc(A if i % 2 == 0 else B, rng)) for i in range(80)],
        ["doc_id", "text"])
    scored = quality_score(hold, w, num_buckets=2048).collect()
    acc = sum(
        1 for r in scored
        if (r["quality_score"] > 0.5) == (r["doc_id"] % 2 == 0)
    ) / len(scored)
    assert acc >= 0.95
    kept = quality_filter(hold, w, num_buckets=2048, threshold=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert sum(1 for d in ids if d % 2 == 0) / max(len(ids), 1) >= 0.95


def test_score_by_hand(spark):
    """One doc, tiny bucket space: σ(mean(w[b]) + bias)."""
    df = spark.createDataFrame([(0, "x y")], ["doc_id", "text"])
    bks = ngram_buckets(df, num_buckets=7).collect()[0]["buckets"]
    w = np.arange(8, dtype=np.float64) / 10.0  # w[7] = 0.7 bias
    got = quality_score(df, w, num_buckets=7).collect()[0]["quality_score"]
    m = sum(w[b] for b in bks) / len(bks) + 0.7
    assert got == pytest.approx(1 / (1 + math.exp(-m)), rel=1e-12)


def test_pareto_keep_formula_and_tail(spark):
    a, c = perm_constants(1)[0]
    df = spark.createDataFrame(
        [(i, 0.05 if i < 500 else 0.99) for i in range(600)],
        ["doc_id", "score"])
    out = df.select(
        "doc_id", "score",
        pareto_keep(F.col("doc_id"), F.col("score")).alias("kept"),
    ).collect()
    for r in out:
        mix = (a * (r["doc_id"] % P31) + c) % P31
        u = (mix + 1.0) / (P31 + 2.0)
        x = u ** (-1.0 / 9.0) - 1.0
        assert r["kept"] == (r["score"] > 1.0 - x)
    lo = [r for r in out if r["score"] == 0.05]
    hi = [r for r in out if r["score"] == 0.99]
    # high scores nearly always survive; low scores only as a thin tail
    assert sum(r["kept"] for r in hi) / len(hi) > 0.9
    frac_lo = sum(r["kept"] for r in lo) / len(lo)
    assert 0.0 < frac_lo < 0.2


def test_sigmoid_stable():
    x = np.array([-800.0, -30.0, 0.0, 30.0, 800.0])
    s = _sigmoid(x)
    assert not np.isnan(s).any()
    assert s[0] == 0.0 and s[-1] == 1.0 and s[2] == 0.5


def test_curate_classifier_stage(spark):
    from quickwit_spark.datapipe.curate import curate

    pos, neg = _corpora(spark, n=30)
    w = train_quality_classifier(pos, neg, num_buckets=2048, iters=30)
    rng = random.Random(5)
    # long mixed docs so only the classifier stage discriminates
    mixed = spark.createDataFrame(
        [(i, "the " + _doc(A if i % 2 == 0 else B, rng, n=60))
         for i in range(40)],
        ["doc_id", "text"])
    out, rep = curate(
        mixed, redact=False, near_dup=False,
        quality_bounds={"min_stopword_hits": 1},
        classifier_weights=w, classifier_threshold=0.5,
        with_report=True,
    )
    stages = dict(rep)
    kept = {r["doc_id"] for r in out.collect()}
    assert stages["classifier"] <= 25
    assert kept and all(d % 2 == 0 for d in kept)
