"""DSIR importance resampling (datapipe/dsir.py).

Hand-computed n-gram/bucket expectations, a pure-Python model oracle on
constructed corpora, selection behavior (target-like docs win), Gumbel
determinism, and edge cases (empty text, short docs).
"""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dsir import (
    dsir_logweights,
    dsir_resample,
    fit_bucket_model,
    gumbel_noise,
    ngram_buckets,
)
from quickwit_spark.datapipe.portable import P31, WEIGHTS, perm_constants


def _ph(s: str) -> int:
    return sum((ord(c) % 128) * WEIGHTS[i % 8] for i, c in enumerate(s))


def test_ngram_buckets_contents(spark):
    """Buckets = portable-hash of [unigrams..., bigrams...] in order."""
    df = spark.createDataFrame([(0, "A b  c"), (1, "solo"), (2, "")],
                               ["doc_id", "text"])
    out = {
        r["doc_id"]: r["buckets"]
        for r in ngram_buckets(df, portable=True, num_buckets=97).collect()
    }
    grams0 = ["a", "b", "c", "a b", "b c"]
    assert out[0] == [_ph(g) % 97 for g in grams0]
    assert out[1] == [_ph("solo") % 97]  # no bigrams for 1 token
    assert out[2] == []


def test_fit_bucket_model_matches_hand_calc(spark):
    df = spark.createDataFrame([(0, "x x y")], ["doc_id", "text"])
    logp = fit_bucket_model(
        ngram_buckets(df, portable=True, num_buckets=11), num_buckets=11,
        alpha=0.5,
    )
    counts = np.zeros(11)
    for g in ["x", "x", "y", "x x", "x y"]:
        counts[_ph(g) % 11] += 1
    exp = np.log(counts + 0.5) - math.log(5 + 0.5 * 11)
    assert np.allclose(logp, exp)


def test_logweights_prefer_target_like_docs(spark):
    random.seed(7)
    A = "spark shuffle executor broadcast join stage".split()
    B = "butter flour oven sugar bake whisk".split()

    def doc(v):
        return " ".join(random.choice(v) for _ in range(25))

    target = spark.createDataFrame(
        [(i, doc(A)) for i in range(30)], ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(i, doc(A if i % 2 == 0 else B)) for i in range(100)],
        ["doc_id", "text"])
    w = dsir_logweights(raw, target, num_buckets=2048).collect()
    a = [r["dsir_logw"] for r in w if r["doc_id"] % 2 == 0]
    b = [r["dsir_logw"] for r in w if r["doc_id"] % 2 == 1]
    assert min(a) > max(b)
    picked = {r["doc_id"] for r in
              dsir_resample(raw, target, k=30, num_buckets=2048).collect()}
    assert all(d % 2 == 0 for d in picked)


def test_resample_deterministic_and_k(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(40)],
        ["doc_id", "text"])
    target = docs.filter(F.col("doc_id") < 10)
    r1 = sorted(r["doc_id"] for r in
                dsir_resample(docs, target, k=15, seed=3).collect())
    r2 = sorted(r["doc_id"] for r in
                dsir_resample(docs, target, k=15, seed=3).collect())
    assert r1 == r2 and len(r1) == 15
    r3 = sorted(r["doc_id"] for r in
                dsir_resample(docs, target, k=15, seed=4).collect())
    assert r1 != r3  # different seed, different Gumbel draw


def test_gumbel_matches_formula(spark):
    a, b = perm_constants(1)[0]
    df = spark.createDataFrame([(7,), (123456,)], ["k"])
    got = [r["g"] for r in
           df.select(gumbel_noise(F.col("k"), seed=0).alias("g"))
           .orderBy("k").collect()]
    for key, g in zip([7, 123456], got):
        mix = (a * (key % P31) + b) % P31
        u = (mix + 1.0) / (P31 + 2.0)
        assert g == pytest.approx(-math.log(-math.log(u)), rel=1e-12)


def test_empty_and_schema(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "one two three"), (2, None)], ["doc_id", "text"])
    target = spark.createDataFrame([(9, "one two")], ["doc_id", "text"])
    out = dsir_logweights(docs, target)
    assert out.columns == ["doc_id", "text", "dsir_logw"]
    rows = {r["doc_id"]: r["dsir_logw"] for r in out.collect()}
    assert rows[0] == 0.0 and rows[2] == 0.0  # no grams -> zero weight
