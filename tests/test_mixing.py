"""Domain-mixture sampling (datapipe/mixing.py): plan arithmetic,
determinism, mixture convergence, and edge cases."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.mixing import mixture_plan, mixture_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # 600 a / 300 b / 100 c
    rows = [(i, "a" if i < 600 else "b" if i < 900 else "c")
            for i in range(1000)]
    return spark.createDataFrame(rows, ["doc_id", "dom"])


def test_plan_binding_domain_keeps_all(corpus):
    # target 50/25/25: c is binding (100 docs / 0.25 → T=400);
    # keeps: a 200/600, b 100/300, c 100/100
    plan = mixture_plan(corpus, {"a": 2, "b": 1, "c": 1}, "dom")
    assert plan["c"]["keep_prob"] == 1.0
    assert plan["a"]["keep_prob"] == pytest.approx(200 / 600, abs=1e-9)
    assert plan["b"]["keep_prob"] == pytest.approx(100 / 300, abs=1e-9)
    # weights normalized: raw 2/1/1 == 0.5/0.25/0.25
    assert plan["a"]["weight"] == 0.5


def test_sample_hits_mixture_and_is_deterministic(corpus):
    kept = mixture_sample(corpus, {"a": 0.5, "b": 0.25, "c": 0.25}, "dom")
    by = {r["dom"]: r["n"] for r in
          kept.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert by["c"] == 100                      # binding domain: all kept
    # expected 200 / 100; hash sampling at n=600/300 → generous bounds
    assert abs(by["a"] - 200) < 60 and abs(by["b"] - 100) < 45
    again = mixture_sample(corpus, {"a": 0.5, "b": 0.25, "c": 0.25}, "dom")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    other = mixture_sample(
        corpus, {"a": 0.5, "b": 0.25, "c": 0.25}, "dom", seed=1
    )
    assert sorted(r["doc_id"] for r in other.collect()) != sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_unweighted_domain_dropped_and_marks(corpus):
    marks = mixture_sample(
        corpus, {"a": 1.0, "b": 1.0}, "dom", marks=True
    )
    c_rows = marks.filter(F.col("domain") == "c").collect()
    assert c_rows and all(not r["is_kept"] for r in c_rows)
    assert all(r["keep_prob"] == 0.0 for r in c_rows)
    assert marks.columns == ["doc_id", "domain", "keep_prob", "is_kept"]


def test_errors(corpus):
    with pytest.raises(ValueError, match="positive"):
        mixture_plan(corpus, {"a": 0.0}, "dom")
    with pytest.raises(ValueError, match="no rows"):
        mixture_plan(corpus, {"zz": 1.0}, "dom")


def test_curate_with_mixture_stage(spark, sf_dir):
    from quickwit_spark.datapipe.curate import curate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out, report = curate(
        docs,
        redact=False,
        near_dup=False,
        # the Gopher stopword rule is English-centric; zero it so the
        # de/fr domains survive to the mixture stage on this corpus
        quality_bounds={"min_stopword_hits": 0},
        mixture={"en": 0.5, "de": 0.25, "fr": 0.25},
        with_report=True,
        persist_intermediate=False,
    )
    stages = dict(report)
    assert "mixture" in stages and 0 < stages["mixture"] < stages["input"]
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert set(counts) == {"en", "de", "fr"}  # unweighted domains dropped
    # en should be roughly twice de and fr
    assert abs(counts["en"] / (counts["de"] + counts["fr"]) - 1.0) < 0.35
    assert set(out.columns) == {"doc_id", "text", "lang"}
