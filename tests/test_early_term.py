"""Split-order early termination (reference `CanSplitDoBetter`,
`leaf.rs:958-1100`): a metadata score bound sorts segments, a phase-1
probe fixes θ, and provable losers are demoted to count-only/skip —
with results IDENTICAL to the full search."""

import tempfile

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.query.ast import Bool, FullText, MatchAll, Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    """Term 'needle' concentrated in one routing partition: category 0
    docs repeat it, category 1 has a trace, categories 2-3 never see it
    — the skewed-split shape where split ordering pays off."""
    idx = tempfile.mkdtemp(prefix="qws_early_")
    docs = (
        web_corpus(spark, sf_dir)
        .withColumn("cat", (F.col("doc_id") % 4).cast("string"))
        .withColumn(
            "text",
            F.when(
                F.col("cat") == "0",
                F.concat(F.col("text"), F.lit(" needle needle needle")),
            )
            .when(
                (F.col("cat") == "1") & (F.col("doc_id") % 40 == 1),
                F.concat(F.col("text"), F.lit(" needle")),
            )
            .otherwise(F.col("text")),
        )
    )
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=4,
        routing_column="cat",
        stored_columns=("lang", "cat"),
    )
    build_index(spark, docs, idx, cfg)
    return IndexSearcher(spark, idx)


def _rows(df):
    return [(r["doc_key"], round(r["score"], 6)) for r in df.collect()]


def test_early_identical_and_demotes(skewed):
    full = skewed.search(Term("text", "needle"), k=10)
    et = skewed.search_early(Term("text", "needle"), k=10)
    assert _rows(et["hits"]) == _rows(full)
    # the needle-free segments bound at 0 and are provably losers
    zero_bound = [s for s, b in et["bounds"].items() if b == 0.0]
    assert len(zero_bound) >= 2
    assert set(zero_bound) <= set(et["demoted"])
    # exact num_hits via the count path (CountHits::CountAll)
    assert et["num_hits"] == skewed.count(Term("text", "needle"))
    # underestimate mode counts only the searched segments — here the
    # needle-free demoted segments hold no matches, so the underestimate
    # happens to equal the exact count; it can never exceed it.
    et2 = skewed.search_early(
        Term("text", "needle"), k=10, count_hits="underestimate"
    )
    under = et2["num_hits"]
    exact = skewed.count(Term("text", "needle"))
    assert under is not None and 0 < under <= exact
    assert under == skewed.count(
        Term("text", "needle"), segments=et2["phase1"] + et2["phase2"]
    )
    assert _rows(et2["hits"]) == _rows(full)


def test_early_or_query_and_fallback(skewed):
    q = FullText("text", "needle table", "or")
    full = skewed.search(q, k=10)
    et = skewed.search_early(q, k=10)
    assert _rows(et["hits"]) == _rows(full)
    # score-less query → no bound → graceful fallback to full search
    et_ma = skewed.search_early(MatchAll(), k=5)
    assert et_ma["demoted"] == [] and len(et_ma["hits"].collect()) == 5
    # zero-score anchored bool: every segment stays a contender when k
    # isn't filled by positive scores (rank-identity over demotion)
    q2 = Bool(must=[MatchAll()], should=[Term("text", "needle")])
    full2 = skewed.search(q2, k=10)
    et3 = skewed.search_early(q2, k=10)
    assert _rows(et3["hits"]) == _rows(full2)


def test_search_plan_shows_demotion(skewed):
    plan = skewed.search_plan(Term("text", "needle"), early_terminate=True)
    tri = plan["early_termination"]
    assert tri["demoted_count_only"], tri
    assert set(tri["phase1"]) | set(tri["phase2"]) | set(
        tri["demoted_count_only"]
    ) == set(plan["segments_searched"])
