"""Gopher quality rules (datapipe/gopher_quality.py): hand-computed
expectations on constructed docs + filter bound overrides."""

import math

import pytest

from quickwit_spark.datapipe.gopher_quality import (
    GOPHER_QUALITY_BOUNDS,
    REQUIRED_STOPWORDS,
    gopher_quality_filter,
    gopher_quality_stats,
)

DOCS = [
    (0, "the cat sat of the mat and that have with " * 10),
    (1, "# # # word"),
    (2, "• one\n• two\n- three\nplain"),
    (3, "end...\nmore…   \nplain"),
    (4, "1 2 3 4 5 6 7 8 9"),
    (5, ""),
    (6, "text with an ellipsis mid...dle and trailing dots...."),
]


@pytest.fixture(scope="module", params=["arrow", "column"])
def stats(spark, request):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = gopher_quality_stats(df, impl=request.param)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_word_count_and_mean_len(stats):
    assert stats[0]["word_count"] == 100
    assert math.isclose(stats[0]["mean_word_len"], 3.2)
    assert stats[5]["word_count"] == 0
    assert stats[5]["mean_word_len"] == 0.0


def test_symbol_ratio(stats):
    # 3 '#' over 4 words
    assert math.isclose(stats[1]["symbol_word_ratio"], 0.75)
    # "end..." + "more…" = 2 ellipses over 3 words
    assert math.isclose(stats[3]["symbol_word_ratio"], 2 / 3)
    # '....' counts one non-overlapping '...'; 'mid...dle' counts too;
    # 8 whitespace words
    assert math.isclose(stats[6]["symbol_word_ratio"], 2 / 8)


def test_bullet_and_ellipsis_lines(stats):
    assert math.isclose(stats[2]["bullet_line_frac"], 0.75)
    assert stats[2]["ellipsis_line_frac"] == 0.0
    # trailing spaces after '…' are rtrimmed; 'plain' doesn't count
    assert math.isclose(stats[3]["ellipsis_line_frac"], 2 / 3)
    # mid-word '...' does not END a line; trailing '....' does
    assert math.isclose(stats[6]["ellipsis_line_frac"], 1.0)


def test_alpha_word_frac(stats):
    assert stats[4]["alpha_word_frac"] == 0.0
    assert stats[0]["alpha_word_frac"] == 1.0
    assert math.isclose(stats[2]["alpha_word_frac"], 4 / 7)


def test_stopword_hits_distinct(stats):
    # doc 0 contains the, of, and, that, have, with (distinct = 6)
    assert stats[0]["stopword_hits"] == 6
    assert stats[1]["stopword_hits"] == 0
    assert len(REQUIRED_STOPWORDS) == 8


def test_filter_bounds_and_overrides(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {r["doc_id"] for r in gopher_quality_filter(df).select("doc_id").collect()}
    assert kept == {0}  # only the long stopword-rich doc passes defaults
    loose = {
        r["doc_id"]
        for r in gopher_quality_filter(
            df,
            bounds={"min_word_count": 3, "min_stopword_hits": 0,
                    "min_mean_word_len": 1.0, "min_alpha_word_frac": 0.5},
        ).select("doc_id").collect()
    }
    assert 2 in loose and 0 in loose
    assert 1 not in loose  # still killed by symbol_word_ratio 0.75
    assert 4 not in loose  # alpha_word_frac 0 < 0.5


def test_keep_stats_and_schema(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = gopher_quality_filter(df, keep_stats=True)
    assert {"word_count", "symbol_word_ratio", "stopword_hits"} <= set(out.columns)
    assert gopher_quality_filter(df).columns == ["doc_id", "text"]
    assert set(GOPHER_QUALITY_BOUNDS) == {
        "min_word_count", "max_word_count", "min_mean_word_len",
        "max_mean_word_len", "max_symbol_word_ratio",
        "max_bullet_line_frac", "max_ellipsis_line_frac",
        "min_alpha_word_frac", "min_stopword_hits",
    }


def test_oracle_bounds_in_sync():
    import __spark_entry__ as entry

    assert entry._GQ_BOUNDS == {**GOPHER_QUALITY_BOUNDS,
                                "min_stopword_hits": 1}


def test_arrow_equals_column_on_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    a = {r["doc_id"]: r.asDict()
         for r in gopher_quality_stats(docs, impl="arrow").collect()}
    c = {r["doc_id"]: r.asDict()
         for r in gopher_quality_stats(docs, impl="column").collect()}
    assert a == c


def test_arrow_equals_column_property(spark):
    """Hypothesis: arrow == column on adversarial text (NBSP must not
    split words: Java \\s is ASCII; bullets, ellipses, symbols)."""
    from hypothesis import given, settings, strategies as st

    pieces = st.sampled_from(
        ["a", "the", "aa", " ", "\n", "\n\n", "\t", ".", "...", "#",
         "• ", "- ", "…", "é", " ", "12"]
    )
    texts = st.lists(
        st.lists(pieces, min_size=0, max_size=30).map("".join),
        min_size=1, max_size=10,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts)
    def check(batch):
        df = spark.createDataFrame(
            list(enumerate(batch)), "doc_id long, text string"
        )
        a = {r["doc_id"]: r.asDict()
             for r in gopher_quality_stats(df, impl="arrow").collect()}
        c = {r["doc_id"]: r.asDict()
             for r in gopher_quality_stats(df, impl="column").collect()}
        assert a == c

    check()


def test_restats_of_stats_no_duplicate_columns(spark):
    """Re-running stats on an output that already carries the stat
    columns must overwrite (like withColumn), not duplicate fields."""
    df = spark.createDataFrame([(0, "the of and words here")],
                               ["doc_id", "text"])
    for impl in ("arrow", "column"):
        once = gopher_quality_stats(df, impl=impl)
        twice = gopher_quality_stats(once, impl=impl)
        assert len(twice.columns) == len(set(twice.columns))
        assert twice.select("word_count").count() == 1
