"""Gopher repetition statistics + filter (datapipe/repetition.py).

Hand-computed expectations on constructed documents, a pure-pandas
oracle over the real corpus, and a sync check between the module's
Gopher thresholds and the hardcoded copy in the gate oracle SQL.
"""

import math
import re

import pytest

from quickwit_spark.datapipe.repetition import (
    GOPHER_THRESHOLDS,
    repetition_filter,
    repetition_stats,
)

DOCS = [
    (0, "a a a a"),
    (1, "x\nx\ny"),
    (2, "one two three four five"),
    (3, "p q\n\np q\n\nr s"),
    (4, "w1 w2 w3 w1 w2 w3 w1 w2 w3 zz"),
    (5, ""),
    (6, "  \n \n  "),  # whitespace-only: every stat must be 0
    # 30 distinct tokens: top-2gram coverage 6/90, nothing repeated —
    # the only constructed doc long+diverse enough to pass every
    # Gopher threshold (they assume long web documents).
    (7, " ".join(f"t{i:02d}" for i in range(30))),
]


@pytest.fixture(scope="module", params=["arrow", "column"])
def stats(spark, request):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = repetition_stats(
        df, top_ngrams=(2, 3), dup_ngrams=(5,), impl=request.param
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_dup_line_fractions(stats):
    # "x\nx\ny": 3 lines, 2 distinct -> 1/3 by count and by chars
    assert math.isclose(stats[1]["dup_line_frac"], 1 / 3)
    assert math.isclose(stats[1]["dup_line_char_frac"], 1 / 3)
    # single-line docs have no duplicated lines
    assert stats[0]["dup_line_frac"] == 0.0
    assert stats[2]["dup_line_char_frac"] == 0.0


def test_dup_para_fractions(stats):
    # "p q\n\np q\n\nr s": 3 paragraphs, 2 distinct
    assert math.isclose(stats[3]["dup_para_frac"], 1 / 3)
    assert math.isclose(stats[3]["dup_para_char_frac"], 1 / 3)
    # \n (single) does not split paragraphs
    assert stats[1]["dup_para_frac"] == 0.0


def test_top_ngram_coverage_and_clamp(stats):
    # "a a a a": 'a a' occurs 3x, chars 2, token chars 4 -> 6/4 clamps to 1
    assert stats[0]["top_2gram_char_frac"] == 1.0
    # "w1 w2 w3 ... zz": 'w1 w2 w3' 3x, chars 6, token chars 20 -> 0.9
    assert math.isclose(stats[4]["top_3gram_char_frac"], 0.9)
    # no repetition: top2 = max single bigram chars / token chars
    assert math.isclose(stats[2]["top_2gram_char_frac"], 9 / 19)


def test_dup_ngram_all_occurrences_counted(stats):
    # Gopher convention: ALL occurrences of a repeated n-gram count.
    # doc 4 has two 5-grams appearing twice (chars 10 each) -> 40/20 -> 1.0
    assert stats[4]["dup_5gram_char_frac"] == 1.0
    assert stats[2]["dup_5gram_char_frac"] == 0.0


def test_empty_and_blank_docs_are_all_zero(stats):
    for doc in (5, 6):
        for k, v in stats[doc].items():
            if k.endswith("_frac"):
                assert v == 0.0, (doc, k, v)


def test_filter_drops_and_keeps(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    kept = {r["doc_id"] for r in repetition_filter(df).select("doc_id").collect()}
    assert 0 not in kept  # top_2gram_char_frac 1.0 > 0.20
    assert 4 not in kept  # dup_5gram_char_frac 1.0 > 0.15
    # doc 2 is dropped too: a ONCE-occurring bigram in a 5-token doc
    # covers 9/19 of its chars — Gopher thresholds assume long docs.
    assert 2 not in kept
    assert {5, 6, 7} <= kept
    # custom threshold: loosening top-2gram alone keeps doc 1
    kept2 = {
        r["doc_id"]
        for r in repetition_filter(
            df,
            thresholds={
                "top_2gram_char_frac": 1.0,
                "top_3gram_char_frac": 1.0,
                "dup_line_frac": 0.5,
                "dup_line_char_frac": 0.5,
            },
        ).select("doc_id").collect()
    }
    assert 1 in kept2


def test_filter_keep_stats_and_schema(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = repetition_filter(df, keep_stats=True)
    assert set(GOPHER_THRESHOLDS) <= set(out.columns)
    slim = repetition_filter(df)
    assert slim.columns == ["doc_id", "text"]


def _pandas_oracle(text, top_ns=(2, 3), dup_ns=(5,)):
    out = {}
    for prefix, sep in (("line", r"\n"), ("para", r"\n{2,}")):
        parts = [p for p in re.split(sep, text) if p.strip()]
        n = len(parts)
        chars = sum(len(p) for p in parts)
        from collections import Counter

        c = Counter(parts)
        dupch = sum((k - 1) * len(p) for p, k in c.items())
        out[f"dup_{prefix}_frac"] = (n - len(set(parts))) / n if n else 0.0
        out[f"dup_{prefix}_char_frac"] = dupch / chars if chars else 0.0
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    tc = sum(len(t) for t in toks)
    from collections import Counter

    for n in top_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        cov = max(
            (k * (len(g) - (n - 1)) for g, k in grams.items()), default=0
        )
        out[f"top_{n}gram_char_frac"] = min(cov / tc, 1.0) if tc else 0.0
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        dup = sum(k * (len(g) - (n - 1)) for g, k in grams.items() if k > 1)
        out[f"dup_{n}gram_char_frac"] = min(dup / tc, 1.0) if tc else 0.0
    return out


def test_against_pandas_oracle_on_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_stats(docs, top_ngrams=(2, 3), dup_ngrams=(5,)).collect()
    }
    for doc_id, row in got.items():
        exp = _pandas_oracle(row["text"])
        for k, v in exp.items():
            assert math.isclose(row[k], v, abs_tol=1e-9), (doc_id, k, row[k], v)


def test_arrow_equals_column_on_corpus(spark, sf_dir):
    """The Arrow fast path and the Column-expression spec must agree
    bit-for-bit on real corpus text (full default stat family)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    a = {r["doc_id"]: r.asDict()
         for r in repetition_stats(docs, impl="arrow").collect()}
    c = {r["doc_id"]: r.asDict()
         for r in repetition_stats(docs, impl="column").collect()}
    assert a.keys() == c.keys()
    for k in a:
        for col, v in a[k].items():
            assert v == c[k][col], (k, col, v, c[k][col])


def test_oracle_thresholds_in_sync():
    import __spark_entry__ as entry

    assert entry._REP_THRESHOLDS == GOPHER_THRESHOLDS


def test_arrow_equals_column_property(spark):
    """Hypothesis: arrow == column bit-for-bit on adversarial text —
    unicode whitespace (NBSP must NOT split: Java \\s is ASCII-only),
    tabs, newlines, repeated runs, empty/blank strings."""
    from hypothesis import given, settings, strategies as st

    pieces = st.sampled_from(
        ["a", "b", "aa", " ", "  ", "\n", "\n\n", "\t", ".", "#",
         "\u00e9", "\u00a0", "\u0130"]
    )
    texts = st.lists(
        st.lists(pieces, min_size=0, max_size=40).map("".join),
        min_size=1, max_size=12,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts)
    def check(batch):
        df = spark.createDataFrame(
            list(enumerate(batch)), "doc_id long, text string"
        )
        kw = dict(top_ngrams=(2,), dup_ngrams=(3,))
        a = {r["doc_id"]: r.asDict()
             for r in repetition_stats(df, impl="arrow", **kw).collect()}
        c = {r["doc_id"]: r.asDict()
             for r in repetition_stats(df, impl="column", **kw).collect()}
        assert a == c

    check()
