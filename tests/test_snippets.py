"""Snippet generation (reference fetch_docs.rs:41-167, tantivy
SnippetGenerator semantics)."""

import tempfile

import pytest

from quickwit_spark.search.snippets import snippet_for_text


def test_basic_highlight():
    s = snippet_for_text("the quick brown fox", {"quick": 1.0})
    assert s == "quick brown fox" or "<b>quick</b>" in s
    assert "<b>quick</b>" in s


def test_no_match_returns_empty():
    assert snippet_for_text("nothing to see", {"absent": 1.0}) == ""
    assert snippet_for_text("", {"x": 1.0}) == ""
    assert snippet_for_text(None, {"x": 1.0}) == ""


def test_best_window_picks_densest_region():
    text = ("alpha " * 40) + "spark join stream" + (" omega" * 40)
    s = snippet_for_text(text, {"spark": 1.0, "join": 1.0, "stream": 1.0}, max_chars=40)
    assert "<b>spark</b>" in s and "<b>join</b>" in s and "<b>stream</b>" in s
    assert len(s) <= 40 + 3 * len("<b></b>")


def test_window_respects_max_chars_and_ties_earliest():
    text = "spark one two three four five six seven eight nine ten spark"
    s = snippet_for_text(text, {"spark": 1.0}, max_chars=20)
    # both occurrences score 1; earliest window wins
    assert s.startswith("<b>spark</b>")


def test_case_insensitive_match_preserves_original_case():
    s = snippet_for_text("Spark Is Fast", {"spark": 1.0})
    assert "<b>Spark</b>" in s


def test_search_with_snippets_e2e(spark, sf_dir):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = tempfile.mkdtemp(prefix="qws_snip_")
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("text", "url"),
    )
    build_index(spark, web_corpus(spark, sf_dir), idx, cfg)
    s = IndexSearcher(spark, idx)
    rows = s.search(
        "spark OR join", k=5, fetch=["url"], snippet_fields=["text"]
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert "text" not in r.asDict()  # raw column dropped (not fetched)
        assert r["url"].startswith("https://")
        assert "<b>" in r["snippet_text"]
        inner = r["snippet_text"].replace("<b>", "").replace("</b>", "")
        assert inner in _full_text(spark, sf_dir, r["doc_key"])


def _full_text(spark, sf_dir, doc_key):
    from quickwit_spark.sources.corpus import web_corpus

    return (
        web_corpus(spark, sf_dir)
        .filter(f"doc_id = {doc_key}")
        .select("text")
        .collect()[0]["text"]
    )
