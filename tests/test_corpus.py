"""Corpus derivation + the byte-identical extraction invariant.

The north rule requires: extraction yields byte-identical `text` per
`url` versus the pinned extractor on `html`. `extract_text` is that
extractor; this is the per-row invariant test."""

from pyspark.sql import functions as F

from quickwit_spark.sources.corpus import extract_text, web_corpus


def test_extract_text_byte_identical(spark, sf_dir):
    corpus = web_corpus(spark, sf_dir, with_html=True)
    out = extract_text(corpus)
    mismatches = out.filter(
        F.encode("extracted_text", "utf-8") != F.encode("text", "utf-8")
    ).count()
    assert mismatches == 0
    # and per url: one row, extraction deterministic across reruns
    assert out.select("url").distinct().count() == out.count()
    again = extract_text(corpus).select("url", "extracted_text")
    joined = (
        out.select("url", F.col("extracted_text").alias("a"))
        .join(again.withColumnRenamed("extracted_text", "b"), "url")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert joined == 0


def test_corpus_deterministic_columns(spark, sf_dir):
    c = web_corpus(spark, sf_dir).orderBy("doc_id").limit(3).collect()
    assert c[0]["url"] == "https://site0.example/p/0"
    assert c[1]["url"] == "https://site1.example/p/1"
    assert str(c[1]["warc_ts"]).startswith("2024-01-01 00:01:37")
