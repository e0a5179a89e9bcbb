"""Streaming indexing: files arrive → micro-batches build segments →
searchable index, resumable across restarts."""

import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig
from quickwit_spark.query.ast import Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus
from quickwit_spark.streaming import index_stream


def test_stream_indexing_builds_searchable_index(spark, sf_dir, tmp_path):
    src = str(tmp_path / "incoming")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    corpus = web_corpus(spark, sf_dir)
    first = corpus.filter(F.col("doc_id") < 250)
    second = corpus.filter(F.col("doc_id") >= 250)
    first.write.mode("append").parquet(src)

    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("url", "lang"),
        time_column="warc_ts",
    )
    stream = spark.readStream.schema(corpus.schema).parquet(src)

    q = index_stream(stream, idx, cfg, ckpt, name="s")
    q.awaitTermination(120)

    segs = mf.live_segments(idx)
    assert sum(s.num_docs for s in segs) == 250

    # second file lands → restart the stream (availableNow) → new batch
    second.write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(corpus.schema).parquet(src)
    q2 = index_stream(stream2, idx, cfg, ckpt, name="s")
    q2.awaitTermination(120)

    segs = mf.live_segments(idx)
    assert sum(s.num_docs for s in segs) == 500

    s = IndexSearcher(spark, idx)
    n = s.count(Term("text", "spark"))
    brute = (
        corpus.select(F.explode(F.split("text", " ")).alias("t"), "doc_id")
        .filter(F.col("t") == "spark")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n == brute
