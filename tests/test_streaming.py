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


def test_fresh_checkpoint_dir_does_not_drop_batches(spark, sf_dir, tmp_path):
    """Replay idempotency keys on (name, batch_id) in the manifest; the
    default name derives from the checkpoint dir, so a stream restarted
    with a FRESH checkpoint location (batch_ids restart at 0) indexes
    its batches instead of treating them as replays of the old stream's
    batch 0 and silently dropping them."""
    src1 = str(tmp_path / "in1")
    src2 = str(tmp_path / "in2")
    idx = str(tmp_path / "idx2")
    os.makedirs(src1)
    os.makedirs(src2)

    corpus = web_corpus(spark, sf_dir)
    corpus.filter(F.col("doc_id") < 100).write.mode("append").parquet(src1)
    corpus.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
    ).write.mode("append").parquet(src2)
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1
    )
    s1 = spark.readStream.schema(corpus.schema).parquet(src1)
    q = index_stream(s1, idx, cfg, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert sum(s.num_docs for s in mf.live_segments(idx)) == 100

    # second stream: DIFFERENT source + checkpoint, same index —
    # its batch 0 must not be mistaken for the first stream's batch 0
    s2 = spark.readStream.schema(corpus.schema).parquet(src2)
    q2 = index_stream(s2, idx, cfg, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    assert sum(s.num_docs for s in mf.live_segments(idx)) == 200
