"""Streamed-vs-batch equivalence on random queries.

The gate (`search_streamed_topk`) pins one query; here the same corpus
is indexed twice — once through Structured Streaming micro-batches
(`index_stream`, maxFilesPerTrigger forcing ≥2 commits) and once with
the one-shot batch build — and seeded random query trees must return
identical counts AND identical oracle-mode (doc_key, score, rank)
rows. Oracle mode uses corpus-global statistics, so the two indexes'
different segment layouts must not leak into results (the same
partition-invariance the kernel fuzz proves, here through the real
streaming commit path)."""

from __future__ import annotations

import os
import random

import pytest

from test_count_differential import _gen_ast, vocab  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def pair(spark, sf_dir, tmp_path_factory):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.streaming.indexing import index_stream

    base = str(tmp_path_factory.mktemp("stream_diff"))
    src = os.path.join(base, "src")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.repartition(4, "doc_id").write.parquet(src)

    def cfg():
        return IndexConfig(
            fields=[
                FieldConfig("text"),
                FieldConfig("lang", tokenizer="raw"),
            ],
            doc_key="doc_id",
            num_partitions=2,
            stored_columns=("lang", "source", "n_chars"),
        )

    batch_idx = os.path.join(base, "batch")
    build_index(spark, spark.read.parquet(src), batch_idx, cfg())

    stream_idx = os.path.join(base, "stream")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)  # ≥4 micro-batch commits
        .parquet(src)
    )
    q = index_stream(
        stream, stream_idx, cfg(), checkpoint_dir=os.path.join(base, "ckpt")
    )
    assert q.awaitTermination(300), "streamed build did not finish in 300s"
    return IndexSearcher(spark, batch_idx), IndexSearcher(spark, stream_idx)


def test_streamed_equals_batch_on_random_queries(pair, vocab):
    batch, streamed = pair
    assert len(streamed.segments) > len(batch.segments)  # really micro-batched
    rng = random.Random(1212)
    for _ in range(10):
        ast = _gen_ast(rng, vocab, depth=1, allow_range=False)
        assert batch.count(ast) == streamed.count(ast), ast
        rows_b = [
            (r["doc_key"], r["score"], r["rank"])
            for r in batch.search(ast, k=10, mode="oracle").collect()
        ]
        rows_s = [
            (r["doc_key"], r["score"], r["rank"])
            for r in streamed.search(ast, k=10, mode="oracle").collect()
        ]
        assert rows_b == rows_s, ast
