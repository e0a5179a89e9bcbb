"""Streaming incremental MinHash-LSH dedup (streaming/near_dedup.py)."""

import time

from pyspark.sql import functions as F

from quickwit_spark.streaming.near_dedup import NearDedupStream

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps on running "
    "through the quiet green fields toward the river bank at dawn while "
    "birds are singing in the tall trees and the morning light slowly "
    "spreads across the whole wide valley floor"
)
VARIANT = BASE.replace("quiet", "silent")  # near-dup of BASE
OTHER = (
    "completely different subject matter entirely unrelated words "
    "about databases indexes postings compression and query engines"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _stream(tmp_path, name):
    d = tmp_path / name
    d.mkdir()
    return str(d)


def test_batch_semantics_and_cross_batch_store(spark, tmp_path):
    nd = NearDedupStream(
        _stream(tmp_path, "store"), _stream(tmp_path, "out")
    )
    # batch 0: BASE, its near-variant, and an unrelated doc
    nd.process_batch(
        _mk(spark, [(1, BASE), (2, VARIANT), (3, OTHER)]), 0
    )
    kept0 = set(
        r["doc_id"]
        for r in spark.read.parquet(f"{nd.out_dir}/batch=000000").collect()
    )
    assert 1 in kept0 and 3 in kept0  # anchors survive
    assert 2 not in kept0  # within-batch near-dup dropped

    # batch 1: replay of BASE (store hit) + a genuinely new doc
    new_doc = "fresh unique sentence with novel vocabulary never seen before here"
    nd.process_batch(_mk(spark, [(10, BASE), (11, new_doc)]), 1)
    kept1 = set(
        r["doc_id"]
        for r in spark.read.parquet(f"{nd.out_dir}/batch=000001").collect()
    )
    assert 10 not in kept1  # killed by the store
    assert 11 in kept1

    # global survivors via the partitioned reader
    all_kept = set(r["doc_id"] for r in nd.kept(spark).collect())
    assert all_kept == kept0 | kept1


def test_replay_same_batch_id_is_idempotent(spark, tmp_path):
    nd = NearDedupStream(
        _stream(tmp_path, "store"), _stream(tmp_path, "out")
    )
    batch = _mk(spark, [(1, BASE), (2, OTHER)])
    nd.process_batch(batch, 0)
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(nd.out_dir).collect()
    )
    # failure replay: same batch_id re-runs with the store already
    # holding this batch's buckets — the batch<id filter must hide them
    nd.process_batch(batch, 0)
    second = sorted(
        r["doc_id"] for r in spark.read.parquet(nd.out_dir).collect()
    )
    assert first == second == [1, 2]
    # store holds exactly one batch partition
    batches = set(
        r["batch"]
        for r in spark.read.parquet(nd.store_dir).select("batch").collect()
    )
    assert batches == {0}


def test_transitive_chain_across_batches(spark, tmp_path):
    """A kept, B dropped as near-dup of A, C near-dup of B ONLY:
    C must still be dropped — the dropped doc's buckets enter the
    store (transitive recall, like batch connected components)."""
    words = [f"w{i:03d}" for i in range(100)]
    a_text = " ".join(words)
    b_text = " ".join(words[:-10] + [f"x{i}" for i in range(10)])
    c_text = " ".join([f"y{i}" for i in range(10)] + words[10:-10]
                      + [f"x{i}" for i in range(10)])
    nd = NearDedupStream(
        _stream(tmp_path, "store"), _stream(tmp_path, "out")
    )
    nd.process_batch(_mk(spark, [(1, a_text)]), 0)
    nd.process_batch(_mk(spark, [(2, b_text)]), 1)
    nd.process_batch(_mk(spark, [(3, c_text)]), 2)
    kept = {r["doc_id"] for r in nd.kept(spark).collect()}
    assert kept == {1}
    # sanity: C really does NOT collide with A directly — only via B
    from quickwit_spark.datapipe.dedup import (
        lsh_band_buckets,
        minhash_signatures,
    )

    def bucket_set(text):
        df = _mk(spark, [(9, text)])
        sigs = minhash_signatures(df, "doc_id", num_perm=32)
        return {
            (r["band"], r["bucket"])
            for r in lsh_band_buckets(sigs, "doc_id", 8, 4).collect()
        }

    assert not (bucket_set(a_text) & bucket_set(c_text))
    assert bucket_set(b_text) & bucket_set(c_text)
    # and the dropped doc's buckets are in the store (batch=1 rows)
    assert spark.read.parquet(nd.store_dir).filter("batch = 1").count() > 0


def test_attached_file_stream_end_to_end(spark, tmp_path):
    src = _stream(tmp_path, "src")
    nd = NearDedupStream(
        _stream(tmp_path, "store2"), _stream(tmp_path, "out2")
    )
    df1 = _mk(spark, [(1, BASE), (2, OTHER)])
    df1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(df1.schema).parquet(src)
    q = nd.attach(stream, _stream(tmp_path, "ckpt"), available_now=True)
    q.awaitTermination(120)
    assert nd.kept(spark).count() == 2

    # second file: one dup of batch-0 content, one new — restart stream
    _mk(spark, [(5, VARIANT), (6, "another brand new never seen text")]) \
        .coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.2)
    stream2 = spark.readStream.schema(df1.schema).parquet(src)
    q2 = nd.attach(stream2, str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(120)
    kept = {r["doc_id"] for r in nd.kept(spark).collect()}
    assert kept == {1, 2, 6}


def test_agrees_with_batch_anchor_dedup(spark, tmp_path):
    """Feeding the whole corpus as ONE batch equals the batch-mode
    anchor dedup (same signatures, same star rule)."""
    from quickwit_spark.datapipe.dedup import (
        dedup_canonical,
        minhash_lsh_edges,
        minhash_signatures,
    )

    rows = [(1, BASE), (2, VARIANT), (3, OTHER), (4, BASE + " extra")]
    df = _mk(spark, rows)
    nd = NearDedupStream(
        _stream(tmp_path, "store3"), _stream(tmp_path, "out3")
    )
    nd.process_batch(df, 0)
    streamed = {r["doc_id"] for r in nd.kept(spark).collect()}

    sigs = minhash_signatures(df, "doc_id", num_perm=32)
    edges = minhash_lsh_edges(sigs, "doc_id", bands=8, rows=4)
    dropped = {r["key_b"] for r in edges.select("key_b").distinct().collect()}
    batch_kept = {i for i, _ in rows} - dropped
    assert streamed == batch_kept
    # and dedup_canonical keeps at least the component minima of these
    canon = {r["doc_id"] for r in dedup_canonical(df, edges).collect()}
    assert canon <= streamed | dropped


def test_bad_bands_config_raises(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        NearDedupStream("s", "o", num_perm=30, bands=8)
