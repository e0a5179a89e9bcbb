"""End-to-end tokenized-dataset export (datapipe/dataset.py)."""

import json
import sys

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.bpe import bpe_encode, train_bpe, word_histogram
from quickwit_spark.datapipe.dataset import (
    assemble_sequences,
    build_token_dataset,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )


@pytest.fixture(scope="module")
def pieces(docs):
    _, p = train_bpe(word_histogram(docs), num_merges=30)
    return p


def test_assemble_sequences_reconstructs_the_stream(docs, pieces):
    L = 512
    enc = bpe_encode(docs, pieces)
    seqs = assemble_sequences(enc, L).orderBy("seq_id").collect()
    total = enc.agg(F.sum(F.size("tokens"))).first()[0]
    # every sequence full except the last; ids dense from 0
    assert [r["seq_id"] for r in seqs] == list(range(len(seqs)))
    for r in seqs[:-1]:
        assert len(r["tokens"]) == L
    assert len(seqs[-1]["tokens"]) == total - (len(seqs) - 1) * L
    # concatenating sequences == concatenating docs in key order
    stream = [t for r in seqs for t in r["tokens"]]
    doc_stream = [
        t
        for r in enc.orderBy("doc_id").collect()
        for t in r["tokens"]
    ]
    assert stream == doc_stream
    # n_docs: at least one per sequence, sums to >= doc span rows
    assert all(r["n_docs"] >= 1 for r in seqs)


def test_build_token_dataset_writes_shuffled_shards(
    docs, pieces, spark, tmp_path
):
    out = str(tmp_path / "ds")
    build_token_dataset(
        docs, pieces, out, seq_len=256, num_shards=4, seed=3
    )
    back = spark.read.parquet(out)
    n_seqs = back.count()
    assert n_seqs > 4
    # deterministic: a rerun writes the identical dataset
    out2 = str(tmp_path / "ds2")
    build_token_dataset(
        docs, pieces, out2, seq_len=256, num_shards=4, seed=3
    )
    a = sorted(
        (r["seq_id"], r["shard_id"], r["pos"], tuple(r["tokens"]))
        for r in back.collect()
    )
    b = sorted(
        (r["seq_id"], r["shard_id"], r["pos"], tuple(r["tokens"]))
        for r in spark.read.parquet(out2).collect()
    )
    assert a == b
    # every sequence present exactly once across shards
    assert back.select("seq_id").distinct().count() == n_seqs
    # within-shard pos dense
    for s in range(4):
        poss = sorted(
            r["pos"] for r in back.filter(F.col("shard_id") == s).collect()
        )
        assert poss == list(range(len(poss)))


def test_dataset_job_cli(docs, pieces, spark, tmp_path, monkeypatch, capsys):
    from quickwit_spark.datapipe.bpe import vocab

    src = str(tmp_path / "corpus")
    docs.write.parquet(src)
    model = str(tmp_path / "model")
    pieces.write.parquet(f"{model}/word_pieces")
    vocab([], pieces).write.parquet(f"{model}/vocab")
    out = str(tmp_path / "out")
    import jobs.dataset_job as dj

    monkeypatch.setattr(
        sys,
        "argv",
        ["dataset_job.py", "--input", src, "--model", model, "--output",
         out, "--seq-len", "256", "--num-shards", "2"],
    )
    dj.main()
    info = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert info["sequences"] == spark.read.parquet(out).count() > 0

    # --ids mode reads the model vocab and writes dense int arrays
    out2 = str(tmp_path / "out_ids")
    monkeypatch.setattr(
        sys,
        "argv",
        ["dataset_job.py", "--input", src, "--model", model, "--output",
         out2, "--seq-len", "256", "--num-shards", "2", "--ids"],
    )
    dj.main()
    back = spark.read.parquet(out2)
    assert "token_ids" in back.columns and "tokens" not in back.columns
    assert back.count() == info["sequences"]


def test_token_id_paths_agree(docs, pieces, spark, tmp_path):
    from quickwit_spark.datapipe.bpe import train_bpe, vocab, word_histogram
    from quickwit_spark.datapipe.dataset import (
        assemble_sequences,
        map_tokens_to_ids,
    )

    merges, p2 = train_bpe(word_histogram(docs), num_merges=30)
    v = vocab(merges, p2)
    id2tok = {r["token_id"]: r["token"] for r in v.collect()}

    # path 1: encode-time ids (word-table join, the exporter path)
    enc_ids = bpe_encode(docs, p2, vocab_df=v)
    assert "token_ids" in enc_ids.columns
    # path 2: string encode + standalone mapper
    enc_str = bpe_encode(docs, p2)
    mapped = map_tokens_to_ids(
        enc_str.drop("n_tokens"), v, tokens_col="tokens"
    )
    a = {r["doc_id"]: list(r["token_ids"]) for r in enc_ids.collect()}
    b = {r["doc_id"]: list(r["token_ids"]) for r in mapped.collect()}
    assert a == b
    # ids decode back to the string tokens
    toks = {r["doc_id"]: list(r["tokens"]) for r in enc_str.collect()}
    for d, ids in a.items():
        assert [id2tok[i] for i in ids] == toks[d]
        assert all(i >= 0 for i in ids)  # in-vocab corpus: no OOV

    # sequences assemble identically over int arrays
    seqs = assemble_sequences(enc_ids, 256, tokens_col="token_ids")
    stream = [
        t
        for r in seqs.orderBy("seq_id").collect()
        for t in r["token_ids"]
    ]
    doc_stream = [t for d in sorted(a) for t in a[d]]
    assert stream == doc_stream

    # OOV sentinel: a vocab missing chars maps them to -1 on both paths
    small_v = v.filter(F.col("token_id") < 5)
    r1 = bpe_encode(docs.limit(3), p2, vocab_df=small_v).collect()
    assert min(min(r["token_ids"]) for r in r1 if r["token_ids"]) == -1

    # mapper guards: empty-token rows survive; no-id-column frame raises
    empt = spark.createDataFrame(
        [(1, ["a"]), (2, [])], ["k", "tokens"]
    )
    kept = {r["k"]: list(r["token_ids"])
            for r in map_tokens_to_ids(empt, v).collect()}
    assert set(kept) == {1, 2} and kept[2] == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        map_tokens_to_ids(empt.select("tokens"), v)


def test_build_token_dataset_ids_mode(docs, pieces, spark, tmp_path):
    from quickwit_spark.datapipe.bpe import train_bpe, vocab, word_histogram

    merges, p2 = train_bpe(word_histogram(docs), num_merges=20)
    v = vocab(merges, p2)
    out = str(tmp_path / "ids_ds")
    build_token_dataset(
        docs, p2, out, seq_len=256, num_shards=2, vocab_df=v
    )
    back = spark.read.parquet(out)
    assert "token_ids" in back.columns and "tokens" not in back.columns
    assert back.filter(F.size("token_ids") <= 0).count() == 0
    # non-numeric key rejected up front
    import pytest as _pytest

    with _pytest.raises(TypeError):
        build_token_dataset(
            docs.withColumn("sid", F.col("doc_id").cast("string")),
            p2, out, seq_len=256, num_shards=2, key="sid",
        )
