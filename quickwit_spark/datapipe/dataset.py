"""End-to-end tokenized-dataset export: text → BPE tokens →
fixed-length sequences → deterministically shuffled shards.

The final mile of a training-data pipeline, composed from the
operators in this package:

    1. `bpe.bpe_encode`         docs → token arrays (join against a
                                trained word→pieces table)
    2. `packing.pack_sequences` concat-and-chunk the token stream into
                                seq_len-sized context windows
                                (distributed prefix sum, span rows)
    3. span assembly            slice each doc's tokens by its span,
                                group by sequence, stitch in
                                seq_pos order (one shuffle, keyed by
                                seq_id — uniform by construction)
    4. `sharding.shuffle_shards` place sequences pseudo-randomly into
                                num_shards shards, deterministically
                                (a training reader then consumes
                                shards in parallel and sees mixed data)

Every stage is deterministic in (input, seed): a rerun — or a retried
task — reproduces byte-identical shards. No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.bpe import bpe_encode
from quickwit_spark.datapipe.packing import pack_sequences
from quickwit_spark.datapipe.sharding import write_shards


def assemble_sequences(
    encoded: DataFrame,
    seq_len: int,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(key, tokens) → (seq_id, tokens, n_docs): the corpus token
    stream in key order, chunked into sequences of exactly `seq_len`
    tokens (the final sequence may be shorter). `n_docs` counts the
    documents contributing to each sequence (attention-reset info)."""
    enc = encoded.withColumn("n_tokens", F.size(tokens_col))
    spans = pack_sequences(
        enc.select(key, "n_tokens"),
        key,
        "n_tokens",
        seq_len=seq_len,
        num_partitions=num_partitions,
    )
    sliced = spans.join(enc.select(key, tokens_col), key).select(
        "seq_id",
        "seq_pos_start",
        F.slice(
            F.col(tokens_col),
            (F.col("doc_tok_start") + 1).cast("int"),
            (F.col("doc_tok_end") - F.col("doc_tok_start")).cast("int"),
        ).alias("piece"),
    )
    return (
        sliced.groupBy("seq_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq_pos_start", "piece"))
            ).alias("parts")
        )
        .select(
            "seq_id",
            F.flatten(F.col("parts.piece")).alias("tokens"),
            F.size("parts").alias("n_docs"),
        )
    )


def map_tokens_to_ids(
    seqs: DataFrame,
    vocab_df: DataFrame,
    tokens_col: str = "tokens",
    out_col: str = "token_ids",
) -> DataFrame:
    """Replace each sequence's token strings with dense vocabulary ids
    (→ same schema with `tokens_col` swapped for `out_col`:
    array<int>). Tokens outside the vocabulary (characters never seen
    in training) map to -1, the conventional unk sentinel.

    Scale: posexplode → broadcast join against the vocab (a BPE vocab
    is ~10⁴–10⁵ rows — always broadcastable) → re-assemble in position
    order. One shuffle, keyed by seq_id (uniform by construction)."""
    other = [c for c in seqs.columns if c != tokens_col]
    ex = seqs.select(
        *other, F.posexplode(tokens_col).alias("_p", "token")
    )
    mapped = ex.join(
        F.broadcast(vocab_df.select("token", "token_id")), "token", "left"
    )
    return (
        mapped.groupBy(*other)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "_p",
                        F.coalesce(
                            F.col("token_id"), F.lit(-1)
                        ).alias("tid"),
                    )
                )
            ).alias("_parts")
        )
        .select(
            *other,
            F.col("_parts.tid").cast("array<int>").alias(out_col),
        )
    )


def build_token_dataset(
    docs: DataFrame,
    word_pieces: DataFrame,
    out_dir: str,
    *,
    seq_len: int = 2048,
    num_shards: int = 16,
    seed: int = 0,
    key: str = "doc_id",
    text_col: str = "text",
    broadcast_pieces: bool = True,
    vocab_df: DataFrame | None = None,
) -> None:
    """Tokenize `docs` with a trained BPE piece table, pack into
    `seq_len` context windows, and write `num_shards` deterministically
    shuffled shards under `out_dir` (shard_id=<i>/ parquet dirs, rows
    in pos order; columns seq_id, tokens, n_docs, shard_id, pos).
    With `vocab_df` (the trainer's token→token_id table), sequences
    are written as dense int ids (`token_ids`) instead of strings —
    the form a training reader consumes."""
    # persist the encode result: pack_sequences runs two driver
    # actions (quantile sketch + bucket totals) before the final
    # write — without the cache each one re-tokenizes the corpus
    enc = bpe_encode(
        docs,
        word_pieces,
        key=key,
        text_col=text_col,
        broadcast_table=broadcast_pieces,
    ).persist()
    try:
        seqs = assemble_sequences(enc, seq_len, key=key)
        if vocab_df is not None:
            seqs = map_tokens_to_ids(seqs, vocab_df)
        write_shards(seqs, out_dir, num_shards, key="seq_id", seed=seed)
    finally:
        enc.unpersist()
