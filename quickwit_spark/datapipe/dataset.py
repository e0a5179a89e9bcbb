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
    """(key, tokens) → (seq_id, <tokens_col>, n_docs): the corpus
    token stream in key order, chunked into sequences of exactly
    `seq_len` tokens (the final sequence may be shorter). `n_docs`
    counts the documents contributing to each sequence
    (attention-reset info). Works over any array element type — the
    output column keeps the input's name (`tokens` or `token_ids`)."""
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
            F.flatten(F.col("parts.piece")).alias(tokens_col),
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

    This is the STANDALONE mapper (token-scale posexplode + broadcast
    vocab join + positional re-assembly — one extra shuffle). The
    dataset exporter does NOT use it: `bpe_encode(vocab_df=...)`
    attaches ids at the word-table level for free. Prefer that path
    when you control the encode step; use this one to convert
    already-materialized string-token frames."""
    other = [c for c in seqs.columns if c != tokens_col]
    if not other:
        raise ValueError(
            "seqs needs at least one identifying column besides "
            f"{tokens_col!r} to group rows by"
        )
    ex = seqs.select(
        *other, F.posexplode(tokens_col).alias("_p", "token")
    )
    mapped = ex.join(
        F.broadcast(vocab_df.select("token", "token_id")), "token", "left"
    )
    grouped = (
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
    # rows with empty token arrays emit nothing from posexplode —
    # restore them with an empty id array rather than dropping them
    return (
        seqs.select(*other)
        .join(grouped, other, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col(out_col), F.array().cast("array<int>")),
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
    the form a training reader consumes; ids are attached inside the
    encode join (word-table scale, no extra token-scale shuffle).

    `key` must be a NUMERIC unique column — the packer's deterministic
    range bucketing (packing.pack_token_shards) quantile-sketches it."""
    from pyspark.sql.types import NumericType

    if not isinstance(docs.schema[key].dataType, NumericType):
        raise TypeError(
            f"build_token_dataset needs a numeric key column, got "
            f"{key}: {docs.schema[key].dataType} — add a numeric "
            "surrogate (e.g. monotonically increasing id + "
            "zipWithIndex-style dense rank) before exporting"
        )
    tokens_col = "tokens" if vocab_df is None else "token_ids"
    # persist the encode result: pack_sequences runs two driver
    # actions (quantile sketch + bucket totals) before the final
    # write — without the cache each one re-tokenizes the corpus
    enc = bpe_encode(
        docs,
        word_pieces,
        key=key,
        text_col=text_col,
        broadcast_table=broadcast_pieces,
        vocab_df=vocab_df,
    ).persist()
    try:
        seqs = assemble_sequences(enc, seq_len, key=key, tokens_col=tokens_col)
        write_shards(seqs, out_dir, num_shards, key="seq_id", seed=seed)
    finally:
        enc.unpersist()
