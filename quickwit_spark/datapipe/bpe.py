"""Distributed BPE tokenizer training — learn merge rules from a
corpus, then encode documents with the learned vocabulary.

The public byte-pair-encoding recipe (Sennrich et al. 2016; the GPT-2
variant pre-tokenizes with a regex so merges never cross pre-token
boundaries). The classic implementations train on a driver-local word
histogram; at 100 TB the histogram itself (one row per DISTINCT
pre-token) is a DataFrame, so training must stay distributed:

1. **Histogram collapse** — `word_histogram`: one
   `regexp_extract_all` + explode + groupBy(word).count(). This is the
   whole-corpus pass; everything after runs on the histogram (~1e8
   distinct pre-tokens at web scale, ~1e4 at test scale), a 1e4–1e6×
   reduction. Map-side partial aggregation absorbs Zipf skew (hot
   words collapse before the shuffle).
2. **Iterative merge learning** — `train_bpe`: each round counts
   adjacent symbol pairs weighted by word frequency (arrays_zip of two
   shifted slices → explode → groupBy(pair).sum — a tiny shuffle over
   the histogram), picks the (count desc, pair asc) arg-max with
   `orderBy().limit(1)` (TakeOrderedAndProject — no global sort
   materialization), and applies the merge JVM-side with a left fold
   (`F.aggregate`): `last(acc)==a AND x==b → replace last with a||b`.
   The fold reproduces the canonical left-to-right non-overlapping
   scan exactly (a merged symbol `a||b` can never equal `a`, so no
   accidental cascade). No Python touches the hot path.
   Lineage is truncated every `checkpoint_every` rounds with
   `localCheckpoint` — 100s of chained withColumns would otherwise
   blow up the plan.
3. **Encoding** — `bpe_encode`: a document's tokens are the
   concatenation of its pre-tokens' piece sequences, so encoding is
   posexplode(pre-tokens) → join against the trained word→pieces
   table → re-assemble in order. The join is keyed by the word
   histogram (broadcast when small; a plain shuffle join at scale —
   never per-row Python re-deriving merges). Out-of-vocabulary words
   (absent from the training histogram) fall back to character
   symbols, the standard base-alphabet backstop.

No reference analog (`/root/reference` is a search engine); this is
the LLM-training-data surface (SURVEY.md "LLM-data-pipeline
operators"). Verified against a pure-Python golden BPE in
tests/test_bpe.py; the histogram + first-round pair counts are
oracle-gated in `__spark_entry__` (`bpe_word_histogram`,
`bpe_top_pairs` — the iterative arg-max itself is not expressible in
one SQL statement, so training equality is pytest-golden evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.textstats import BPE_PRETOKEN_RE


def word_histogram(
    df: DataFrame, text_col: str = "text", pattern: str | None = None
) -> DataFrame:
    """(word, n) pre-token histogram — the corpus-collapse pass.

    `pattern` defaults to the GPT-2 pre-tokenizer regex
    (textstats.BPE_PRETOKEN_RE). Empty matches are dropped.
    """
    pat = f"({pattern or BPE_PRETOKEN_RE})"
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
            ).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _adjacent_pairs(syms_col):
    """array<struct<a,b>> of adjacent symbol pairs in `syms_col`."""
    sz = F.size(syms_col)
    return F.arrays_zip(
        F.slice(syms_col, 1, sz - 1).alias("a"),
        F.slice(syms_col, 2, sz - 1).alias("b"),
    )


def _apply_merge(syms_col, a: str, b: str):
    """Left-to-right non-overlapping replacement of (a, b) → a||b,
    as a JVM left fold. Equivalent to the canonical scan: the fold
    merges exactly when the previous KEPT symbol is `a` and the
    current is `b`; since `a||b != a` for non-empty b, a fresh merge
    result never re-triggers on the next element, matching the
    i += 2 skip of the scan."""
    merged = a + b
    # NB: reference syms_col exactly ONCE. The chained withColumns
    # between checkpoints inline the previous iteration's expression
    # at every reference site, so a "skip unaffected words" guard like
    # when(exists(pairs(col), …), fold(col)).otherwise(col) triples
    # the references and blows the plan up 3^checkpoint_every-fold
    # (measured: 40-merge training went from ~30 s to a timeout).
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    hist: DataFrame,
    num_merges: int = 100,
    *,
    min_pair_count: int = 2,
    checkpoint_every: int = 16,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `num_merges` BPE merge rules from a (word, n) histogram.

    Returns (merges, word_pieces) where merges is the ordered rule
    list and word_pieces is a DataFrame (word, n, pieces:array<string>)
    holding every training word's final symbol sequence — the
    encoding table for `bpe_encode`. Training stops early when the
    best pair's weighted count drops below `min_pair_count`.

    Ties on pair count break lexicographically on (a, b) so training
    is deterministic regardless of partitioning.
    """
    work = hist.select(
        "word",
        "n",
        F.split(F.col("word"), "").alias("syms"),
    ).persist()
    work.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    prev = work
    for i in range(num_merges):
        best = (
            prev.filter(F.size("syms") >= 2)
            .select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        nxt = prev.withColumn("syms", _apply_merge(F.col("syms"), a, b))
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        prev = nxt
    pieces = prev.select("word", "n", F.col("syms").alias("pieces"))
    pieces = pieces.localCheckpoint(eager=True)
    work.unpersist()
    return merges, pieces


def vocab(merges: list[tuple[str, str]], words_df: DataFrame) -> DataFrame:
    """Token vocabulary: all single characters seen in training words
    plus one token per merge rule. → (token, token_id), ids dense,
    characters first (sorted), then merges in first-rule order.
    `words_df` is any DataFrame with a `word` column — pass the
    trainer's returned `word_pieces` table (already checkpointed) to
    avoid re-scanning the corpus. Two merge rules can concatenate to
    the same string (('a','bc') and ('ab','c')); the token keeps its
    first id so the (token → id) lookup stays unique."""
    chars = sorted(
        r[0]
        for r in words_df.select(
            F.explode(F.split("word", "")).alias("c")
        )
        .filter(F.length("c") > 0)
        .distinct()
        .collect()
    )
    toks: list[str] = list(chars)
    seen = set(chars)
    for a, b in merges:
        if a + b not in seen:
            seen.add(a + b)
            toks.append(a + b)
    spark = words_df.sparkSession
    return spark.createDataFrame(
        [(t, i) for i, t in enumerate(toks)], ["token", "token_id"]
    )


def pieces_with_ids(word_pieces: DataFrame, vocab_df: DataFrame) -> DataFrame:
    """(word, piece_ids: array<int>) — the encode table with every
    piece string replaced by its vocabulary id (-1 for tokens missing
    from the vocab). Computed at WORD-TABLE scale (explode the pieces
    of each distinct training word, broadcast-join the vocab,
    re-assemble) — the corpus never pays a per-token id join."""
    ex = word_pieces.select(
        "word", F.posexplode("pieces").alias("_p", "token")
    )
    j = ex.join(F.broadcast(vocab_df.select("token", "token_id")), "token", "left")
    return (
        j.groupBy("word")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "_p",
                        F.coalesce(F.col("token_id"), F.lit(-1)).alias("tid"),
                    )
                )
            ).alias("_parts")
        )
        .select("word", F.col("_parts.tid").cast("array<int>").alias("piece_ids"))
    )


def _char_id_map(vocab_df: DataFrame):
    """Literal char→id map for OOV character fallback (single-char
    vocab rows only — the base alphabet, a bounded driver collect)."""
    rows = (
        vocab_df.filter(F.length("token") == 1)
        .select("token", "token_id")
        .collect()
    )
    kv = []
    for r in rows:
        kv += [F.lit(r["token"]), F.lit(r["token_id"])]
    return F.create_map(*kv) if kv else F.create_map()


def bpe_encode(
    df: DataFrame,
    word_pieces: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    pattern: str | None = None,
    *,
    broadcast_table: bool = True,
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Encode documents with a trained piece table → (key, tokens
    array<string>, n_tokens). Document token order = pre-token order;
    OOV pre-tokens fall back to character symbols. With `vocab_df`
    (the trainer's token→token_id table) the output column is
    `token_ids` (array<int>, -1 = unknown) instead of strings — ids
    are attached to the WORD table up front (`pieces_with_ids`) and to
    OOV characters via a literal map, so the id path costs no extra
    token-scale shuffle.

    Scale: posexplode keeps (key, pos) so the final
    `array_sort(collect_list(struct(pos, …)))` re-assembly is exact;
    the piece join broadcasts when the table fits (default) and falls
    back to a shuffle hash join otherwise — set
    `broadcast_table=False` for web-scale vocab histograms."""
    pat = f"({pattern or BPE_PRETOKEN_RE})"
    words = df.select(
        F.col(key),
        F.posexplode(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
        ).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    if vocab_df is None:
        table = word_pieces.select("word", "pieces")
        fallback = F.split(F.col("word"), "")
        piece_col, out_col, empty_type = "pieces", "tokens", "array<string>"
    else:
        table = pieces_with_ids(word_pieces, vocab_df).withColumnRenamed(
            "piece_ids", "pieces"
        )
        cmap = _char_id_map(vocab_df)
        fallback = F.transform(
            F.split(F.col("word"), ""),
            lambda c: F.coalesce(cmap[c], F.lit(-1)),
        )
        piece_col, out_col, empty_type = "pieces", "token_ids", "array<int>"
    if broadcast_table:
        table = F.broadcast(table)
    joined = words.join(table, "word", "left").select(
        key,
        "pos",
        F.coalesce(F.col(piece_col), fallback).alias("pieces"),
    )
    per_doc = (
        joined.groupBy(key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "pieces"))
            ).alias("ordered")
        )
        .select(
            key,
            F.flatten(F.col("ordered.pieces")).alias(out_col),
        )
        .withColumn("n_tokens", F.size(out_col))
    )
    # docs whose text produced zero pre-tokens still appear, empty
    return (
        df.select(key)
        .join(per_doc, key, "left")
        .select(
            key,
            F.coalesce(
                out_col, F.array().cast(empty_type)
            ).alias(out_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
