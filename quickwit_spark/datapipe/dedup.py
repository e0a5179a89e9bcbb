"""Deduplication operators: exact, shingle-Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each strategy at 10^12 docs):
- exact: one hash-groupBy shuffle on a 64-bit content hash; skew-free
  because the groupBy key IS the hash.
- n-gram Jaccard: exact pairwise similarity but only over candidate
  pairs that SHARE a shingle (explode + self-join on shingle hash), so
  cost is Σ df(shingle)² not N² — stop-shingles (df > cap) are dropped
  like hot terms in the index merge.
- MinHash-LSH: constant signatures per doc (b bands × r rows), pairs
  generated per band bucket; tunable (b, r) trades recall vs cost.
- SimHash: one 64-bit fingerprint per doc; near-dup = small Hamming
  distance; banded by 16-bit chunks for candidate generation.

All shingling/hashing uses built-in JVM expressions (xxhash64, no
Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col):
    """Whitespace tokens of a lowercase text column (JVM-side)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def shingles(df: DataFrame, text_col: str = "text", k: int = 3, out: str = "shingle") -> DataFrame:
    """Explode k-token shingles: one row per (doc, distinct shingle)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("*", F.explode(F.array_distinct(sh)).alias(out))
        .filter(F.col(out) != "")
    )


def exact_dedup(df: DataFrame, key: str, content_col: str = "text") -> DataFrame:
    """Exact dedup on content hash: keeps every row, marks duplicates.

    → input columns + (content_hash, dup_group, is_duplicate) where
    dup_group is the smallest key sharing the hash (the canonical
    representative) and is_duplicate = key != dup_group."""
    h = F.xxhash64(F.col(content_col))
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", h)
        .withColumn("dup_group", F.min(key).over(w))
        .withColumn("is_duplicate", F.col(key) != F.col("dup_group"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 10000,
) -> DataFrame:
    """Exact k-shingle Jaccard over candidate pairs sharing ≥1 shingle.

    → (key_a, key_b, jaccard) with key_a < key_b, jaccard ≥ threshold.
    `max_shingle_df` drops stop-shingles (present in more docs than the
    cap) before the self-join — the skew guard; dropping them can only
    lose candidates whose remaining shingles are all stop-shingles."""
    sh = shingles(df.select(key, text_col), text_col, k).select(
        F.col(key).alias("k"), F.xxhash64("shingle").alias("sh")
    )
    sizes = sh.groupBy("k").agg(F.count("*").alias("n"))
    if max_shingle_df is not None:
        hot = sh.groupBy("sh").agg(F.count("*").alias("df")).filter(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    a = sh.select(F.col("k").alias("key_a"), "sh")
    b = sh.select(F.col("k").alias("key_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("k").alias("key_a"), F.col("n").alias("na")), "key_a")
        .join(sizes.select(F.col("k").alias("key_b"), F.col("n").alias("nb")), "key_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("key_a", "key_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, key: str, text_col: str = "text", k: int = 3, num_perm: int = 64
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). → (key, sig: array<bigint>)."""
    sh = shingles(df.select(key, text_col), text_col, k)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    agg = sh.groupBy(key).agg(*mins)
    return agg.select(key, F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    sig_df: DataFrame, key: str, bands: int = 16, rows: int = 4
) -> DataFrame:
    """LSH candidate pairs from signatures: docs agreeing on ALL `rows`
    components of any band collide. → (key_a, key_b, est_jaccard) where
    est_jaccard = fraction of agreeing signature components."""
    num_perm = bands * rows
    banded = sig_df.select(
        F.col(key).alias("k"),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("sig")[b * rows + r] for r in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "sig", "bb.band", "bb.bucket")
    a = banded.select(F.col("k").alias("key_a"), F.col("sig").alias("sig_a"), "band", "bucket")
    b = banded.select(F.col("k").alias("key_b"), F.col("sig").alias("sig_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "sig_a", "sig_b")
        .dropDuplicates(["key_a", "key_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
        )
    )
    return pairs.select(
        "key_a",
        "key_b",
        (agree / F.lit(num_perm)).cast("double").alias("est_jaccard"),
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.95,
    planes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (key_a, key_b, cosine)
    with cosine ≥ threshold, key_a < key_b. planes=0 compares all pairs
    (exact); planes>0 restricts to hyperplane-LSH bucket collisions
    (the 10^12-scale path — cost |bucket|² not N²)."""
    from quickwit_spark.datapipe.similarity import cosine, hyperplane_signatures

    a = df.select(F.col(key).alias("key_a"), F.col(vec).alias("_va"))
    b = df.select(F.col(key).alias("key_b"), F.col(vec).alias("_vb"))
    if planes > 0:
        sig = hyperplane_signatures(df.select(key, vec), key, vec, planes)
        a = a.join(sig.select(F.col(key).alias("key_a"), "bucket"), "key_a")
        b = b.join(sig.select(F.col(key).alias("key_b"), "bucket"), "key_b")
        pairs = a.join(b, "bucket")
    else:
        pairs = a.crossJoin(b)
    return (
        pairs.filter(F.col("key_a") < F.col("key_b"))
        .withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("key_a", "key_b", "cosine")
    )


def simhash(df: DataFrame, key: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens (JVM-side bit arithmetic):
    bit j of the fingerprint = majority vote of bit j across token
    hashes. → (key, simhash: bigint)."""
    toks = df.select(
        F.col(key).alias("k"), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("k").agg(
        *[
            F.sum(F.shiftrightunsigned("h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        term = bit * F.lit(1 << j).cast("long") if j < 63 else F.when(
            F.col(f"b{j}") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(F.col("k").alias(key), fp.alias("simhash"))


def simhash_near_pairs(sim_df: DataFrame, key: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates by banding the 64-bit simhash into four
    16-bit chunks (≤3 differing bits ⇒ some chunk matches exactly),
    then exact Hamming filter. → (key_a, key_b, hamming)."""
    chunks = [
        F.shiftrightunsigned("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
        for c in range(4)
    ]
    banded = sim_df.select(F.col(key).alias("k"), "simhash", *chunks)
    banded = banded.select(
        "k",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("band"), F.col(f"c{c}").alias("bucket"))
                    for c in range(4)
                ]
            )
        ).alias("bb"),
    ).select("k", "simhash", "bb.band", "bb.bucket")
    a = banded.select(F.col("k").alias("key_a"), F.col("simhash").alias("sh_a"), "band", "bucket")
    b = banded.select(F.col("k").alias("key_b"), F.col("simhash").alias("sh_b"), "band", "bucket")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("key_a") < F.col("key_b"))
        .dropDuplicates(["key_a", "key_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("key_a", "key_b", "hamming")
    )
