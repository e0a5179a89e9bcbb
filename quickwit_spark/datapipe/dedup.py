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


def paragraph_dedup(
    df: DataFrame,
    key: str,
    text_col: str = "text",
    para_sep: str = r"\n{2,}",
    joiner: str = "\n\n",
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the RefinedWeb/CCNet
    curation stage): every occurrence of a paragraph beyond the
    globally FIRST one — ordered by (key, position), within-document
    repeats included — is removed, and each document's text is rebuilt
    from its surviving paragraphs in order.

    → (key, text_dedup, n_paras, n_paras_kept); documents whose
    paragraphs were all removed stay as rows with text_dedup = ''.
    `normalize=True` matches paragraphs on trim(lower(...)) but emits
    the original spelling of the first occurrence's document.

    Scale: explode to one row per paragraph occurrence; winners come
    from `groupBy(norm).agg(min(key, pos))` — a TRUE partial
    aggregation, so a boilerplate paragraph occurring 10^9 times
    combines map-side instead of funneling through one task (a window
    partitioned by the paragraph would). Survivors are selected with a
    semi-join on (key, pos) — unique, skew-free join keys — then a
    groupBy(key) reassembly shuffle. At 10^12 docs, key the winner
    shuffle on xxhash64(norm) to cut shuffle bytes — kept as the raw
    string here so the DuckDB correctness oracle can reproduce values
    exactly. NULL text behaves as '' (0 paragraphs).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    parts = F.filter(F.split(txt, para_sep), lambda p: F.trim(p) != "")
    ex = df.select(F.col(key), F.posexplode(parts).alias("pos", "para"))
    norm = F.trim(F.lower(F.col("para"))) if normalize else F.col("para")
    winners = (
        ex.withColumn("_norm", norm)
        .groupBy("_norm")
        .agg(F.min(F.struct(F.col(key), F.col("pos"))).alias("_first"))
        .select(
            F.col("_first")[key].alias(key), F.col("_first")["pos"].alias("pos")
        )
    )
    kept = ex.join(winners, [key, "pos"], "left_semi")
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            joiner,
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )
    base = df.select(F.col(key), F.size(parts).cast("long").alias("n_paras"))
    return base.join(rebuilt, key, "left").select(
        key,
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        "n_paras",
        F.coalesce("n_paras_kept", F.lit(0)).cast("long").alias("n_paras_kept"),
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
    df: DataFrame,
    key: str,
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 64,
    portable: bool = False,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of a
    permuted shingle hash. → (key, sig: array<bigint>).

    Default: ONE xxhash64 per shingle seeds the permutation family
    sig_i = (A_i·(h mod 2^31−1) + B_i) mod 2^31−1 (fast JVM path; see
    the note at the mins below). `portable=True` replaces the seed
    hash with `portable.portable_hash` so an independent SQL engine
    reproduces the signatures bit-for-bit — the correctness-oracle
    path."""
    sh = shingles(df.select(key, text_col), text_col, k)
    if portable:
        from quickwit_spark.datapipe.portable import P31, perm_constants, portable_hash

        sh = sh.withColumn("_ph", portable_hash(F.col("shingle")) % F.lit(P31))
        mins = [
            F.min((F.col("_ph") * F.lit(a) + F.lit(b)) % F.lit(P31)).alias(f"h{i}")
            for i, (a, b) in enumerate(perm_constants(num_perm))
        ]
    else:
        # ONE string hash per shingle; the num_perm permutations are
        # derived arithmetically ((A_i·h + B_i) mod 2^31−1, same shape
        # as the portable path) — hashing the string num_perm times
        # was the dominant cost of signature building (measured: ~64×
        # the string-hash work for identical recall). A_i ≤ 1e9 and
        # h < 2^31 keep A_i·h within signed-64 range.
        from quickwit_spark.datapipe.portable import P31, perm_constants

        sh = sh.withColumn(
            "_h", F.pmod(F.xxhash64(F.col("shingle")), F.lit(P31))
        )
        mins = [
            F.min((F.col("_h") * F.lit(a) + F.lit(b)) % F.lit(P31)).alias(
                f"h{i}"
            )
            for i, (a, b) in enumerate(perm_constants(num_perm))
        ]
    agg = sh.groupBy(key).agg(*mins)
    return agg.select(key, F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def lsh_band_buckets(
    sig_df: DataFrame,
    key: str,
    bands: int = 16,
    rows: int = 4,
    *,
    keep_sig: bool = False,
) -> DataFrame:
    """THE banding expression — (key, [sig,] band, bucket), one row per
    doc per band; bucket = comma-joined raw signature components
    (engine-portable, no re-hash). Single definition shared by
    `minhash_lsh_pairs`, `minhash_lsh_edges`, and the streaming bucket
    store so batch and streaming can never disagree on buckets."""
    head = [F.col(key)] + ([F.col("sig")] if keep_sig else [])
    return sig_df.select(
        *head,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * rows + r] for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        F.col(key).alias("k"),
        *(["sig"] if keep_sig else []),
        "bb.band",
        "bb.bucket",
    )


def minhash_lsh_pairs(
    sig_df: DataFrame, key: str, bands: int = 16, rows: int = 4
) -> DataFrame:
    """LSH candidate pairs from signatures: docs agreeing on ALL `rows`
    components of any band collide. → (key_a, key_b, est_jaccard) where
    est_jaccard = fraction of agreeing signature components. The band
    bucket is the raw joined component string (engine-portable — no
    re-hash), so the same banding is reproducible in SQL."""
    num_perm = bands * rows
    banded = lsh_band_buckets(sig_df, key, bands, rows, keep_sig=True)
    # Signatures ride through the in-bucket join: measured 53 s vs
    # 83 s for the keys-only-join + re-attach-sigs variant at 200k
    # docs / 40-doc cliques (two extra pair-table shuffles cost more
    # than the wider dedup shuffle saves; the duplicate-pair rows the
    # arrays widen live only between the bucket join and the
    # immediately following dropDuplicates).
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


def minhash_lsh_edges(
    sig_df: DataFrame, key: str, bands: int = 16, rows: int = 4
) -> DataFrame:
    """Anchor (star) edges from LSH buckets: per (band, bucket), link
    every member to the bucket's smallest key. → (key_a, key_b) with
    key_a = bucket anchor < key_b.

    Scale design — this is the 10^12-doc shape for LSH DEDUP (as
    opposed to pair scoring): a bucket of m docs emits m−1 edges
    instead of m(m−1)/2 pairs, so a hot bucket costs O(m), not O(m²).
    Because every LSH bucket is a CLIQUE in the candidate-pair graph,
    a star rooted at any bucket member preserves connectivity exactly:
    `connected_components(minhash_lsh_edges(sigs))` equals
    `connected_components(minhash_lsh_pairs(sigs))` for the same
    (bands, rows) — verified by the `dedup_minhash_anchor` oracle gate
    and tests/test_dedup equivalence test. The trade: no per-pair
    `est_jaccard` (there are no pairs), so precision is governed
    solely by the (bands, rows) collision probability — the
    public fuzzy-dedup recipe used by large web-corpus pipelines.
    Use `minhash_lsh_pairs` when downstream needs pair similarity.
    """
    banded = lsh_band_buckets(sig_df, key, bands, rows)
    w = Window.partitionBy("band", "bucket")
    return (
        banded.withColumn("_anchor", F.min("k").over(w))
        .filter(F.col("k") != F.col("_anchor"))
        .select(
            F.col("_anchor").alias("key_a"), F.col("k").alias("key_b")
        )
        .dropDuplicates(["key_a", "key_b"])
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.95,
    planes: int = 0,
    rank_round: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (key_a, key_b, cosine)
    with cosine ≥ threshold, key_a < key_b. planes=0 compares all pairs
    (exact); planes>0 restricts to hyperplane-LSH bucket collisions
    (the 10^12-scale path — cost |bucket|² not N²). `rank_round` rounds
    the cosine before the threshold test so a ±1-ulp independent engine
    makes identical keep/drop decisions (oracle comparability)."""
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
    out = pairs.filter(F.col("key_a") < F.col("key_b")).withColumn(
        "cosine", cosine(F.col("_va"), F.col("_vb"))
    )
    if rank_round is not None:
        out = out.withColumn("cosine", F.round("cosine", rank_round))
    return (
        out.filter(F.col("cosine") >= threshold)
        .select("key_a", "key_b", "cosine")
        .dropDuplicates(["key_a", "key_b"])
    )


def simhash(
    df: DataFrame,
    key: str,
    text_col: str = "text",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash over whitespace tokens (JVM-side bit arithmetic): bit j
    of the fingerprint = majority vote of bit j across token hashes.
    → (key, simhash: bigint).

    `portable=True` uses the engine-portable token hash (two 31-bit
    mixes → a 62-bit fingerprint, `bits` forced to 62) so the SQL
    oracle reproduces the fingerprints exactly."""
    toks = df.select(
        F.col(key).alias("k"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    if portable:
        from quickwit_spark.datapipe.portable import P31, perm_constants, portable_hash

        bits = 62
        (a1, b1), (a2, b2) = perm_constants(2)
        ph = portable_hash(F.col("tok")) % F.lit(P31)
        toks = toks.withColumn(
            "h",
            ((ph * F.lit(a1) + F.lit(b1)) % F.lit(P31))
            + ((ph * F.lit(a2) + F.lit(b2)) % F.lit(P31)) * F.lit(1 << 31).cast("long"),
        )
    else:
        toks = toks.withColumn("h", F.xxhash64("tok"))
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


def _band_ranges(bits: int, bands: int) -> list[tuple[int, int]]:
    """Split `bits` into `bands` contiguous (shift, width) chunks."""
    base, extra = divmod(bits, bands)
    out, shift = [], 0
    for c in range(bands):
        width = base + (1 if c < extra else 0)
        out.append((shift, width))
        shift += width
    return out


def simhash_near_pairs(
    sim_df: DataFrame,
    key: str,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Near-dup candidates by banding the simhash into `bands` bit
    chunks, then exact Hamming filter. → (key_a, key_b, hamming).

    Pigeonhole guarantee: a pair with hamming ≤ bands−1 shares at least
    one identical band, so with bands > max_hamming the result is the
    COMPLETE set of pairs within max_hamming (banding is a pure cost
    optimization, not an approximation). The default 4×16-bit banding
    guarantees recall only for hamming ≤ 3 — pass bands=max_hamming+1
    for exact semantics at larger radii."""
    chunks = [
        F.shiftrightunsigned("simhash", shift)
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias(f"c{c}")
        for c, (shift, width) in enumerate(_band_ranges(bits, bands))
    ]
    banded = sim_df.select(F.col(key).alias("k"), "simhash", *chunks)
    banded = banded.select(
        "k",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("band"), F.col(f"c{c}").alias("bucket"))
                    for c in range(bands)
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


def connected_components(
    pairs: DataFrame, src: str = "key_a", dst: str = "key_b", max_iter: int = 50
) -> DataFrame:
    """Near-dup clusters via min-label propagation over the pair graph:
    every key gets the smallest key reachable through candidate pairs
    (→ columns `key`, `component`). Only PAIRED keys appear; unpaired
    docs are their own trivial component.

    Scale design: each round shuffles only the EDGE set (near-dup pairs
    ≪ corpus) and converges in O(cluster diameter) rounds — near-dup
    clusters are shallow, so typically 2-4. Each round's labels are
    fully materialized into the cache before the previous round is
    dropped, so round i never recomputes rounds 0..i-1. Raises
    RuntimeError if the graph has not converged after `max_iter`
    rounds (a silent exit would return inconsistent labels). The
    returned DataFrame is cached — `.unpersist()` it when done. No
    reference analog (the reference dedups at ingest by doc id only);
    this is the training-pipeline canonicalization step over LSH
    candidate pairs."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("u")
        .agg(F.min("v").alias("lbl"))
        .withColumn("lbl", F.least(F.col("u"), F.col("lbl")))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("lbl")), "v"
            )
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .persist()
        )
        # full count (not limit(1)) so EVERY partition of `new` lands in
        # the cache before the old labels are dropped — a short-circuit
        # probe would leave the tail partitions to recompute the whole
        # join lineage back to `edges` on the next round
        new.count()
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), "u")
            .filter(F.col("lbl") < F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the pair graph has a longer chain than expected — raise max_iter"
        )
    return labels.select(F.col("u").alias("key"), F.col("lbl").alias("component"))


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    key: str = "doc_id",
    src: str = "key_a",
    dst: str = "key_b",
) -> DataFrame:
    """Keep ONE document per near-dup cluster (the smallest key) plus
    every unpaired document — the canonicalization pass a training
    pipeline runs after LSH candidate generation. Losers are removed
    with a left-anti join (losers ≪ corpus; no broadcast assumption)."""
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("key") != F.col("component")).select(
        F.col("key").alias(key)
    )
    return df.join(losers, key, "left_anti")
