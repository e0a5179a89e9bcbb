"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the
query set, one pass over the corpus, per-partition top-k then global
top-k — the same partial/final shape as the BM25 collector). The scale
path is `lsh_topk`: random-hyperplane signatures bucket the corpus so
each query only scores its bucket's candidates (recall traded via
number of planes/tables).

Dot products run as built-in higher-order functions (zip_with +
aggregate) — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    """Cosine similarity of two array columns, computed in float64."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = 10,
    rank_round: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows
    (self-matches on equal keys excluded). → (query_id, neighbor_id,
    cosine, rank), ties broken by neighbor_id asc.

    Plan shape: broadcast(queries) ⨯ corpus → per-partition scoring →
    window top-k. At 10^12 scale the window is replaced by the same
    two-phase topk the search engine uses; at sane query-set sizes
    (≤10k) this exact form is already shuffle-minimal."""
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("_qvec")
    )
    c = corpus.select(F.col(key).alias("neighbor_id"), F.col(vec).alias("_cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
    )
    if rank_round is not None:
        # rank on decimal-rounded values so an independent engine with
        # ±1-ulp dot products ranks identically (oracle comparability)
        scored = scored.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def hyperplane_signatures(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    planes: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(v · h_i) with
    h_i[j] ∈ {−1,+1} a deterministic LCG-parity mix of (seed, i, j)
    (`portable.plane_component`) — plain integer arithmetic an
    independent SQL engine reproduces exactly (the dot product is a
    left-fold in array order, so even the float rounding matches),
    no stored model. → (key, bucket:int)."""
    from quickwit_spark.datapipe.portable import plane_component

    dim_col = F.size(F.col(vec))
    bits = []
    for i in range(planes):
        proj = F.aggregate(
            F.zip_with(
                F.transform(F.col(vec), lambda x: x.cast("double")),
                F.transform(
                    F.sequence(F.lit(0), dim_col - 1),
                    lambda j: plane_component(seed * 131 + i, j),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(F.col(key).alias(key), bucket.cast("int").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = 10,
    planes: int = 8,
    tables: int = 1,
    rank_round: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: score only candidates that share a
    hyperplane bucket with the query in ANY of `tables` independent
    hash tables (OR-amplification — each extra table multiplies the
    chance a true neighbor collides somewhere, curing the single-table
    recall cliff at a linear candidate-cost increase). Same output
    schema as brute_force_topk; recall/cost trade via (planes, tables).
    With tables=1 the portable hyperplanes keep the buckets (and with
    `rank_round` the ranking) exactly reproducible in SQL."""
    c_base = corpus.select(F.col(key).alias("neighbor_id"), F.col(vec).alias("_cvec"))
    q_base = queries.select(F.col(key).alias("query_id"), F.col(vec).alias("_qvec"))
    cand = None
    for t in range(tables):
        csig = hyperplane_signatures(corpus.select(key, vec), key, vec, planes, seed=t)
        qsig = hyperplane_signatures(queries.select(key, vec), key, vec, planes, seed=t)
        pairs = csig.select(F.col(key).alias("neighbor_id"), "bucket").join(
            F.broadcast(qsig.select(F.col(key).alias("query_id"), "bucket")),
            "bucket",
        ).select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = (
        cand.join(c_base, "neighbor_id")
        .join(F.broadcast(q_base), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
    )
    if rank_round is not None:
        scored = scored.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    rank_round: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means partitions the corpus into
    `nlist` cells; each query scores only the cells of its `nprobe`
    nearest centroids. The 10^12-scale shape — the clustering is a
    one-off model fit (sampled), assignment is a narrow JVM transform,
    and the probe join touches nprobe/nlist of the corpus. Centroids
    are broadcast (nlist × dim floats — KBs). Not SQL-reproducible
    (k-means), so correctness evidence is the recall-vs-brute-force
    pytest, not a value-hash oracle."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c_feat = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec).alias("_cvec"),
        array_to_vector(F.transform(F.col(vec), lambda x: x.cast("double"))).alias(
            "_features"
        ),
    )
    model = KMeans(
        k=nlist, seed=seed, featuresCol="_features", predictionCol="_cell"
    ).fit(c_feat.select("_features"))
    c_cells = model.transform(c_feat).select("neighbor_id", "_cvec", "_cell")

    # nprobe nearest centroids per query: centroids are tiny — compute
    # the distance list per query row with a broadcast literal array
    cents = [list(map(float, c)) for c in model.clusterCenters()]
    cent_col = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(x) for x in c]).alias("cv"),
            )
            for i, c in enumerate(cents)
        ]
    )
    dist = lambda q, c: F.aggregate(  # noqa: E731
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    q_cells = (
        queries.select(
            F.col(key).alias("query_id"),
            F.transform(F.col(vec), lambda x: x.cast("double")).alias("_qvec"),
        )
        .withColumn(
            "_cells",
            F.transform(
                cent_col,
                lambda s: F.struct(
                    s["cell"].alias("_cell"), dist(F.col("_qvec"), s["cv"]).alias("d")
                ),
            ),
        )
        .withColumn(
            "_probed",
            F.slice(F.expr("array_sort(_cells, (l, r) -> int(sign(l.d - r.d)))"), 1, nprobe),
        )
        .withColumn("_cell", F.explode("_probed._cell"))
        .select("query_id", "_qvec", "_cell")
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if rank_round is not None:
        scored = scored.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank")
        )
    )


# --------------------------------------------------------------- IVF-PQ


def _kmeans_np(X, k: int, seed: int, iters: int = 20):
    """Deterministic Lloyd k-means (numpy): seeded spread-out init
    (greedy farthest-point from a seeded start), empty clusters
    reseeded to the farthest point. Good enough for codebook training
    on a sample — the faiss-style practice at 10^12 scale."""
    import numpy as np

    rng = np.random.default_rng(seed)
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n <= k:
        reps = np.concatenate([X] * (k // max(n, 1) + 1))[:k]
        return reps
    cents = [X[rng.integers(n)]]
    d2 = ((X - cents[0]) ** 2).sum(1)
    for _ in range(k - 1):
        cents.append(X[int(d2.argmax())])
        d2 = np.minimum(d2, ((X - cents[-1]) ** 2).sum(1))
    C = np.stack(cents)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        newC = C.copy()
        for j in range(k):
            m = a == j
            if m.any():
                newC[j] = X[m].mean(0)
            else:
                newC[j] = X[int(d.min(1).argmax())]
        if np.allclose(newC, C):
            break
        C = newC
    return C


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    seed: int = 7,
    train_size: int = 10_000,
    refine: int = 3,
) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011, "Product Quantization for
    Nearest Neighbor Search"): coarse k-means routes vectors to `nlist`
    cells; each RESIDUAL (vector − its centroid) is compressed to `m`
    byte codes from per-subspace `ksub`-entry codebooks. A query probes
    `nprobe` cells and scores candidates with an ADC lookup table (m ×
    ksub distances computed once per query-cell) — no original vectors
    touched until the optional exact re-rank of the `refine`·k ADC
    shortlist.

    The true 10^12-document shape: codebooks train on a driver sample
    (what faiss does), the encoded corpus is m bytes + a cell id per
    vector (64-dim float32 → 8 bytes is 32×), candidate scoring reads
    only codes. Returns (query_id, neighbor_id, cosine, rank) when
    refine > 0 (exact re-rank of the shortlist, cosine in f64), else
    (query_id, neighbor_id, adc_dist, rank) by ascending approximate
    L2² — identical ranking to cosine for unit-norm embeddings. Not
    SQL-expressible (k-means); evidence = recall-vs-brute-force tests,
    like `ivf_topk`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    sample = np.array(
        [
            r["v"]
            for r in corpus.select(
                F.transform(F.col(vec), lambda x: x.cast("double")).alias("v")
            )
            .limit(train_size)
            .collect()
        ],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    C = _kmeans_np(sample, nlist, seed)  # nlist × dim
    d2 = ((sample[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    resid = sample - C[d2.argmin(1)]
    B = np.stack(
        [
            _kmeans_np(resid[:, j * sub : (j + 1) * sub], ksub, seed + 1 + j)
            for j in range(m)
        ]
    )  # m × ksub × sub

    enc_schema = T.StructType(
        [
            T.StructField("neighbor_id", corpus.schema[key].dataType),
            T.StructField("_cell", T.IntegerType()),
            T.StructField("_codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        for pdf in batches:
            V = np.stack(pdf[vec].apply(np.asarray).values).astype(np.float64)
            cell = ((V[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            R = V - C[cell]
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                Rj = R[:, j * sub : (j + 1) * sub]
                codes[:, j] = (
                    ((Rj[:, None, :] - B[j][None, :, :]) ** 2).sum(-1).argmin(1)
                )
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[key].values,
                    "_cell": cell.astype("int32"),
                    "_codes": list(codes),
                }
            )

    encoded = corpus.select(key, vec).mapInPandas(encode, enc_schema)

    probe_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[key].dataType),
            T.StructField("_cell", T.IntegerType()),
            T.StructField("_qvec", T.ArrayType(T.DoubleType())),
        ]
    )

    def probe(batches):
        for pdf in batches:
            Q = np.stack(pdf[vec].apply(np.asarray).values).astype(np.float64)
            d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            cells = np.argsort(d, axis=1)[:, :nprobe]
            rows = {"query_id": [], "_cell": [], "_qvec": []}
            for i in range(len(Q)):
                for c in cells[i]:
                    rows["query_id"].append(pdf[key].values[i])
                    rows["_cell"].append(int(c))
                    rows["_qvec"].append(Q[i])
            yield pd.DataFrame(rows)

    probed = queries.select(key, vec).mapInPandas(probe, probe_schema)

    joined = encoded.join(F.broadcast(probed), "_cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )

    adc_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[key].dataType),
            T.StructField("neighbor_id", corpus.schema[key].dataType),
            T.StructField("adc_dist", T.DoubleType()),
        ]
    )

    def adc(pdf):
        # one (query, cell) group: LUT once, score all codes via gather
        q = np.asarray(pdf["_qvec"].iloc[0], dtype=np.float64)
        cell = int(pdf["_cell"].iloc[0])
        r = q - C[cell]
        lut = np.stack(
            [
                ((r[j * sub : (j + 1) * sub][None, :] - B[j]) ** 2).sum(-1)
                for j in range(m)
            ]
        )  # m × ksub
        codes = np.stack(pdf["_codes"].apply(np.asarray).values)
        dist = lut[np.arange(m)[None, :], codes].sum(1)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].values,
                "neighbor_id": pdf["neighbor_id"].values,
                "adc_dist": dist,
            }
        )

    scored = joined.groupBy("query_id", "_cell").applyInPandas(adc, adc_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * max(refine, 1))
    )
    if not refine:
        return short.filter(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "adc_dist",
            F.col("rank").cast("long").alias("rank"),
        )
    # exact re-rank of the shortlist: fetch true vectors for ≤ refine·k
    # candidates per query (winners ≪ corpus → broadcast-join shape)
    cvecs = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec).alias("_cv")
    )
    qvecs = queries.select(F.col(key).alias("query_id"), F.col(vec).alias("_qv"))
    exact = (
        short.select("query_id", "neighbor_id")
        .join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ------------------------------------------------------ SQ8 quantization


def sq8_quantize(
    df: DataFrame, vec: str = "embedding", out: str = "sq8"
) -> tuple[DataFrame, tuple[float, float]]:
    """Global-range 8-bit scalar quantization: code = round((x − mn) /
    (mx − mn) · 255) with (mn, mx) the corpus-wide component range —
    4× smaller than float32 (the middle memory tier between raw
    vectors and IVF-PQ's m bytes). → (df + `out` array<int>, (mn, mx)).
    Pure column arithmetic, reproducible in any SQL engine."""
    d = F.transform(F.col(vec), lambda x: x.cast("double"))
    mm = df.agg(
        F.min(F.array_min(d)).alias("mn"), F.max(F.array_max(d)).alias("mx")
    ).first()
    mn, mx = float(mm["mn"]), float(mm["mx"])
    scale = (mx - mn) or 1.0
    codes = F.transform(
        d, lambda x: F.round((x - F.lit(mn)) / F.lit(scale) * 255, 0).cast("int")
    )
    return df.withColumn(out, codes), (mn, mx)


def sq8_dequantize(codes, mn: float, mx: float):
    """Column expression decoding SQ8 codes back to doubles."""
    scale = (mx - mn) or 1.0
    return F.transform(
        codes, lambda c: c.cast("double") / 255.0 * F.lit(scale) + F.lit(mn)
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = 10,
    rank_round: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over the SQ8-DEQUANTIZED corpus against
    raw queries — the accuracy/memory trade measured end-to-end
    (same partial/final collector shape as `brute_force_topk`)."""
    enc, (mn, mx) = sq8_quantize(corpus, vec)
    c = enc.select(
        F.col(key).alias("neighbor_id"),
        sq8_dequantize(F.col("sq8"), mn, mx).alias("_cv"),
    )
    q = queries.select(
        F.col(key).alias("query_id"),
        F.transform(F.col(vec), lambda x: x.cast("double")).alias("_qv"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    if rank_round is not None:
        scored = scored.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )
