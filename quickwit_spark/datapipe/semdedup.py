"""SemDeDup — semantic deduplication via embedding clusters.

The public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means the
embeddings, and inside each cluster drop every item whose cosine
similarity to ANY earlier-ranked cluster member exceeds a threshold —
"earlier" in a fixed intra-cluster order (the public implementation
orders by similarity-to-centroid and keeps either the far/"hard" or
near/"easy" extreme; the drop test is against all earlier members,
dropped or not, exactly like its upper-triangular `torch.max` matrix).

Spark-first shape (the 10^12 path):

- clustering is the IVF trick from `similarity.py`: k-means on a
  driver-side SAMPLE (centroids are tiny), broadcast centroids, assign
  every row in one mapInPandas pass — no iterative distributed work.
- the quadratic near-pair test runs per CLUSTER via a self-join on the
  cluster id — the bucketed-candidates shape every dedup operator here
  uses; cluster size is the cost dial (`k` ≈ corpus_size / target
  cluster size; the paper uses ~11k clusters for LAION).
- ranks are a window partitioned by cluster (bounded groups, no
  single-partition funnel); pair cosines are JVM Column expressions
  (`similarity.cosine`, float64), no Python in the join.

With explicit `centroids` the whole operator is deterministic and the
DuckDB oracle replays it end-to-end (assignment argmax, rank, pair
test). With learned centroids (`k=`), determinism holds for a fixed
seed but k-means isn't SQL-expressible — pytest covers that path.

The reference engine (`/root/reference`) has no analog; this belongs to
the training-data curation surface (SURVEY.md "LLM-data-pipeline
operators").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickwit_spark.datapipe.similarity import _kmeans_np, cosine


def _assign_map(df: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    """+ (cluster int, cent_sim double): argmax cosine over broadcast
    centroids, one numpy matmul per Arrow batch. Cosines are rounded to
    9 decimals BEFORE the argmax so the SQL oracle (same rounding)
    agrees on ties to the last bit."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("cluster", IntegerType(), False),
            StructField("cent_sim", DoubleType(), False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(X) == 0:
                continue
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-30
            )
            sims = np.round(Xn @ Cn.T, 9)
            out = pdf.copy()
            out["cluster"] = sims.argmax(axis=1).astype(np.int32)
            out["cent_sim"] = sims.max(axis=1)
            yield out

    return df.mapInPandas(assign, schema)


def semdedup(
    df: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    k: int | None = None,
    centroids: np.ndarray | None = None,
    keep: str = "far",
    seed: int = 0,
    sample: int = 8192,
) -> DataFrame:
    """Marks semantic duplicates: returns (key, cluster, cent_sim,
    is_semdup). `keep="far"` ranks far-from-centroid items first (the
    paper's keep_hard default; they survive preferentially),
    `keep="near"` the reverse. Pass `centroids` for a fully
    deterministic run, or `k` to learn them from a driver-side sample.
    """
    if keep not in ("far", "near"):
        raise ValueError("keep must be 'far' or 'near'")
    if centroids is None:
        if k is None:
            raise ValueError("pass either k= or centroids=")
        rows = (
            df.select(vec_col).limit(int(sample)).collect()
        )
        X = np.asarray([r[0] for r in rows], dtype=np.float64)
        # spherical k-means: assignment below is argmax COSINE, so the
        # codebook must be learned on the unit sphere too — otherwise
        # large-norm outliers hijack the euclidean centroids
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        centroids = _kmeans_np(X, k, seed)
    marked = _assign_map(df.select(key, vec_col), centroids, vec_col)
    order = (
        [F.asc("cent_sim"), F.asc(key)]
        if keep == "far"
        else [F.desc("cent_sim"), F.asc(key)]
    )
    w = Window.partitionBy("cluster").orderBy(*order)
    ranked = marked.withColumn("_rk", F.row_number().over(w))
    a = ranked.select(
        F.col("cluster").alias("_c"),
        F.col("_rk").alias("_rk_a"),
        F.col(vec_col).alias("_va"),
    )
    dup_keys = (
        ranked.alias("b")
        .join(a, (F.col("_c") == F.col("b.cluster")) & (F.col("_rk_a") < F.col("b._rk")))
        .filter(F.round(cosine(F.col("_va"), F.col(f"b.{vec_col}")), 9) > threshold)
        .select(F.col(f"b.{key}").alias(key))
        .distinct()
    )
    return (
        ranked.alias("r")
        .join(dup_keys.withColumn("_dup", F.lit(True)), key, "left")
        .select(
            key,
            "cluster",
            F.round("cent_sim", 6).alias("cent_sim"),
            F.coalesce("_dup", F.lit(False)).alias("is_semdup"),
        )
    )
