"""Streaming incremental near-duplicate removal (MinHash-LSH against a
growing bucket store).

The batch `datapipe.dedup` operators deduplicate a corpus at rest; a
continuously ingesting crawl additionally needs each NEW micro-batch
deduplicated against EVERYTHING SEEN SO FAR. The public recipe is an
LSH bucket store: a doc's (band, bucket) keys are looked up against
the store — any hit means a near-duplicate of an earlier doc; novel
docs' keys are appended. On Spark this is `foreachBatch`:

    per micro-batch
      1. MinHash signatures + banded bucket keys (datapipe.dedup —
         same arithmetic as the batch path, so batch and streaming
         agree on what "near-duplicate" means)
      2. drop docs with any bucket already in the store
         (left-semi join store → distinct hit keys)
      3. drop within-batch non-anchors (minhash_lsh_edges star rule —
         bucket-mates of a smaller-keyed batch doc)
      4. write survivors to `out_dir/batch=<id>` and their buckets to
         `store_dir/batch=<id>`, both dynamic-overwrite by batch id

Exactly-once under replay: Structured Streaming re-runs a failed
micro-batch with the SAME batch_id; both writes overwrite their own
`batch=<id>` partition (idempotent), and the store LOOKUP filters to
`batch < current_id` (partition-pruned), so a half-written previous
attempt can never make the replay see its own buckets and drop the
whole batch.

Scale: the store is an append-only table partitioned by batch —
at production scale a Delta/Iceberg table with compaction; here plain
parquet partitions (the sandbox analog, same layout). The lookup join
is keyed by (band, bucket) — hot boilerplate buckets skew the join,
which AQE skew-split handles; the store side carries ONLY distinct
bucket keys (no doc ids), so a hot bucket is one row per batch that
touched it, not one per member doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dedup import minhash_lsh_edges, minhash_signatures


def _bucket_keys(
    sig_df: DataFrame, key: str, bands: int, rows: int
) -> DataFrame:
    """(key, band, bucket) — one row per doc per band."""
    return sig_df.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[F.col("sig")[b * rows + r] for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(key, "bb.band", "bb.bucket")


class NearDedupStream:
    """foreachBatch processor holding the dedup configuration.

    Use `attach(stream_df)` for the full wiring, or call
    `process_batch(df, batch_id)` directly (this is also what tests
    drive — it is the exact function Structured Streaming invokes)."""

    def __init__(
        self,
        store_dir: str,
        out_dir: str,
        key: str = "doc_id",
        text_col: str = "text",
        shingle_k: int = 3,
        num_perm: int = 32,
        bands: int = 8,
    ):
        if num_perm % bands:
            raise ValueError("num_perm must be divisible by bands")
        self.store_dir = store_dir
        self.out_dir = out_dir
        self.key = key
        self.text_col = text_col
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = num_perm // bands
        self.num_perm = num_perm

    # -------------------------------------------------------- batch
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        key = self.key
        sigs = minhash_signatures(
            batch_df,
            key,
            self.text_col,
            k=self.shingle_k,
            num_perm=self.num_perm,
        ).persist()
        buckets = _bucket_keys(sigs, key, self.bands, self.rows)

        from pyspark.errors import AnalysisException

        try:
            store = spark.read.parquet(self.store_dir).filter(
                F.col("batch") < F.lit(batch_id)
            )
        except AnalysisException:  # first batch: no store yet
            store = None
        if store is not None:
            store_hits = (
                buckets.join(
                    store.select("band", "bucket"),
                    ["band", "bucket"],
                    "left_semi",
                )
                .select(key)
                .distinct()
            )
        else:
            store_hits = None

        # within-batch: non-anchors of any shared bucket are dropped
        intra = minhash_lsh_edges(
            sigs, key, bands=self.bands, rows=self.rows
        ).select(F.col("key_b").alias(key)).distinct()
        dropped = intra if store_hits is None else intra.union(store_hits).distinct()

        kept = batch_df.join(dropped, key, "left_anti")
        kept.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id:06d}"
        )
        # store grows by the SURVIVORS' bucket keys only: dropped docs
        # are represented by whatever earlier doc already claimed the
        # bucket, so the store stays one row per (band,bucket,batch)
        kept_buckets = (
            buckets.join(kept.select(key), key, "left_semi")
            .select("band", "bucket")
            .distinct()
        )
        kept_buckets.write.mode("overwrite").parquet(
            f"{self.store_dir}/batch={batch_id:06d}"
        )
        sigs.unpersist()

    # ------------------------------------------------------- stream
    def attach(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ):
        """Wire onto a streaming DataFrame; returns the started query."""
        writer = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # survivors across all batches, as a batch DataFrame
    def kept(self, spark) -> DataFrame:
        return spark.read.parquet(self.out_dir)
