"""Streaming incremental near-duplicate removal (MinHash-LSH against a
growing bucket store).

The batch `datapipe.dedup` operators deduplicate a corpus at rest; a
continuously ingesting crawl additionally needs each NEW micro-batch
deduplicated against EVERYTHING SEEN SO FAR. The public recipe is an
LSH bucket store: a doc's (band, bucket) keys are looked up against
the store — any hit means a near-duplicate of an earlier doc; novel
docs' keys are appended. On Spark this is `foreachBatch`:

    per micro-batch
      1. MinHash signatures + banded bucket keys
         (`datapipe.dedup.lsh_band_buckets` — the ONE banding
         definition, so batch and streaming agree on buckets)
      2. drop docs with any bucket already in the store
         (left-semi join store → distinct hit keys)
      3. drop within-batch non-anchors (the star rule: bucket-mates
         of a smaller-keyed batch doc)
      4. write survivors to `out_dir/batch=<id>` and ALL the batch's
         bucket keys — dropped docs' included — to
         `store_dir/batch=<id>`, both dynamic-overwrite by batch id

    Storing dropped docs' buckets matters for recall: a dropped doc B
    may own buckets its killer A does not (B is a near-dup of A via
    one band only); a later doc C near-duplicating B through those
    other buckets must still be caught — the same transitivity the
    batch operator gets from connected components.

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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickwit_spark.datapipe.dedup import lsh_band_buckets, minhash_signatures


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
        portable: bool = False,
    ):
        if num_perm % bands:
            raise ValueError("num_perm must be divisible by bands")
        # portable=True swaps xxhash64 for the engine-portable hash so
        # an independent SQL engine replays the signatures bit-for-bit
        # (the correctness-oracle mode, as in datapipe.dedup)
        self.portable = portable
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
            portable=self.portable,
        )
        buckets = (
            lsh_band_buckets(sigs, key, self.bands, self.rows)
            .withColumnRenamed("k", key)
            .persist()
        )
        try:
            self._process_with_buckets(batch_df, batch_id, buckets)
        finally:
            # a failed write/join must not leak the cached frame: the
            # stream replays the batch and re-persists a fresh copy,
            # so un-released copies would pile up across retries
            buckets.unpersist()

    def _process_with_buckets(
        self, batch_df: DataFrame, batch_id: int, buckets: DataFrame
    ) -> None:
        spark = batch_df.sparkSession
        key = self.key

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
        # (star rule over the already-built buckets frame)
        w = Window.partitionBy("band", "bucket")
        intra = (
            buckets.withColumn("_anchor", F.min(key).over(w))
            .filter(F.col(key) != F.col("_anchor"))
            .select(key)
            .distinct()
        )
        dropped = intra if store_hits is None else intra.union(store_hits).distinct()

        kept = batch_df.join(dropped, key, "left_anti")
        kept.write.mode("overwrite").parquet(
            f"{self.out_dir}/batch={batch_id:06d}"
        )
        # the store grows by ALL of the batch's bucket keys — dropped
        # docs' too: a dropped near-dup may own buckets its killer
        # does not, and later docs matching only those must still be
        # caught (transitive recall; see module docstring). Distinct
        # keys only, so a hot bucket is one row per touching batch.
        batch_buckets = buckets.select("band", "bucket").distinct()
        batch_buckets.write.mode("overwrite").parquet(
            f"{self.store_dir}/batch={batch_id:06d}"
        )

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
