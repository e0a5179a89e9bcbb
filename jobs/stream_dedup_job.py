"""Streaming incremental near-dedup as a spark-submit entry.

    spark-submit --py-files dist/quickwit_spark.zip \
        jobs/stream_dedup_job.py \
        --input /data/incoming --schema-from /data/seed.parquet \
        --store /data/dedup_store --output /data/deduped \
        --checkpoint /data/ckpt \
        [--key doc_id] [--text-col text] [--num-perm 32] [--bands 8] \
        [--continuous]

Watches `--input` for new parquet files (the file-source micro-batch
pattern); each batch is deduplicated against everything seen so far
via the LSH bucket store (quickwit_spark/streaming/near_dedup.py).
Default is a drain-and-exit `availableNow` run (cron-able, resumes
from the checkpoint); `--continuous` stays up and processes files as
they land.
"""

from __future__ import annotations

import argparse
import json

from quickwit_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--schema-from",
        required=True,
        help="parquet path whose schema the stream reader uses",
    )
    ap.add_argument("--store", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--num-perm", type=int, default=32)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--continuous", action="store_true")
    args = ap.parse_args()

    from quickwit_spark.streaming.near_dedup import NearDedupStream

    spark = get_spark("qws-stream-dedup")
    schema = spark.read.parquet(args.schema_from).schema
    nd = NearDedupStream(
        args.store,
        args.output,
        key=args.key,
        text_col=args.text_col,
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        bands=args.bands,
    )
    stream = spark.readStream.schema(schema).parquet(args.input)
    q = nd.attach(
        stream, args.checkpoint, available_now=not args.continuous
    )
    q.awaitTermination()
    kept = spark.read.parquet(args.output).count()
    print(json.dumps({"kept_total": kept, "output": args.output}))


if __name__ == "__main__":
    main()
