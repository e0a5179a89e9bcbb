"""Batch indexing job (the reference's `quickwit index ingest` analog).

    spark-submit --py-files dist/quickwit_spark.zip jobs/index_job.py \
        --input /data/corpus_parquet --index-dir /data/index \
        --text-field text --doc-key doc_id --partitions 64 \
        [--time-column warc_ts] [--stored url,lang] [--batches 4] \
        [--job-id job1] [--routing hash|input]

Resumable: re-running after a crash skips batches already committed to
the manifest (per-partition lineage; SURVEY.md §1.3).
"""

from __future__ import annotations

import argparse

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--doc-key", default="doc_id")
    p.add_argument("--text-field", action="append", default=None)
    p.add_argument("--time-column", default=None)
    p.add_argument("--stored", default="")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument(
        "--routing", choices=("hash", "input"), default="hash",
        help="hash: shuffle to --partitions segments by --doc-key; "
        "input: zero-shuffle, one segment per input partition "
        "(the reference's default no-partition_key ingest)",
    )
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--job-id", default="job0")
    args = p.parse_args()

    spark = get_spark("qws-index")
    df = spark.read.parquet(args.input)
    cfg = IndexConfig(
        fields=[FieldConfig(f) for f in (args.text_field or ["text"])],
        doc_key=args.doc_key,
        num_partitions=args.partitions,
        routing=args.routing,
        stored_columns=tuple(c for c in args.stored.split(",") if c),
        time_column=args.time_column,
    )
    recs = build_index(
        spark, df, args.index_dir, cfg, job_id=args.job_id, num_batches=args.batches
    )
    total = sum(r.num_docs for r in recs)
    print(f"published {len(recs)} segments, {total} docs → {args.index_dir}")


if __name__ == "__main__":
    main()
