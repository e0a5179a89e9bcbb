"""End-to-end web pipeline as one spark-submit entry:

    WARC files → parse → text extraction → curation → BM25 index
                                          ↘ (optional) tokenized dataset

    spark-submit --py-files dist/quickwit_spark.zip \
        jobs/web_pipeline_job.py \
        --warc '/data/crawl/*.warc' --work /data/pipeline \
        [--index] [--dataset --seq-len 2048 --num-shards 64 \
         --num-merges 1000] [--partitions 64] \
        [--mix 'en=0.5,de=0.5'] [--no-near-dup] [--report]

Stages (each the already-tested operator; this entry only composes):
  1. `sources.warc.read_warc`       — (url, warc_date, http_status,
                                      html binary), one partition per
                                      WARC file
  2. `sources.corpus.extract_text`  — byte-identical text recovery
                                      from html (pinned extractor)
  3. synthetic keys + curation      — doc_id = dense numeric surrogate
                                      (url-hash ordered), then
                                      `datapipe.curate.curate` (PII,
                                      quality, repetition, exact +
                                      MinHash near-dup, optional mix)
  4. `index.builder.build_index`    — resumable segment build over the
                                      curated corpus (--index)
  5. `datapipe.dataset.build_token_dataset`
                                    — BPE train + encode → seq_len
                                      windows → shuffled shards
                                      (--dataset)

Outputs under --work: curated/ (parquet), index/ (segments+manifest),
bpe_model/ + dataset/ (when --dataset), report.json (when --report).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from quickwit_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help="WARC file/glob/dir")
    ap.add_argument("--work", required=True, help="output root")
    ap.add_argument("--index", action="store_true")
    ap.add_argument("--dataset", action="store_true")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--num-merges", type=int, default=256)
    ap.add_argument("--mix", default=None)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--no-redact", action="store_true")
    ap.add_argument("--min-stopword-hits", type=int, default=None)
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()

    from quickwit_spark.datapipe.curate import curate
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.sources.corpus import extract_text
    from quickwit_spark.sources.warc import read_warc

    spark = get_spark("qws-web-pipeline")
    report: dict = {}

    # 1-2. parse + extract
    pages = read_warc(spark, args.warc).filter(F.col("http_status") == 200)
    docs = extract_text(pages).select(
        "url",
        "warc_ts",
        F.col("extracted_text").alias("text"),
    )
    # 3. dense numeric surrogate key, deterministic in the input set:
    # rank of (xxhash64(url), url) via the distributed two-pass rank
    # (sharding.surrogate_key) — never a global single-task window
    from quickwit_spark.datapipe.sharding import surrogate_key

    keyed = surrogate_key(
        docs.withColumn("_h", F.xxhash64("url")), ["_h", "url"]
    ).drop("_h")

    mixture = None
    if args.mix:
        mixture = {
            kv.split("=", 1)[0].strip(): float(kv.split("=", 1)[1])
            for kv in args.mix.split(",")
            if "=" in kv
        }
    bounds = (
        {"min_stopword_hits": args.min_stopword_hits}
        if args.min_stopword_hits is not None
        else None
    )
    curated = curate(
        keyed,
        url_col="url",
        redact=not args.no_redact,
        quality_bounds=bounds,
        near_dup=not args.no_near_dup,
        mixture=mixture,
    )
    curated_dir = os.path.join(args.work, "curated")
    curated.write.mode("overwrite").parquet(curated_dir)
    curated = spark.read.parquet(curated_dir)
    report["curated_docs"] = curated.count()

    # 4. index
    if args.index:
        idx_dir = os.path.join(args.work, "index")
        cfg = IndexConfig(
            fields=[FieldConfig("text")],
            doc_key="doc_id",
            num_partitions=args.partitions,
            stored_columns=("url",),
            time_column="warc_ts",
        )
        build_index(spark, curated, idx_dir, cfg)
        report["index_dir"] = idx_dir

    # 5. tokenized dataset
    if args.dataset:
        from quickwit_spark.datapipe.bpe import train_bpe, vocab, word_histogram
        from quickwit_spark.datapipe.dataset import build_token_dataset

        hist = word_histogram(curated)
        merges, pieces = train_bpe(hist, num_merges=args.num_merges)
        model_dir = os.path.join(args.work, "bpe_model")
        pieces.write.mode("overwrite").parquet(
            os.path.join(model_dir, "word_pieces")
        )
        v = vocab(merges, pieces)
        v.write.mode("overwrite").parquet(os.path.join(model_dir, "vocab"))
        ds_dir = os.path.join(args.work, "dataset")
        build_token_dataset(
            curated,
            pieces,
            ds_dir,
            seq_len=args.seq_len,
            num_shards=args.num_shards,
            vocab_df=v,
        )
        report["merges"] = len(merges)
        report["dataset_dir"] = ds_dir
        report["sequences"] = spark.read.parquet(ds_dir).count()

    if args.report:
        with open(
            os.path.join(args.work, "report.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(report, f)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
