"""Tokenized training-dataset export as a spark-submit entry.

    spark-submit --py-files dist/quickwit_spark.zip jobs/dataset_job.py \
        --input /data/curated --model /data/bpe_model \
        --output /data/dataset \
        [--seq-len 2048] [--num-shards 64] [--seed 0] \
        [--key doc_id] [--text-col text] [--no-broadcast]

Composes bpe_encode → pack_sequences → assemble → shuffle_shards
(quickwit_spark/datapipe/dataset.py). Expects a model directory
produced by `jobs/bpe_job.py train`.
"""

from __future__ import annotations

import argparse
import json
import os

from quickwit_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-broadcast", action="store_true")
    ap.add_argument(
        "--ids",
        action="store_true",
        help="write dense token_ids (model vocab) instead of strings",
    )
    args = ap.parse_args()

    from quickwit_spark.datapipe.dataset import build_token_dataset

    spark = get_spark("qws-dataset")
    docs = spark.read.parquet(args.input)
    pieces = spark.read.parquet(os.path.join(args.model, "word_pieces"))
    vocab_df = (
        spark.read.parquet(os.path.join(args.model, "vocab"))
        if args.ids
        else None
    )
    build_token_dataset(
        docs,
        pieces,
        args.output,
        seq_len=args.seq_len,
        num_shards=args.num_shards,
        seed=args.seed,
        key=args.key,
        text_col=args.text_col,
        broadcast_pieces=not args.no_broadcast,
        vocab_df=vocab_df,
    )
    out = spark.read.parquet(args.output)
    print(
        json.dumps(
            {
                "sequences": out.count(),
                "shards": args.num_shards,
                "seq_len": args.seq_len,
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
