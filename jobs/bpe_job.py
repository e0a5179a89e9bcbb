"""Distributed BPE tokenizer training/encoding as a spark-submit entry.

    # train: learn merges + piece table from a corpus
    spark-submit --py-files dist/quickwit_spark.zip jobs/bpe_job.py \
        train --input /data/corpus --model /data/bpe_model \
        [--text-col text] [--num-merges 1000] [--min-pair-count 2]

    # encode: tokenize a corpus with a trained model
    spark-submit --py-files dist/quickwit_spark.zip jobs/bpe_job.py \
        encode --input /data/corpus --model /data/bpe_model \
        --output /data/tokens [--key doc_id] [--text-col text] \
        [--no-broadcast]

The model directory holds `merges.json` (ordered rules), a
`word_pieces` parquet table (training-histogram word → final pieces —
the encode join table), and a `vocab` parquet table (token → dense id).
Training runs entirely on the distributed word histogram; encoding is
a posexplode + join, no per-row Python (quickwit_spark/datapipe/bpe.py).
"""

from __future__ import annotations

import argparse
import json
import os

from quickwit_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["train", "encode"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--output")
    ap.add_argument("--key", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--num-merges", type=int, default=1000)
    ap.add_argument("--min-pair-count", type=int, default=2)
    ap.add_argument("--no-broadcast", action="store_true")
    args = ap.parse_args()

    from quickwit_spark.datapipe.bpe import (
        bpe_encode,
        train_bpe,
        vocab,
        word_histogram,
    )

    spark = get_spark("qws-bpe")
    df = spark.read.parquet(args.input)

    if args.mode == "train":
        hist = word_histogram(df, text_col=args.text_col)
        merges, pieces = train_bpe(
            hist,
            num_merges=args.num_merges,
            min_pair_count=args.min_pair_count,
        )
        pieces.write.mode("overwrite").parquet(
            os.path.join(args.model, "word_pieces")
        )
        # chars come from the checkpointed pieces table, NOT hist —
        # re-deriving hist would re-scan the whole corpus
        vocab(merges, pieces).write.mode("overwrite").parquet(
            os.path.join(args.model, "vocab")
        )
        merges_path = os.path.join(args.model, "merges.json")
        with open(merges_path, "w", encoding="utf-8") as f:
            json.dump(merges, f, ensure_ascii=False)
        print(
            json.dumps(
                {"mode": "train", "merges": len(merges), "model": args.model}
            )
        )
    else:
        if not args.output:
            ap.error("encode requires --output")
        pieces = spark.read.parquet(os.path.join(args.model, "word_pieces"))
        enc = bpe_encode(
            df,
            pieces,
            key=args.key,
            text_col=args.text_col,
            broadcast_table=not args.no_broadcast,
        )
        enc.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"mode": "encode", "output": args.output}))


if __name__ == "__main__":
    main()
