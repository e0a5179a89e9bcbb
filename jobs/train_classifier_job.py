"""Train the linear quality classifier as a spark-submit entry.

    spark-submit --py-files dist/quickwit_spark.zip \
        jobs/train_classifier_job.py \
        --positive /data/reference_corpus --negative /data/raw_sample \
        --model-out /data/quality_model.npy \
        [--text-col text] [--num-buckets 10000] [--iters 30] [--lr 2.0]

The output .npy (float64[num_buckets+1], weights + bias) feeds
`jobs/curate_job.py --classifier-model` or
`quality_score`/`quality_filter` directly. Holdout metrics print as one
JSON line when --holdout-frac > 0 (rows are split off each corpus
deterministically by key hash before training).
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from pyspark.sql import functions as F

from quickwit_spark.datapipe.quality_classifier import (
    quality_score,
    train_quality_classifier,
)
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--positive", required=True,
                   help="parquet path of the quality reference corpus")
    p.add_argument("--negative", required=True,
                   help="parquet path of the raw/web sample")
    p.add_argument("--model-out", required=True)
    p.add_argument("--key", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-buckets", type=int, default=10_000)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--lr", type=float, default=2.0)
    p.add_argument("--l2", type=float, default=1e-6)
    p.add_argument("--holdout-frac", type=float, default=0.0,
                   help="e.g. 0.1: hold out every 10th row by key hash "
                        "and report holdout accuracy")
    args = p.parse_args()

    spark = get_spark("qws-train-classifier")
    pos = spark.read.parquet(args.positive)
    neg = spark.read.parquet(args.negative)
    pos_h = neg_h = None
    if args.holdout_frac > 0:
        mod = max(int(round(1 / args.holdout_frac)), 2)
        is_hold = F.pmod(F.xxhash64(F.col(args.key)), F.lit(mod)) == 0
        pos_h, pos = pos.filter(is_hold), pos.filter(~is_hold)
        neg_h, neg = neg.filter(is_hold), neg.filter(~is_hold)

    w = train_quality_classifier(
        pos, neg, args.text_col,
        num_buckets=args.num_buckets, iters=args.iters,
        lr=args.lr, l2=args.l2,
    )
    np.save(args.model_out, w)
    out = {"model": args.model_out, "num_buckets": args.num_buckets}
    if pos_h is not None:
        kw = dict(num_buckets=args.num_buckets)
        tp = (
            quality_score(pos_h, w, args.text_col, **kw)
            .filter(F.col("quality_score") > 0.5).count()
        )
        tn = (
            quality_score(neg_h, w, args.text_col, **kw)
            .filter(F.col("quality_score") <= 0.5).count()
        )
        np_, nn = pos_h.count(), neg_h.count()
        out["holdout"] = {
            "pos": np_, "neg": nn,
            "accuracy": round((tp + tn) / max(np_ + nn, 1), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
