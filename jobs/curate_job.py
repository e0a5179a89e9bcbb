"""Corpus-curation job: the composed training-data pipeline as a
spark-submit entry.

    spark-submit --py-files dist/quickwit_spark.zip jobs/curate_job.py \
        --input /data/raw_corpus --output /data/curated \
        [--key doc_id] [--text-col text] [--url-col url] \
        [--benchmark /data/eval_set] [--decontam-n 13] \
        [--no-redact] [--no-near-dup] [--min-stopword-hits 2] \
        [--report]

Stages (see quickwit_spark/datapipe/curate.py): URL dedup → PII
redaction → optional C4 clean (--c4) → Gopher quality filter
(+ optional LM perplexity bound and/or trained linear classifier via
--classifier-model) → Gopher repetition filter → exact dedup →
MinHash-LSH near-dup removal → benchmark decontamination.
Without --report the pipeline is one lazy plan straight into the
parquet writer (the 100 TB shape); --report prints per-stage row
counts (runs one count job per stage — sample-scale auditing only).
"""

from __future__ import annotations

import argparse
import json

from quickwit_spark.datapipe.curate import curate
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--key", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--url-col", default=None)
    p.add_argument("--benchmark", default=None,
                   help="parquet path of the eval set to decontaminate against")
    p.add_argument("--decontam-n", type=int, default=13)
    p.add_argument("--no-redact", action="store_true")
    p.add_argument("--no-near-dup", action="store_true")
    p.add_argument("--para-dedup", action="store_true",
                   help="corpus-wide paragraph dedup (text surgery)")
    p.add_argument("--span-window", type=int, default=None,
                   help="exact-substring span cuts at this token window")
    p.add_argument("--max-perplexity", type=float, default=None,
                   help="drop docs above this trigram-LM perplexity")
    p.add_argument("--lm-train", default=None,
                   help="parquet path of clean text to train the LM on "
                        "(default: self-trained)")
    p.add_argument("--min-stopword-hits", type=int, default=None,
                   help="override the Gopher required-stopword bound")
    p.add_argument("--c4", action="store_true",
                   help="C4 line clean + page filters before quality")
    p.add_argument("--classifier-model", default=None,
                   help=".npy weight vector from "
                        "train_quality_classifier (num_buckets+1)")
    p.add_argument("--classifier-threshold", type=float, default=None,
                   help="hard score cut; omit for GPT-3 Pareto keep")
    p.add_argument("--mix", default=None,
                   help="target domain mixture, e.g. 'en=0.5,de=0.25,"
                        "fr=0.25' — final deterministic downsample")
    p.add_argument("--mix-domain", default="lang")
    p.add_argument("--mix-seed", type=int, default=0)
    p.add_argument("--report", action="store_true")
    args = p.parse_args()
    mixture = None
    if args.mix:
        mixture = {}
        for part in args.mix.split(","):
            part = part.strip()
            if not part:
                continue
            if "=" not in part:
                p.error(f"--mix segment {part!r} is not domain=weight")
            d, w = part.split("=", 1)
            try:
                mixture[d.strip()] = float(w)
            except ValueError:
                p.error(f"--mix weight {w!r} for {d.strip()!r} not a number")
        if not mixture:
            p.error("--mix given but parsed to no domain=weight pairs")

    spark = get_spark("qws-curate")
    df = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    bounds = (
        {"min_stopword_hits": args.min_stopword_hits}
        if args.min_stopword_hits is not None
        else None
    )
    result = curate(
        df,
        key=args.key,
        text_col=args.text_col,
        url_col=args.url_col,
        redact=not args.no_redact,
        c4=args.c4,
        quality_bounds=bounds,
        classifier_weights=(
            __import__("numpy").load(args.classifier_model)
            if args.classifier_model else None
        ),
        classifier_threshold=args.classifier_threshold,
        near_dup=not args.no_near_dup,
        benchmark=bench,
        decontam_n=args.decontam_n,
        para_dedup=args.para_dedup,
        span_window=args.span_window,
        max_perplexity=args.max_perplexity,
        lm_train=(
            spark.read.parquet(args.lm_train) if args.lm_train else None
        ),
        mixture=mixture,
        mixture_domain_col=args.mix_domain,
        mixture_seed=args.mix_seed,
        with_report=args.report,
    )
    if args.report:
        out, report = result
        print(json.dumps({"stages": report}))
    else:
        out = result
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"output": args.output, "done": True}))


if __name__ == "__main__":
    main()
