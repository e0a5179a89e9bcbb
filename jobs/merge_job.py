"""Merge (compaction) job — one round of the StableLog merge policy.

    spark-submit --py-files dist/quickwit_spark.zip jobs/merge_job.py \
        --index-dir /data/index [--rounds 0 = until stable]
"""

from __future__ import annotations

import argparse

from quickwit_spark.index.merge import run_merges
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--max-rounds", type=int, default=10)
    args = p.parse_args()

    spark = get_spark("qws-merge")
    recs = run_merges(spark, args.index_dir, max_rounds=args.max_rounds)
    print(f"executed {len(recs)} merge ops (stable)")


if __name__ == "__main__":
    main()
