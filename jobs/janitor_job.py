"""Janitor job: retention + delete-rewrites + merges + GC in one sweep.

    spark-submit --py-files dist/quickwit_spark.zip jobs/janitor_job.py \
        --index-dir /data/index [--retain-after 2024-01-03T00:00:00] [--gc]
"""

from __future__ import annotations

import argparse
import datetime as dt

from quickwit_spark.index.deletes import plan_delete_rewrites
from quickwit_spark.index.merge import execute_merge, run_merges
from quickwit_spark.index.retention import apply_retention, garbage_collect
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--retain-after", default=None, help="ISO timestamp cutoff")
    p.add_argument("--gc", action="store_true")
    args = p.parse_args()

    spark = get_spark("qws-janitor")
    if args.retain_after:
        cutoff = int(dt.datetime.fromisoformat(args.retain_after).timestamp() * 1e6)
        retired = apply_retention(args.index_dir, cutoff)
        print(f"retired {len(retired)} segments past retention")
    for op in plan_delete_rewrites(args.index_dir):
        execute_merge(spark, args.index_dir, op)
    merged = run_merges(spark, args.index_dir)
    print(f"executed {len(merged)} merge ops")
    if args.gc:
        removed = garbage_collect(args.index_dir)
        print(f"collected {len(removed)} dead batch dirs")


if __name__ == "__main__":
    main()
