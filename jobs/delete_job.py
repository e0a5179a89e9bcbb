"""Delete-by-query job (the reference's delete-task API analog).

    spark-submit --py-files dist/quickwit_spark.zip jobs/delete_job.py \
        --index-dir /data/index --query "lang:spam" [--apply]

Without --apply the delete is only recorded (applied lazily at the
next merge, like the reference's janitor); with --apply, rewrite ops
run immediately.
"""

from __future__ import annotations

import argparse

from quickwit_spark.index.deletes import delete_by_query, plan_delete_rewrites
from quickwit_spark.index.merge import execute_merge
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--apply", action="store_true")
    args = p.parse_args()

    spark = get_spark("qws-delete")
    s = IndexSearcher(spark, args.index_dir)
    opstamp = delete_by_query(s, args.query)
    print(f"recorded delete opstamp {opstamp}")
    if args.apply:
        ops = plan_delete_rewrites(args.index_dir)
        for op in ops:
            execute_merge(spark, args.index_dir, op)
        print(f"applied via {len(ops)} rewrite ops")


if __name__ == "__main__":
    main()
