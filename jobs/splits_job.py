"""Split listing job: the metastore `ListSplits` surface as a CLI.

    spark-submit --py-files dist/quickwit_spark.zip jobs/splits_job.py \
        --index-dir /data/index [--states published,staged] \
        [--time-range 2024-01-01T00:00:00,2024-02-01T00:00:00] \
        [--tags lang:en,lang:de] [--min-merge-gen 1]

Manifest-only — no SparkSession is started (the reference's
`quickwit split list` talks to the metastore alone).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json

from quickwit_spark.index.manifest import list_splits


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--states", default=None, help="comma list")
    p.add_argument("--time-range", default=None, help="ISO start,ISO end")
    p.add_argument("--tags", default=None, help="comma list, any-of")
    p.add_argument("--min-merge-gen", type=int, default=None)
    args = p.parse_args()

    tr = None
    if args.time_range:
        lo, hi = args.time_range.split(",")
        tr = tuple(
            int(dt.datetime.fromisoformat(t).timestamp() * 1e6) for t in (lo, hi)
        )
    rows = list_splits(
        args.index_dir,
        states=tuple(args.states.split(",")) if args.states else None,
        time_range=tr,
        tags_any=tuple(args.tags.split(",")) if args.tags else None,
        min_merge_gen=args.min_merge_gen,
    )
    for r in rows:
        print(
            json.dumps(
                {
                    "segment_id": r.segment_id,
                    "state": r.state,
                    "num_docs": r.num_docs,
                    "time_range": r.time_range,
                    "tags": r.tags,
                    "merge_gen": r.merge_gen,
                }
            )
        )
    print(f"# {len(rows)} splits")


if __name__ == "__main__":
    main()
