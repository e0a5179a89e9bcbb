"""Search job (the reference's `quickwit index search` analog).

    spark-submit --py-files dist/quickwit_spark.zip jobs/search_job.py \
        --index-dir /data/index --query "spark AND join" [--k 10] \
        [--count-only] [--fetch url,lang]
"""

from __future__ import annotations

import argparse
import json

from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--count-only", action="store_true")
    p.add_argument("--fetch", default="")
    args = p.parse_args()

    spark = get_spark("qws-search")
    s = IndexSearcher(spark, args.index_dir)
    if args.count_only:
        print(json.dumps({"num_hits": s.count(args.query)}))
        return
    fetch = [c for c in args.fetch.split(",") if c]
    hits = s.search(args.query, k=args.k, fetch=fetch).collect()
    for r in hits:
        print(json.dumps(r.asDict(), default=str))


if __name__ == "__main__":
    main()
