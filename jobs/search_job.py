"""Search job (the reference's `quickwit index search` analog).

    spark-submit --py-files dist/quickwit_spark.zip jobs/search_job.py \
        --index-dir /data/index --query "spark AND join" [--k 10] \
        [--count-only] [--fetch url,lang] [--snippet text] \
        [--sort-by n_chars [--asc]] [--plan] [--describe] \
        [--early-terminate [--count-hits underestimate]] \
        [--export /out --format csv|rowbinary --columns lang,n_chars \
         [--partition-by lang]]

    # full ES _search body (query + aggs + size):
    ... jobs/search_job.py --index-dir /data/index \
        --es-body '{"query": {"match": {"text": {"query": "spark"}}},
                    "size": 5, "aggs": {"langs": {"terms": {"field": "lang"}}}}'
"""

from __future__ import annotations

import argparse
import json

from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--query")
    p.add_argument("--es-body", help="full ES _search body as JSON")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--count-only", action="store_true")
    p.add_argument("--fetch", default="")
    p.add_argument("--snippet", default="", help="comma-separated snippet fields")
    p.add_argument("--sort-by", default="", help="fast-field sort instead of BM25")
    p.add_argument("--asc", action="store_true")
    p.add_argument("--plan", action="store_true", help="print the search plan")
    p.add_argument("--describe", action="store_true", help="print index stats")
    p.add_argument(
        "--early-terminate", action="store_true",
        help="split-order early termination (demotes provable losers)",
    )
    p.add_argument("--count-hits", default="count_all",
                   choices=["count_all", "underestimate"])
    p.add_argument("--export", help="search_stream export directory")
    p.add_argument("--format", default="csv", choices=["csv", "rowbinary"])
    p.add_argument("--columns", default="", help="export columns")
    p.add_argument("--partition-by", help="partition_by_fast_field column")
    args = p.parse_args()

    spark = get_spark("qws-search")
    # `--index-dir /data/logs-*` or `/data/a,/data/b` fans out across
    # every matching index (the reference's ES index-pattern URLs);
    # a plain directory keeps the single-index searcher (full surface)
    if "*" in args.index_dir or "," in args.index_dir:
        import os as _os

        from quickwit_spark.search.multi import MultiIndexSearcher

        pats = [p_.strip() for p_ in args.index_dir.split(",")]
        root = _os.path.dirname(pats[0].rstrip("/")) or "."
        s = MultiIndexSearcher.resolve(
            spark, root, [_os.path.basename(p_.rstrip("/")) for p_ in pats]
        )
        multi = True
    else:
        s = IndexSearcher(spark, args.index_dir)
        multi = False
    if multi and (
        args.describe or args.plan or args.export
        or args.early_terminate or args.sort_by or args.snippet
    ):
        p.error(
            "index patterns support plain --query search, --count-only, "
            "and --es-body only"
        )

    if args.describe:
        print(json.dumps(s.describe_index(), default=str))
        return
    if args.es_body:
        res = s.es_search(json.loads(args.es_body))
        if "hits" in res:
            for r in res["hits"].collect():
                print(json.dumps(r.asDict(), default=str))
        for name, df in (res.get("aggregations") or {}).items():
            print(
                json.dumps(
                    {"agg": name, "buckets": [r.asDict() for r in df.collect()]},
                    default=str,
                )
            )
        return
    if not args.query:
        p.error("--query or --es-body or --describe required")
    if args.plan:
        plan = s.search_plan(args.query, k=args.k)
        plan.pop("spark_plan", None)
        print(json.dumps(plan, default=str))
        return
    if args.count_only:
        print(json.dumps({"num_hits": s.count(args.query)}))
        return
    if args.export:
        cols = [c for c in args.columns.split(",") if c]
        res = s.export_stream(
            args.query, cols, args.export, fmt=args.format,
            partition_by=args.partition_by,
        )
        print(json.dumps({"exported": res}, default=str))
        return
    fetch = [c for c in args.fetch.split(",") if c]
    if args.early_terminate:
        et = s.search_early(
            args.query, k=args.k, count_hits=args.count_hits, fetch=fetch
        )
        for r in et["hits"].collect():
            print(json.dumps(r.asDict(), default=str))
        print(
            json.dumps(
                {
                    "num_hits": et["num_hits"],
                    "phase1": et["phase1"],
                    "phase2": et["phase2"],
                    "demoted": et["demoted"],
                }
            )
        )
        return
    if args.sort_by:
        hits = s.sort_by_field(
            args.query, args.sort_by, k=args.k, descending=not args.asc, fetch=fetch
        ).collect()
    elif multi:
        hits = s.search(args.query, k=args.k, fetch=fetch).collect()
    else:
        snippet = [c for c in args.snippet.split(",") if c]
        hits = s.search(
            args.query, k=args.k, fetch=fetch, snippet_fields=snippet or None
        ).collect()
    for r in hits:
        print(json.dumps(r.asDict(), default=str))


if __name__ == "__main__":
    main()
