"""Index-administration job (the reference's `quickwit index
create/ingest/delete/clear/update` + template CLI analog,
`docs/reference/cli.md`), driving the QuickwitSpark facade:

    spark-submit --py-files dist/quickwit_spark.zip jobs/admin_job.py \
        --root /data/indexes create --config index_config.json
        ... ingest --index logs --ndjson docs.ndjson
        ... bulk --ndjson payload.ndjson
        ... update --index logs --config new_config.json
        ... clear --index logs
        ... delete --index logs
        ... template-create --config template.json
        ... template-delete --template-id t1
        ... list
        ... describe --index logs
        ... source-create --index logs --config source.json
        ... source-update --index logs --source s1 --config source.json
        ... source-enable|source-disable|source-delete|source-describe \
              --index logs --source s1
        ... source-reset-checkpoint | source-run --index logs --source s1
        ... source-list --index logs
        ... analyze --request '{"type": "simple", "text": "Hello"}'
        ... parse-query --query 'body:hello' [--search-field a,b]

Config files are reference index-config / index-template JSON
documents. `bulk` prints the ES bulk response envelope; `list` prints
index ids one per line.
"""

from __future__ import annotations

import argparse
import json

from quickwit_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="shared index root dir")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("create")
    sp.add_argument("--config", required=True)
    sp = sub.add_parser("ingest")
    sp.add_argument("--index", required=True)
    sp.add_argument("--ndjson", required=True)
    sp = sub.add_parser("bulk")
    sp.add_argument("--ndjson", required=True)
    sp.add_argument("--default-index", default=None)
    sp = sub.add_parser("update")
    sp.add_argument("--index", required=True)
    sp.add_argument("--config", required=True)
    sp = sub.add_parser("clear")
    sp.add_argument("--index", required=True)
    sp = sub.add_parser("delete")
    sp.add_argument("--index", required=True)
    sp = sub.add_parser("template-create")
    sp.add_argument("--config", required=True)
    sp = sub.add_parser("template-delete")
    sp.add_argument("--template-id", required=True)
    sub.add_parser("list")
    sp = sub.add_parser("describe")
    sp.add_argument("--index", required=True)
    # source family (reference `quickwit source
    # create/update/enable/disable/delete/describe/list/reset-checkpoint`)
    sp = sub.add_parser("source-create")
    sp.add_argument("--index", required=True)
    sp.add_argument("--config", required=True)
    sp = sub.add_parser("source-update")
    sp.add_argument("--index", required=True)
    sp.add_argument("--source", required=True)
    sp.add_argument("--config", required=True)
    for name in ("source-enable", "source-disable", "source-delete",
                 "source-describe", "source-reset-checkpoint", "source-run"):
        sp = sub.add_parser(name)
        sp.add_argument("--index", required=True)
        sp.add_argument("--source", required=True)
    sp = sub.add_parser("source-list")
    sp.add_argument("--index", required=True)
    # split resource (`quickwit split list/describe/mark-for-deletion`)
    sp = sub.add_parser("split-list")
    sp.add_argument("--index", required=True)
    sp.add_argument("--states", default=None,
                    help="comma list: Staged,Published,MarkedForDeletion")
    sp.add_argument("--offset", type=int, default=None)
    sp.add_argument("--limit", type=int, default=None)
    sp.add_argument("--start-timestamp", type=int, default=None)
    sp.add_argument("--end-timestamp", type=int, default=None)
    sp.add_argument("--end-create-timestamp", type=int, default=None)
    sp = sub.add_parser("split-describe")
    sp.add_argument("--index", required=True)
    sp.add_argument("--split", required=True)
    sp = sub.add_parser("split-mark-for-deletion")
    sp.add_argument("--index", required=True)
    sp.add_argument("--split", required=True, help="comma list of split ids")
    # merge rounds under the index's configured merge policy
    sp = sub.add_parser("merge")
    sp.add_argument("--index", required=True)
    sp.add_argument("--max-rounds", type=int, default=10)
    # schema-less REST helpers (`/analyze`, `/parse-query`)
    sp = sub.add_parser("analyze")
    sp.add_argument("--request", required=True,
                    help="JSON AnalyzeRequest (TokenizerConfig + text)")
    sp = sub.add_parser("parse-query")
    sp.add_argument("--query", required=True)
    sp.add_argument("--search-field", default=None)
    args = p.parse_args()

    from quickwit_spark.api import QuickwitSpark

    spark = get_spark("qws-admin")
    qw = QuickwitSpark(spark, args.root)

    if args.cmd == "create":
        with open(args.config) as f:
            print(json.dumps(qw.create_index(json.load(f))))
    elif args.cmd == "ingest":
        with open(args.ndjson) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        print(json.dumps(qw.ingest(args.index, lines)))
    elif args.cmd == "bulk":
        with open(args.ndjson) as f:
            payload = f.read()
        print(json.dumps(qw.bulk(payload, default_index=args.default_index)))
    elif args.cmd == "update":
        with open(args.config) as f:
            print(json.dumps(qw.update_index(args.index, json.load(f))))
    elif args.cmd == "clear":
        print(json.dumps(qw.clear_index(args.index)))
    elif args.cmd == "delete":
        qw.delete_index(args.index)
        print(json.dumps({"index_id": args.index, "deleted": True}))
    elif args.cmd == "template-create":
        with open(args.config) as f:
            print(json.dumps(qw.create_template(json.load(f))))
    elif args.cmd == "template-delete":
        qw.delete_template(args.template_id)
        print(json.dumps({"template_id": args.template_id, "deleted": True}))
    elif args.cmd == "list":
        for name in qw.list_indexes():
            print(name)
    elif args.cmd == "describe":
        print(json.dumps(qw.describe_index(args.index), default=str))
    elif args.cmd == "source-create":
        with open(args.config) as f:
            print(json.dumps(qw.create_source(args.index, json.load(f))))
    elif args.cmd == "source-update":
        with open(args.config) as f:
            print(json.dumps(qw.update_source(args.index, args.source, json.load(f))))
    elif args.cmd in ("source-enable", "source-disable"):
        print(json.dumps(
            qw.toggle_source(args.index, args.source, args.cmd == "source-enable")
        ))
    elif args.cmd == "source-delete":
        qw.delete_source(args.index, args.source)
        print(json.dumps({"source_id": args.source, "deleted": True}))
    elif args.cmd == "source-describe":
        print(json.dumps(qw.get_source(args.index, args.source)))
    elif args.cmd == "source-reset-checkpoint":
        qw.reset_source_checkpoint(args.index, args.source)
        print(json.dumps({"source_id": args.source, "checkpoint": {}}))
    elif args.cmd == "source-run":
        print(json.dumps(qw.run_source(args.index, args.source)))
    elif args.cmd == "source-list":
        print(json.dumps(qw.list_sources(args.index)))
    elif args.cmd == "split-list":
        print(json.dumps(qw.list_splits(
            args.index, offset=args.offset, limit=args.limit,
            split_states=args.states,
            start_timestamp=args.start_timestamp,
            end_timestamp=args.end_timestamp,
            end_create_timestamp=args.end_create_timestamp,
        )))
    elif args.cmd == "split-describe":
        splits = [
            s for s in qw.list_splits(args.index)["splits"]
            if s["split_id"] == args.split
        ]
        if not splits:
            raise SystemExit(f"split {args.split!r} not found")
        print(json.dumps(splits[0]))
    elif args.cmd == "split-mark-for-deletion":
        print(json.dumps(
            qw.mark_splits_for_deletion(args.index, args.split.split(","))
        ))
    elif args.cmd == "merge":
        print(json.dumps(qw.run_merges(args.index, max_rounds=args.max_rounds)))
    elif args.cmd == "analyze":
        print(json.dumps(qw.analyze(json.loads(args.request))))
    elif args.cmd == "parse-query":
        req = {"query": args.query}
        if args.search_field:
            req["search_field"] = args.search_field
        print(json.dumps(qw.parse_query(req)))


if __name__ == "__main__":
    main()
