"""HTTP serving job (the reference's `quickwit run --service searcher`
analog: qw/quickwit-serve mounts the ES-compatible REST API; here the
stdlib shim from quickwit_spark.serve does, over a facade index root).

    spark-submit --py-files dist/quickwit_spark.zip jobs/serve_job.py \
        --index-root /data/indexes [--host 0.0.0.0] [--port 9200] \
        [--cores 8]

Serves until interrupted. Routes: / (cluster banner), <idx>/_search,
_msearch, _bulk, _search/scroll, _count, _stats, _field_caps,
_cat/indices, _resolve/index, _cluster/health — under both bare ES
paths and /api/v1/_elastic/... like the reference.
"""

from __future__ import annotations

import argparse
import signal
import threading

from quickwit_spark.api import QuickwitSpark
from quickwit_spark.serve import EsHttpServer
from quickwit_spark.session import get_spark


def main(wait: bool = True):
    p = argparse.ArgumentParser()
    p.add_argument("--index-root", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=9200)
    p.add_argument("--cores", type=int, default=8)
    args = p.parse_args()

    spark = get_spark("qws_serve", cores=args.cores, shuffle_partitions=args.cores)
    qw = QuickwitSpark(spark, args.index_root)
    server = EsHttpServer(facade=qw, host=args.host, port=args.port)
    server.start()
    print(f"serving {len(qw.list_indexes())} index(es) at {server.url}", flush=True)
    if not wait:  # test mode: caller owns the lifecycle
        return server

    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    stop.wait()
    server.stop()
    return None


if __name__ == "__main__":
    main()
