"""Benchmark harness — indexing throughput + headline query latencies.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...},        # best-of-2 in-process (warm)
   "queries_cold": {name: sec, ...},   # first-pass numbers alongside
   "sf": ...,
   "indexing": {docs, mb, secs, docs_per_sec, mb_per_sec, per_core},
   "merge": {..., secs (min), secs_cold, secs_warm},
   "scaleup": {replicate, docs, build_secs, queries, query_ratio_vs_base}}

The warm/cold split exists because this microVM's first pass over any
file is inflated 1.3-2× by a cold page cache (BASELINE.md
§bench-protocol); committed artifacts carry both so round-over-round
comparisons use warm minima instead of scheduler luck.

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir    (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N]     (default 32)
  QWS_BENCH_REPLICATE  corpus replication factor (default 40) — the
      sf0.1 documents table is 5k rows; replication (doc_id offset per
      replica, text unchanged) scales posting lists to a measurable
      size while staying derived from the driver-provided input.
  QWS_BENCH_WARM=1     warm the Python UDF workers with a tiny build
      before the timed one (steady-state / long-lived-cluster mode;
      default off for comparability with earlier rounds). Recorded in
      the output as "warm".
  QWS_BENCH_SCALEUP=0  skip the 10× stress point (on by default;
      QWS_BENCH_SCALEUP_REPLICATE sets its corpus factor, default 400
      ≈ 2 M docs — catches O(corpus) driver steps the ~1.2 s
      scheduling floor hides at the default size). The scaleup phase
      also stresses merge at 4× corpus (throughput_ratio_vs_base ≈ 1
      is the linear pass shape) and the bucketed datapipe ops
      (minhash-LSH anchor edges, IVF-PQ ANN) at N vs 4N inputs
      (secs_ratio ≈ 4 linear, ≪ 16 = the quadratic failure shape;
      QWS_BENCH_DEDUP_REPLICATE / QWS_BENCH_KNN_REPLICATE size them).

`python bench.py --scaling` additionally re-runs the indexing job in
subprocesses at cores=8 and cores=32 on identical input and reports
throughput at both + scaling efficiency (the sandbox evidence for the
north rule's N→4N ≥0.8 criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("QWS_BENCH_REPLICATE", "40"))

# numbers recorded on a loaded host are noise, not measurements (the
# round-2 BENCH was 2.5× slower than an idle re-run of the same code) —
# wait for the machine to go idle, and always record loadavg in the JSON
# so a flagged run is self-describing
LOAD_MAX = float(os.environ.get("QWS_BENCH_LOAD_MAX", "2.0"))
LOAD_WAIT_SECS = int(os.environ.get("QWS_BENCH_LOAD_WAIT_SECS", "600"))


def wait_for_idle() -> dict:
    """Block (up to LOAD_WAIT_SECS) until 1-min loadavg ≤ LOAD_MAX.
    Returns {"loadavg": [...], "load_flagged": bool} for the output."""
    deadline = time.time() + LOAD_WAIT_SECS
    load = os.getloadavg()
    while load[0] > LOAD_MAX and time.time() < deadline:
        print(
            f"# bench: host loaded (1m={load[0]:.2f} > {LOAD_MAX}), waiting...",
            file=sys.stderr,
        )
        time.sleep(30)
        load = os.getloadavg()
    return {
        "loadavg": [round(x, 2) for x in load],
        "load_flagged": load[0] > LOAD_MAX,
    }


def bench_corpus(spark, sf_dir: str, replicate: int):
    """documents.parquet replicated `replicate`× with shifted doc_ids.

    The small docs table is BROADCAST; the replica range is the stream
    side with `replicate` partitions, so corpus generation parallelizes
    (documents.parquet is a single file = a single input partition —
    cross-joining off it would serialize the whole pipeline behind one
    map task)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    reps = spark.range(0, replicate, 1, numPartitions=min(replicate, 256))
    big = reps.withColumnRenamed("id", "rep").crossJoin(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=((F.col("doc_id") + F.col("rep") * n) * 97).cast("double"))
        ).alias("warc_ts"),
    )
    return big, n * replicate


def run_index_bench(
    cores: int,
    out_json: str | None = None,
    record: str = "freq",
    replicate: int | None = None,
) -> dict:
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.session import get_spark

    # at high core counts, reserving 2 cpus/task halves concurrent
    # python workers: the UDF worker + its JVM feeder thread together
    # saturate one core pair, and >16 concurrent memory-heavy workers
    # regress per-task time ~5× on this host (see BASELINE.md §scaling)
    spark = get_spark(
        "qws_bench",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.task.cpus": "2"} if cores >= 16 else None,
    )
    gen, ndocs = bench_corpus(spark, SF_DIR, replicate or REPLICATE)
    # materialize the corpus to a real table first — the timed job reads
    # from storage like the production pipeline reads the Iceberg table
    corpus_dir = tempfile.mkdtemp(prefix=f"qws_bench_corpus_{cores}_")
    gen.write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    mb = (
        corpus.selectExpr("sum(octet_length(text)) AS b").collect()[0]["b"] or 0
    ) / 1e6
    idx_dir = tempfile.mkdtemp(prefix=f"qws_bench_idx_{cores}_")
    # num_partitions is CONSTANT across core counts: the scaling study
    # must run identical work units at different parallelism, like the
    # same segment plan on an N- vs 4N-executor cluster.
    cfg = IndexConfig(
        fields=[FieldConfig("text", record=record)],
        doc_key="doc_id",
        num_partitions=64,
        stored_columns=("lang", "source", "n_chars"),
        time_column="warc_ts",
    )
    warm = os.environ.get("QWS_BENCH_WARM", "") == "1"
    if warm:
        # steady-state mode: spawn + warm the Python UDF workers with a
        # tiny build first, so the timed job measures throughput the way
        # a long-lived cluster would see it (worker fork + import +
        # first-touch allocator costs are per-executor-lifetime, not
        # per-job). Cold mode stays the default for r1/r2 comparability.
        wdir = tempfile.mkdtemp(prefix="qws_bench_warm_")
        build_index(
            spark, corpus.limit(2000), wdir, cfg, job_id="bench_warm"
        )
        shutil.rmtree(wdir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, corpus, idx_dir, cfg, job_id="bench")
    secs = time.perf_counter() - t0
    shutil.rmtree(corpus_dir, ignore_errors=True)
    res = {
        "cores": cores,
        "docs": ndocs,
        "mb": round(mb, 2),
        "secs": round(secs, 3),
        "docs_per_sec": round(ndocs / secs, 1),
        "mb_per_sec": round(mb / secs, 3),
        "mb_per_sec_per_core": round(mb / secs / cores, 4),
        "warm": warm,
        "idx_dir": idx_dir,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f)
    return res


def run_datapipe_scaleup(cores: int) -> dict:
    """Scale evidence for the bucketed datapipe paths (VERDICT r4 item
    5): run the same op at N and 4N inputs and report the time ratio.
    A pairwise (quadratic) plan would show ~16× at 4× input; the
    banded-LSH dedup and PQ-coded ANN paths are designed to stay
    near-linear (Σ|bucket| edges / m-byte code scans), so
    `secs_ratio` ≈ 4 is the pass shape.

      - dedup: minhash signatures + anchor-edge extraction
        (shingle→64-perm minhash→banded buckets→star edges)
      - knn: IVF-PQ end to end (driver-sampled codebooks, ADC
        shortlist, exact re-rank) for 64 queries over a jittered
        replication of the embeddings table
    """
    from pyspark.sql import functions as F

    from quickwit_spark.datapipe import dedup, similarity
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench", cores=cores, shuffle_partitions=cores)
    out: dict = {}

    def best_of(fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            secs = time.perf_counter() - t0
            best = secs if best is None else min(best, secs)
        return round(best, 3), r

    base_rep = int(os.environ.get("QWS_BENCH_DEDUP_REPLICATE", "16"))

    def run_dedup(rep):
        gen, ndocs = bench_corpus(spark, SF_DIR, rep)
        docs = gen.select("doc_id", "text")
        sigs = dedup.minhash_signatures(docs, "doc_id", num_perm=64)
        return ndocs, dedup.minhash_lsh_edges(
            sigs, "doc_id", bands=16, rows=4
        ).count()

    run_dedup(1)  # untimed: python-worker/JVM warmup
    dd = {}
    for label, rep in (("base", base_rep), ("x4", base_rep * 4)):
        secs, (ndocs, n_edges) = best_of(lambda: run_dedup(rep))
        dd[label] = {"docs": ndocs, "secs": secs, "edges": n_edges}
    dd["secs_ratio"] = round(dd["x4"]["secs"] / max(dd["base"]["secs"], 1e-9), 2)
    dd["input_ratio"] = 4.0
    out["dedup_minhash_edges"] = dd

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base_rep = int(os.environ.get("QWS_BENCH_KNN_REPLICATE", "16"))
    queries = emb.filter(F.col("vec_id") < 64).select("vec_id", "embedding")

    def run_knn(rep):
        # deterministic replication: shifted ids, slightly scaled
        # vectors (ANN cost is size-driven, not value-driven)
        big = (
            emb.crossJoin(spark.range(rep).withColumnRenamed("id", "rep"))
            .select(
                (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (1.0 + F.col("rep") * 0.001),
                ).alias("embedding"),
            )
        )
        return similarity.ivfpq_topk(
            big, queries, k=10, nlist=32, nprobe=4, m=8, ksub=16
        ).count()

    run_knn(1)  # untimed warmup
    kn = {}
    for label, rep in (("base", base_rep), ("x4", base_rep * 4)):
        secs, n_rows = best_of(lambda: run_knn(rep))
        kn[label] = {"vectors": 2000 * rep, "secs": secs, "rows": n_rows}
    kn["secs_ratio"] = round(kn["x4"]["secs"] / max(kn["base"]["secs"], 1e-9), 2)
    kn["input_ratio"] = 4.0
    out["knn_ivfpq"] = kn
    return out


def run_merge_bench(
    cores: int,
    slices: int = 12,
    repeats: int = 2,
    replicate: int | None = None,
) -> dict:
    """Hierarchical merge throughput: `slices` sequential ingest batches
    produce `slices` segments per routing partition (merges only group
    within a partition, like the reference), then StableLog merges them
    (merge_factor 10) — salted postings re-merge + docmap rewrite.

    The merge phase runs `repeats` times on identical pristine copies
    of the pre-merge index IN ONE PROCESS: the first run lands on a
    cold page cache (on this microVM that inflates it 1.3-2×; see
    BASELINE.md §bench-protocol), the later runs measure the code.
    `secs` (the headline) is the min; `secs_cold` is run 1, so the
    artifact records both instead of whichever the scheduler felt
    like."""
    from pyspark.sql import functions as F

    from quickwit_spark.index import manifest as mf
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.index.merge import run_merges
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench", cores=cores, shuffle_partitions=cores)
    gen, ndocs = bench_corpus(spark, SF_DIR, replicate or REPLICATE)
    corpus_dir = tempfile.mkdtemp(prefix=f"qws_merge_corpus_{cores}_")
    gen.write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    idx_dir = tempfile.mkdtemp(prefix=f"qws_merge_idx_{cores}_")
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=8
    )
    step = (ndocs + slices - 1) // slices
    for i in range(slices):
        build_index(
            spark,
            corpus.filter(
                (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
            ),
            idx_dir,
            cfg,
            job_id=f"ing{i:02d}",
        )
    shutil.rmtree(corpus_dir, ignore_errors=True)
    times = []
    recs = []
    segments_after = 0
    for rep in range(max(repeats, 1)):
        work_dir = tempfile.mkdtemp(prefix=f"qws_merge_work_{rep}_")
        shutil.rmtree(work_dir, ignore_errors=True)
        shutil.copytree(idx_dir, work_dir)
        t0 = time.perf_counter()
        recs = run_merges(spark, work_dir)
        times.append(time.perf_counter() - t0)
        segments_after = len(mf.live_segments(work_dir))
        shutil.rmtree(work_dir, ignore_errors=True)
    merged_docs = sum(r.num_docs for r in recs)
    secs = min(times)
    res = {
        "ops": len(recs),
        "docs_merged": merged_docs,
        "secs": round(secs, 3),
        "secs_cold": round(times[0], 3),
        "secs_warm": round(min(times[1:] or times), 3),
        "docs_per_sec": round(merged_docs / secs, 1) if secs > 0 else 0.0,
        "segments_after": segments_after,
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    return res


def run_query_bench(idx_dir: str, cores: int) -> dict:
    import datetime as dt

    from quickwit_spark.query.ast import Bool, FullText, Range, Term, Wildcard
    from quickwit_spark.search import aggs
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench", cores=cores, shuffle_partitions=cores)
    s = IndexSearcher(spark, idx_dir)
    qset = {
        "q_hot_term": lambda: s.search(Term("text", "table"), k=10).collect(),
        "q_rare_term": lambda: s.search(Term("text", "vector"), k=10).collect(),
        "q_or_hot_rare": lambda: s.search(
            FullText("text", "table vector stream", "or"), k=10
        ).collect(),
        "q_and": lambda: s.search(FullText("text", "table join", "and"), k=10).collect(),
        "q_bool": lambda: s.search(
            Bool(
                must=[Term("text", "spark")],
                should=[Term("text", "join")],
                must_not=[Term("text", "slow")],
            ),
            k=10,
        ).collect(),
        "q_time_filter": lambda: s.search(
            Bool(
                must=[Term("text", "query")],
                filter=[Range("warc_ts", lt=dt.datetime(2024, 1, 10))],
            ),
            k=10,
        ).collect(),
        "q_wildcard": lambda: s.search(Wildcard("text", "qu*"), k=10).collect(),
        "q_count": lambda: s.count(Term("text", "table")),
        "q_agg_terms": lambda: aggs.terms_agg_for_query(
            s, Term("text", "table"), "lang"
        ).collect(),
    }
    # untimed warmup: spins up python workers + page cache so the first
    # timed query isn't measuring JVM/worker cold start
    s.search(Term("text", "row"), k=10).collect()
    # two timed passes per query in one process: pass 1 can still hit
    # cold file pages for that query's postings; the headline is the
    # min and the cold pass is recorded alongside (BASELINE.md
    # §bench-protocol — committed artifacts must not encode page-cache
    # luck in either direction)
    out = {}
    cold = {}
    for name, fn in qset.items():
        t0 = time.perf_counter()
        fn()
        cold[name] = round(time.perf_counter() - t0, 3)
    for name, fn in qset.items():
        t0 = time.perf_counter()
        fn()
        out[name] = min(round(time.perf_counter() - t0, 3), cold[name])
    out["_cold"] = cold  # popped into top-level "queries_cold" by main()
    # warmup-cache (leaf-cache analog): persist the hot term's postings
    # and time the REPEATED query against the in-memory path (first
    # call after caching pays one-time plan/codegen — steady state is
    # what the cache exists for). At sf0.1 the win is bounded by the
    # ~0.9 s fixed job-submission floor (see q_count); the scan-time
    # component it removes grows with index size.
    def best_of(fn, n=3):
        reps = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            reps.append(time.perf_counter() - t0)
        return round(min(reps), 3)

    run_hot = lambda: s.search(Term("text", "table"), k=10).collect()  # noqa: E731
    # paired protocol: SAME query, SAME best-of-3, with and without the
    # cache — the delta is the parquet-scan component the cache removes
    out["q_hot_term_uncached_rep"] = best_of(run_hot)
    s.cache_hot_postings(["table"])
    run_hot()  # one-time plan/codegen against the in-memory relation
    out["q_hot_term_cached"] = best_of(run_hot)
    s.uncache()
    # concurrent-search throughput: all queries at once on the shared
    # session (stateless searcher, like the reference's searcher fleet)
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=len(qset)) as pool:
        list(pool.map(lambda fn: fn(), qset.values()))
    wall = time.perf_counter() - t0
    out["concurrent_all"] = round(wall, 3)
    out["concurrent_qps"] = round(len(qset) / wall, 2)
    return out


def run_phrase_bench(idx_dir: str, cores: int) -> dict:
    """Phrase-family latencies on a `record: position` index (the same
    replicated corpus): the vectorized sorted-merge position kernel must
    keep q_phrase within ~2× of the positionless q_and."""
    from quickwit_spark.query.ast import FullText, Phrase, PhrasePrefix
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench", cores=cores, shuffle_partitions=cores)
    s = IndexSearcher(spark, idx_dir)
    qset = {
        "q_and_pos": lambda: s.search(
            FullText("text", "table join", "and"), k=10
        ).collect(),
        "q_phrase": lambda: s.search(Phrase("text", "table join"), k=10).collect(),
        "q_phrase_slop": lambda: s.search(
            Phrase("text", "table join", slop=2), k=10
        ).collect(),
        "q_phrase_prefix": lambda: s.search(
            PhrasePrefix("text", "table jo"), k=10
        ).collect(),
    }
    s.search(Phrase("text", "row scan"), k=10).collect()  # warmup
    out = {}
    cold = {}
    for name, fn in qset.items():
        t0 = time.perf_counter()
        fn()
        cold[name] = round(time.perf_counter() - t0, 3)
    for name, fn in qset.items():
        t0 = time.perf_counter()
        fn()
        out[name] = min(round(time.perf_counter() - t0, 3), cold[name])
    out["_cold"] = cold
    return out


def scaling_report(
    replicate: int = 1600, pairs=(1, 4, 8, 32), attempts: int = 2
) -> dict:
    """Same indexing job at N and 4N cores in fresh JVMs — the
    local-mode proxy for the north rule's two-cluster-size criterion.

    Reports BOTH 2→8 and 8→32. On this sandbox (Firecracker microVM,
    visible steal time, kernel-dominated first-touch page faults) the
    32-thread point is bounded by the virtualized fault path, not by
    the job — see BASELINE.md §scaling for the diagnosis; 2→8 is the
    representative multi-executor figure."""
    out = {}
    for cores in pairs:
        best = None
        for _attempt in range(attempts):  # best-of-N: host steal-time noise
            rf = tempfile.mktemp(suffix=".json")
            code = (
                "import bench, json; "
                f"r = bench.run_index_bench({cores}, {rf!r}); "
                "import shutil; shutil.rmtree(r['idx_dir'], ignore_errors=True)"
            )
            env = dict(os.environ, QWS_BENCH_REPLICATE=str(replicate))
            subprocess.run(
                [sys.executable, "-c", code],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                check=True,
                capture_output=True,
                env=env,
            )
            with open(rf) as f:
                r = json.load(f)
            os.unlink(rf)
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        out[f"cores{cores}"] = best
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if f"cores{lo}" in out and f"cores{hi}" in out:
            r = out[f"cores{hi}"]["docs_per_sec"] / out[f"cores{lo}"]["docs_per_sec"]
            out[f"scaling_efficiency_{lo}_to_{hi}"] = round(r / (hi / lo), 3)
    return out


def run_curate_bench(cores: int) -> dict:
    """End-to-end curation-pipeline throughput (quality + repetition +
    PII + exact & MinHash dedup) written to parquet — the training-data
    side of the engine. Not part of the default bench phases; run with
    `python bench.py --curate`."""
    from pyspark.sql import functions as F

    from quickwit_spark.datapipe.curate import curate
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench_curate", cores=cores, shuffle_partitions=cores)
    # replicated corpus with a unique per-doc suffix: replicas become
    # textually-distinct NEAR-duplicates, so the MinHash-LSH + CC stage
    # does real 40-doc-cluster work instead of trivial exact matches
    big, n = bench_corpus(spark, SF_DIR, REPLICATE)
    docs = big.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" d"), F.col("doc_id").cast("string"))
        .alias("text"),
    ).persist()
    n = docs.count()
    mb = docs.select(F.sum(F.length("text"))).first()[0] / 1e6
    out_dir = tempfile.mkdtemp(prefix="qws_bench_curated_")
    t0 = time.perf_counter()
    curate(docs, quality_bounds={"min_stopword_hits": 1}).write.mode(
        "overwrite"
    ).parquet(out_dir)
    secs = time.perf_counter() - t0
    kept = spark.read.parquet(out_dir).count()
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return {
        "cores": cores,
        "docs": n,
        "mb": round(mb, 2),
        "kept": kept,
        "secs": round(secs, 3),
        "docs_per_sec": round(n / secs, 1),
        "mb_per_sec": round(mb / secs, 3),
    }


def run_dataset_bench(cores: int) -> dict:
    """Tokenized-dataset export throughput: BPE train (histogram +
    64 merges) then encode → pack → shuffle → write shards. Run with
    `python bench.py --dataset`."""
    from pyspark.sql import functions as F

    from quickwit_spark.datapipe.bpe import train_bpe, word_histogram
    from quickwit_spark.datapipe.dataset import build_token_dataset
    from quickwit_spark.session import get_spark

    spark = get_spark("qws_bench_dataset", cores=cores, shuffle_partitions=cores)
    docs, n = bench_corpus(spark, SF_DIR, REPLICATE)
    docs = docs.persist()
    n = docs.count()
    mb = docs.select(F.sum(F.length("text"))).first()[0] / 1e6
    t0 = time.perf_counter()
    merges, pieces = train_bpe(word_histogram(docs, "text"), num_merges=64)
    train_secs = time.perf_counter() - t0
    out_dir = tempfile.mkdtemp(prefix="qws_bench_ds_")
    t1 = time.perf_counter()
    build_token_dataset(
        docs, pieces, out_dir, seq_len=2048, num_shards=max(cores, 4)
    )
    export_secs = time.perf_counter() - t1
    seqs = spark.read.parquet(out_dir).count()
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return {
        "cores": cores,
        "docs": n,
        "mb": round(mb, 2),
        "merges": len(merges),
        "sequences": seqs,
        "train_secs": round(train_secs, 3),
        "export_secs": round(export_secs, 3),
        "export_docs_per_sec": round(n / export_secs, 1),
        "export_mb_per_sec": round(mb / export_secs, 3),
    }


def run_scaleup_bench(cores: int, base_queries: dict | None = None) -> dict:
    """One committed stress point at ~10× the default bench corpus
    (QWS_BENCH_SCALEUP_REPLICATE, default 400 ≈ 2 M docs / 600 MB of
    text): the ~1.2 s/query floor at the default size is Spark job-
    scheduling latency, not scan work, so only a larger corpus can
    reveal an O(corpus) driver step or super-linear query cost. Reports
    the headline queries (best-of-2 in-process) plus their ratio vs the
    base-size run — with a 10× corpus a healthy top-k query grows far
    sub-linearly (term-pruned scan + per-segment top-k), so
    query_ratio_vs_base ≪ 10 is the pass shape."""
    import datetime as dt

    from quickwit_spark.query.ast import Bool, FullText, Range, Term, Wildcard
    from quickwit_spark.search import aggs
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.session import get_spark

    replicate = int(os.environ.get("QWS_BENCH_SCALEUP_REPLICATE", "400"))
    idx = run_index_bench(cores, replicate=replicate)
    idx_dir = idx.pop("idx_dir")
    spark = get_spark("qws_bench", cores=cores, shuffle_partitions=cores)
    s = IndexSearcher(spark, idx_dir)
    qset = {
        "q_hot_term": lambda: s.search(Term("text", "table"), k=10).collect(),
        "q_rare_term": lambda: s.search(Term("text", "vector"), k=10).collect(),
        "q_and": lambda: s.search(
            FullText("text", "table join", "and"), k=10
        ).collect(),
        "q_time_filter": lambda: s.search(
            Bool(
                must=[Term("text", "query")],
                filter=[Range("warc_ts", lt=dt.datetime(2024, 1, 10))],
            ),
            k=10,
        ).collect(),
        "q_wildcard": lambda: s.search(Wildcard("text", "qu*"), k=10).collect(),
        "q_count": lambda: s.count(Term("text", "table")),
        "q_agg_terms": lambda: aggs.terms_agg_for_query(
            s, Term("text", "table"), "lang"
        ).collect(),
    }
    s.search(Term("text", "row"), k=10).collect()  # warmup
    queries = {}
    for _pass in range(2):
        for name, fn in qset.items():
            t0 = time.perf_counter()
            fn()
            secs = round(time.perf_counter() - t0, 3)
            queries[name] = min(queries.get(name, secs), secs)
    out = {
        "replicate": replicate,
        "docs": idx["docs"],
        "mb": idx["mb"],
        "build_secs": idx["secs"],
        "build_mb_per_sec": idx["mb_per_sec"],
        "queries": queries,
    }
    if base_queries:
        ratios = {
            name: round(queries[name] / base_queries[name], 2)
            for name in queries
            if base_queries.get(name)
        }
        out["query_ratio_vs_base"] = ratios
        out["corpus_ratio_vs_base"] = round(replicate / REPLICATE, 1)
    shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def main():
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_report(), indent=2))
        return
    if "--curate" in sys.argv:
        load_info = wait_for_idle()
        print(json.dumps({"curate": run_curate_bench(CPUS), **load_info}))
        return
    if "--dataset" in sys.argv:
        load_info = wait_for_idle()
        print(json.dumps({"dataset": run_dataset_bench(CPUS), **load_info}))
        return
    load_info = wait_for_idle()
    t_all = time.perf_counter()
    idx = run_index_bench(CPUS)
    idx_dir = idx.pop("idx_dir")
    merge = run_merge_bench(CPUS)
    queries = run_query_bench(idx_dir, CPUS)
    queries_cold = queries.pop("_cold", {})
    idxp = run_index_bench(CPUS, record="position")
    idxp_dir = idxp.pop("idx_dir")
    phrase = run_phrase_bench(idxp_dir, CPUS)
    queries_cold.update(phrase.pop("_cold", {}))
    queries.update(phrase)
    shutil.rmtree(idxp_dir, ignore_errors=True)
    # headline wall closes HERE: the scale-up stress point is a
    # separate measurement, not part of the round-over-round
    # "index_build_plus_query_wall_sec" series (folding it in would
    # read as a huge regression vs earlier rounds' artifacts)
    total = round(time.perf_counter() - t_all, 3)
    # 10× stress point (skippable for quick local iteration loops)
    scaleup = None
    if os.environ.get("QWS_BENCH_SCALEUP", "1") == "1":
        scaleup = run_scaleup_bench(CPUS, base_queries=queries)
        # merge at 4× corpus: throughput (docs/sec) should hold ≈flat
        # if the merge path is linear in merged bytes
        merge4 = run_merge_bench(
            CPUS, replicate=REPLICATE * 4, repeats=2
        )
        scaleup["merge"] = {
            **merge4,
            "corpus_ratio_vs_base": 4.0,
            "throughput_ratio_vs_base": round(
                merge4["docs_per_sec"] / max(merge["docs_per_sec"], 1e-9), 2
            ),
        }
        scaleup["datapipe"] = run_datapipe_scaleup(CPUS)
    # NOTE on the north rule's two-cluster-size criterion: the default
    # run does NOT embed an N-vs-4N study — at this corpus size the
    # ratio is dominated by fixed job overhead and microVM steal-time
    # noise (a measured 4-core run can come out SLOWER than 1-core
    # minutes apart). The authoritative evidence is the 2.4 GB
    # best-of-2 study behind `--scaling`, recorded in BASELINE.md
    # §scaling together with the virtualized-fault-path analysis.
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "index_build_plus_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "queries_cold": queries_cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "indexing": idx,
                "indexing_positions": idxp,
                "merge": merge,
                **({"scaleup": scaleup} if scaleup else {}),
                **load_info,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
