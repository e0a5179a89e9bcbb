"""spark-submit entry points driven in-process (argv-patched mains).

The reference ships a CLI (`docs/reference/cli.md`: index create/
ingest/search, split list, tool gc); our analogs are the `jobs/*.py`
spark-submit scripts. Driving `main()` with a patched argv exercises
the exact code path `spark-submit` runs (argument parsing included) —
only the JVM launch differs.
"""

import json
import sys

import pytest


@pytest.fixture(scope="module")
def corpus_path(sf_dir):
    return f"{sf_dir}/documents.parquet"


@pytest.fixture(scope="module")
def built_index(tmp_path_factory, corpus_path, spark, monkeysession):
    d = str(tmp_path_factory.mktemp("cli_idx"))
    import jobs.index_job as ij

    monkeysession.setattr(
        sys, "argv",
        ["index_job.py", "--input", corpus_path, "--index-dir", d,
         "--doc-key", "doc_id", "--text-field", "text",
         "--partitions", "4", "--stored", "lang", "--job-id", "cli"],
    )
    ij.main()
    return d


@pytest.fixture(scope="module")
def monkeysession():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_index_job_publishes(built_index):
    from quickwit_spark.index import manifest as mf

    segs = mf.live_segments(built_index)
    assert len(segs) == 4
    assert sum(s.num_docs for s in segs) == 500


def test_search_job_count_and_es_body(built_index, monkeysession, capsys):
    import jobs.search_job as sj

    monkeysession.setattr(
        sys, "argv",
        ["search_job.py", "--index-dir", built_index,
         "--query", "text:spark", "--count-only"],
    )
    sj.main()
    out = capsys.readouterr().out
    assert "387" in out  # sf0.001 oracle count for 'spark'

    monkeysession.setattr(
        sys, "argv",
        ["search_job.py", "--index-dir", built_index, "--es-body",
         json.dumps({"query": {"match": {"text": {"query": "spark"}}},
                     "size": 3})],
    )
    sj.main()
    assert capsys.readouterr().out.strip()


def test_index_job_input_routing(tmp_path_factory, corpus_path, monkeysession):
    import jobs.index_job as ij
    from quickwit_spark.index import manifest as mf

    d = str(tmp_path_factory.mktemp("cli_idx_inp"))
    monkeysession.setattr(
        sys, "argv",
        ["index_job.py", "--input", corpus_path, "--index-dir", d,
         "--doc-key", "doc_id", "--text-field", "text",
         "--routing", "input", "--job-id", "cli-inp"],
    )
    ij.main()
    segs = mf.live_segments(d)
    assert sum(s.num_docs for s in segs) == 500
    assert all(s.partition_id == 0 for s in segs)


def test_merge_job_runs(built_index, monkeysession, capsys):
    import jobs.merge_job as mj

    monkeysession.setattr(
        sys, "argv", ["merge_job.py", "--index-dir", built_index]
    )
    mj.main()
    assert "merge ops" in capsys.readouterr().out


def test_search_job_index_pattern(tmp_path_factory, corpus_path, monkeysession, capsys):
    """`--index-dir /root/dir/logs-*` fans out across matching indexes
    (the ES index-pattern URL analog) for search/count/es-body."""
    import os

    import jobs.index_job as ij
    import jobs.search_job as sj

    root = str(tmp_path_factory.mktemp("cli_multi"))
    for name, batch in (("logs-a", "0"), ("logs-b", "1")):
        monkeysession.setattr(
            sys, "argv",
            ["index_job.py", "--input", corpus_path,
             "--index-dir", os.path.join(root, name),
             "--doc-key", "doc_id", "--text-field", "text",
             "--partitions", "2", "--job-id", f"cli-{name}"],
        )
        ij.main()
    monkeysession.setattr(
        sys, "argv",
        ["search_job.py", "--index-dir", os.path.join(root, "logs-*"),
         "--query", "text:spark", "--count-only"],
    )
    sj.main()
    out = capsys.readouterr().out
    assert "774" in out  # both indexes hold the full 500-doc corpus: 2*387
    monkeysession.setattr(
        sys, "argv",
        ["search_job.py", "--index-dir", os.path.join(root, "logs-*"),
         "--query", "text:spark", "--k", "3"],
    )
    sj.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3 and all('"_index"' in l for l in lines)


def test_admin_job_lifecycle(tmp_path_factory, spark, monkeysession, capsys):
    """create → bulk → list → update → clear → delete through the
    spark-submit admin entry point (argv-patched main)."""
    import jobs.admin_job as aj

    root = str(tmp_path_factory.mktemp("cli_admin"))
    cfg = tmp_path_factory.mktemp("cli_admin_cfg")
    (cfg / "idx.json").write_text(json.dumps(
        {"index_id": "cli-logs", "doc_mapping": {"mode": "dynamic"}}
    ))
    (cfg / "bulk.ndjson").write_text(
        '{"index": {"_index": "cli-logs"}}\n{"msg": "hello cli"}\n'
    )
    (cfg / "upd.json").write_text(json.dumps(
        {"index_id": "cli-logs", "doc_mapping": {
            "mode": "dynamic",
            "field_mappings": [{"name": "msg", "type": "text"}]}}
    ))

    def run(*argv):
        monkeysession.setattr(sys, "argv", ["admin_job.py", "--root", root, *argv])
        aj.main()
        return capsys.readouterr().out

    out = run("create", "--config", str(cfg / "idx.json"))
    assert json.loads(out)["created"] is True
    out = run("bulk", "--ndjson", str(cfg / "bulk.ndjson"))
    resp = json.loads(out)
    assert resp["errors"] is False
    assert resp["items"][0]["index"]["status"] == 201
    assert run("list").strip() == "cli-logs"
    out = run("update", "--index", "cli-logs", "--config", str(cfg / "upd.json"))
    assert json.loads(out)["updated"] is True
    out = run("clear", "--index", "cli-logs")
    assert json.loads(out)["cleared"] is True
    out = run("describe", "--index", "cli-logs")
    assert json.loads(out)["index_id"] == "cli-logs"
    # source family through the CLI
    (cfg / "src.json").write_text(json.dumps(
        {"source_id": "src1", "source_type": "void", "params": {}}
    ))
    out = run("source-create", "--index", "cli-logs", "--config", str(cfg / "src.json"))
    assert json.loads(out)["enabled"] is True
    out = run("source-disable", "--index", "cli-logs", "--source", "src1")
    assert json.loads(out)["enabled"] is False
    out = run("source-describe", "--index", "cli-logs", "--source", "src1")
    assert json.loads(out)["source_type"] == "void"
    out = run("source-update", "--index", "cli-logs", "--source", "src1",
              "--config", str(cfg / "src.json"))
    assert json.loads(out)["source_id"] == "src1"
    out = run("source-list", "--index", "cli-logs")
    assert [s["source_id"] for s in json.loads(out)] == ["src1"]
    out = run("source-delete", "--index", "cli-logs", "--source", "src1")
    assert json.loads(out)["deleted"] is True
    # split resource through the CLI (re-ingest first: clear emptied it)
    out = run("bulk", "--ndjson", str(cfg / "bulk.ndjson"))
    assert json.loads(out)["errors"] is False
    out = run("split-list", "--index", "cli-logs", "--states", "Published")
    listing = json.loads(out)
    assert listing["size"] >= 1
    sid = listing["splits"][0]["split_id"]
    out = run("split-describe", "--index", "cli-logs", "--split", sid)
    assert json.loads(out)["split_state"] == "Published"
    out = run("split-mark-for-deletion", "--index", "cli-logs", "--split", sid)
    assert json.loads(out)["marked"] == [sid]
    out = run("split-list", "--index", "cli-logs", "--states", "MarkedForDeletion")
    assert [s["split_id"] for s in json.loads(out)["splits"]] == [sid]
    # schema-less helpers
    out = run("analyze", "--request", json.dumps({"type": "simple", "text": "a B"}))
    assert [t["text"] for t in json.loads(out)] == ["a", "B"]
    out = run("parse-query", "--query", "msg:hello")
    assert json.loads(out)["type"] == "full_text"
    out = run("delete", "--index", "cli-logs")
    assert json.loads(out)["deleted"] is True
    assert run("list").strip() == ""


def test_curate_job_writes_curated_parquet(
    tmp_path_factory, corpus_path, spark, monkeysession, capsys
):
    out_dir = str(tmp_path_factory.mktemp("curated"))
    import jobs.curate_job as cj

    monkeysession.setattr(
        sys, "argv",
        ["curate_job.py", "--input", corpus_path, "--output", out_dir,
         "--min-stopword-hits", "1", "--no-near-dup", "--report"],
    )
    cj.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    stages = dict(json.loads(lines[0])["stages"])
    assert stages["input"] == 500
    assert 0 < stages["exact_dedup"] < 500
    assert json.loads(lines[1])["done"]
    curated = spark.read.parquet(out_dir)
    assert curated.count() == stages["exact_dedup"]
    assert set(["doc_id", "text"]) <= set(curated.columns)


def test_train_classifier_job_and_curate_with_model(
    tmp_path_factory, spark, monkeysession, capsys
):
    """train_classifier_job writes an .npy model whose holdout accuracy
    prints; curate_job consumes it via --classifier-model."""
    import random

    import numpy as np

    import jobs.curate_job as cj
    import jobs.train_classifier_job as tj

    rng = random.Random(3)
    A = "spark shuffle executor broadcast join stage".split()
    B = "butter flour oven sugar bake whisk".split()

    def doc(v):
        return "the " + " ".join(rng.choice(v) for _ in range(30))

    d = tmp_path_factory.mktemp("clf")
    pos_p, neg_p = str(d / "pos"), str(d / "neg")
    spark.createDataFrame(
        [(i, doc(A)) for i in range(60)], ["doc_id", "text"]
    ).write.parquet(pos_p)
    spark.createDataFrame(
        [(i, doc(B)) for i in range(60)], ["doc_id", "text"]
    ).write.parquet(neg_p)
    model = str(d / "model.npy")
    monkeysession.setattr(
        sys, "argv",
        ["train_classifier_job.py", "--positive", pos_p, "--negative",
         neg_p, "--model-out", model, "--num-buckets", "2048",
         "--iters", "25", "--holdout-frac", "0.2"],
    )
    tj.main()
    rep = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert rep["holdout"]["accuracy"] >= 0.9
    w = np.load(model)
    assert w.shape == (2049,)

    mixed_p = str(d / "mixed")
    spark.createDataFrame(
        [(i, doc(A if i % 2 == 0 else B)) for i in range(40)],
        ["doc_id", "text"],
    ).write.parquet(mixed_p)
    out_dir = str(d / "curated")
    monkeysession.setattr(
        sys, "argv",
        ["curate_job.py", "--input", mixed_p, "--output", out_dir,
         "--min-stopword-hits", "1", "--no-near-dup", "--no-redact",
         "--classifier-model", model, "--classifier-threshold", "0.5",
         "--report"],
    )
    cj.main()
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    stages = dict(json.loads(lines[0])["stages"])
    assert stages["classifier"] <= 25
    kept = spark.read.parquet(out_dir)
    assert all(r["doc_id"] % 2 == 0 for r in kept.select("doc_id").collect())


def test_bpe_job_train_then_encode(
    tmp_path_factory, corpus_path, spark, monkeysession, capsys
):
    d = tmp_path_factory.mktemp("bpe")
    model, out = str(d / "model"), str(d / "tokens")
    import jobs.bpe_job as bj

    monkeysession.setattr(
        sys, "argv",
        ["bpe_job.py", "train", "--input", corpus_path, "--model", model,
         "--num-merges", "20"],
    )
    bj.main()
    trained = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert 0 < trained["merges"] <= 20
    with open(f"{model}/merges.json", encoding="utf-8") as f:
        merges = json.load(f)
    assert len(merges) == trained["merges"]
    v = spark.read.parquet(f"{model}/vocab")
    assert v.count() > len(merges)

    monkeysession.setattr(
        sys, "argv",
        ["bpe_job.py", "encode", "--input", corpus_path, "--model", model,
         "--output", out],
    )
    bj.main()
    enc = spark.read.parquet(out)
    docs = spark.read.parquet(corpus_path)
    assert enc.count() == docs.count()
    assert enc.filter("n_tokens <= 0").count() == 0
    # every emitted token is either a vocab token or a raw character
    from pyspark.sql import functions as F

    toks = enc.select(F.explode("tokens").alias("t")).distinct()
    unknown = toks.join(
        v.select(F.col("token").alias("t")), "t", "left_anti"
    ).filter(F.length("t") > 1)
    assert unknown.count() == 0


def test_stream_dedup_job_drains_and_resumes(
    tmp_path_factory, spark, monkeysession, capsys
):
    d = tmp_path_factory.mktemp("sdj")
    src = str(d / "in"); (d / "in").mkdir()
    text_a = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, text_a), (2, "totally different words " * 8)],
        ["doc_id", "text"],
    )
    seed = str(d / "seed.parquet")
    df.limit(1).write.parquet(seed)
    df.coalesce(1).write.mode("append").parquet(src)
    import jobs.stream_dedup_job as sdj

    argv = ["stream_dedup_job.py", "--input", src, "--schema-from", seed,
            "--store", str(d / "store"), "--output", str(d / "out"),
            "--checkpoint", str(d / "ckpt")]
    monkeysession.setattr(sys, "argv", argv)
    sdj.main()
    out1 = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert out1["kept_total"] == 2
    # second drop: one near-dup of doc 1, one new — rerun drains only it
    spark.createDataFrame(
        [(3, text_a.replace("w59", "zz")), (4, "fresh new content here " * 6)],
        ["doc_id", "text"],
    ).coalesce(1).write.mode("append").parquet(src)
    monkeysession.setattr(sys, "argv", argv)
    sdj.main()
    out2 = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert out2["kept_total"] == 3  # doc 3 deduped against the store


def test_web_pipeline_job_end_to_end(
    tmp_path_factory, spark, sf_dir, monkeysession, capsys
):
    """WARC → extract → curate → index → tokenized dataset, one entry."""
    from quickwit_spark.sources.corpus import web_corpus
    from quickwit_spark.sources.warc import write_warc

    d = tmp_path_factory.mktemp("webpipe")
    warc_dir = str(d / "warc")
    corpus = web_corpus(spark, sf_dir, with_html=True)
    n_in = write_warc(corpus.repartition(3), warc_dir)
    assert n_in == corpus.count()

    import jobs.web_pipeline_job as wj

    work = str(d / "work")
    monkeysession.setattr(
        sys, "argv",
        ["web_pipeline_job.py", "--warc", warc_dir, "--work", work,
         "--index", "--dataset", "--seq-len", "256", "--num-shards", "2",
         "--num-merges", "16", "--min-stopword-hits", "0",
         "--partitions", "4", "--report"],
    )
    wj.main()
    report = json.loads(
        [l for l in capsys.readouterr().out.splitlines()
         if l.startswith("{")][-1]
    )
    assert 0 < report["curated_docs"] <= n_in
    assert report["sequences"] > 0 and report["merges"] == 16
    assert json.load(open(f"{work}/report.json")) == report

    # the index answers queries over the curated corpus
    from quickwit_spark.search.engine import IndexSearcher

    s = IndexSearcher(spark, report["index_dir"])
    assert s.count("*") == report["curated_docs"]
    hits = s.search("spark OR data", k=5).collect()
    assert len(hits) > 0

    # the dataset shards hold dense ids
    ds = spark.read.parquet(report["dataset_dir"])
    assert "token_ids" in ds.columns
    assert ds.count() == report["sequences"]


def test_serve_job_answers_http(tmp_path_factory, monkeysession, spark):
    """jobs/serve_job.py: the spark-submit HTTP entry point boots a
    live server over a facade root and answers ES routes."""
    import json as _json
    import urllib.request

    from quickwit_spark.api import QuickwitSpark

    root = str(tmp_path_factory.mktemp("serve_root"))
    qw = QuickwitSpark(spark, root)
    qw.create_index(
        {"index_id": "svc", "doc_mapping": {"mode": "dynamic",
         "dynamic_mapping": {"tokenizer": "default", "fast": True}}}
    )
    qw.ingest("svc", [{"msg": "served doc"}])

    import jobs.serve_job as sj

    monkeysession.setattr(
        sys, "argv",
        ["serve_job.py", "--index-root", root, "--port", "0", "--cores", "4"],
    )
    server = sj.main(wait=False)
    try:
        with urllib.request.urlopen(server.url + "/", timeout=60) as r:
            assert "cluster_name" in _json.loads(r.read())
        body = _json.dumps({"query": {"match": {"msg": "served"}}}).encode()
        req = urllib.request.Request(
            server.url + "/svc/_search", data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert _json.loads(r.read())["hits"]["total"]["value"] == 1
    finally:
        server.stop()
