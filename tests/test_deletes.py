"""Delete tasks: delete-by-query recorded, applied at rewrite, stats refreshed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.index.deletes import (
    delete_by_query,
    pending_deletes,
    plan_delete_rewrites,
)
from quickwit_spark.index.merge import execute_merge
from quickwit_spark.query.ast import Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("delidx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("url", "lang"),
        time_column="warc_ts",
    )
    build_index(spark, web_corpus(spark, sf_dir), d, cfg, job_id="del")
    return d


def test_delete_lifecycle(spark, idx, sf_dir):
    s = IndexSearcher(spark, idx)
    n_before = s.count(Term("text", "vector"))
    total_before = s.count(Term("text", "spark"))
    assert n_before > 0

    op = delete_by_query(s, Term("text", "vector"))
    assert op == 1
    rec = pending_deletes(idx)[op]
    assert sum(rec["segments"].values()) == n_before
    # corrections carry exact token counts of the doomed docs
    corpus = web_corpus(spark, sf_dir).toPandas()
    doomed_keys = {
        int(k)
        for k, t in zip(corpus["doc_id"], corpus["text"].str.split())
        if "vector" in t
    }
    exp_tokens = sum(
        len(t)
        for k, t in zip(corpus["doc_id"], corpus["text"].str.split())
        if int(k) in doomed_keys
    )
    got_tokens = sum(
        c["text"]["deleted_tokens"] for c in rec["corrections"].values()
    )
    assert got_tokens == exp_tokens

    # docs remain searchable until the rewrite (reference laziness)
    assert s.count(Term("text", "vector")) == n_before

    # apply: one rewrite op per affected segment
    ops = plan_delete_rewrites(idx)
    assert len(ops) == 2
    for o in ops:
        execute_merge(spark, idx, o)
    s.refresh()

    assert s.count(Term("text", "vector")) == 0
    # every non-deleted doc still matches exactly as before
    live_spark = {
        int(k)
        for k, t in zip(corpus["doc_id"], corpus["text"].str.split())
        if "spark" in t and int(k) not in doomed_keys
    }
    got = {r["doc_key"] for r in s.search_stream(Term("text", "spark"), []).collect()}
    assert got == live_spark
    assert s.count(Term("text", "spark")) == len(live_spark) < total_before

    # manifest stats reflect live docs only (BM25 stats refreshed)
    segs = mf.live_segments(idx)
    assert sum(g.num_docs for g in segs) == len(corpus) - len(doomed_keys)
    live_tokens = sum(
        len(t)
        for k, t in zip(corpus["doc_id"], corpus["text"].str.split())
        if int(k) not in doomed_keys
    )
    assert sum(g.field_stats["text"]["total_tokens"] for g in segs) == live_tokens

    # scores equal a fresh index built over only the live docs (oracle:
    # per-segment stats differ, so compare via the oracle mode which
    # uses global stats)
    hits = s.search(Term("text", "spark"), k=5, mode="oracle").collect()
    assert len(hits) == 5
    scores = [r["score"] for r in hits]
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_deletes_applied_in_multi_segment_merge(spark, sf_dir, tmp_path_factory):
    """Tombstones apply during a NORMAL StableLog merge of several
    segments, not just single-segment rewrites."""
    from pyspark.sql import functions as F

    from quickwit_spark.index.merge import MergePolicy, run_merges

    d = str(tmp_path_factory.mktemp("delmerge"))
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    corpus = web_corpus(spark, sf_dir)
    # 4 ingest slices → 4 segments in partition 0
    for i in range(4):
        build_index(
            spark,
            corpus.filter((F.col("doc_id") % 4) == i),
            d,
            cfg,
            job_id=f"s{i}",
        )
    s = IndexSearcher(spark, d)
    n_vec = s.count(Term("text", "vector"))
    assert n_vec > 0 and len(mf.live_segments(d)) == 4

    delete_by_query(s, Term("text", "vector"))
    # merge_factor 4 so the four young segments merge in one op
    recs = run_merges(spark, d, MergePolicy(merge_factor=4, max_merge_factor=4))
    assert len(recs) == 1
    s.refresh()
    assert len(s.live_ids) == 1
    assert s.count(Term("text", "vector")) == 0

    corpus_pdf = corpus.toPandas()
    doomed = {
        int(k)
        for k, t in zip(corpus_pdf["doc_id"], corpus_pdf["text"].str.split())
        if "vector" in t
    }
    assert s.count("*") == len(corpus_pdf) - len(doomed)
    live_spark = {
        int(k)
        for k, t in zip(corpus_pdf["doc_id"], corpus_pdf["text"].str.split())
        if "spark" in t and int(k) not in doomed
    }
    got = {r["doc_key"] for r in s.search_stream(Term("text", "spark"), []).collect()}
    assert got == live_spark


def test_second_delete_survives_static_overwrite_mode(
    spark, sf_dir, tmp_path_factory
):
    """Regression: delete #2 in a fresh session (static
    partitionOverwriteMode) must not truncate delete #1's tombstones."""
    d = str(tmp_path_factory.mktemp("delstatic"))
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    corpus = web_corpus(spark, sf_dir)
    build_index(spark, corpus, d, cfg, job_id="b")
    s = IndexSearcher(spark, d)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        delete_by_query(s, Term("text", "vector"))
        delete_by_query(s, Term("text", "tutorial"))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    import os

    ops_dirs = {
        n for n in os.listdir(f"{d}/deletes") if n.startswith("opstamp=")
    }
    assert ops_dirs == {"opstamp=1", "opstamp=2"}

    for o in plan_delete_rewrites(d):
        execute_merge(spark, d, o)
    s.refresh()
    assert s.count(Term("text", "vector")) == 0
    assert s.count(Term("text", "tutorial")) == 0


def test_overlapping_deletes_count_each_doc_once(spark, sf_dir, tmp_path_factory):
    """Regression: two delete queries matching the SAME docs must not
    double-subtract their stats (corrections are per-doc exact)."""
    d = str(tmp_path_factory.mktemp("deloverlap"))
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    corpus = web_corpus(spark, sf_dir)
    build_index(spark, corpus, d, cfg, job_id="b")
    s = IndexSearcher(spark, d)

    delete_by_query(s, Term("text", "vector"))
    # overlapping: every 'vector' doc may also contain 'spark'
    delete_by_query(s, Term("text", "spark"))

    # second op's recorded tombstones exclude docs already doomed by op 1
    recs = pending_deletes(d)
    pdf = web_corpus(spark, sf_dir).toPandas()
    toks = {int(k): t for k, t in zip(pdf["doc_id"], pdf["text"].str.split())}
    doomed1 = {k for k, t in toks.items() if "vector" in t}
    doomed2 = {k for k, t in toks.items() if "spark" in t} - doomed1
    assert sum(recs[1]["segments"].values()) == len(doomed1)
    assert sum(recs[2]["segments"].values()) == len(doomed2)

    for o in plan_delete_rewrites(d):
        execute_merge(spark, d, o)
    s.refresh()
    live = set(toks) - doomed1 - doomed2
    assert s.count("*") == len(live)
    segs = mf.live_segments(d)
    live_tokens = sum(len(toks[k]) for k in live)
    assert sum(g.field_stats["text"]["total_tokens"] for g in segs) == live_tokens
    assert sum(g.field_stats["text"]["doc_count"] for g in segs) == len(live)


def test_orphaned_tombstone_partition_is_inert(spark, sf_dir, tmp_path_factory):
    """A crash between the tombstone write and the manifest commit
    leaves an orphaned `deletes/opstamp=N` partition. The next delete
    must NOT reuse that opstamp (it would overwrite the orphan while
    anti-joining against it, erasing the retried delete), and the
    orphan's tombstones must not be applied or anti-joined (their stat
    corrections never happened)."""
    import os

    from quickwit_spark.index.deletes import (
        _next_opstamp,
        _tombstone_paths,
    )

    d = str(tmp_path_factory.mktemp("orphan") / "idx")
    df = web_corpus(spark, sf_dir)
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=2
    )
    build_index(spark, df, d, cfg)
    s = IndexSearcher(spark, d)
    n = s.count(Term("text", "vector"))
    assert n > 0

    # simulate the crashed op: partition on disk, no manifest record
    orphan = os.path.join(d, "deletes", "opstamp=1")
    spark.createDataFrame(
        [("zz-nonexistent", 0)], "segment_id string, doc_id long"
    ).write.mode("overwrite").parquet(orphan)

    assert _next_opstamp(d) == 2  # parked, not reused
    assert _tombstone_paths(d) == []  # and never read

    op = delete_by_query(s, Term("text", "vector"))
    assert op == 2
    rec = pending_deletes(d)[op]
    # the retried delete doomed ALL matching docs — the orphan did not
    # suppress any of them through the anti-join
    assert sum(rec["segments"].values()) == n
    for o in plan_delete_rewrites(d):
        execute_merge(spark, d, o)
    s.refresh()
    assert s.count(Term("text", "vector")) == 0
