"""Retention + GC: manifest-driven expiry, file collection, search safety."""

import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.index.merge import MergePolicy, run_merges
from quickwit_spark.index.retention import apply_retention, garbage_collect
from quickwit_spark.query.ast import Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.corpus import web_corpus


def test_retention_and_gc(spark, sf_dir, tmp_path):
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=1,
        time_column="warc_ts",
    )
    corpus = web_corpus(spark, sf_dir)
    # two time slices: doc_id < 250 is strictly older (warc_ts = doc_id*97s)
    build_index(spark, corpus.filter(F.col("doc_id") < 250), d, cfg, job_id="old")
    build_index(spark, corpus.filter(F.col("doc_id") >= 250), d, cfg, job_id="new")
    s = IndexSearcher(spark, d)
    assert s.count("*") == 500

    old_max = mf.reconcile(d)["old-p00000"].time_range[1]
    retired = apply_retention(d, cutoff_micros=old_max + 1)
    assert retired == ["old-p00000"]
    s.refresh()
    assert s.count("*") == 250
    assert {r["doc_key"] for r in s.search_stream(Term("text", "spark"), []).collect()} <= set(range(250, 500))

    # files still on disk until GC
    removed = garbage_collect(d, dry_run=True)
    assert any("old" in p for p in removed)
    removed = garbage_collect(d)
    for p in removed:
        assert not os.path.exists(os.path.join(d, p))
    s.refresh()
    assert s.count("*") == 250  # search unaffected after GC


def test_gc_after_merge_collects_inputs(spark, sf_dir, tmp_path):
    d = str(tmp_path / "idx")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    corpus = web_corpus(spark, sf_dir)
    for i in range(4):
        build_index(spark, corpus.filter(F.col("doc_id") % 4 == i), d, cfg, job_id=f"s{i}")
    run_merges(spark, d, MergePolicy(merge_factor=4, max_merge_factor=4))
    removed = garbage_collect(d)
    # all four input build batches are dead → collected from inv and docs
    assert len([p for p in removed if p.startswith("inv/")]) == 4
    assert len([p for p in removed if p.startswith("docs/")]) == 4
    s = IndexSearcher(spark, d)
    assert s.count("*") == 500


def test_gc_collects_tombstones_and_sidecars(spark, sf_dir, tmp_path):
    """After a merge applies all deletes, GC removes the opstamp
    tombstone partitions (no published segment targeted anymore) and
    the merge's compact sidecar."""
    import os

    from pyspark.sql import functions as F

    from quickwit_spark.index import manifest as mf
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.index.deletes import COMPACT_DIR, DELETES_DIR, delete_by_query
    from quickwit_spark.index.merge import MergePolicy, run_merges
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    d = str(tmp_path / "idx")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=1)
    corpus = web_corpus(spark, sf_dir)
    for i in range(2):
        build_index(
            spark, corpus.filter((F.col("doc_id") % 2) == i), d, cfg, job_id=f"g{i}"
        )
    s = IndexSearcher(spark, d)
    delete_by_query(s, Term("text", "vector"))
    assert os.path.isdir(os.path.join(d, DELETES_DIR))
    run_merges(spark, d, MergePolicy(merge_factor=2, max_merge_factor=2))

    removed = garbage_collect(d)
    names = "\n".join(removed)
    assert f"{COMPACT_DIR}/" in names or not os.path.isdir(
        os.path.join(d, COMPACT_DIR)
    )
    assert f"{DELETES_DIR}/opstamp=" in names
    # nothing live was touched
    s.refresh()
    assert s.count(Term("text", "vector")) == 0
    assert s.count("*") > 0
