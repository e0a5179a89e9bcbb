"""Merge invariance: counts and oracle-mode top-k across real merges.

The kernel fuzz asserts oracle-mode scores are partition-invariant on
in-memory segments; this test asserts the same through the REAL merge
executor — postings re-encode, docid rebase by doc_key permutation,
positions permutation, norms chunking, manifest swap — by snapshotting
seeded queries before `run_merges` and replaying them after. Counts
(parity) and (doc_key, score, rank) rows (oracle, round-9) must be
identical; the merge must actually reduce the segment count for the
test to mean anything.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from quickwit_spark.query.ast import Bool, FullText, Phrase, Term, Wildcard

import os

_SF = os.environ.get("QWS_TEST_SF_DIR", "/root/testdata/sf0.001")
DOCS = f"{_SF}/documents.parquet"


@pytest.fixture(scope="module")
def index_dir(spark, sf_dir, tmp_path_factory):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index

    idx = str(tmp_path_factory.mktemp("merge_diff_idx"))
    cfg = IndexConfig(
        fields=[
            FieldConfig("text", record="position"),
            FieldConfig("lang", tokenizer="raw"),
        ],
        doc_key="doc_id",
        num_partitions=8,
        stored_columns=("lang", "n_chars"),
    )
    # two ingest jobs (doc_id parity halves) → 2 segments per routing
    # partition, the shape the merge policy actually groups
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_index(spark, df.filter(df.doc_id % 2 == 0), idx, cfg, job_id="even")
    build_index(spark, df.filter(df.doc_id % 2 == 1), idx, cfg, job_id="odd")
    return idx


def _queries():
    rng = random.Random(777)
    vocab = [
        t
        for t, _ in duckdb.sql(
            f"""SELECT term, COUNT(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS term
                  FROM read_parquet('{DOCS}')
                ) WHERE term <> '' GROUP BY term ORDER BY 2 DESC LIMIT 40"""
        ).fetchall()
    ]
    bigram = duckdb.sql(
        f"""SELECT a || ' ' || b AS bg, COUNT(*) AS c FROM (
              SELECT t[i] AS a, t[i+1] AS b FROM (
                SELECT string_split(text, ' ') AS t,
                       unnest(range(1, len(string_split(text, ' ')))) AS i
                FROM read_parquet('{DOCS}')
              ) WHERE t[i] <> '' AND t[i+1] <> ''
            ) GROUP BY bg ORDER BY c DESC LIMIT 1"""
    ).fetchone()[0]
    qs = [
        Term("text", vocab[0]),
        Term("text", vocab[-1]),
        FullText("text", f"{vocab[1]} {vocab[7]}", "or"),
        FullText("text", f"{vocab[2]} {vocab[3]}", "and"),
        Phrase("text", bigram),
        Phrase("text", bigram, slop=1),
        Wildcard("text", vocab[4][:2] + "*"),
        Bool(
            must=[Term("text", vocab[5])],
            must_not=[Term("lang", "de")],
            should=[Term("text", vocab[6]), Term("text", vocab[8])],
        ),
    ]
    for _ in range(4):
        qs.append(
            Bool(should=[Term("text", rng.choice(vocab)) for _ in range(3)],
                 minimum_should_match=rng.choice([None, 2]))
        )
    return qs


def _snapshot(searcher, queries):
    counts = [searcher.count(q) for q in queries]
    topks = [
        [
            (r["doc_key"], r["score"], r["rank"])
            for r in searcher.search(q, k=10, mode="oracle").collect()
        ]
        for q in queries
    ]
    return counts, topks


def test_merge_preserves_counts_and_oracle_topk(spark, index_dir):
    from quickwit_spark.index import manifest as mf
    from quickwit_spark.index.merge import MergePolicy, run_merges
    from quickwit_spark.search.engine import IndexSearcher

    queries = _queries()
    before = _snapshot(IndexSearcher(spark, index_dir), queries)
    n_before = len(mf.live_segments(index_dir))

    # merge_factor 2 folds each partition's two ingest segments into one
    run_merges(spark, index_dir, MergePolicy(merge_factor=2), max_concurrent=2)
    n_after = len(mf.live_segments(index_dir))
    assert n_after < n_before, (n_before, n_after)

    after = _snapshot(IndexSearcher(spark, index_dir), queries)
    for i, q in enumerate(queries):
        assert before[0][i] == after[0][i], ("count", q)
        assert before[1][i] == after[1][i], ("topk", q)
