"""Randomized counts over an index with applied delete-by-query.

Reference delete-task semantics (`quickwit-janitor`): a delete query
marks docs; they stay searchable until a rewrite applies the
tombstones; post-rewrite statistics reflect the survivors. The fixed
gates pin one delete; here two seeded delete queries (a raw-field term
and a text term) are applied and rewritten, then the count-differential
generator from test_count_differential runs random ASTs against DuckDB
with the survivor predicate conjoined — planning, pruning and the
metadata count fast paths must all see only surviving docs.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from test_count_differential import DOCS, _gen_ast, _pred, _tok_contains

DEL_LANG = "de"
DEL_TERM_RANK = 5  # vocab index of the deleted text term (df-ordered)


@pytest.fixture(scope="module")
def vocab():
    rows = duckdb.sql(
        f"""SELECT term, COUNT(DISTINCT doc_id) AS df FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM read_parquet('{DOCS}')
            ) WHERE term <> '' GROUP BY term ORDER BY df DESC"""
    ).fetchall()
    return [t for t, _ in rows]


@pytest.fixture(scope="module")
def deleted_searcher(spark, sf_dir, tmp_path_factory, vocab):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.index.deletes import delete_by_query, plan_delete_rewrites
    from quickwit_spark.index.merge import execute_merge
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search.engine import IndexSearcher

    idx = str(tmp_path_factory.mktemp("del_diff_idx"))
    cfg = IndexConfig(
        fields=[FieldConfig("text"), FieldConfig("lang", tokenizer="raw")],
        doc_key="doc_id",
        num_partitions=4,
        stored_columns=("lang", "source", "n_chars"),
    )
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build_index(spark, df, idx, cfg)
    s = IndexSearcher(spark, idx)
    delete_by_query(s, Term("lang", DEL_LANG))
    delete_by_query(s, Term("text", vocab[DEL_TERM_RANK]))
    for op in plan_delete_rewrites(idx):
        execute_merge(spark, idx, op)
    return IndexSearcher(spark, idx)


def test_counts_after_deletes_match_duckdb(deleted_searcher, vocab):
    from quickwit_spark.query.ast import MatchAll, Term

    survivor = (
        f"NOT (lang = '{DEL_LANG}') AND NOT ({_tok_contains(vocab[DEL_TERM_RANK])})"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')"
        f" WHERE {survivor}"
    )
    # totals and the deleted sets themselves
    total = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert deleted_searcher.count(MatchAll()) == total
    assert deleted_searcher.count(Term("lang", DEL_LANG)) == 0
    assert deleted_searcher.count(Term("text", vocab[DEL_TERM_RANK])) == 0

    rng = random.Random(4242)
    mismatches = []
    for i in range(20):
        ast = _gen_ast(rng, vocab)
        want = con.execute(
            f"SELECT COUNT(*) FROM documents WHERE {_pred(ast)}"
        ).fetchone()[0]
        got = deleted_searcher.count(ast)
        if got != want:
            mismatches.append((i, ast, got, want))
    assert not mismatches, mismatches[:3]
