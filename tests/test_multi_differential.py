"""Randomized multi-index federation differential.

Two member indexes (doc_id parity halves of the corpus) behind
MultiIndexSearcher: random query trees must count like the whole
corpus in DuckDB, and oracle-mode federated top-k must equal the
python merge of each half's generated BM25 SQL — per-index statistics
(each half's own n/df/avgdl), no renormalization, ties broken on
(score desc, _index asc, doc_key asc), exactly the reference's root
merge (`quickwit-search/src/root.rs:162-168,561`)."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from test_count_differential import DOCS, _gen_ast, _pred, vocab  # noqa: F401


@pytest.fixture(scope="module")
def multi(spark, sf_dir, tmp_path_factory):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.multi import MultiIndexSearcher

    root = str(tmp_path_factory.mktemp("multi_diff"))
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for name, parity in (("even", 0), ("odd", 1)):
        cfg = IndexConfig(
            fields=[
                FieldConfig("text"),
                FieldConfig("lang", tokenizer="raw"),
            ],
            doc_key="doc_id",
            num_partitions=2,
            stored_columns=("lang", "source", "n_chars"),
        )
        build_index(
            spark, df.filter(df.doc_id % 2 == parity),
            os.path.join(root, name), cfg,
        )
    return MultiIndexSearcher.resolve(spark, root, "*")


def test_multi_counts_match_duckdb(multi, vocab):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    rng = random.Random(8080)
    for _ in range(10):
        ast = _gen_ast(rng, vocab)
        want = con.execute(
            f"SELECT COUNT(*) FROM documents WHERE {_pred(ast)}"
        ).fetchone()[0]
        assert multi.count(ast) == want, ast


def test_multi_oracle_topk_matches_member_sql_merge(multi, vocab):
    import __spark_entry__ as entry

    from quickwit_spark.query.ast import Bool, Boost, Term

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    rng = random.Random(9090)
    for _ in range(6):
        pool = rng.sample(vocab[:30], 4)
        musts, shoulds = pool[:1], [(t, rng.choice([1.0, 2.0])) for t in pool[1:3]]
        ast = Bool(
            must=[Term("text", t) for t in musts],
            should=[
                Boost(Term("text", t), b) if b != 1.0 else Term("text", t)
                for t, b in shoulds
            ],
        )
        merged = []
        for name, parity in (("even", 0), ("odd", 1)):
            sql = entry._bm25_sql(
                [(t, 1.0) for t in musts] + shoulds,
                must=musts,
                corpus_sql=f"(SELECT * FROM documents WHERE doc_id % 2 = {parity})",
            )
            merged += [
                (r[0], r[1], name) for r in con.execute(sql).fetchall()
            ]
        merged.sort(key=lambda r: (-r[1], r[2], r[0]))
        want = [
            (dk, sc, name, i + 1) for i, (dk, sc, name) in enumerate(merged[:10])
        ]
        got = [
            (r["doc_key"], round(r["score"], 6), r["_index"], r["rank"])
            for r in multi.search(ast, k=10, mode="oracle").collect()
        ]
        assert got == want, (ast, got[:3], want[:3])


def test_multi_unmapped_agg_field_empty_buckets(multi):
    """Engine parity on the federated path: aggregating a field no
    member maps answers empty buckets (all-null column), never an
    error — and a malformed body is a clean parse error."""
    from quickwit_spark.search.es_aggs import shape_es_agg

    r = multi.es_search({"size": 0, "aggs": {"x": {"terms": {"field": "ghost"}}}})
    shaped = shape_es_agg({"terms": {"field": "ghost"}}, r["aggregations"]["x"])
    assert shaped["buckets"] == []
    with pytest.raises(ValueError):
        multi.es_search({"size": 0, "aggs": {"x": "bad"}})
