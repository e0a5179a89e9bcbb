"""ES-compatible DSL → QueryAst conversion (reference elastic_query_dsl)."""

import pytest

from quickwit_spark.query.ast import (
    Bool,
    Boost,
    Exists,
    FullText,
    MatchAll,
    Range,
    Regex,
    Term,
    TermSet,
    Wildcard,
)
from quickwit_spark.query.es_dsl import from_es_body, from_es_query


def test_leaves():
    assert from_es_query({"match_all": {}}) == MatchAll()
    assert from_es_query({"term": {"lang": {"value": "en"}}}) == Term("lang", "en")
    assert from_es_query({"term": {"lang": "en"}}) == Term("lang", "en")
    assert from_es_query({"terms": {"lang": ["en", "de"]}}) == TermSet(
        "lang", ("en", "de")
    )
    assert from_es_query({"exists": {"field": "url"}}) == Exists("url")
    assert from_es_query({"range": {"n": {"gte": 1, "lt": 5}}}) == Range(
        "n", gte=1, lt=5
    )
    assert from_es_query({"wildcard": {"text": {"value": "qu*"}}}) == Wildcard(
        "text", "qu*"
    )
    assert from_es_query({"regexp": {"text": {"value": "qu.*"}}}) == Regex(
        "text", "qu.*"
    )


def test_match_variants():
    assert from_es_query({"match": {"text": "spark join"}}) == FullText(
        "text", "spark join", "or"
    )
    assert from_es_query(
        {"match": {"text": {"query": "spark join", "operator": "AND"}}}
    ) == FullText("text", "spark join", "and")
    assert from_es_query({"match_phrase": {"text": "spark join"}}) == FullText(
        "text", "spark join", "and"
    )
    mm = from_es_query({"multi_match": {"query": "spark", "fields": ["a", "b"]}})
    assert mm == Bool(should=[FullText("a", "spark", "or"), FullText("b", "spark", "or")])


def test_bool_boost_query_string():
    ast = from_es_query(
        {
            "bool": {
                "must": [{"term": {"text": "spark"}}],
                "must_not": {"term": {"text": "slow"}},
                "should": [{"term": {"text": {"value": "join", "boost": 2.0}}}],
                "filter": [{"range": {"n": {"lt": 3}}}],
                "minimum_should_match": 1,
            }
        }
    )
    assert ast == Bool(
        must=[Term("text", "spark")],
        must_not=[Term("text", "slow")],
        should=[Boost(Term("text", "join"), 2.0)],
        filter=[Range("n", lt=3)],
        minimum_should_match=1,
    )
    qs = from_es_body(
        {"query": {"query_string": {"query": "spark AND join", "fields": ["text"]}}}
    )
    assert qs == Bool(
        must=[
            FullText("text", "spark", "and", phrase_fallback=True),
            FullText("text", "join", "and", phrase_fallback=True),
        ]
    )


def test_unsupported_raises():
    with pytest.raises(NotImplementedError):
        from_es_query({"fuzzy": {"text": {"value": "spark"}}})


def test_es_search_end_to_end(spark, sf_dir, tmp_path):
    """An ES body drives the same search as the native AST."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=2)
    build_index(spark, web_corpus(spark, sf_dir), idx, cfg)
    s = IndexSearcher(spark, idx)
    body = {"query": {"match": {"text": {"query": "spark join", "operator": "or"}}}}
    es_hits = s.search(from_es_body(body), k=5).collect()
    native = s.search(FullText("text", "spark join", "or"), k=5).collect()
    assert [r.asDict() for r in es_hits] == [r.asDict() for r in native]


def test_match_bool_prefix():
    from quickwit_spark.query.ast import Bool, Term, Wildcard
    from quickwit_spark.query.es_dsl import from_es_query

    ast = from_es_query({"match_bool_prefix": {"text": {"query": "file not ch"}}})
    assert ast == Bool(
        should=[Term("text", "file"), Term("text", "not"), Wildcard("text", "ch*")]
    )
    ast_and = from_es_query(
        {"match_bool_prefix": {"text": {"query": "file not ch", "operator": "AND"}}}
    )
    assert ast_and == Bool(
        must=[Term("text", "file"), Term("text", "not"), Wildcard("text", "ch*")]
    )
    single = from_es_query({"match_bool_prefix": {"text": "qu"}})
    assert single == Wildcard("text", "qu*")


def test_es_body_sort_and_search_after(spark, sf_dir, tmp_path):
    """ES body `sort` routes to the fast-field collector; `search_after`
    cursors page 2 (reference sort-by mini-DSL + search_after)."""
    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = str(tmp_path / "idx_sort")
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=2,
        stored_columns=("n_chars",),
    )
    docs = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    build_index(spark, docs, idx, cfg)
    searcher = IndexSearcher(spark, idx)
    body = {
        "query": {"match": {"text": {"query": "spark"}}},
        "size": 5,
        "sort": [{"n_chars": {"order": "desc"}}],
    }
    p1 = searcher.es_search(body)["hits"].collect()
    assert len(p1) == 5
    vals = [r["sort_value"] for r in p1]
    assert vals == sorted(vals, reverse=True)
    last = p1[-1]
    body2 = dict(body, search_after=[last["sort_value"], last["doc_key"]])
    p2 = searcher.es_search(body2)["hits"].collect()
    assert len(p2) == 5
    # desc primary ⇒ doc_key tie-break desc: strictly after the cursor
    assert all(
        (r["sort_value"], r["doc_key"]) < (last["sort_value"], last["doc_key"])
        for r in p2
    )
    assert {r["doc_key"] for r in p1}.isdisjoint({r["doc_key"] for r in p2})
    # _score sort stays on the BM25 path
    body3 = {
        "query": {"match": {"text": {"query": "spark"}}},
        "size": 3,
        "sort": ["_score"],
    }
    hits = searcher.es_search(body3)["hits"].collect()
    assert [r["rank"] for r in hits] == [1, 2, 3]
    assert "score" in hits[0].asDict()


def test_es_wire_field_caps_count_cat(spark, sf_dir, tmp_path):
    """_field_caps / _count / _cat indices wire shapes (reference
    `model/field_capability.rs:60-140`, `cat_indices.rs:96-224`)."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus

    idx = str(tmp_path / "wire_idx")
    cfg = IndexConfig(
        fields=[FieldConfig("text"), FieldConfig("lang", tokenizer="raw")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("lang",),
        time_column="warc_ts",
    )
    build_index(spark, web_corpus(spark, sf_dir), idx, cfg)
    s = IndexSearcher(spark, idx)

    caps = s.es_field_caps()
    assert caps["indices"] == ["wire_idx"]
    assert caps["fields"]["text"]["text"]["searchable"] is True
    # raw tokenizer ⇒ ES keyword type
    assert "keyword" in caps["fields"]["lang"]
    # fast (docmap) timestamp column ⇒ date_nanos, aggregatable
    ts = caps["fields"]["warc_ts"]["date_nanos"]
    assert ts["aggregatable"] is True and ts["searchable"] is False
    # wildcard field filter
    only = s.es_field_caps(fields=["lang*"])
    assert set(only["fields"]) == {"lang"}

    # _count: body query and match-all, shard header from live segments
    total = s.es_count()
    assert total["count"] == 500 and total["_shards"]["failed"] == 0
    n_spark = s.es_count({"query": {"match": {"text": {"query": "spark"}}}})
    assert 0 < n_spark["count"] < total["count"]
    assert n_spark["count"] == s.count(Term("text", "spark"))

    # _cat/indices: ES-shaped row with human sizes
    (row,) = s.es_cat_indices()
    assert row["index"] == "wire_idx" and row["health"] == "green"
    assert row["docs.count"] == "500"
    assert row["store.size"].endswith(("b", "kb", "mb"))
    (filtered,) = s.es_cat_indices(fields=["index", "docs.count"])
    assert set(filtered) == {"index", "docs.count"}


def test_es_wire_stats_health_resolve_info_delete(spark, sf_dir, tmp_path):
    """_stats / _cluster/health / _resolve/index / GET-root / DELETE
    wire shapes + track_total_hits count accuracy (reference
    `elasticsearch_api/mod.rs:66-99` handler set,
    `rest_handler.rs:364-367` TrackTotalHits → CountHits mapping)."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher, es_cluster_info
    from quickwit_spark.sources.corpus import web_corpus

    idx = str(tmp_path / "wire2_idx")
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=12,  # > one count_up_to batch (8)
        time_column="warc_ts",
    )
    build_index(spark, web_corpus(spark, sf_dir), idx, cfg)
    s = IndexSearcher(spark, idx)

    # _stats
    st = s.es_stats()
    assert st["_all"]["primaries"]["docs"]["count"] == 500
    assert st["indices"]["wire2_idx"]["total"]["store"]["size_in_bytes"] > 0
    assert st["_shards"]["failed"] == 0

    # _cluster/health
    h = s.es_cluster_health()
    assert h["status"] == "green"
    assert h["active_shards"] == len(s.segments) > 8

    # _resolve/index with ES expression patterns
    assert s.es_resolve_index("wire2*")["indices"] == [
        {"name": "wire2_idx", "attributes": ["open"]}
    ]
    assert s.es_resolve_index("zzz*,nope")["indices"] == []

    # GET / root banner
    info = es_cluster_info()
    assert info["version"]["distribution"] == "quickwit-spark"
    assert info["cluster_name"] == "quickwit-spark"

    # count_up_to: exact when exhausted, early-stopped lower bound else
    exact = s.count(Term("text", "spark"))
    assert exact > 8  # hot enough to stop after the first batch
    v_all, ex_all = s.count_up_to(Term("text", "spark"), 10**9)
    assert (v_all, ex_all) == (exact, True)
    v_lo, ex_lo = s.count_up_to(Term("text", "spark"), 1)
    assert v_lo >= 1 and ex_lo is False and v_lo <= exact

    # track_total_hits through the wire envelope
    body = {"query": {"match": {"text": {"query": "spark"}}}, "size": 3}
    eq = s.es_search_response({**body, "track_total_hits": True})
    assert eq["hits"]["total"] == {"value": exact, "relation": "eq"}
    off = s.es_search_response({**body, "track_total_hits": False})
    assert off["hits"]["total"] == {"value": 3, "relation": "gte"}
    # int > size ⇒ CountAll (exact); int ≤ size ⇒ underestimate
    big = s.es_search_response({**body, "track_total_hits": 10**6})
    assert big["hits"]["total"] == {"value": exact, "relation": "eq"}
    lo = s.es_search_response({**body, "track_total_hits": 1})
    tot = lo["hits"]["total"]
    assert tot["value"] >= 3 and tot["relation"] in ("eq", "gte")
    if tot["relation"] == "eq":
        assert tot["value"] == exact

    # DELETE /<index>: files gone, searcher tombstoned, non-index refused
    import os

    import pytest as _pytest

    from quickwit_spark.index.manifest import delete_index

    with _pytest.raises(FileNotFoundError):
        delete_index(str(tmp_path / "not_an_index"))
    assert s.es_delete_index() == {"acknowledged": True}
    assert not os.path.exists(idx) and s.segments == []
