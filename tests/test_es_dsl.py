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
    # false maps to the same Underestimate path as absent (reference
    # Track(false) => CountHits::Underestimate, rest_handler.rs:364-367)
    off = s.es_search_response({**body, "track_total_hits": False})
    absent = s.es_search_response(body)
    assert off["hits"]["total"] == absent["hits"]["total"]
    assert off["hits"]["total"]["value"] >= 3
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


def test_query_string_default_operator_is_or():
    """ES query_string without default_operator combines clauses with
    OR (reference BooleanOperand #[default] Or, lib.rs:48-53); the
    native query-string API keeps AND juxtaposition."""
    from quickwit_spark.query.ast import Bool, FullText
    from quickwit_spark.query.es_dsl import from_es_body

    qs = from_es_body(
        {"query": {"query_string": {"query": "spark join", "fields": ["text"]}}}
    )
    assert qs == Bool(
        should=[
            FullText("text", "spark", "and", phrase_fallback=True),
            FullText("text", "join", "and", phrase_fallback=True),
        ]
    )
    qs2 = from_es_body(
        {"query": {"query_string": {"query": "spark join", "fields": ["text"],
                                    "default_operator": "AND"}}}
    )
    assert qs2 == Bool(
        must=[
            FullText("text", "spark", "and", phrase_fallback=True),
            FullText("text", "join", "and", phrase_fallback=True),
        ]
    )


def test_es_from_pagination(spark, sf_dir, tmp_path):
    """Body/param `from` paginates: page [from, from+size) equals the
    corresponding slice of one big page (reference start_offset,
    rest_handler.rs:359), on both the BM25 and field-sort paths."""
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.corpus import web_corpus
    from pyspark.sql import functions as F

    idx = str(tmp_path / "idx_from")
    cfg = IndexConfig(
        fields=[FieldConfig("text")], doc_key="doc_id", num_partitions=2,
        stored_columns=("n_chars",),
    )
    docs = web_corpus(spark, sf_dir).withColumn("n_chars", F.length("text"))
    build_index(spark, docs, idx, cfg)
    s = IndexSearcher(spark, idx)
    base = {"query": {"match": {"text": {"query": "spark"}}}}
    big = [r["doc_key"] for r in s.es_search({**base, "size": 9})["hits"].collect()]
    p2 = [
        r["doc_key"]
        for r in s.es_search({**base, "size": 3, "from": 3})["hits"].collect()
    ]
    assert p2 == big[3:6]
    # field-sorted path
    base_s = {**base, "sort": [{"n_chars": {"order": "desc"}}]}
    big_s = [r["doc_key"] for r in s.es_search({**base_s, "size": 9})["hits"].collect()]
    p2_s = [
        r["doc_key"]
        for r in s.es_search({**base_s, "size": 3, "from": 3})["hits"].collect()
    ]
    assert p2_s == big_s[3:6]


def test_es_wire_from_pagination_federated(spark, tmp_path):
    """`from` on a multi-index pattern applies AFTER the global merge —
    pages tile the federated ranking without overlap."""
    from quickwit_spark.api import QuickwitSpark

    qw = QuickwitSpark(spark, str(tmp_path / "fed"))
    for n in ("logs-a", "logs-b"):
        qw.create_index(
            {"index_id": n, "doc_mapping": {"mode": "dynamic"}}
        )
    qw.ingest("logs-a", [{"msg": f"spark event {i}", "n": i} for i in range(6)])
    qw.ingest("logs-b", [{"msg": f"spark other {i}", "n": 10 + i} for i in range(6)])
    es = qw.es()
    body = {"query": {"match": {"msg": {"query": "spark"}}},
            "sort": [{"n": {"order": "asc"}}]}
    big = es.request("GET", "logs-*/_search", body={**body, "size": 12})
    keys = [(h["_index"], h["_id"]) for h in big["hits"]["hits"]]
    assert len(keys) == 12
    paged = []
    for frm in (0, 4, 8):
        page = es.request(
            "GET", "logs-*/_search", body={**body, "size": 4, "from": frm}
        )
        paged += [(h["_index"], h["_id"]) for h in page["hits"]["hits"]]
    assert paged == keys
    # URL param form wins over the body value
    via_param = es.request(
        "GET", "logs-*/_search?from=4&size=4", body={**body, "from": 0}
    )
    assert [(h["_index"], h["_id"]) for h in via_param["hits"]["hits"]] == keys[4:8]


def test_es_wire_q_param_decoding_and_default_operator(spark, tmp_path):
    """URL query strings percent-decode (`q=event%20other` is two
    words) and the `default_operator` param flips the `q` combination
    (reference: Or when absent, rest_handler.rs:310)."""
    from quickwit_spark.api import QuickwitSpark

    qw = QuickwitSpark(spark, str(tmp_path / "qdec"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest(
        "logs",
        [{"msg": f"spark event {i}"} for i in range(3)]
        + [{"msg": "spark other x"}],
    )
    es = qw.es()
    r_or = es.request("GET", "logs/_search?q=event%20other&size=0")
    assert r_or["hits"]["total"]["value"] == 4
    r_and = es.request(
        "GET", "logs/_search?q=event%20other&default_operator=AND&size=0"
    )
    assert r_and["hits"]["total"]["value"] == 0


def test_es_wire_size_from_validation(spark, tmp_path):
    """size/from are u64 in the reference request structs — negative or
    non-numeric values return a 400 envelope, never a raw ValueError."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "val"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("logs", [{"msg": "spark"}])
    es = qw.es()
    for ep, body in [
        ("logs/_search?size=-1", None),
        ("logs/_search?from=-2", None),
        ("logs/_search?size=abc", None),
        ("logs/_search", {"from": -3}),
        ("logs/_search", {"size": "x"}),
    ]:
        with pytest.raises(EsApiError) as ei:
            es.request("GET", ep, body=body)
        assert ei.value.status == 400


def test_es_wire_method_guards(spark, tmp_path):
    """Route × method matrix matches the reference's warp filters
    (`elasticsearch_api/filter.rs`): wrong methods are 405, and DELETE
    on _search/scroll must not silently serve a page."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "methods"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("logs", [{"msg": "spark"}])
    es = qw.es()
    cases = [
        ("DELETE", "_search/scroll"),
        ("PUT", "logs/_search"),
        ("DELETE", "logs/_count"),
        ("POST", "logs/_stats"),
        ("GET", "_msearch"),
        ("POST", "_cat/indices"),
        ("POST", "_resolve/index/logs"),
        ("GET", "_bulk"),
    ]
    for method, ep in cases:
        with pytest.raises(EsApiError) as ei:
            es.request(method, ep, ndjson=[])
        assert ei.value.status == 405, (method, ep)
    # allowed combos still work
    assert es.request("POST", "logs/_search", body={"size": 0})["hits"]
    assert es.request("POST", "logs/_count")["count"] == 1

def test_es_wire_body_deny_unknown_fields(spark, tmp_path):
    """The reference `SearchBody` is serde deny_unknown_fields
    (`model/search_body.rs:64-97`): unknown body keys — including
    `aggregations`, which is NOT an alias of `aggs` there — are 400s,
    while the five OpenSearch-Dashboards compat keys are accepted and
    ignored."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "deny"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("logs", [{"msg": "spark"}])
    es = qw.es()
    for bad in [
        {"siz": 1},
        {"aggregations": {"a": {"terms": {"field": "msg"}}}},
        {"query": {"match_all": {}}, "min_score": 0.5},
    ]:
        with pytest.raises(EsApiError) as ei:
            es.request("POST", "logs/_search", body=bad)
        assert ei.value.status == 400
        assert "unknown field" in str(ei.value)
    # accepted-but-ignored compat keys (SearchBody IgnoredAny)
    ok = es.request(
        "POST",
        "logs/_search",
        body={
            "size": 1,
            "stored_fields": ["msg"],
            "docvalue_fields": ["msg"],
            "script_fields": {},
            "highlight": {},
            "version": True,
        },
    )
    assert ok["hits"]["total"]["value"] == 1
    # _msearch bodies go through the same validation
    r = es.request(
        "POST",
        "_msearch",
        ndjson=[{"index": "logs"}, {"size": 0, "bogus_key": 1}],
    )
    assert r["responses"][0]["status"] == 400


def test_es_sort_map_form_and_score_default(spark, tmp_path):
    """`sort` accepts the single-object multi-field form with key order
    = sort order (`FieldSortVecVisitor::visit_map`), `_score` defaults
    DESC while field keys default ASC
    (`default_elasticsearch_sort_order`), sort params are
    deny_unknown_fields, and the only date format is
    `epoch_nanos_int`."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "sortmap"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest(
        "logs",
        [
            {"msg": "spark", "a": 1, "b": 9},
            {"msg": "spark", "a": 1, "b": 3},
            {"msg": "spark", "a": 0, "b": 5},
        ],
    )
    es = qw.es()
    # object form: {a: desc, b: {}} — b's order defaults asc
    r = es.request(
        "POST",
        "logs/_search",
        body={"sort": {"a": {"order": "desc"}, "b": {}}, "size": 3},
    )
    assert [h["sort"] for h in r["hits"]["hits"]] == [
        [1, 3],
        [1, 9],
        [0, 5],
    ]
    # bare {"_score": {}} defaults desc == the plain BM25 path
    r2 = es.request(
        "POST",
        "logs/_search",
        body={"query": {"match": {"msg": "spark"}}, "sort": [{"_score": {}}]},
    )
    assert r2["hits"]["total"]["value"] == 3
    scores = [h["_score"] for h in r2["hits"]["hits"]]
    assert scores == sorted(scores, reverse=True)
    # unknown sort param / bad order / bad format are 400s
    for bad_sort in [
        [{"a": {"order": "asc", "missing": "_last"}}],
        [{"a": "ascending"}],
        [{"a": {"format": "epoch_millis"}}],
        [{"a": {"order": "asc"}, "b": "asc"}],  # two-field map inside array
    ]:
        with pytest.raises(EsApiError) as ei:
            es.request("POST", "logs/_search", body={"sort": bad_sort})
        assert ei.value.status == 400, bad_sort

def test_es_wire_track_total_hits_url_param(spark, tmp_path):
    """URL `track_total_hits` wins over the body value (reference
    `search_params.track_total_hits.or(search_body.track_total_hits)`,
    rest_handler.rs:360-362) and accepts bool/int string forms."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "tth"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("logs", [{"msg": f"spark {i}"} for i in range(25)])
    es = qw.es()
    r = es.request(
        "GET",
        "logs/_search?track_total_hits=true&size=1",
        body={"track_total_hits": False},
    )
    assert r["hits"]["total"] == {"value": 25, "relation": "eq"}
    # false maps to the SAME Underestimate path as absent (reference:
    # Track(false) => CountHits::Underestimate, rest_handler.rs:364-367)
    r2 = es.request("GET", "logs/_search?track_total_hits=false&size=1")
    r_absent = es.request("GET", "logs/_search?size=1")
    assert r2["hits"]["total"] == r_absent["hits"]["total"]
    r3 = es.request("GET", "logs/_search?track_total_hits=30&size=1")
    assert r3["hits"]["total"] == {"value": 25, "relation": "eq"}
    with pytest.raises(EsApiError) as ei:
        es.request("GET", "logs/_search?track_total_hits=maybe")
    assert ei.value.status == 400

def test_es_sort_doc_field_truncates_rest(spark, tmp_path):
    """Sort keys after `_doc`/`_shard_doc` are dropped — the
    reference's take_while_inclusive(!is_doc_field)
    (`rest_handler.rs:371-385,417-419`)."""
    from quickwit_spark.api import QuickwitSpark

    qw = QuickwitSpark(spark, str(tmp_path / "docsort"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("logs", [{"msg": "spark", "n": v} for v in (5, 1, 3)])
    es = qw.es()
    # "n" after "_doc" is ignored: hits come back in ingest order
    r = es.request(
        "POST",
        "logs/_search",
        body={"sort": ["_doc", {"n": "desc"}], "size": 3},
    )
    ids = [h["_id"] for h in r["hits"]["hits"]]
    assert ids == sorted(ids, key=int)
    assert all(len(h["sort"]) == 1 for h in r["hits"]["hits"])
    # the cursor length check counts AFTER the truncation too
    # (reference: take_while_inclusive at rest_handler.rs:371-385 runs
    # BEFORE partial_hit_from_search_after_param's length check at
    # :421-434) — echoing hits[-1]["sort"] pages, a 2-value cursor 400s
    from quickwit_spark.search.es_wire import EsApiError

    body = {"sort": ["_doc", {"n": "desc"}], "size": 2}
    p1 = es.request("POST", "logs/_search", body=body)
    cursor = p1["hits"]["hits"][-1]["sort"]
    assert len(cursor) == 1
    p2 = es.request(
        "POST", "logs/_search", body={**body, "search_after": cursor}
    )
    assert [h["_id"] for h in p2["hits"]["hits"]] == [ids[-1]]
    with pytest.raises(EsApiError) as ei:
        es.request(
            "POST", "logs/_search",
            body={**body, "search_after": [cursor[0], 99]},
        )
    assert ei.value.status == 400
    # a SORTLESS body advertises no sort values (reference convert_hit
    # pushes nothing without partial-hit sort values; the cursor
    # endpoint rejects any search_after when the sort is empty)
    r3 = es.request("POST", "logs/_search", body={"size": 2})
    assert all("sort" not in h for h in r3["hits"]["hits"])

def test_es_search_after_validation(spark, tmp_path):
    """The reference 400s a cursor whose length differs from the sort
    key count — never silent truncation — and rejects non-scalar cursor
    values (`partial_hit_from_search_after_param`,
    rest_handler.rs:421-478). An explicit `_score` sort takes a
    values-only score cursor."""
    from quickwit_spark.api import QuickwitSpark
    from quickwit_spark.search.es_wire import EsApiError

    qw = QuickwitSpark(spark, str(tmp_path / "saval"))
    qw.create_index({"index_id": "logs", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest(
        "logs",
        [{"msg": "spark " + ("spark " * (i % 3)), "n": i} for i in range(9)],
    )
    es = qw.es()
    for bad in [
        {"sort": [{"n": "asc"}], "search_after": [1, 2]},
        {"search_after": [1]},
        {"sort": [{"n": "asc"}], "search_after": [[1]]},
        {"query": {"match": {"msg": "spark"}}, "sort": ["_score"],
         "search_after": [{"s": 1}]},
    ]:
        with pytest.raises(EsApiError) as ei:
            es.request("POST", "logs/_search", body=bad)
        assert ei.value.status == 400, bad
    # _score sort + values-only cursor pages without re-serving the
    # cursor score (ties at the cursor score are skipped)
    q = {"query": {"match": {"msg": "spark"}}, "sort": ["_score"], "size": 3}
    p1 = es.request("POST", "logs/_search", body=q)
    cursor = p1["hits"]["hits"][-1]["_score"]
    p2 = es.request(
        "POST", "logs/_search", body={**q, "search_after": [cursor]}
    )
    assert all(h["_score"] < cursor for h in p2["hits"]["hits"])
