"""Non-additive doc-mapping updates (docs/reference/updating-mapper.md):
a PUT that changes the doc mapping starts a new generation
(doc_mapping_uid); old splits keep their data, searches run under the
NEWEST mapping with best-effort conversion, merges never cross
generations, and fetched docs convert per the
`tantivy_val_to_json.rs` matrix."""

import pytest


@pytest.fixture(scope="module")
def qw(spark, tmp_path_factory):
    from quickwit_spark.api import QuickwitSpark

    return QuickwitSpark(spark, str(tmp_path_factory.mktemp("qw_upd")))


def _cfg(index_id, field_mappings):
    return {
        "index_id": index_id,
        "doc_mapping": {
            "mode": "dynamic",
            "field_mappings": field_mappings,
        },
    }


def test_example_3_type_update_retrieval(qw):
    """updating-mapper.md Example 3 verbatim: text<->u64 swap and
    array<text> -> text, returned documents converted best-effort."""
    qw.create_index(
        _cfg(
            "upd3",
            [
                {"name": "field1", "type": "text"},
                {"name": "field2", "type": "u64"},
                {"name": "field3", "type": "array<text>"},
            ],
        )
    )
    qw.ingest(
        "upd3",
        [
            {"field1": "123", "field2": 456, "field3": ["abc", "def"]},
            {"field1": "message", "field2": 987, "field3": ["ghi"]},
        ],
    )
    qw.update_index(
        "upd3",
        _cfg(
            "upd3",
            [
                {"name": "field1", "type": "u64"},
                {"name": "field2", "type": "text"},
                {"name": "field3", "type": "text"},
            ],
        ),
    )
    r = qw.search("upd3", {"query": {"match_all": {}}, "sort": ["field2"]})
    docs = [h["_source"] for h in r["hits"]["hits"]]
    assert {"field1": 123, "field2": "456", "field3": "abc"} in docs
    # "message" can't convert to u64 -> field1 omitted entirely
    assert {"field2": "987", "field3": "ghi"} in docs


def test_generations_in_splits_and_merge_isolation(qw):
    """Old and new splits carry their doc_mapping_uid; the merge
    planner never mixes generations (merge_planner.rs:41-53)."""
    qw.create_index(
        _cfg("updgen", [{"name": "n", "type": "u64"}])
    )
    for i in range(2):
        qw.ingest("updgen", [{"n": 10 + i}])
    qw.update_index(
        "updgen",
        {
            "index_id": "updgen",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [{"name": "n", "type": "text"}],
            },
        },
    )
    for i in range(2):
        qw.ingest("updgen", [{"n": f"t{i}"}])
    splits = qw.list_splits("updgen")["splits"]
    uids = sorted({s["doc_mapping_uid"] for s in splits})
    assert uids == [0, 1]
    # merge rounds must not produce any split whose inputs span uids
    from quickwit_spark.index import manifest as mf
    from quickwit_spark.index.merge import MergePolicy, plan_merges

    segs = mf.live_segments(qw.index_dir("updgen"))
    ops = plan_merges(segs, MergePolicy(merge_factor=2, max_merge_factor=2))
    by_id = {s.segment_id: s for s in segs}
    for op in ops:
        in_uids = {by_id[sid].doc_mapping_uid for sid in op.segment_ids}
        assert len(in_uids) == 1
        assert op.doc_mapping_uid in in_uids

    # both generations stay searchable: the docmap union converts the
    # old u64 column to the current text type
    r = qw.search("updgen", {"query": {"match_all": {}}})
    assert r["hits"]["total"]["value"] == 4


def test_example_2_newly_indexed_field_on_old_splits(qw):
    """A query on a field the old splits didn't have returns no match
    there (no error); NOT of it matches all old docs."""
    qw.create_index(_cfg("upd2", [{"name": "f2", "type": "text"}]))
    qw.ingest("upd2", [{"f2": "old"}])
    qw.update_index(
        "upd2",
        {
            "index_id": "upd2",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "f1", "type": "text"},
                    {"name": "f2", "type": "text"},
                ],
            },
        },
    )
    qw.ingest("upd2", [{"f1": "new", "f2": "recent"}])
    s = qw.searcher("upd2")
    assert s.count("f1:new") == 1
    assert s.count("f2:old OR f2:recent") == 2
    # NOT f1:new -> the old doc (f1 absent there)
    assert s.count("NOT f1:new") == 1


def test_update_reversibility(qw):
    """Re-updating back to the previous mapping restores old-split
    retrieval exactly (reference "Reversibility")."""
    fm_v1 = [{"name": "x", "type": "u64"}]
    fm_v2 = [{"name": "x", "type": "text"}]
    qw.create_index(_cfg("updrev", fm_v1))
    qw.ingest("updrev", [{"x": 7}])
    qw.update_index(
        "updrev",
        {"index_id": "updrev", "doc_mapping": {"mode": "dynamic", "field_mappings": fm_v2}},
    )
    r = qw.search("updrev", {"query": {"match_all": {}}})
    assert r["hits"]["hits"][0]["_source"]["x"] == "7"
    qw.update_index(
        "updrev",
        {"index_id": "updrev", "doc_mapping": {"mode": "dynamic", "field_mappings": fm_v1}},
    )
    r = qw.search("updrev", {"query": {"match_all": {}}})
    assert r["hits"]["hits"][0]["_source"]["x"] == 7


def test_update_still_rejects_timestamp_field_change(qw):
    qw.create_index(
        _cfg("updts", [{"name": "ts", "type": "datetime", "fast": True}])
    )
    with pytest.raises(ValueError, match="timestamp_field"):
        qw.update_index(
            "updts",
            {
                "index_id": "updts",
                "doc_mapping": {
                    "mode": "dynamic",
                    "field_mappings": [
                        {"name": "ts", "type": "datetime", "fast": True}
                    ],
                    "timestamp_field": "ts",
                },
            },
        )


def test_example_1_indexed_false_rejection(qw):
    """updating-mapper.md Example 1: a field flipped to
    `indexed: false` keeps its stored/fast column but term queries on
    it become invalid; range on the fast column stays legal."""
    qw.create_index(
        _cfg("upd1", [{"name": "field1", "type": "text", "tokenizer": "raw"}])
    )
    qw.ingest("upd1", [{"field1": "my_value", "n": 3}])
    s = qw.searcher("upd1")
    assert s.count("field1:my_value") == 1
    qw.update_index(
        "upd1",
        {
            "index_id": "upd1",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "field1", "type": "text", "indexed": False}
                ],
            },
        },
    )
    s = qw.searcher("upd1")
    with pytest.raises(ValueError, match="not indexed"):
        s.count("field1:my_value")
    # the value itself is still stored and returned
    r = qw.search("upd1", {"query": {"match_all": {}}})
    assert r["hits"]["hits"][0]["_source"]["field1"] == "my_value"


def test_indexed_false_builds_no_postings(qw):
    """A fresh index with `indexed: false` writes no postings for the
    field and rejects queries on it; other fields are unaffected."""
    qw.create_index(
        _cfg(
            "updnoidx",
            [
                {"name": "secret", "type": "text", "indexed": False},
                {"name": "title", "type": "text"},
            ],
        )
    )
    qw.ingest("updnoidx", [{"secret": "hidden", "title": "hello world"}])
    s = qw.searcher("updnoidx")
    assert s.count("title:hello") == 1
    with pytest.raises(ValueError, match="not indexed"):
        s.count("secret:hidden")
    # no postings were built for the field
    assert "secret" not in {f.name for f in s.config.fields}


def test_range_and_sort_on_converted_fast_columns(qw):
    """After text->u64, old-split numeric strings become rangeable and
    sort numerically; unconvertible values are null (missing-last)."""
    qw.create_index(_cfg("updrange", [{"name": "v", "type": "text"}]))
    qw.ingest(
        "updrange",
        [{"v": "30", "t": "a"}, {"v": "7", "t": "b"}, {"v": "x", "t": "c"}],
    )
    qw.update_index(
        "updrange",
        {
            "index_id": "updrange",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [{"name": "v", "type": "u64"}],
            },
        },
    )
    qw.ingest("updrange", [{"v": 10, "t": "d"}])
    # range over BOTH generations: "30" and "7" convert, "x" doesn't
    r = qw.search(
        "updrange",
        {"query": {"range": {"v": {"gte": 8}}}},
    )
    assert r["hits"]["total"]["value"] == 2  # 30 (gen0) + 10 (gen1)
    # numeric sort across generations, unconvertible last
    r = qw.search(
        "updrange",
        {"query": {"match_all": {}}, "sort": [{"v": "asc"}], "size": 10},
    )
    order = [h["_source"]["t"] for h in r["hits"]["hits"]]
    assert order[:3] == ["b", "d", "a"]  # 7 < 10 < 30
    assert order[3] == "c"  # null (unconvertible) sorts last


def test_merges_execute_within_generations(qw):
    """run_merges on a multi-generation index merges each generation's
    splits separately and search results are unchanged after."""
    cfg = _cfg("updmerge", [{"name": "v", "type": "u64"}])
    cfg["indexing_settings"] = {
        "merge_policy": {
            "type": "stable_log",
            "merge_factor": 3,
            "max_merge_factor": 3,
        }
    }
    qw.create_index(cfg)
    for i in range(3):
        qw.ingest("updmerge", [{"v": i, "w": "alpha"}])
    qw.update_index(
        "updmerge",
        {
            "index_id": "updmerge",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [{"name": "v", "type": "text"}],
            },
            # PUT full-replace semantics: omitting indexing_settings
            # would reset the merge policy to the default
            "indexing_settings": cfg["indexing_settings"],
        },
    )
    for i in range(3):
        qw.ingest("updmerge", [{"v": f"s{i}", "w": "alpha"}])
    before = qw.search("updmerge", {"query": {"term": {"w": {"value": "alpha"}}}})
    res = qw.run_merges("updmerge", max_rounds=3)
    from quickwit_spark.index import manifest as mf

    segs = mf.live_segments(qw.index_dir("updmerge"))
    uids = sorted({s.doc_mapping_uid for s in segs})
    assert uids == [0, 1]
    merged = [s for s in segs if s.merge_gen > 0]
    assert merged, f"no merge happened: {res}"
    qw._searchers.pop("updmerge", None)
    after = qw.search("updmerge", {"query": {"term": {"w": {"value": "alpha"}}}})
    assert (
        after["hits"]["total"]["value"]
        == before["hits"]["total"]["value"]
        == 6
    )


def test_snippets_convert_old_generation_source(qw):
    """Review regression: the snippet path must keep segment_id so
    old-generation hits still convert their _source."""
    qw.create_index(
        _cfg(
            "updsnip",
            [
                {"name": "v", "type": "text"},
                {"name": "body", "type": "text", "record": "position"},
            ],
        )
    )
    qw.ingest("updsnip", [{"v": "hello", "body": "grand canyon hike"}])
    qw.update_index(
        "updsnip",
        {
            "index_id": "updsnip",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "v", "type": "u64"},
                    {"name": "body", "type": "text", "record": "position"},
                ],
            },
        },
    )
    from quickwit_spark.search.native_api import native_search

    resp = native_search(
        qw.searcher("updsnip"),
        {"query": "body:canyon", "snippet_fields": "body", "max_hits": 5},
    )
    hit = resp["hits"][0]
    # "hello" can't convert to u64 -> omitted even on the snippet path
    assert "v" not in hit
    assert "snippets" in resp["hits"][0] or resp.get("snippets") is not None


def test_exists_on_indexed_false_fast_column(qw):
    """The reference answers `exists` from the FAST column whenever the
    field is fast, postings or not (`field_presence.rs:75-82`
    build_existence_query) — so `indexed: false` must reject term
    queries but keep `field:*` legal in conjunctive positions."""
    from quickwit_spark.query.ast import Bool, Exists, Term

    qw.create_index(
        _cfg(
            "updexists",
            [
                {"name": "secret", "type": "text", "indexed": False},
                {"name": "title", "type": "text"},
            ],
        )
    )
    qw.ingest(
        "updexists",
        [
            {"secret": "hidden", "title": "hello world"},
            {"title": "hello again"},
        ],
    )
    s = qw.searcher("updexists")
    # dynamic-mode indexes carry a presence field, which serves exists
    # on the non-indexed field in ANY position
    assert s.count(Exists("secret")) == 1
    assert (
        s.count(Bool(must=[Term("title", "hello")], filter=[Exists("secret")]))
        == 1
    )
    # term queries stay rejected
    with pytest.raises(ValueError, match="not indexed"):
        s.count("secret:hidden")

    # presence-less config (reference index_field_presence: false):
    # exists answers from the FAST column in conjunctive positions —
    # a fresh searcher instance so the mutation stays local
    from quickwit_spark.search.engine import IndexSearcher

    s2 = IndexSearcher(s.spark, s.index_dir)
    s2.config.presence_field = None
    assert s2.count(Exists("secret")) == 1
    assert (
        s2.count(
            Bool(must=[Term("title", "hello")], filter=[Exists("secret")])
        )
        == 1
    )
    # non-conjunctive placement fails loudly at planning time, not with
    # a silent zero-match
    with pytest.raises(NotImplementedError, match="exists"):
        s2.count(Bool(should=[Term("title", "hello"), Exists("secret")]))


def test_delete_rewrite_on_generation_split(qw):
    """plan_delete_rewrites must stamp each op with the target
    segment's doc_mapping_uid: with the default uid 0, a rewrite of a
    generation>=1 split read the WRONG docmap dataset, found zero rows,
    and published an empty segment — silently losing every surviving
    doc of the split."""
    from quickwit_spark.index import manifest as mf
    from quickwit_spark.index.deletes import (
        delete_by_query,
        plan_delete_rewrites,
    )
    from quickwit_spark.index.merge import execute_merge
    from quickwit_spark.query.ast import Term

    qw.create_index(_cfg("upddel", [{"name": "msg", "type": "text"}]))
    qw.ingest("upddel", [{"msg": "old keepme"}])
    # non-additive update → future splits build under doc_mapping_uid 1
    qw.update_index(
        "upddel",
        {
            "index_id": "upddel",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "msg", "type": "text"},
                    {"name": "v", "type": "u64"},
                ],
            },
        },
    )
    qw.ingest(
        "upddel",
        [{"msg": "dropme new", "v": 1}, {"msg": "keepme new", "v": 2}],
    )
    s = qw.searcher("upddel")
    d = s.index_dir
    gen1 = [r for r in mf.live_segments(d) if r.doc_mapping_uid == 1]
    assert gen1 and all(r.num_docs for r in gen1)

    delete_by_query(s, Term("msg", "dropme"))
    ops = plan_delete_rewrites(d)
    assert ops and all(
        o.doc_mapping_uid == seg.doc_mapping_uid
        for o in ops
        for seg in mf.live_segments(d)
        if seg.segment_id in o.segment_ids
    )
    for o in ops:
        execute_merge(qw.spark, d, o)
    s.refresh()
    # the doomed doc is gone; BOTH survivors (one per generation) remain
    assert s.count(Term("msg", "dropme")) == 0
    assert s.count(Term("msg", "keepme")) == 2
    rewritten = [r for r in mf.live_segments(d) if r.doc_mapping_uid == 1]
    assert sum(r.num_docs for r in rewritten) == 1
