"""Regressions for the facade/config review findings: create-path
robustness, per-doc ingest rejection, honest counts, clear semantics,
u64 sign validation, concat-over-mixed tokens, bulk action keys."""

import pytest


@pytest.fixture(scope="module")
def qw(spark, tmp_path_factory):
    from quickwit_spark.api import QuickwitSpark

    return QuickwitSpark(spark, str(tmp_path_factory.mktemp("qw_hard")))


def test_nested_dotted_timestamp_field_create_and_ingest(qw):
    """A nested `timestamp_field` (`meta.ts`) must create cleanly: the
    empty publish previously had no column for the dotted path and
    crashed with UNRESOLVED_COLUMN."""
    qw.create_index(
        {
            "index_id": "hard-nested",
            "doc_mapping": {
                "field_mappings": [
                    {"name": "meta", "type": "object", "field_mappings": [
                        {"name": "ts", "type": "datetime", "fast": True}
                    ]}
                ],
                "timestamp_field": "meta.ts",
            },
        }
    )
    r = qw.ingest(
        "hard-nested",
        [{"meta": {"ts": "2024-01-02T03:04:05Z"}, "m": "hello"}],
    )
    assert r["num_docs"] == 1
    assert qw.searcher("hard-nested").count("m:hello") == 1


def test_failed_create_leaves_no_half_index(qw, monkeypatch):
    """A create whose empty publish fails must remove the index dir —
    a state file with no manifest poisoned es()/search() for EVERY
    index in the root."""
    import os

    def boom(*a, **k):
        raise RuntimeError("injected publish failure")

    monkeypatch.setattr(qw, "_build", boom)
    with pytest.raises(RuntimeError, match="injected"):
        qw.create_index({"index_id": "hard-broken", "doc_mapping": {}})
    monkeypatch.undo()
    assert not os.path.exists(qw.index_dir("hard-broken"))
    assert "hard-broken" not in qw.list_indexes()
    # the rest of the root still works
    qw.create_index({"index_id": "hard-ok", "doc_mapping": {}})
    qw.ingest("hard-ok", [{"msg": "fine"}])
    assert qw.search("hard-ok", {"query": {"match": {"msg": "fine"}}})[
        "hits"
    ]["total"]["value"] == 1


def test_empty_mapping_has_no_phantom_body_pin(qw):
    """create_index({}) used to pin a placeholder text field named
    'body', so a real numeric 'body' was forever compared
    lexicographically ('10' < '2')."""
    qw.create_index({"index_id": "hard-body", "doc_mapping": {}})
    qw.ingest("hard-body", [{"body": 10}, {"body": 2}])
    r = qw.search(
        "hard-body", {"query": {"range": {"body": {"gte": 3, "lte": 20}}}}
    )
    assert r["hits"]["total"]["value"] == 1


def test_ingest_rejects_per_doc_not_per_batch(qw):
    """Reference ingest semantics: a malformed doc is rejected alone;
    the rest of the batch commits. Reserved internal field names are
    per-doc rejections too, not AMBIGUOUS_REFERENCE 500s."""
    qw.create_index({"index_id": "hard-rej", "doc_mapping": {}})
    r = qw.ingest(
        "hard-rej",
        ['{"a": "one"}', "not json", '[1,2]', {"_qw_key": 9, "a": "two"},
         {"a": "three"}],
    )
    assert r["num_docs"] == 2
    assert r["rejected"] == 3
    reasons = " ".join(e["reason"] for e in r["errors"])
    assert "invalid JSON" in reasons and "reserved" in reasons
    assert qw.searcher("hard-rej").count("a:one OR a:three") == 2


def test_ingest_counts_only_indexed_docs(qw):
    """Docs dropped for a missing timestamp must not be claimed as
    ingested."""
    qw.create_index(
        {
            "index_id": "hard-ts",
            "doc_mapping": {
                "field_mappings": [
                    {"name": "ts", "type": "datetime", "fast": True}
                ],
                "timestamp_field": "ts",
            },
        }
    )
    r = qw.ingest(
        "hard-ts",
        [{"ts": "2024-01-01T00:00:00Z", "a": "x"}, {"a": "y"}, {"a": "z"}],
    )
    assert r["num_docs"] == 1
    assert (
        qw.search("hard-ts", {"query": {"match_all": {}}})["hits"]["total"][
            "value"
        ]
        == 1
    )


def test_clear_index_resets_source_checkpoints(qw):
    """The reference's clear resets every source checkpoint
    (index.rs:427-435): after clear, run_source re-ingests from the
    beginning instead of leaving the index empty forever."""
    qw.create_index({"index_id": "hard-clear", "doc_mapping": {}})
    qw.create_source(
        "hard-clear",
        {"source_id": "vsource", "source_type": "vec",
         "params": {"docs": [{"m": "doc1"}, {"m": "doc2"}]}},
    )
    assert qw.run_source("hard-clear", "vsource")["num_docs"] == 2
    qw.clear_index("hard-clear")
    assert qw.run_source("hard-clear", "vsource")["num_docs"] == 2
    assert qw.searcher("hard-clear").count("m:doc1") == 1


def test_u64_rejects_negative_values(qw):
    """Rust u64 deserialization rejects negatives: the bulk path 400s
    per item, and lenient ingest coerces the misfit value to null."""
    qw.create_index(
        {
            "index_id": "hard-u64",
            "doc_mapping": {
                "field_mappings": [{"name": "n", "type": "u64",
                                    "fast": True}]
            },
        }
    )
    payload = "\n".join(
        ['{"index": {"_index": "hard-u64"}}', '{"n": -5}',
         '{"index": {"_index": "hard-u64"}}', '{"n": 7}']
    )
    out = qw.bulk(payload)
    statuses = [list(i.values())[0]["status"] for i in out["items"]]
    assert statuses == [400, 201] and out["errors"]
    # lenient plain ingest: the negative coerces to null, doc survives
    qw.ingest("hard-u64", [{"n": -3, "m": "neg"}])
    r = qw.search(
        "hard-u64", {"query": {"range": {"n": {"gte": 0}}}}
    )
    vals = [h["_source"].get("n") for h in r["hits"]["hits"]]
    assert -5 not in vals and -3 not in vals


def test_bulk_create_items_keyed_by_action(qw):
    qw.create_index({"index_id": "hard-bulkc", "doc_mapping": {}})
    payload = "\n".join(
        ['{"create": {"_index": "hard-bulkc"}}', '{"m": "one"}',
         '{"index": {"_index": "hard-bulkc"}}', '{"m": "two"}']
    )
    out = qw.bulk(payload)
    assert list(out["items"][0]) == ["create"]
    assert list(out["items"][1]) == ["index"]
    assert out["items"][0]["create"]["status"] == 201


def test_concat_over_mixed_dynamic_field_matches_tokens(qw):
    """A concatenate field with include_dynamic_fields must index the
    ORIGINAL tokens of a mixed-typed dynamic path, not its
    decimal-coercion rendering ('10.5', not '10.500000000')."""
    qw.create_index(
        {
            "index_id": "hard-concat",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "all", "type": "concatenate",
                     "include_dynamic_fields": True}
                ],
            },
        }
    )
    # 'v' classifies mixed: bool + float values
    qw.ingest("hard-concat", [{"v": True}, {"v": 10.5}])
    s = qw.searcher("hard-concat")
    assert s.count("all:true") == 1
    assert s.count("all:10.5") == 1
