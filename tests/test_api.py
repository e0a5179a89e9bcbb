"""QuickwitSpark facade: the reference's index lifecycle as a library —
create from an index-config doc, NDJSON ingest with additive dynamic
schema evolution, search through the ES wire envelope."""

import pytest


@pytest.fixture(scope="module")
def qw(spark, tmp_path_factory):
    from quickwit_spark.api import QuickwitSpark

    return QuickwitSpark(spark, str(tmp_path_factory.mktemp("qw_root")))


def test_lifecycle_and_evolution(qw):
    qw.create_index(
        {
            "index_id": "logs",
            "doc_mapping": {
                "mode": "dynamic",
                "dynamic_mapping": {"tokenizer": "default", "fast": True},
            },
        }
    )
    assert "logs" in qw.list_indexes()
    # empty index is searchable
    r = qw.search("logs", {"query": {"match_all": {}}})
    assert r["hits"]["total"]["value"] == 0

    qw.ingest("logs", [{"level": "error", "msg": "disk full"},
                       {"level": "info", "msg": "started"}])
    r = qw.search("logs", {"query": {"term": {"level": {"value": "error"}}}})
    assert r["hits"]["total"]["value"] == 1
    assert r["hits"]["hits"][0]["_source"]["msg"] == "disk full"

    # batch 2 ADDS a field (additive mapping evolution): both old and
    # new fields search; old splits just lack the new column
    qw.ingest("logs", [{"level": "error", "host": "web1"}])
    r = qw.search("logs", {"query": {"term": {"host": {"value": "web1"}}}})
    assert r["hits"]["total"]["value"] == 1
    r = qw.search("logs", {"query": {"term": {"level": {"value": "error"}}}})
    assert r["hits"]["total"]["value"] == 2
    # aggregating the new field over all splits: old docs contribute
    # nothing (null column there)
    r = qw.search(
        "logs",
        {"size": 0, "aggs": {"h": {"terms": {"field": "host"}}}},
    )
    assert r["aggregations"]["h"]["buckets"] == [
        {"key": "web1", "doc_count": 1}
    ]

    # field caps see both fields
    caps = qw.es().request("GET", "logs/_field_caps")
    assert "host" in caps["fields"] and "level" in caps["fields"]

    qw.delete_index("logs")
    assert "logs" not in qw.list_indexes()
    with pytest.raises(ValueError):
        qw.searcher("logs")


def test_pinned_types_and_mixed_monotonicity(qw):
    qw.create_index(
        {"index_id": "pins", "doc_mapping": {"mode": "dynamic"}},
    )
    # batch 1 types `n` as long and `v` as text
    qw.ingest("pins", [{"n": 5, "v": "hello world"}])
    # batch 2: `n` gets a non-numeric value -> coerces to null under the
    # pinned long kind (lenient coercion, mapping unchanged); `v` gets a
    # numeric token but STAYS text (classification is monotone)
    qw.ingest("pins", [{"n": "not-a-number", "v": "7"}])
    s = qw.searcher("pins")
    assert s.count("n:5") == 1
    r = qw.search("pins", {"query": {"term": {"v": {"value": "7"}}}})
    assert r["hits"]["total"]["value"] == 1
    # range over the pinned long column ignores the coerced-null doc
    r = qw.search("pins", {"query": {"range": {"n": {"gte": 0}}}})
    assert r["hits"]["total"]["value"] == 1
    qw.delete_index("pins")


def test_timestamp_field_required(qw):
    qw.create_index(
        {
            "index_id": "ts",
            "doc_mapping": {
                "mode": "dynamic",
                "timestamp_field": "ts",
                "field_mappings": [{"name": "ts", "type": "datetime"}],
            },
        }
    )
    qw.ingest("ts", [{"ts": 1684993001, "m": "a"}, {"m": "no-timestamp"}])
    # the reference rejects docs missing the declared timestamp field
    r = qw.search("ts", {"query": {"match_all": {}}})
    assert r["hits"]["total"]["value"] == 1
    qw.delete_index("ts")


def test_create_validation_errors(qw):
    with pytest.raises(ValueError):
        qw.create_index(
            {
                "index_id": "bad",
                "doc_mapping": {
                    "field_mappings": [
                        {"name": "t", "type": "text", "tokenizer": "default"}
                    ],
                    "tag_fields": ["t"],
                },
            }
        )
    with pytest.raises(ValueError):
        qw.create_index({"index_id": "../evil", "doc_mapping": {}})
