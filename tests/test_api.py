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
            "index_id": "tsidx",
            "doc_mapping": {
                "mode": "dynamic",
                "timestamp_field": "ts",
                "field_mappings": [
                    {"name": "ts", "type": "datetime", "fast": True}
                ],
            },
        }
    )
    qw.ingest("tsidx", [{"ts": 1684993001, "m": "a"}, {"m": "no-timestamp"}])
    # the reference rejects docs missing the declared timestamp field
    r = qw.search("tsidx", {"query": {"match_all": {}}})
    assert r["hits"]["total"]["value"] == 1
    qw.delete_index("tsidx")


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


def test_update_index_replace_semantics(qw):
    qw.create_index(
        {
            "index_id": "upd",
            "doc_mapping": {"mode": "dynamic"},
            "retention": {"period": "7 days"},
        }
    )
    # full replace: new search settings, retention omitted → deleted
    qw.update_index(
        "upd",
        {
            "index_id": "upd",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [{"name": "msg", "type": "text"}],
            },
            "search_settings": {"default_search_fields": ["msg"]},
        },
    )
    state = qw._state("upd")
    assert "retention" not in state
    assert state["search_settings"] == {"default_search_fields": ["msg"]}
    # ingest under the updated mapping works, old data unaffected
    qw.ingest("upd", [{"msg": "hello update"}])
    r = qw.search("upd", {"query": {"match": {"msg": {"query": "update"}}}})
    assert r["hits"]["total"]["value"] == 1
    # mismatched index_id rejected
    with pytest.raises(ValueError, match="does not match"):
        qw.update_index("upd", {"index_id": "other", "doc_mapping": {}})
    # timestamp_field change rejected (reference serialize.rs:126-141)
    with pytest.raises(ValueError, match="timestamp_field"):
        qw.update_index(
            "upd",
            {
                "index_id": "upd",
                "doc_mapping": {
                    "timestamp_field": "ts",
                    "field_mappings": [
                        {"name": "ts", "type": "datetime", "fast": True}
                    ],
                },
            },
        )


def test_clear_index_keeps_config(qw):
    qw.create_index({"index_id": "clr", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("clr", [{"a": "one"}, {"a": "two"}])
    assert qw.search("clr", {"query": {"match_all": {}}})["hits"]["total"][
        "value"
    ] == 2
    qw.clear_index("clr")
    # still registered and searchable, but empty
    assert "clr" in qw.list_indexes()
    assert qw.search("clr", {"query": {"match_all": {}}})["hits"]["total"][
        "value"
    ] == 0
    # re-ingest starts a fresh mapping epoch
    qw.ingest("clr", [{"b": 7}])
    assert qw.search("clr", {"query": {"match_all": {}}})["hits"]["total"][
        "value"
    ] == 1


def test_facade_retention_policy(qw):
    import datetime as dt

    qw.create_index(
        {
            "index_id": "ret",
            "doc_mapping": {
                "timestamp_field": "ts",
                "field_mappings": [
                    {"name": "ts", "type": "datetime", "fast": True},
                    {"name": "msg", "type": "text"},
                ],
            },
            "retention": {"period": "7 days"},
        }
    )
    qw.ingest("ret", [{"ts": "2024-01-01T00:00:00Z", "msg": "old doc"}])
    qw.ingest("ret", [{"ts": "2024-03-01T00:00:00Z", "msg": "new doc"}])
    now = dt.datetime(2024, 3, 2, tzinfo=dt.timezone.utc)
    retired = qw.apply_retention("ret", int(now.timestamp() * 1_000_000))
    assert retired  # the january split is past 7 days
    r = qw.search("ret", {"query": {"match_all": {}}})
    assert r["hits"]["total"]["value"] == 1
    assert r["hits"]["hits"][0]["_source"]["msg"] == "new doc"


def test_parse_period_forms():
    from quickwit_spark.api import _parse_period_secs

    assert _parse_period_secs("7 days") == 7 * 86400
    assert _parse_period_secs("1week") == 604800
    assert _parse_period_secs("24h") == 86400
    assert _parse_period_secs("1 hour 30 minutes") == 5400
    with pytest.raises(ValueError):
        _parse_period_secs("forever")


def test_facade_delete_tasks(qw):
    qw.create_index({"index_id": "del", "doc_mapping": {"mode": "dynamic"}})
    qw.ingest("del", [{"m": "spam message"}, {"m": "good message"}])
    resp = qw.create_delete_task("del", {"query": "m:spam"})
    assert resp["opstamp"] >= 1
    tasks = qw.list_delete_tasks("del")
    assert tasks and tasks[0]["opstamp"] == resp["opstamp"]
    # reference semantics: doomed docs stay visible until a rewrite
    # applies the delete (delete_by_query docstring)
    r = qw.search("del", {"query": {"match": {"m": {"query": "message"}}}})
    assert r["hits"]["total"]["value"] == 2


def test_identifier_validation_rules(qw):
    """Reference naming conventions (`quickwit-config/src/lib.rs:134-178`):
    identifiers are `^[a-zA-Z][a-zA-Z0-9-_.]{2,254}$`; patterns allow `*`
    and a leading `-` but never `**`."""
    for bad in ("ab", "1abc", "has space", "x" * 256, None, 7):
        with pytest.raises(ValueError):
            qw.create_index({"index_id": bad, "doc_mapping": {"mode": "dynamic"}})
    with pytest.raises(ValueError):
        qw.create_template(
            {"template_id": "tp", "index_id_patterns": ["logs-*"]}
        )
    with pytest.raises(ValueError):
        qw.create_template(
            {"template_id": "tpl-ok", "index_id_patterns": ["logs-**"]}
        )
    with pytest.raises(ValueError):
        qw.create_template(
            {"template_id": "tpl-ok", "index_id_patterns": "logs-*"}
        )
    qw.create_template(
        {"template_id": "tpl-ok", "index_id_patterns": ["logs-*", "-logs-x*"]}
    )
    qw.delete_template("tpl-ok")


def test_splits_resource(qw):
    """`GET /indexes/{id}/splits` + `PUT .../splits/mark-for-deletion`
    (`index_api/split_resource.rs:38-205`): wire-shaped split docs,
    ListSplitsQueryParams filters, silent-skip mark semantics."""
    qw.create_index({
        "index_id": "spl",
        "doc_mapping": {
            "mode": "dynamic",
            "timestamp_field": "ts",
            "field_mappings": [
                {"name": "ts", "type": "datetime", "fast": True}
            ],
        },
    })
    qw.ingest("spl", [{"m": "alpha one", "ts": 1_700_000_000},
                      {"m": "alpha two", "ts": 1_700_000_500}])
    qw.ingest("spl", [{"m": "beta three", "ts": 1_700_009_000}])

    resp = qw.list_splits("spl")
    assert resp["offset"] == 0 and resp["size"] == len(resp["splits"]) >= 2
    for s in resp["splits"]:
        assert s["split_state"] == "Published"
        assert s["create_timestamp"] > 0
        assert s["update_timestamp"] >= s["create_timestamp"]
        assert s["publish_timestamp"] == s["create_timestamp"]
        assert s["num_docs"] >= 1 and s["num_merge_ops"] == 0
    total = resp["size"]

    # pagination: offset/limit page through the same stable order
    first = qw.list_splits("spl", limit=1)
    rest = qw.list_splits("spl", offset=1)
    assert first["size"] == 1 and rest["offset"] == 1
    assert first["splits"] + rest["splits"] == resp["splits"]

    # time filters are epoch seconds against the split's doc time range:
    # end_timestamp below every doc excludes all; start_timestamp below
    # the earliest doc keeps all (end >= start for every split)
    assert qw.list_splits("spl", end_timestamp=1_600_000_000)["size"] == 0
    assert qw.list_splits("spl", start_timestamp=1_600_000_000)["size"] == total
    # a window covering only the second batch keeps just its split
    late = qw.list_splits("spl", start_timestamp=1_700_005_000)
    assert late["size"] >= 1 and all(
        s["time_range"]["end"] >= 1_700_005_000 for s in late["splits"]
    )
    # create-timestamp upper bound in the past excludes everything
    assert qw.list_splits("spl", end_create_timestamp=1)["size"] == 0

    with pytest.raises(ValueError):
        qw.list_splits("spl", split_states=["Bogus"])
    with pytest.raises(ValueError):
        qw.list_splits("nope-idx")

    # mark one split for deletion: pruned from search immediately,
    # listed as MarkedForDeletion; unknown ids silently skipped
    victim = late["splits"][0]["split_id"]
    before = qw.search("spl", {"query": {"match_all": {}}})
    out = qw.mark_splits_for_deletion("spl", [victim, "no-such-split"])
    assert out["marked"] == [victim]
    marked = qw.list_splits("spl", split_states="MarkedForDeletion")
    assert [s["split_id"] for s in marked["splits"]] == [victim]
    assert qw.list_splits("spl", split_states=["Published"])["size"] == total - 1
    after = qw.search("spl", {"query": {"match_all": {}}})
    lost = late["splits"][0]["num_docs"]
    assert after["hits"]["total"]["value"] == (
        before["hits"]["total"]["value"] - lost
    )
    # idempotent: re-marking flips nothing
    assert qw.mark_splits_for_deletion("spl", [victim])["marked"] == []
    qw.delete_index("spl")


def test_facade_merge_policy(qw):
    # invalid merge policy rejected at create time
    with pytest.raises(ValueError):
        qw.create_index(
            {"index_id": "badmp", "doc_mapping": {"mode": "dynamic"},
             "indexing_settings": {"merge_policy": {"type": "tiered"}}}
        )
    qw.create_index(
        {"index_id": "mpol", "doc_mapping": {"mode": "dynamic"},
         "indexing_settings": {
             "merge_policy": {"type": "stable_log", "merge_factor": 2,
                              "max_merge_factor": 2,
                              "min_level_num_docs": 10}}}
    )
    qw.ingest("mpol", [{"m": "alpha one"}])
    qw.ingest("mpol", [{"m": "alpha two"}])
    out = qw.run_merges("mpol")
    assert out["num_merges"] == 1 and out["num_splits"] == 1
    r = qw.search("mpol", {"query": {"term": {"m": {"value": "alpha"}}}})
    assert r["hits"]["total"]["value"] == 2

    # no_merge: planning is a no-op
    qw.create_index(
        {"index_id": "nomerge", "doc_mapping": {"mode": "dynamic"},
         "indexing_settings": {"merge_policy": {"type": "no_merge"}}}
    )
    qw.ingest("nomerge", [{"m": "a"}])
    qw.ingest("nomerge", [{"m": "b"}])
    out = qw.run_merges("nomerge")
    assert out["num_merges"] == 0 and out["num_splits"] == 2


def test_source_output_formats(qw):
    """Mapped leaves in `_source` re-render through output_format like
    the reference's doc reconstruction (`tantivy_val_to_json.rs`):
    datetime defaults to rfc3339 whatever the input form; numerics can
    render as strings; bytes re-encode; ip canonicalizes; dynamic
    fields stay verbatim."""
    with pytest.raises(ValueError):
        qw.create_index({
            "index_id": "badout",
            "doc_mapping": {
                "mode": "dynamic",
                "field_mappings": [
                    {"name": "ts", "type": "datetime",
                     "output_format": "bogus"}
                ],
            },
        })
    qw.create_index({
        "index_id": "outfmt",
        "doc_mapping": {
            "mode": "dynamic",
            "field_mappings": [
                {"name": "ts", "type": "datetime", "fast": True,
                 "input_formats": ["unix_timestamp"]},
                {"name": "ts_ms", "type": "datetime", "fast": True,
                 "output_format": "unix_timestamp_millis"},
                {"name": "n", "type": "u64", "output_format": "string"},
                {"name": "payload", "type": "bytes",
                 "output_format": "hex"},
                {"name": "addr", "type": "ip"},
            ],
        },
    })
    qw.ingest("outfmt", [{
        "ts": 1700000000,
        "ts_ms": "2023-11-14T22:13:20Z",
        "n": 5,
        "payload": "aGVsbG8=",
        "addr": "::ffff:10.1.2.3",
        "free": 1700000000,          # dynamic: stays verbatim
        "msg": "alpha",
    }])
    r = qw.search("outfmt", {"query": {"term": {"msg": {"value": "alpha"}}}})
    src = r["hits"]["hits"][0]["_source"]
    assert src["ts"] == "2023-11-14T22:13:20Z"     # unix in, rfc3339 out
    assert src["ts_ms"] == 1700000000000           # rfc3339 in, millis out
    assert src["n"] == "5"                         # numeric as string
    assert src["payload"] == "68656c6c6f"          # base64 in, hex out
    assert src["addr"] == "10.1.2.3"               # canonical IPv4
    assert src["free"] == 1700000000               # dynamic untouched
    # the scroll page path renders identically
    r2 = qw.es().request(
        "POST", "outfmt/_search", params={"scroll": "1m"},
        body={"query": {"match_all": {}}, "size": 10},
    )
    src2 = r2["hits"]["hits"][0]["_source"]
    assert src2["ts"] == "2023-11-14T22:13:20Z" and src2["n"] == "5"
    qw.delete_index("outfmt")
