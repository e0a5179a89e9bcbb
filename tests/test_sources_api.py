"""Index sources API on the facade (reference
`index_api/rest_handler.rs:759-1380`): create/get/list/delete, toggle,
reset-checkpoint, reserved-source protection, and real ingestion runs
for the vec and file source types with checkpoint resume."""

import json

import pytest


@pytest.fixture(scope="module")
def qw(spark, tmp_path_factory):
    from quickwit_spark.api import QuickwitSpark

    q = QuickwitSpark(spark, str(tmp_path_factory.mktemp("qw_src_root")))
    q.create_index(
        {
            "index_id": "logs",
            "doc_mapping": {
                "mode": "dynamic",
                "dynamic_mapping": {"tokenizer": "default", "fast": True},
            },
        }
    )
    return q


def _count(qw, q="match_all"):
    body = {"query": {"match_all": {}}}
    return qw.search("logs", body)["hits"]["total"]["value"]


def test_source_crud_and_validation(qw):
    cfg = {
        "source_id": "vec-source",
        "source_type": "vec",
        "params": {"docs": [], "batch_num_docs": 10},
    }
    created = qw.create_source("logs", cfg)
    assert created["enabled"] is True
    assert qw.get_source("logs", "vec-source")["source_type"] == "vec"
    assert [s["source_id"] for s in qw.list_sources("logs")] == ["vec-source"]
    with pytest.raises(ValueError, match="already exists"):
        qw.create_source("logs", cfg)
    with pytest.raises(ValueError, match="unsupported source_type"):
        qw.create_source(
            "logs", {"source_id": "kfk", "source_type": "kafka", "params": {}}
        )
    with pytest.raises(ValueError, match="docs"):
        qw.create_source(
            "logs", {"source_id": "vec2", "source_type": "vec", "params": {}}
        )
    with pytest.raises(ValueError, match="not found"):
        qw.get_source("logs", "nope")
    qw.delete_source("logs", "vec-source")
    assert qw.list_sources("logs") == []
    with pytest.raises(ValueError, match="not found"):
        qw.delete_source("logs", "vec-source")


def test_reserved_sources_protected(qw):
    for sid in ("_ingest-api-source", "_ingest-cli-source"):
        with pytest.raises(PermissionError):
            qw.delete_source("logs", sid)
        with pytest.raises(PermissionError):
            qw.toggle_source("logs", sid, False)
        with pytest.raises(PermissionError):
            qw.create_source(
                "logs", {"source_id": sid, "source_type": "void"}
            )


def test_vec_source_run_checkpoint_toggle_reset(qw):
    docs = [{"level": "error", "msg": f"m{i}"} for i in range(5)]
    qw.create_source(
        "logs",
        {"source_id": "vsrc", "source_type": "vec",
         "params": {"docs": docs, "batch_num_docs": 2}},
    )
    before = _count(qw)
    assert qw.run_source("logs", "vsrc")["num_docs"] == 5
    assert _count(qw) == before + 5
    # checkpointed: a second run ingests nothing
    assert qw.run_source("logs", "vsrc")["num_docs"] == 0
    assert _count(qw) == before + 5
    # disabled source refuses to run
    qw.toggle_source("logs", "vsrc", False)
    assert qw.run_source("logs", "vsrc") == {
        "source_id": "vsrc", "num_docs": 0, "disabled": True}
    qw.toggle_source("logs", "vsrc", True)
    # reset-checkpoint replays from the beginning
    qw.reset_source_checkpoint("logs", "vsrc")
    assert qw.run_source("logs", "vsrc")["num_docs"] == 5
    assert _count(qw) == before + 10


def test_file_source_run(qw, tmp_path):
    p1 = tmp_path / "a.ndjson"
    p1.write_text("\n".join(
        json.dumps({"level": "warn", "msg": f"f{i}"}) for i in range(3)))
    qw.create_source(
        "logs",
        {"source_id": "fsrc", "source_type": "file",
         "params": {"filepath": str(tmp_path / "*.ndjson")}},
    )
    before = _count(qw)
    assert qw.run_source("logs", "fsrc")["num_docs"] == 3
    assert qw.run_source("logs", "fsrc")["num_docs"] == 0  # consumed
    # a NEW file appears -> only it is ingested
    p2 = tmp_path / "b.ndjson"
    p2.write_text(json.dumps({"level": "warn", "msg": "late"}))
    assert qw.run_source("logs", "fsrc")["num_docs"] == 1
    assert _count(qw) == before + 4
    r = qw.search("logs", {"query": {"term": {"msg": {"value": "late"}}}})
    assert r["hits"]["total"]["value"] == 1


def test_void_source_and_state_survives_restart(qw, spark):
    from quickwit_spark.api import QuickwitSpark

    qw.create_source("logs", {"source_id": "nop", "source_type": "void"})
    assert qw.run_source("logs", "nop")["num_docs"] == 0
    # a fresh facade over the same root sees the same sources +
    # checkpoints (metastore-on-disk, like the reference)
    q2 = QuickwitSpark(spark, qw.root)
    ids = {s["source_id"] for s in q2.list_sources("logs")}
    assert {"vsrc", "fsrc", "nop"} <= ids
    assert q2.run_source("logs", "vsrc")["num_docs"] == 0  # checkpoint kept


def test_update_source_replaces_params_keeps_checkpoint(qw, tmp_path):
    # PUT semantics (source_resource.rs:98-158): full replacement,
    # same id, type frozen, checkpoint survives
    p1 = tmp_path / "a.ndjson"
    p1.write_text(json.dumps({"msg": "one"}) + "\n")
    p2 = tmp_path / "b.ndjson"
    p2.write_text(json.dumps({"msg": "two"}) + "\n")
    qw.create_source(
        "logs",
        {"source_id": "upd", "source_type": "file", "params": {"filepath": str(p1)}},
    )
    qw.run_source("logs", "upd")
    before = qw.get_source("logs", "upd")["checkpoint"]
    assert before  # consumed p1
    updated = qw.update_source(
        "logs",
        "upd",
        {"source_id": "upd", "source_type": "file", "params": {"filepath": str(p2)}},
    )
    assert updated["params"]["filepath"] == str(p2)
    assert qw.get_source("logs", "upd")["checkpoint"] == before
    with pytest.raises(ValueError, match="does not match"):
        qw.update_source(
            "logs",
            "upd",
            {"source_id": "other", "source_type": "file", "params": {"filepath": "x"}},
        )
    with pytest.raises(ValueError, match="type cannot be changed"):
        qw.update_source(
            "logs",
            "upd",
            {"source_id": "upd", "source_type": "vec", "params": {"docs": []}},
        )
    with pytest.raises(ValueError, match="filepath"):
        qw.update_source(
            "logs", "upd", {"source_id": "upd", "source_type": "file", "params": {}}
        )
    with pytest.raises(ValueError, match="not found"):
        qw.update_source(
            "logs", "nope", {"source_id": "nope", "source_type": "void", "params": {}}
        )
    qw.delete_source("logs", "upd")
