"""Facade large-batch ingest: batches over the threshold must parse
and validate JVM-side (no driver json.loads loop) and produce the same
index/search results and rejection semantics as the driver path."""

import json

import pytest

from quickwit_spark.api import QuickwitSpark


@pytest.fixture()
def qw(spark, tmp_path, monkeypatch):
    return QuickwitSpark(spark, str(tmp_path / "qw_root"))


MAPPING = {
    "index_id": "big",
    "doc_mapping": {
        "mode": "dynamic",
        "dynamic_mapping": {"tokenizer": "default", "fast": True},
    },
}


def _docs(n):
    return [
        {"msg": f"event number {i} level {'err' if i % 7 == 0 else 'ok'}",
         "n": i}
        for i in range(n)
    ]


def test_distributed_path_taken_and_results_match(qw, monkeypatch):
    """Same batch through both paths (threshold forced) → identical
    search counts, _source rendering, and doc accounting."""
    monkeypatch.setattr(QuickwitSpark, "_DISTRIBUTED_INGEST_MIN", 300)
    taken = {"dist": 0}
    orig = QuickwitSpark._ingest_distributed

    def spy(self, index_id, docs, **kw):
        taken["dist"] += 1
        return orig(self, index_id, docs, **kw)

    monkeypatch.setattr(QuickwitSpark, "_ingest_distributed", spy)

    qw.create_index(MAPPING)
    docs = _docs(400)
    # mix dicts and raw JSON strings like the REST body would arrive
    batch = [json.dumps(d) if d["n"] % 2 else d for d in docs]
    res = qw.ingest("big", batch)
    assert taken["dist"] == 1
    assert res["num_docs"] == 400
    assert "rejected" not in res

    qw.create_index({**MAPPING, "index_id": "small"})
    monkeypatch.setattr(QuickwitSpark, "_DISTRIBUTED_INGEST_MIN", 10_000)
    res2 = qw.ingest("small", batch)
    assert taken["dist"] == 1  # stayed on the driver path
    assert res2["num_docs"] == 400

    for q in ("err", "ok", "number"):
        big = qw.search("big", {"query": {"match": {"msg": q}}})
        small = qw.search("small", {"query": {"match": {"msg": q}}})
        assert big["hits"]["total"]["value"] == small["hits"]["total"]["value"]
    # _source renders the original raw line through the JVM-wrapped path
    hit = qw.search(
        "big", {"query": {"match": {"msg": "7"}}, "size": 1}
    )["hits"]["hits"][0]
    assert set(hit["_source"]) == {"msg", "n"}


def test_distributed_path_rejects_per_doc(qw, monkeypatch):
    monkeypatch.setattr(QuickwitSpark, "_DISTRIBUTED_INGEST_MIN", 10)
    qw.create_index(MAPPING)
    batch = [json.dumps(d) for d in _docs(50)]
    batch[7] = "{broken json"
    batch[13] = "[1, 2, 3]"  # not an object
    batch[21] = json.dumps({"_qw_key": 1, "msg": "reserved"})
    # valid object + trailing garbage: passes json_object_keys but NOT
    # a strict whole-line parse — must be rejected, never silently
    # corrupted into the envelope
    batch[30] = '{"msg": "tail"} extra'
    batch[35] = '{\n"msg": "multiline"}'  # NDJSON discipline
    res = qw.ingest("big", batch)
    assert res["num_docs"] == 45
    assert res["rejected"] == 5
    assert sorted(e["doc"] for e in res["errors"]) == [7, 13, 21, 30, 35]
    # and none of the rejects leaked into the index or its schema
    got = qw.search("big", {"query": {"match": {"msg": "tail"}}})
    assert got["hits"]["total"]["value"] == 0
    # a follow-up batch must keep keys unique despite the holes
    res2 = qw.ingest("big", [json.dumps(d) for d in _docs(20)])
    assert res2["num_docs"] == 20
    total = qw.search("big", {"query": {"match_all": {}}, "size": 0})
    assert total["hits"]["total"]["value"] == 65


def test_distributed_path_all_rejected(qw, monkeypatch):
    monkeypatch.setattr(QuickwitSpark, "_DISTRIBUTED_INGEST_MIN", 4)
    qw.create_index(MAPPING)
    res = qw.ingest("big", ["nope", "{", "[]", "5"])
    assert res["num_docs"] == 0
    assert res["rejected"] == 4
    # index still usable afterwards
    ok = qw.ingest("big", [json.dumps({"msg": "hello world"})] * 1)
    assert ok["num_docs"] == 1
    assert (
        qw.search("big", {"query": {"match": {"msg": "hello"}}})["hits"][
            "total"
        ]["value"]
        == 1
    )
