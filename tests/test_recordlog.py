"""Durable record-log WAL (mrecordlog analog; reference ingest v1/v2
buffering, docs/internals/ingest-v2.md): append/replay/truncate,
torn-tail crash recovery, and the facade `wal` source's exactly-once
drain."""

import json
import os

import pytest

from quickwit_spark.sources.recordlog import RecordLog


def test_append_read_truncate_roundtrip(tmp_path):
    log = RecordLog(str(tmp_path / "wal"))
    p = log.append_batch("q1", [f"rec-{i}".encode() for i in range(10)])
    assert p == list(range(10))
    assert log.last_position("q1") == 9
    got = list(log.read_after("q1", None))
    assert [(pos, b.decode()) for pos, b in got] == [
        (i, f"rec-{i}") for i in range(10)
    ]
    assert [pos for pos, _ in log.read_after("q1", 6)] == [7, 8, 9]
    # a second queue is independent
    log.append("q2", b"other")
    assert log.last_position("q2") == 0
    assert [p for p, _ in log.read_after("q1", None)] == list(range(10))


def test_segment_rotation_and_truncate_unlinks(tmp_path):
    root = str(tmp_path / "wal")
    log = RecordLog(root, segment_max_bytes=64)  # tiny: force rotation
    for i in range(12):
        log.append("q", f"payload-{i:02d}".encode())
    qdir = os.path.join(root, "q")
    n_before = len(os.listdir(qdir))
    assert n_before > 1  # rotated
    removed = log.truncate("q", 7)
    assert removed > 0
    assert len(os.listdir(qdir)) < n_before
    # replay from a checkpoint is unaffected by truncation
    assert [p for p, _ in log.read_after("q", 7)] == [8, 9, 10, 11]
    # appends continue gap-free
    assert log.append("q", b"after") == 12


def test_torn_tail_recovery(tmp_path):
    root = str(tmp_path / "wal")
    log = RecordLog(root)
    log.append_batch("q", [b"a", b"bb", b"ccc"])
    (seg,) = [
        os.path.join(root, "q", f)
        for f in os.listdir(os.path.join(root, "q"))
    ]
    size = os.path.getsize(seg)
    with open(seg, "ab") as f:
        f.write(b"QW\x05\x00")  # torn frame header (crash mid-write)
    log2 = RecordLog(root)
    assert [b for _p, b in log2.read_after("q", None)] == [b"a", b"bb", b"ccc"]
    assert os.path.getsize(seg) == size  # tail truncated on recovery
    assert log2.append("q", b"dddd") == 3  # continues gap-free

    # corrupt CRC mid-file: everything from there is dropped
    with open(seg, "r+b") as f:
        f.seek(size - 1)
        f.write(b"\x00" if f.read(0) != b"\x00" else b"\x01")
    with open(seg, "r+b") as f:
        f.seek(size - 2)
        f.write(b"XX")
    log3 = RecordLog(root)
    recs = [b for _p, b in log3.read_after("q", None)]
    assert recs[:2] == [b"a", b"bb"] and len(recs) < 4


def test_fully_truncated_queue_keeps_positions(tmp_path):
    root = str(tmp_path / "wal")
    log = RecordLog(root)
    log.append_batch("q", [b"x", b"y", b"z"])
    log.truncate("q", 2)
    assert list(log.read_after("q", None)) == []
    assert log.append("q", b"new") == 3  # positions never restart
    log4 = RecordLog(root)  # restart sees the same numbering
    assert [p for p, _ in log4.read_after("q", None)] == [3]


def test_facade_wal_source_exactly_once_across_crash(spark, tmp_path, monkeypatch):
    from quickwit_spark.api import QuickwitSpark

    qw = QuickwitSpark(spark, str(tmp_path / "root"))
    qw.create_index(
        {"index_id": "walidx", "doc_mapping": {"mode": "dynamic",
         "dynamic_mapping": {"tokenizer": "default", "fast": True}}}
    )
    wal_root = str(tmp_path / "wal")
    log = RecordLog(wal_root)
    log.append_batch(
        "ingest", [json.dumps({"msg": f"walrec {i}"}) for i in range(50)]
    )
    qw.create_source(
        "walidx",
        {"source_id": "wal1", "source_type": "wal",
         "params": {"wal_root": wal_root, "queue": "ingest",
                    "batch_num_docs": 20}},
    )

    # crash after the first batch: the cursor advanced atomically with
    # that batch's state write, so the rerun resumes, never replays
    calls = {"n": 0}
    orig = QuickwitSpark.ingest

    def flaky(self, index_id, docs, _state_mutator=None):
        out = orig(self, index_id, docs, _state_mutator=_state_mutator)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after commit")
        return out

    monkeypatch.setattr(QuickwitSpark, "ingest", flaky)
    with pytest.raises(RuntimeError):
        qw.run_source("walidx", "wal1")
    monkeypatch.setattr(QuickwitSpark, "ingest", orig)

    res = qw.run_source("walidx", "wal1")
    assert res["num_docs"] == 30  # the 20 already-committed never replay
    total = qw.search("walidx", {"query": {"match": {"msg": "walrec"}}, "size": 0})
    assert total["hits"]["total"]["value"] == 50

    # drained log is truncated; new records flow on the next run
    assert list(log.read_after("ingest", None)) == []
    log.append("ingest", json.dumps({"msg": "walrec late"}).encode())
    assert qw.run_source("walidx", "wal1")["num_docs"] == 1
    total = qw.search("walidx", {"query": {"match": {"msg": "walrec"}}, "size": 0})
    assert total["hits"]["total"]["value"] == 51
