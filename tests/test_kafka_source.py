"""Kafka-source wiring (reference kafka_source.rs): option builder,
record→doc projection, and restart-resume on a file-backed stand-in
stream with the connector's wire shape (no broker in the sandbox)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig
from quickwit_spark.query.ast import Term
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.kafka import kafka_options, kafka_records_to_docs
from quickwit_spark.streaming import index_stream

WIRE_SCHEMA = "value binary, partition int, offset long"
DOC_SCHEMA = "doc_id long, text string"


def test_kafka_options_mirror_reference_consumer_setup():
    opts = kafka_options(
        "b1:9092,b2:9092",
        "web-pages",
        group_id_prefix="quickwit-idx" + "x" * 300,
        client_params={"session.timeout.ms": 30000, "security.protocol": "SSL"},
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "web-pages"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    # group id limited to 255 chars like the reference (kafka_source.rs:668)
    assert len(opts["groupIdPrefix"]) == 255
    # client params pass through with the connector prefix
    assert opts["kafka.session.timeout.ms"] == "30000"
    assert opts["kafka.security.protocol"] == "SSL"


@pytest.mark.parametrize(
    "key", ["enable.auto.commit", "auto.offset.reset", "group.id"]
)
def test_kafka_options_reject_progress_owning_params(key):
    with pytest.raises(ValueError):
        kafka_options("b:9092", "t", client_params={key: "true"})


def _wire_rows(docs, partition_of=lambda d: d["doc_id"] % 3):
    return [
        (
            bytearray(json.dumps(d).encode("utf-8")),
            partition_of(d),
            d["doc_id"],
        )
        for d in docs
    ]


def test_records_to_docs_skips_empty_and_malformed(spark):
    rows = _wire_rows(
        [{"doc_id": i, "text": f"term{i} common"} for i in range(10)]
    )
    rows += [
        (None, 0, 100),  # null payload (tombstone)
        (bytearray(b""), 1, 101),  # empty payload: skipped per reference
        (bytearray(b"{not json"), 2, 102),  # parse error: counted+skipped
        (bytearray(b"[1, 2]"), 0, 103),  # not an object: skipped
        # valid objects with no schema fields are DOCS, not errors —
        # the reference ingests them with null fields
        (bytearray(b"{}"), 1, 104),
        (bytearray(b'{"unmapped": 1}'), 2, 105),
    ]
    records = spark.createDataFrame(rows, WIRE_SCHEMA)
    docs = kafka_records_to_docs(records, DOC_SCHEMA)
    out = docs.collect()
    assert len(out) == 12
    empties = [r for r in out if r["doc_id"] is None]
    assert {r["_kafka_offset"] for r in empties} == {104, 105}
    out = [r for r in out if r["doc_id"] is not None]
    assert set(docs.columns) == {
        "doc_id", "text", "_kafka_partition", "_kafka_offset"
    }
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[4]["_kafka_partition"] == 1 and by_id[4]["_kafka_offset"] == 4
    bare = kafka_records_to_docs(records, DOC_SCHEMA, lineage=False)
    assert set(bare.columns) == {"doc_id", "text"}


def test_standin_stream_restart_resumes_at_committed_offsets(spark, tmp_path):
    """The full reference contract on the stand-in: a stream indexed
    through a checkpoint, killed, and restarted must pick up at the
    committed partition offsets — everything indexed exactly once, the
    per-doc kafka lineage preserved."""
    src = str(tmp_path / "wire")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def emit(lo, hi):
        docs = [
            {"doc_id": i, "text": f"term{i} common kafka"}
            for i in range(lo, hi)
        ]
        spark.createDataFrame(_wire_rows(docs), WIRE_SCHEMA).write.mode(
            "append"
        ).parquet(src)

    emit(0, 120)
    cfg = IndexConfig(
        fields=[FieldConfig("text")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("_kafka_partition", "_kafka_offset"),
    )

    def run_stream():
        wire = spark.readStream.schema(WIRE_SCHEMA).parquet(src)
        docs = kafka_records_to_docs(wire, DOC_SCHEMA)
        q = index_stream(docs, idx, cfg, ckpt, name="kafka-standin")
        q.awaitTermination(120)

    run_stream()
    assert sum(s.num_docs for s in mf.live_segments(idx)) == 120

    # more records land after the "crash"; restart from the checkpoint
    emit(120, 200)
    run_stream()
    assert sum(s.num_docs for s in mf.live_segments(idx)) == 200

    # a pure replay (no new data) must be a no-op, not re-index
    run_stream()
    assert sum(s.num_docs for s in mf.live_segments(idx)) == 200

    s = IndexSearcher(spark, idx)
    assert s.count(Term("text", "common")) == 200
    # lineage rides through the docstore: fetch one doc's source span
    hit = s.search(
        Term("text", "term150"), k=1,
        fetch=["_kafka_partition", "_kafka_offset"],
    ).collect()
    assert len(hit) == 1
    assert hit[0]["_kafka_offset"] == 150
    assert hit[0]["_kafka_partition"] == 150 % 3
