"""Kafka source wiring: Kafka records → doc rows for `index_stream`.

The reference's dominant production ingest is its Kafka source
(qw/quickwit-indexing/src/source/kafka_source.rs:1-120): an rdkafka
consumer whose per-partition offsets form the SourceCheckpoint
(kafka_source.rs:26,353-360) committed atomically with split publish,
`enable.auto.commit=false` because the metastore — not the broker —
owns progress (kafka_source.rs:672-674), one JSON document per message
payload, empty payloads skipped (kafka_source.rs:734-746).

Spark-native equivalence, piece by piece:
  - consumer + rebalance protocol  → the `kafka` structured-streaming
    connector (spark-sql-kafka); Spark's driver assigns partitions to
    tasks, no consumer group rebalancing is involved
  - SourceCheckpoint {partition → offset} → Spark's streaming
    checkpoint commits exactly a {topic-partition → next offset} map
    per micro-batch; `index_stream`'s idempotent per-batch manifest
    commit makes replay of an uncommitted batch a no-op, which is the
    same "progress owned by the index, not the broker" contract
  - group.id default "quickwit-{index_uid}-{source_id}"
    (kafka_source.rs:663-668) → groupIdPrefix below
  - doc_processor parse-error skipping → from_json null-filtering

The broker connector jar isn't bundled in every deployment (and never
in this sandbox), so construction is split: `kafka_records_to_docs`
is the pure record→doc projection over the connector's public wire
schema (value binary, partition int, offset long, ...) and is what
tests drive with a file-backed stand-in stream of the same shape;
`kafka_source` merely binds it to `readStream.format("kafka")`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    group_id_prefix: str | None = None,
    client_params: dict | None = None,
) -> dict[str, str]:
    """Connector options mirroring the reference's consumer setup.

    `client_params` are passed through with the connector's `kafka.`
    prefix (the analog of KafkaSourceParams.client_params), except
    progress-owning ones: the reference force-disables broker-side
    autocommit because the checkpoint, not the broker, is the source
    of truth (kafka_source.rs:672) — Spark's connector has the same
    rule (it manages offsets itself), so `enable.auto.commit` and
    `auto.offset.reset` overrides are rejected rather than silently
    broken."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # one message may be arbitrarily late; the doc model has no
        # event-time semantics (see streaming/indexing.py), so never
        # drop on the source side
        "failOnDataLoss": "false",
    }
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix[:255]
    for key, value in (client_params or {}).items():
        if key in ("enable.auto.commit", "auto.offset.reset", "group.id"):
            raise ValueError(
                f"kafka_source: client param {key!r} is managed by the "
                "checkpoint/connector (the reference likewise overrides "
                "it; kafka_source.rs:672-676)"
            )
        opts[f"kafka.{key}"] = str(value)
    return opts


def kafka_records_to_docs(
    records: DataFrame,
    schema: StructType | str,
    lineage: bool = True,
) -> DataFrame:
    """Kafka wire records → doc rows.

    `records` carries the connector's output schema (at least `value:
    binary, partition: int, offset: long`). One JSON doc per message
    payload; empty/null payloads are skipped (tombstones etc.,
    kafka_source.rs:734-746) and unparseable payloads are dropped the
    way the reference's doc processor counts-and-skips them. With
    `lineage`, `_kafka_partition`/`_kafka_offset` columns ride along
    so split manifests can record the exact source span a segment
    covers (the SourceCheckpoint analog, queryable after the fact)."""
    # "unparseable" must mean NOT A JSON OBJECT, never "a valid object
    # whose fields happen to miss the schema" — the reference ingests
    # `{}` / `{"unmapped": 1}` as (null-field) docs and only skips
    # parse errors. from_json can't tell the two apart (both give an
    # all-null struct under PERMISSIVE), so object-ness is checked
    # with json_object_keys (NULL for malformed JSON and non-objects).
    parsed = records.filter(
        F.col("value").isNotNull()
        & (F.length("value") > 0)
        & F.json_object_keys(F.col("value").cast("string")).isNotNull()
    ).select(
        F.from_json(F.col("value").cast("string"), schema).alias("doc"),
        "partition",
        "offset",
    )
    out = parsed.select(
        "doc.*",
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
    )
    if not lineage:
        out = out.drop("_kafka_partition", "_kafka_offset")
    return out


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType | str,
    starting_offsets: str = "earliest",
    group_id_prefix: str | None = None,
    client_params: dict | None = None,
    lineage: bool = True,
) -> DataFrame:
    """Streaming doc DataFrame from a Kafka topic, ready for
    `streaming.indexing.index_stream`. Requires the spark-sql-kafka
    connector on the classpath (any Spark distribution's `--packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`); raises a clear
    error when it's absent instead of failing at stream start."""
    reader = spark.readStream.format("kafka")
    for key, value in kafka_options(
        bootstrap_servers, topic, starting_offsets, group_id_prefix,
        client_params,
    ).items():
        reader = reader.option(key, value)
    try:
        records = reader.load()
    except Exception as exc:  # pragma: no cover - connector-less envs
        if "kafka" in str(exc).lower():
            raise RuntimeError(
                "kafka_source: the spark-sql-kafka connector is not on "
                "the classpath; submit with --packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
            ) from exc
        raise
    return kafka_records_to_docs(records, schema, lineage=lineage)
