"""ES-compatible `_bulk` NDJSON ingestion.

Reference: `quickwit-serve/src/elasticsearch_api/bulk.rs:94-180` and
`model/bulk_body.rs:20-54` — the payload alternates an action/metadata
line (`{"index": {"_index": ..., "_id": ...}}` or `{"create": ...}`)
with a source-document line; only `index` and `create` actions exist
(no update/delete, exactly like the reference), and a malformed action
line fails the request with the offending line number.

Spark shape: action metadata lines are tiny and parsed on the driver
(they are request plumbing, not data); the source documents are parsed
JVM-side (`spark.read.json` schema pass + `from_json`) and the heavy
work — tokenize, postings build, segment write — is the ordinary
distributed `build_index` path. Each bulk call commits as its own
lineage batch (`bulk-<seq>`), so replays are idempotent per request id
and segments append exactly like the reference's WAL-fed indexer.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import IndexConfig, build_index

_ACTIONS = ("index", "create")


class BulkError(ValueError):
    """Malformed bulk payload (maps to the reference's 400 response)."""


class BulkV2Error(ValueError):
    """Request-level bulk failure with the ingest-v2 handler's wording
    (`bulk_v2.rs:94-123`): carries the HTTP status and the ES exception
    slug so the wire layer renders the exact reference envelope."""

    def __init__(self, status: int, reason: str, es_type: str):
        super().__init__(reason)
        self.status = status
        self.reason = reason
        self.es_type = es_type


def parse_bulk_v2(
    payload: str | list, default_index: str | None = None
) -> list[dict]:
    """ingest-v2 bulk parse (`bulk_v2.rs:83-123`): 1-based line numbers,
    `illegal_argument_exception` on malformed action lines,
    `action_request_validation_exception` on a missing source line or a
    missing index. → [{"pos", "_index", "_id", "doc_line"}] in request
    order."""
    if isinstance(payload, str):
        lines = payload.splitlines()
    else:
        lines = [
            ln if isinstance(ln, str) else json.dumps(ln) for ln in payload
        ]
    numbered = [(i + 1, ln) for i, ln in enumerate(lines) if ln.strip()]
    actions: list[dict] = []
    i = 0
    while i < len(numbered):
        line_no, line = numbered[i]
        try:
            action = json.loads(line)
        except json.JSONDecodeError as e:
            raise BulkV2Error(
                400,
                f"Malformed action/metadata line [{line_no}]: {e}",
                "illegal_argument_exception",
            ) from e
        ok = (
            isinstance(action, dict)
            and len(action) == 1
            and next(iter(action)) in _ACTIONS
        )
        if not ok:
            raise BulkV2Error(
                400,
                f"Malformed action/metadata line [{line_no}]: unknown "
                f"variant, expected one of `index`, `create`",
                "illegal_argument_exception",
            )
        meta = next(iter(action.values())) or {}
        if i + 1 >= len(numbered):
            raise BulkV2Error(
                400,
                "Validation Failed: 1: no requests added;",
                "action_request_validation_exception",
            )
        index_id = meta.get("_index") or default_index
        if not index_id:
            raise BulkV2Error(
                400,
                "Validation Failed: 1: index is missing;",
                "action_request_validation_exception",
            )
        _id = meta.get("_id")
        actions.append(
            {
                "pos": len(actions),
                # response items are keyed by THIS verb ("create" items
                # come back under "create", like ES/the reference)
                "action": next(iter(action)),
                "_index": index_id,
                "_id": str(_id) if _id is not None else None,
                "doc_line": numbered[i + 1][1],
            }
        )
        i += 2
    return actions


def parse_bulk_lines(
    payload: str | list[str], default_index: str | None = None
) -> tuple[list[dict], list[str]]:
    """→ (metas, doc_lines). Each meta: {"_index": str|None, "_id": ...}.

    Mirrors the reference loop (`bulk.rs:115-160`): non-empty lines
    alternate action/source; an action without a following source line
    or an unknown action verb is a request-level error.
    """
    lines = payload.splitlines() if isinstance(payload, str) else list(payload)
    lines = [ln for ln in lines if ln.strip()]
    metas: list[dict] = []
    docs: list[str] = []
    i = 0
    while i < len(lines):
        try:
            action = json.loads(lines[i])
        except json.JSONDecodeError as e:
            raise BulkError(
                f"Malformed action/metadata line [#{i}]. Details: `{e}`"
            ) from e
        if not isinstance(action, dict) or len(action) != 1:
            raise BulkError(f"Malformed action/metadata line [#{i}]")
        verb, meta = next(iter(action.items()))
        if verb not in _ACTIONS:
            raise BulkError(
                f"unsupported bulk action `{verb}` on line [#{i}] "
                f"(reference supports only {_ACTIONS})"
            )
        if i + 1 >= len(lines):
            raise BulkError(f"missing source line for action on line [#{i}]")
        meta = meta or {}
        metas.append(
            {"_index": meta.get("_index", default_index), "_id": meta.get("_id")}
        )
        docs.append(lines[i + 1])
        i += 2
    return metas, docs


def bulk_docs_df(
    spark: SparkSession,
    metas: list[dict],
    doc_lines: list[str],
    doc_key: str,
    key_start: int = 0,
) -> DataFrame:
    """Parse source lines JVM-side and attach doc keys.

    `_id`s (when present) must be convertible to the index's key type;
    rows without `_id` are assigned sequential keys from `key_start`
    (the reference ULIDs missing ids — any collision-free assignment
    satisfies the contract).
    """
    keys = []
    auto = key_start
    for m in metas:
        if m["_id"] is not None:
            keys.append(m["_id"])
        else:
            keys.append(auto)
            auto += 1
    try:
        keys = [int(k) for k in keys]
        key_type = "long"
    except (TypeError, ValueError):
        keys = [str(k) for k in keys]
        key_type = "string"
    pairs = spark.createDataFrame(
        list(zip(keys, doc_lines)), f"{doc_key} {key_type}, _raw string"
    )
    # one JVM schema-inference pass over the payload, then a JVM parse —
    # the document JSON never touches per-row Python
    schema = spark.read.json(
        spark.sparkContext.parallelize(doc_lines or ["{}"])
    ).schema
    parsed = pairs.withColumn("_doc", F.from_json("_raw", schema))
    # `_id` is the key, never the source body: a same-named source
    # field would collide, so it is shadowed (ES semantics)
    body_cols = [
        f"_doc.{f.name}" for f in schema.fields if f.name != doc_key
    ]
    return parsed.select(doc_key, *body_cols)


def es_bulk(
    spark: SparkSession,
    payload: str | list[str],
    index_dir: str,
    config: IndexConfig,
    default_index: str | None = None,
    request_id: str | None = None,
) -> dict:
    """POST `_elastic/_bulk` analog: ingest the NDJSON payload into the
    index at `index_dir` and return the ES response envelope
    (`bulk_v2.rs` ElasticBulkResponse: took/errors/items)."""
    t0 = time.monotonic()
    metas, doc_lines = parse_bulk_lines(payload, default_index)
    if request_id is None:
        request_id = f"bulk-{mf.next_seq(index_dir):06d}"
    if metas:
        existing = sum(s.num_docs for s in mf.live_segments(index_dir))
        df = bulk_docs_df(
            spark, metas, doc_lines, config.doc_key, key_start=1_000_000 + existing
        )
        build_index(spark, df, index_dir, config, job_id=request_id)
    items = [
        {
            "index": {
                "_index": m["_index"],
                "_id": str(m["_id"]) if m["_id"] is not None else None,
                "status": 201,
            }
        }
        for m in metas
    ]
    return {
        "took": int((time.monotonic() - t0) * 1000),
        "errors": False,
        "items": items,
    }
