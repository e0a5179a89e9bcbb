"""ES `_bulk` ingestion (reference `elasticsearch_api/bulk.rs:94-180`)."""

import json

import pytest

from quickwit_spark.index import manifest as mf
from quickwit_spark.index.builder import FieldConfig, IndexConfig
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.bulk import BulkError, es_bulk, parse_bulk_lines


def payload(docs, action="index", with_id=True):
    lines = []
    for i, d in enumerate(docs):
        meta = {"_index": "idx"}
        if with_id:
            meta["_id"] = i + 1
        lines.append(json.dumps({action: meta}))
        lines.append(json.dumps(d))
    return "\n".join(lines)


def cfg():
    return IndexConfig(
        fields=[FieldConfig("text"), FieldConfig("lang", tokenizer="raw")],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("lang",),
    )


DOCS = [
    {"text": "spark joins the stream", "lang": "en"},
    {"text": "quick brown spark", "lang": "en"},
    {"text": "der schnelle strom", "lang": "de"},
    {"text": "stream of sparks and joins", "lang": "en"},
]


def test_parse_bulk_lines_shapes():
    metas, docs = parse_bulk_lines(payload(DOCS))
    assert len(metas) == len(docs) == 4
    assert metas[0] == {"_index": "idx", "_id": 1}
    assert json.loads(docs[2])["lang"] == "de"
    # create is accepted like index (bulk_body.rs:20-23)
    metas, _ = parse_bulk_lines(payload(DOCS, action="create"))
    assert len(metas) == 4
    # blank lines are skipped; default index applies when meta omits it
    metas, _ = parse_bulk_lines(
        '\n{"index": {}}\n{"text": "x"}\n\n', default_index="fallback"
    )
    assert metas == [{"_index": "fallback", "_id": None}]


def test_parse_bulk_rejects_malformed():
    with pytest.raises(BulkError, match="unsupported bulk action"):
        parse_bulk_lines('{"delete": {"_id": 1}}\n{}')
    with pytest.raises(BulkError, match="Malformed action"):
        parse_bulk_lines("not-json\n{}")
    with pytest.raises(BulkError, match="missing source line"):
        parse_bulk_lines('{"index": {"_id": 1}}')


def test_bulk_ingest_and_search(spark, tmp_path):
    d = str(tmp_path / "bulkidx")
    resp = es_bulk(spark, payload(DOCS), d, cfg())
    assert resp["errors"] is False
    assert [it["index"]["_id"] for it in resp["items"]] == ["1", "2", "3", "4"]
    assert all(it["index"]["status"] == 201 for it in resp["items"])

    s = IndexSearcher(spark, d)
    assert s.count("text:spark") == 2  # 'sparks' is a different token
    assert s.count("lang:en") == 3

    # a second bulk request appends as its own lineage batch
    more = [{"text": "spark again", "lang": "fr"}]
    es_bulk(spark, payload(more, with_id=False), d, cfg())
    s2 = IndexSearcher(spark, d)
    assert s2.count("text:spark") == 3
    assert sum(seg.num_docs for seg in mf.live_segments(d)) == 5
    # auto-assigned keys never collide with explicit ones
    keys = [r["doc_key"] for r in s2.search_stream("text:again", []).collect()]
    assert keys and all(k >= 1_000_000 for k in keys)


def test_bulk_source_field_never_shadows_key(spark, tmp_path):
    d = str(tmp_path / "bulkidx2")
    docs = [{"doc_id": 999, "text": "collision test", "lang": "en"}]
    es_bulk(spark, payload(docs), d, cfg())
    s = IndexSearcher(spark, d)
    rows = s.search_stream("text:collision", []).collect()
    assert [r["doc_key"] for r in rows] == [1]  # _id wins over source field
