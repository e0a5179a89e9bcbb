"""Native `{index}/search` parameter surface (SearchRequestQueryString,
`rest_handler.rs:175-241`): search_field / snippet_fields / aggs /
format / deny-unknown-fields, and the SearchResponseRest envelope
(`search_response_rest.rs:44-95` — snippets array, elapsed time)."""

import duckdb
import pytest

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.search.native_api import native_search

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    idx = str(tmp_path_factory.mktemp("native_idx"))
    cfg = IndexConfig(
        fields=[
            FieldConfig("text"),
            FieldConfig("source", tokenizer="raw"),
        ],
        doc_key="doc_id",
        num_partitions=2,
        stored_columns=("text", "lang", "source", "n_chars", "src"),
        stored_source="src",
        time_column=None,
    )
    df = spark.read.parquet(f"{_SF}/documents.parquet").withColumn(
        "src",
        F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars")),
    )
    build_index(spark, df, idx, cfg)
    return IndexSearcher(spark, idx)


def test_unknown_param_is_rejected(searcher):
    with pytest.raises(ValueError, match="unknown search parameter"):
        native_search(searcher, {"query": "*", "maxhits": 3})


def test_format_validated(searcher):
    with pytest.raises(ValueError, match="format"):
        native_search(searcher, {"query": "*", "format": "yaml"})
    r = native_search(searcher, {"query": "*", "format": "json", "max_hits": 1})
    assert r["num_hits"] > 0 and "elapsed_time_micros" in r


def test_search_field_override(searcher):
    """`search_field` resolves bare clauses against the given fields —
    `src0` exists only in the raw-tokenized `source` field."""
    via_source = native_search(
        searcher, {"query": "src0", "search_field": "source", "max_hits": 0}
    )
    want = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{_SF}/documents.parquet')"
        " WHERE source = 'src0'"
    ).fetchone()[0]
    assert via_source["num_hits"] == want
    via_text = native_search(
        searcher, {"query": "src0", "search_field": "text", "max_hits": 0}
    )
    assert via_text["num_hits"] == 0


def test_snippet_fields_response_shape(searcher):
    r = native_search(
        searcher,
        {"query": "text:spark", "snippet_fields": "text", "max_hits": 3},
    )
    assert len(r["snippets"]) == len(r["hits"]) == 3
    for snip, hit in zip(r["snippets"], r["hits"]):
        assert set(snip) == {"text"}
        assert len(snip["text"]) == 1 and "<b>spark</b>" in snip["text"][0]
        # hit payload itself must NOT leak snippet columns
        assert not any(k.startswith("snippet_") for k in hit)


def test_snippets_on_sorted_hits(searcher):
    r = native_search(
        searcher,
        {
            "query": "text:spark",
            "snippet_fields": "text",
            "sort_by": "n_chars",
            "max_hits": 3,
        },
    )
    assert len(r["snippets"]) == len(r["hits"]) == 3
    assert all("<b>spark</b>" in s["text"][0] for s in r["snippets"])
    # descending default on the sort key
    lens = [h["n_chars"] for h in r["hits"]]
    assert lens == sorted(lens, reverse=True)


def test_aggs_param(searcher):
    body = {"by_lang": {"terms": {"field": "lang", "size": 10}}}
    r = native_search(
        searcher, {"query": "text:spark", "aggs": body, "max_hits": 0}
    )
    want = duckdb.sql(
        f"""SELECT lang, COUNT(*) FROM read_parquet('{_SF}/documents.parquet')
            WHERE list_contains(string_split(text, ' '), 'spark')
            GROUP BY lang ORDER BY 2 DESC, 1"""
    ).fetchall()
    got = [
        (b["key"], b["doc_count"])
        for b in r["aggregations"]["by_lang"]["buckets"]
    ]
    assert got == [(l, c) for l, c in want]
    # JSON-string form of the same param
    import json

    r2 = native_search(
        searcher,
        {"query": "text:spark", "aggs": json.dumps(body), "max_hits": 0},
    )
    assert r2["aggregations"] == r["aggregations"]


def test_unstored_snippet_field_is_400(searcher):
    """Snippet/fetch columns missing from the docmap raise ValueError
    (→ 400 at the wire), not a Spark AnalysisException."""
    with pytest.raises(ValueError, match="not stored"):
        native_search(
            searcher, {"query": "text:spark", "snippet_fields": "nope"}
        )
