"""Doc mapping modes (lenient/strict/dynamic) + typed coercion."""

import tempfile

import pytest

from quickwit_spark.index.mapping import (
    DYNAMIC_COL,
    DYNAMIC_TEXT_COL,
    DocMapping,
    TypedField,
)


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [
            (0, "hello world", "42", "extra stuff", 1.5),
            (1, "more text", "not_a_number", "other things", 2.5),
        ],
        ["doc_id", "body", "count_str", "surprise", "ratio"],
    )


def test_coerce_casts_and_nulls(spark, raw):
    m = DocMapping(
        fields=[TypedField("body", "text"), TypedField("count_str", "long")],
        mode="lenient",
        exclude=("doc_id",),
    )
    out = m.apply(raw)
    assert set(out.columns) == {"doc_id", "body", "count_str"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["count_str"] == 42
    assert rows[1]["count_str"] is None  # coerce failure → NULL, doc kept


def test_no_coerce_rejects_wrong_input_type(raw):
    m = DocMapping(
        fields=[TypedField("count_str", "long", coerce=False)], mode="lenient"
    )
    with pytest.raises(TypeError):
        m.apply(raw)


def test_strict_rejects_unmapped(raw):
    m = DocMapping(fields=[TypedField("body")], mode="strict", exclude=("doc_id",))
    with pytest.raises(ValueError, match="unmapped"):
        m.apply(raw)
    ok = DocMapping(
        fields=[
            TypedField("body"),
            TypedField("count_str"),
            TypedField("surprise"),
            TypedField("ratio", "double"),
        ],
        mode="strict",
        exclude=("doc_id",),
    )
    assert ok.apply(raw).count() == 2


def test_dynamic_captures_and_indexes(spark, raw):
    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search.engine import IndexSearcher

    m = DocMapping(
        fields=[TypedField("body", "text")], mode="dynamic", exclude=("doc_id",)
    )
    out = m.apply(raw)
    assert DYNAMIC_COL in out.columns and DYNAMIC_TEXT_COL in out.columns
    r0 = out.filter("doc_id = 0").collect()[0]
    assert r0[DYNAMIC_COL]["surprise"] == "extra stuff"
    assert "surprise.extra" in r0[DYNAMIC_TEXT_COL].split()

    idx = tempfile.mkdtemp(prefix="qws_dyn_")
    cfg = IndexConfig(
        fields=[
            FieldConfig("body"),
            FieldConfig(DYNAMIC_TEXT_COL, tokenizer="whitespace"),
        ],
        doc_key="doc_id",
        num_partitions=1,
    )
    build_index(spark, out, idx, cfg)
    s = IndexSearcher(spark, idx)
    # path:value search over an unmapped-at-declaration field
    assert s.count(Term(DYNAMIC_TEXT_COL, "surprise.extra")) == 1
    assert s.count(Term(DYNAMIC_TEXT_COL, "count_str.42")) == 1
    assert s.count(Term(DYNAMIC_TEXT_COL, "surprise.things")) == 1
    assert s.count("body:hello") == 1
