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


def test_ip_mapping_and_sort_key(spark):
    from quickwit_spark.index.mapping import ip_sort_key

    df = spark.createDataFrame(
        [(0, "10.1.2.3"), (1, "255.255.255.255"), (2, "999.1.1.1"), (3, None)],
        ["doc_id", "ip"],
    )
    m = DocMapping(fields=[TypedField("ip", "ip")], mode="lenient", exclude=("doc_id",))
    rows = {r["doc_id"]: r for r in m.apply(df).collect()}
    assert rows[0]["ip"] == "::ffff:10.1.2.3"
    assert rows[0]["ip_key"] == ip_sort_key("10.1.2.3")
    assert rows[1]["ip_key"] == "00000000000000000000ffffffffffff"
    assert rows[2]["ip"] is None  # invalid octet → coerce NULL
    assert rows[3]["ip_key"] is None
    # key order == numeric ip order (string range queries are sound)
    assert ip_sort_key("10.2.0.0") > ip_sort_key("10.1.255.255")


def test_ipv6_udf_path(spark):
    from quickwit_spark.index.mapping import ip_sort_key

    df = spark.createDataFrame(
        [(0, "2001:db8::1"), (1, "::ffff:10.1.2.3"), (2, "10.1.2.3"), (3, "junk")],
        ["doc_id", "ip"],
    )
    m = DocMapping(
        fields=[TypedField("ip", "ip", ipv6=True)], mode="lenient", exclude=("doc_id",)
    )
    rows = {r["doc_id"]: r for r in m.apply(df).collect()}
    assert rows[0]["ip"] == "2001:db8::1"
    assert rows[0]["ip_key"] == ip_sort_key("2001:db8::1")
    # IPv4 and IPv4-mapped normalize identically (reference normalizes
    # IPv4 → IPv6-mapped internally)
    assert rows[1]["ip_key"] == rows[2]["ip_key"] == ip_sort_key("10.1.2.3")
    assert rows[3]["ip"] is None


def test_datetime_formats(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            (0, "2024-01-05T10:00:00"),
            (1, "1700000000"),          # unix secs (auto-detect)
            (2, "1700000000123"),       # unix millis (auto-detect)
            (3, "05/Jan/2024 10:00:01"),
            (4, "not a date"),
        ],
        ["doc_id", "when"],
    )
    m = DocMapping(
        fields=[
            TypedField(
                "when", "datetime",
                formats=("rfc3339", "unix_timestamp", "dd/MMM/yyyy HH:mm:ss"),
            )
        ],
        mode="lenient",
        exclude=("doc_id",),
    )
    rows = {r["doc_id"]: r["when"] for r in m.apply(df).collect()}
    assert rows[0] == dt.datetime(2024, 1, 5, 10, 0, 0)
    assert rows[1] == dt.datetime.fromtimestamp(1700000000, dt.timezone.utc).replace(tzinfo=None)
    assert rows[2].microsecond == 123000
    assert rows[3] == dt.datetime(2024, 1, 5, 10, 0, 1)
    assert rows[4] is None


def test_bytes_and_u64(spark):
    df = spark.createDataFrame(
        [(0, "aGVsbG8=", "18446744073709551615")], ["doc_id", "blob", "big"]
    )
    m = DocMapping(
        fields=[TypedField("blob", "bytes"), TypedField("big", "u64")],
        mode="lenient",
        exclude=("doc_id",),
    )
    r = m.apply(df).collect()[0]
    assert bytes(r["blob"]) == b"hello"
    assert int(r["big"]) == 18446744073709551615  # full u64 range


def test_json_field_text_and_subfields(spark):
    from quickwit_spark.index.mapping import json_text_col  # noqa: F401

    df = spark.createDataFrame(
        [
            (0, '{"a": {"lang": "de land", "n": 7}, "src": "my Blog"}'),
            (1, '{"a": {"lang": "en", "n": 3}, "deep": {"x": {"y": "zz"}}}'),
            (2, None),
        ],
        ["doc_id", "meta"],
    )
    m = DocMapping(
        fields=[
            TypedField(
                "meta", "json", json_depth=3,
                subfields={"a.n": "long", "a.lang": "text"},
            )
        ],
        mode="lenient",
        exclude=("doc_id",),
    )
    rows = {r["doc_id"]: r for r in m.apply(df).collect()}
    toks0 = rows[0]["meta_text"].split()
    assert "a.lang.de" in toks0 and "a.lang.land" in toks0
    assert "a.n.7" in toks0 and "src.my" in toks0 and "src.blog" in toks0
    assert "deep.x.y.zz" in rows[1]["meta_text"].split()
    assert rows[0]["meta_a_n"] == 7 and rows[1]["meta_a_lang"] == "en"
    assert rows[2]["meta_text"] == ""


def test_array_field_end_to_end(spark):
    """Multivalued postings: every element's tokens are searchable and
    the fieldnorm counts tokens across elements."""
    import tempfile

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.query.ast import Term
    from quickwit_spark.search.engine import IndexSearcher

    df = spark.createDataFrame(
        [
            (0, ["red", "dark blue"], "one two"),
            (1, ["blue"], "two"),
            (2, [], "three"),
            (3, None, "four"),
        ],
        ["doc_id", "tags", "body"],
    )
    m = DocMapping(
        fields=[TypedField("tags", "text", array=True), TypedField("body")],
        mode="lenient",
        exclude=("doc_id",),
    )
    idx = tempfile.mkdtemp(prefix="qws_arr_")
    cfg = IndexConfig(
        fields=[FieldConfig("tags"), FieldConfig("body")],
        doc_key="doc_id",
        num_partitions=1,
    )
    build_index(spark, m.apply(df), idx, cfg)
    s = IndexSearcher(spark, idx)
    assert s.count(Term("tags", "blue")) == 2  # second element + sole element
    assert s.count(Term("tags", "dark")) == 1
    assert s.count(Term("tags", "red")) == 1
    assert s.count(Term("body", "two")) == 2


def test_json_field_search_end_to_end(spark):
    import tempfile

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.query.ast import Bool, Range, Term
    from quickwit_spark.search.engine import IndexSearcher

    df = spark.createDataFrame(
        [
            (0, '{"u": {"seg": "s1", "id": 10}}'),
            (1, '{"u": {"seg": "s2", "id": 20}}'),
            (2, '{"u": {"seg": "s1", "id": 30}}'),
        ],
        ["doc_id", "props"],
    )
    m = DocMapping(
        fields=[TypedField("props", "json", subfields={"u.id": "long"})],
        mode="lenient",
        exclude=("doc_id",),
    )
    idx = tempfile.mkdtemp(prefix="qws_jsonidx_")
    cfg = IndexConfig(
        fields=[FieldConfig("props_text", tokenizer="whitespace")],
        doc_key="doc_id",
        num_partitions=1,
        stored_columns=("props_u_id",),
    )
    build_index(spark, m.apply(df), idx, cfg)
    s = IndexSearcher(spark, idx)
    # dot-path term search over the nested tree
    assert s.count(Term("props_text", "u.seg.s1")) == 2
    # typed fast subcolumn drives range filters
    got = s.search_stream(
        Bool(must=[Term("props_text", "u.seg.s1")],
             filter=[Range("props_u_id", gte=20)]),
        ["props_u_id"],
    ).collect()
    assert [(r["doc_key"], r["props_u_id"]) for r in got] == [(2, 30)]
