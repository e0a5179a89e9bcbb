"""Cross-generation docmap column conversion (`index/docmap_convert`):
the Spark-expression matrix must agree with the driver-side
`search.source_convert` matrix on every shared (src, dst) pair — the
two implement the same `tantivy_val_to_json.rs` rules, one for fast
columns, one for `_source` rendering.  Documented divergences
(string->timestamp syntax, timestamp->string whole-second render,
f64 display of stringified numbers) are excluded."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.index.docmap_convert import convert_column
from quickwit_spark.search.source_convert import (
    OMIT,
    convert_value,
)


def _spark_convert(spark, values, src, dst):
    import decimal

    if src.startswith("decimal"):
        values = [decimal.Decimal(v) for v in values]
    df = spark.createDataFrame([(v,) for v in values], f"v {src}")
    out = df.select(convert_column(F.col("v"), src, dst).alias("c"))
    return [r["c"] for r in out.collect()]


# (spark src type, old mapspec) pairs and (spark dst type, new mapspec)
_SRC = {
    "string": {"kind": "text"},
    "bigint": {"kind": "long"},
    "double": {"kind": "double"},
    "boolean": {"kind": "bool"},
    "decimal(20,0)": {"kind": "u64"},
}
_DST = {
    "string": {"kind": "text"},
    "bigint": {"kind": "long"},
    "double": {"kind": "double"},
    "boolean": {"kind": "bool"},
    "decimal(20,0)": {"kind": "u64"},
}

_VALUES = {
    "string": ["123", "-7", "true", "false", "True", "10.5", "w9",
               "+4", " 12", "", str(2**63), str(2**64 - 1), str(2**64)],
    "bigint": [0, 1, 2, -1, -(2**62), 2**62, 2**63 - 1],
    "double": [0.0, 1.0, 0.5, -3.25, 12.9, 1e300, -1e300],
    "boolean": [True, False],
    "decimal(20,0)": [0, 1, 7, 2**63 - 1, 2**63, 2**64 - 1],
}


def _py_value(v, src):
    """JSON-shaped value a stored doc would hold for this column."""
    import decimal

    if src == "decimal(20,0)":
        return int(v)
    if isinstance(v, decimal.Decimal):
        return int(v)
    return v


def _normalize(x, dst):
    import decimal

    if x is None or x is OMIT:
        return None
    if isinstance(x, decimal.Decimal):
        return int(x)
    if dst == "double":
        return float(x)
    return x


@pytest.mark.parametrize("src", sorted(_SRC))
@pytest.mark.parametrize("dst", sorted(_DST))
def test_expr_matrix_matches_driver_matrix(spark, src, dst):
    if src == dst:
        pytest.skip("identity")
    values = _VALUES[src]
    got = _spark_convert(spark, values, src, dst)
    for v, g in zip(values, got):
        expect = convert_value(_py_value(v, src), _SRC[src], _DST[dst])
        if (
            src == "double"
            and dst == "string"
            and expect is not OMIT
        ):
            # documented approximation: fast columns use Spark's
            # double->string cast (e.g. "1.0"), _source rendering uses
            # Rust f64 Display ("1") — only check convertibility
            assert (g is None) == (expect is OMIT), (v, g, expect)
            continue
        assert _normalize(g, dst) == _normalize(expect, dst), (
            src, dst, v, g, expect,
        )


def test_array_rules_in_exprs(spark):
    # array<string> -> decimal: element-wise, failures skipped
    df = spark.createDataFrame(
        [(["1", "x", "3"],)], "v array<string>"
    )
    out = df.select(
        convert_column(F.col("v"), "array<string>", "array<decimal(20,0)>")
        .alias("c")
    ).collect()[0]["c"]
    assert [int(x) for x in out] == [1, 3]
    # array -> scalar keeps the first convertible
    out = df.select(
        convert_column(F.col("v"), "array<string>", "decimal(20,0)").alias("c")
    ).collect()[0]["c"]
    assert int(out) == 1
    # scalar -> array wraps; unconvertible -> empty
    df2 = spark.createDataFrame([("x",), ("5",)], "v string")
    rows = df2.select(
        convert_column(F.col("v"), "string", "array<bigint>").alias("c")
    ).collect()
    got = sorted((list(r["c"]) for r in rows), key=len)
    assert got == [[], [5]]


def test_numeric_to_timestamp_magnitudes(spark):
    rows = [(1_700_000_000,), (1_700_000_000_000,), (1_700_000_000_000_000,)]
    df = spark.createDataFrame(rows, "v bigint")
    out = df.select(
        convert_column(F.col("v"), "bigint", "timestamp").alias("c")
    ).collect()
    stamps = {str(r["c"]) for r in out}
    # secs / millis / micros all land on the same instant
    assert stamps == {"2023-11-14 22:13:20"}


def test_review_regressions(spark):
    """Bugs caught by review: ANSI element_at crash on all-unconvertible
    arrays, floor saturation for u64 in (2^63, 2^64), CAST_OVERFLOW on
    huge double->timestamp, scientific notation in double->string."""
    import decimal

    # all-unconvertible array -> scalar must yield null, not throw
    df = spark.createDataFrame([(["x", "y"],), ([],)], "v array<string>")
    rows = df.select(
        convert_column(F.col("v"), "array<string>", "decimal(20,0)").alias("c")
    ).collect()
    assert [r["c"] for r in rows] == [None, None]
    # double -> u64 beyond i64::MAX keeps the true value
    df = spark.createDataFrame([(1.5e19,)], "v double")
    out = df.select(
        convert_column(F.col("v"), "double", "decimal(20,0)").alias("c")
    ).collect()[0]["c"]
    assert out == decimal.Decimal(15000000000000000000)
    # huge double -> timestamp omits instead of CAST_OVERFLOW
    df = spark.createDataFrame([(1e30,)], "v double")
    out = df.select(
        convert_column(F.col("v"), "double", "timestamp").alias("c")
    ).collect()[0]["c"]
    assert out is None
    # double -> string renders plain decimal, not scientific notation
    df = spark.createDataFrame([(1.0e10,), (10.5,)], "v double")
    rows = df.select(
        convert_column(F.col("v"), "double", "string").alias("c")
    ).collect()
    assert sorted(r["c"] for r in rows) == ["10.5", "10000000000"]
