"""Ingest transform hook (VRL analog) + concatenate fields."""

import tempfile

from pyspark.sql import functions as F

from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
from quickwit_spark.search.engine import IndexSearcher
from quickwit_spark.sources.transform import Transform


def test_declarative_steps(spark):
    df = spark.createDataFrame(
        [(1, "INFO", "ok", 200), (2, "error", "boom", 404), (3, "WARN", "meh", 200)],
        ["id", "severity", "msg", "status"],
    )
    t = (
        Transform()
        .with_columns(severity=F.upper("severity"), msg_len="length(msg)")
        .rename(msg="body")
        .drop("status")
        .where(F.col("severity") != "ERROR")
    )
    out = t(df)
    assert out.columns == ["id", "severity", "body", "msg_len"]
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["severity"] == "INFO" and rows[1]["msg_len"] == 2


def test_declarative_steps_stay_codegen(spark):
    # the declarative tier must not break pushdown: no Python eval
    # nodes in the physical plan
    import contextlib
    import io

    df = spark.range(10).withColumn("s", F.col("id").cast("string"))
    t = Transform().with_columns(u=F.upper("s")).where("id > 3")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t(df).explain()
    assert "mapInPandas" not in buf.getvalue()
    assert "BatchEvalPython" not in buf.getvalue()


def test_map_batches_hook(spark):
    import pandas as pd

    df = spark.createDataFrame([(1, "a b"), (2, "c")], ["id", "text"])

    def add_count(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["ntok"] = pdf["text"].str.split().str.len()
        return pdf

    out = Transform().map_batches(add_count, "id long, text string, ntok long")(df)
    got = {r["id"]: r["ntok"] for r in out.collect()}
    assert got == {1: 2, 2: 1}


def test_build_index_with_transform_and_concatenate(spark):
    df = spark.createDataFrame(
        [
            (0, "spark engine", "fast queries", "keep"),
            (1, "DUCK pond", "slow things", "keep"),
            (2, "noise", "noise", "drop"),
        ],
        ["doc_id", "title", "body", "flag"],
    )
    t = Transform().where("flag = 'keep'").drop("flag")
    idx = tempfile.mkdtemp(prefix="qws_concat_")
    cfg = IndexConfig(
        fields=[
            FieldConfig("title"),
            FieldConfig("all", sources=("title", "body")),
        ],
        doc_key="doc_id",
        num_partitions=1,
    )
    build_index(spark, df, idx, cfg, transform=t)
    s = IndexSearcher(spark, idx)
    # transform dropped doc 2
    assert s.count("*") == 2
    # concatenate field searches across title+body
    assert s.count("all:spark") == 1
    assert s.count("all:queries") == 1  # body-only token, via concat field
    assert s.count("all:duck") == 1  # lowercased by analyzer
    assert s.count("title:queries") == 0
