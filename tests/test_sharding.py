"""Deterministic shuffle-shard layout (datapipe/sharding.py)."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.sharding import shuffle_shards, write_shards


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


def test_assignment_is_deterministic_and_dense(docs):
    m1 = shuffle_shards(docs, 8, marks=True).collect()
    m2 = shuffle_shards(docs, 8, marks=True).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    by_shard = {}
    for r in m1:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # every row placed exactly once
    assert sum(len(v) for v in by_shard.values()) == docs.count()


def test_seed_changes_the_permutation(docs):
    a = {r["doc_id"]: (r["shard_id"], r["pos"])
         for r in shuffle_shards(docs, 8, marks=True).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["pos"])
         for r in shuffle_shards(docs, 8, seed=1, marks=True).collect()}
    assert a.keys() == b.keys()
    assert sum(1 for k in a if a[k] != b[k]) > len(a) // 2


def test_shards_are_balanced(docs):
    sizes = [
        r["count"]
        for r in shuffle_shards(docs, 8, marks=True)
        .groupBy("shard_id").count().collect()
    ]
    n = docs.count()
    assert len(sizes) == 8
    for s in sizes:
        assert abs(s - n / 8) < n / 8 * 0.5  # no pathological skew


def test_shuffle_mixes_the_key_order(docs):
    """Consecutive doc_ids should not stay consecutive: within one
    shard, the doc_id sequence in pos order is far from sorted."""
    rows = (
        shuffle_shards(docs, 4, marks=True)
        .filter("shard_id = 0").orderBy("pos").collect()
    )
    ids = [r["doc_id"] for r in rows]
    inversions_free = sum(
        1 for i in range(len(ids) - 1) if ids[i] < ids[i + 1]
    )
    # a sorted list would give len-1; a random permutation ~half
    assert inversions_free < 0.8 * (len(ids) - 1)


def test_write_shards_layout_matches_marks(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs.limit(200), out, 4)
    back = spark.read.parquet(out)
    marks = {
        r["doc_id"]: (r["shard_id"], r["pos"])
        for r in shuffle_shards(docs.limit(200), 4, marks=True).collect()
    }
    got = {
        r["doc_id"]: (r["shard_id"], r["pos"]) for r in back.collect()
    }
    assert got == marks
    # per-shard files exist
    dirs = {r["shard_id"] for r in back.select("shard_id").distinct().collect()}
    assert dirs == set(range(4))


def test_no_python_in_plan(docs):
    plan = (
        shuffle_shards(docs, 8, marks=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bad_num_shards(docs):
    with pytest.raises(ValueError):
        shuffle_shards(docs, 0)


def test_surrogate_key_is_a_dense_deterministic_rank(spark):
    from quickwit_spark.datapipe.sharding import surrogate_key

    rows = [(i * 7919 % 1000, f"u{i}") for i in range(500)]
    df = spark.createDataFrame(rows, ["h", "u"]).repartition(7)
    out = surrogate_key(df, ["h", "u"], out="sk", num_buckets=5)
    got = [(r["h"], r["u"], r["sk"]) for r in out.collect()]
    expect = {
        (h, u): i + 1
        for i, (h, u) in enumerate(sorted(rows))
    }
    assert len(got) == 500
    for h, u, sk in got:
        assert sk == expect[(h, u)]
    # single bucket degenerates to the plain rank too
    one = surrogate_key(df, ["h", "u"], out="sk", num_buckets=1)
    assert {(r["h"], r["u"], r["sk"]) for r in one.collect()} == set(got)


def test_surrogate_key_rejects_non_numeric_lead(spark):
    from quickwit_spark.datapipe.sharding import surrogate_key

    df = spark.createDataFrame([("a", 1)], ["s", "n"])
    with pytest.raises(TypeError):
        surrogate_key(df, ["s", "n"])
