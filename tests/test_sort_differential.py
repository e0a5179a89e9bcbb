"""Randomized field-sort + search_after differential vs DuckDB.

The engine's sort path carries the reference's conventions — ≤2 sort
keys with per-key direction, missing values LAST regardless of
direction, doc_key tie-break following the primary direction, and a
lexicographic strictly-after cursor that understands the missing tail
(`docs/internals/sorting.md:8-25`, `collector.rs:1114-1175`). The
fixed gates (`sort_field_page2`, `sort_two_key_page2`,
`sort_mixed_page2`) pin specific cases; this test generates seeded
random (keys × directions × filters) and checks BOTH the first page
and the cursor-resumed second page against DuckDB ``ORDER BY …
NULLS LAST … OFFSET`` — including cursors that sit inside a nullable
key's missing tail.
"""

from __future__ import annotations

import random

import duckdb
import pytest

import os

_SF = os.environ.get("QWS_TEST_SF_DIR", "/root/testdata/sf0.001")
EVENTS = f"{_SF}/events.parquet"

# engine-side derived nullable columns and their SQL mirrors
_DERIVED_SQL = {
    "vn": "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END",
    "un": "CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END",
}
SORTABLE = ["user_id", "value", "vn", "un"]
TYPES = ["signup", "click", "purchase", "error", "view"]


@pytest.fixture(scope="module")
def searcher(spark, sf_dir, tmp_path_factory):
    from pyspark.sql import functions as F

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    idx = str(tmp_path_factory.mktemp("sort_diff_idx"))
    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn(
            "vn",
            F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
        )
        .withColumn(
            "un",
            F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                F.col("user_id")
            ),
        )
    )
    cfg = IndexConfig(
        fields=[FieldConfig("event_type", tokenizer="raw")],
        doc_key="event_id",
        num_partitions=4,
        stored_columns=("user_id", "value", "vn", "un"),
    )
    build_index(spark, df, idx, cfg)
    return IndexSearcher(spark, idx)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    derived = ", ".join(f"{sql} AS {name}" for name, sql in _DERIVED_SQL.items())
    c.execute(
        f"CREATE VIEW events AS SELECT *, {derived} FROM read_parquet('{EVENTS}')"
    )
    return c


def _rows(df, nkeys):
    cols = ["doc_key", "sort_value"] + (["sort_value2"] if nkeys == 2 else [])
    return [tuple(r[c] for c in cols) for r in df.collect()]


def _sql_rows(con, specs, where, k, offset):
    order = ", ".join(
        f"{f} {'DESC' if d else 'ASC'} NULLS LAST" for f, d in specs
    )
    tie = "DESC" if specs[0][1] else "ASC"
    sel = ", ".join(["event_id"] + [f for f, _ in specs])
    got = con.execute(
        f"""SELECT {sel} FROM events WHERE {where}
            ORDER BY {order}, event_id {tie} LIMIT {k} OFFSET {offset}"""
    ).fetchall()
    return [tuple(r) for r in got]


def test_random_sorts_and_cursors_match_duckdb(searcher, con):
    from quickwit_spark.query.ast import MatchAll, Term

    rng = random.Random(31337)
    k = 10
    failures = []
    for i in range(16):
        nkeys = rng.randint(1, 2)
        specs = []
        pool = SORTABLE[:]
        for _ in range(nkeys):
            f = rng.choice(pool)
            pool.remove(f)
            specs.append((f, rng.random() < 0.5))
        if rng.random() < 0.6:
            t = rng.choice(TYPES)
            ast, where = Term("event_type", t), f"event_type = '{t}'"
        else:
            ast, where = MatchAll(), "TRUE"

        page1 = _rows(
            searcher.sort_by_field(ast, specs, k=k, tie_by_key=True), nkeys
        )
        want1 = _sql_rows(con, specs, where, k, 0)
        if page1 != want1:
            failures.append((i, specs, where, "page1", page1[:3], want1[:3]))
            continue
        if len(page1) < k:
            continue
        last = page1[-1]
        cursor = tuple(last[1:]) + (last[0],)  # (sort values..., doc_key)
        page2 = _rows(
            searcher.sort_by_field(
                ast, specs, k=k, tie_by_key=True, search_after=cursor
            ),
            nkeys,
        )
        want2 = _sql_rows(con, specs, where, k, k)
        if page2 != want2:
            failures.append((i, specs, where, "page2", page2[:3], want2[:3]))
    assert not failures, failures[:2]


def test_cursor_inside_missing_tail(searcher, con):
    """A search_after cursor whose sort value is None sits in the key's
    missing tail: only other missing rows may follow, ordered by the
    tie key — the random pages above rarely reach the tail, so pin it."""
    from quickwit_spark.query.ast import MatchAll

    # a doc_key in the middle of vn's null tail (vn IS NULL, asc tie)
    keys = [
        r[0]
        for r in con.execute(
            "SELECT event_id FROM events WHERE vn IS NULL ORDER BY event_id"
        ).fetchall()
    ]
    assert len(keys) >= 5
    mid = keys[len(keys) // 2]
    for desc in (False, True):
        got = _rows(
            searcher.sort_by_field(
                MatchAll(), [("vn", desc)], k=8, tie_by_key=True,
                search_after=(None, mid),
            ),
            1,
        )
        tie = "DESC" if desc else "ASC"
        cmp = "<" if desc else ">"
        want = [
            tuple(r)
            for r in con.execute(
                f"""SELECT event_id, vn FROM events
                    WHERE vn IS NULL AND event_id {cmp} {mid}
                    ORDER BY event_id {tie} LIMIT 8"""
            ).fetchall()
        ]
        assert got == want, (desc, got[:3], want[:3])
