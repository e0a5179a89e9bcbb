"""Randomized dynamic-JSON dot-path differential vs DuckDB.

The reference's default mode indexes unmapped JSON subtrees under
their dot paths (`doc_mapping.rs:26-47`) — the r2 verdict called this
"the reference's bread and butter". The fixed tests pin known shapes;
here a seeded generator emits 200 nested JSON docs with randomly
absent subtrees, both engines read the SAME jsonl file, and random
dot-path queries — typed terms, text terms, array membership, numeric
ranges, exists on leaves and intermediate objects, bool mixes — must
count identically to DuckDB struct/list SQL.
"""

from __future__ import annotations

import json
import random

import duckdb
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
LANGS = ["en", "de", "fr"]


def _make_corpus(path: str, n: int = 200, seed: int = 13):
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(n):
            doc: dict = {"doc_id": i}
            if rng.random() < 0.9:
                user: dict = {"id": rng.randint(0, 40)}
                if rng.random() < 0.8:
                    user["name"] = rng.choice(WORDS)
                if rng.random() < 0.6:
                    user["tags"] = [
                        rng.choice(WORDS) for _ in range(rng.randint(1, 3))
                    ]
                doc["user"] = user
            if rng.random() < 0.7:
                doc["metrics"] = {"value": round(rng.uniform(0, 100), 3)}
            if rng.random() < 0.85:
                doc["msg"] = " ".join(
                    rng.choice(WORDS) for _ in range(rng.randint(1, 6))
                )
            if rng.random() < 0.5:
                doc["lang"] = rng.choice(LANGS)
            f.write(json.dumps(doc) + "\n")


@pytest.fixture(scope="module")
def dyn(spark, tmp_path_factory):
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.search.engine import IndexSearcher
    from quickwit_spark.sources.dynamic import (
        dynamic_index_config,
        flatten_dynamic,
    )

    base = tmp_path_factory.mktemp("dyn_diff")
    src = str(base / "docs.jsonl")
    _make_corpus(src)
    df = spark.read.json(src)
    flat, fields = flatten_dynamic(df, exclude=("doc_id",))
    cfg = dynamic_index_config(fields, doc_key="doc_id", num_partitions=2)
    idx = str(base / "idx")
    build_index(spark, flat, idx, cfg)
    return IndexSearcher(spark, idx), src


def _queries(rng):
    from quickwit_spark.query.ast import Bool, Exists, Range, Term

    w = rng.choice(WORDS)
    uid = rng.randint(0, 40)
    lo = rng.randint(0, 60)
    picks = [
        (Term("user.name", w), f"u.user.name = '{w}'"),
        (Term("user.id", str(uid)), f"u.user.id = {uid}"),
        (
            Term("user.tags", w),
            f"u.user.tags IS NOT NULL AND list_contains(u.user.tags, '{w}')",
        ),
        (
            Term("msg", w),
            f"u.msg IS NOT NULL AND list_contains(string_split(u.msg, ' '), '{w}')",
        ),
        (Term("lang", rng.choice(LANGS)), None),  # filled below
        (Exists("user.name"), "u.user.name IS NOT NULL"),
        (Exists("metrics.value"), "u.metrics.value IS NOT NULL"),
        (
            Exists("user"),
            "(u.user.id IS NOT NULL OR u.user.name IS NOT NULL"
            " OR u.user.tags IS NOT NULL)",
        ),
        (
            Range("metrics.value", gte=lo, lt=lo + 30),
            f"u.metrics.value >= {lo} AND u.metrics.value < {lo + 30}",
        ),
        (
            Range("user.id", gt=uid),
            f"u.user.id > {uid}",
        ),
    ]
    lang = picks[4][0].value
    picks[4] = (picks[4][0], f"u.lang = '{lang}'")
    q1, p1 = rng.choice(picks)
    # Range is must/filter-position-only (reference restriction) — it
    # cannot sit under must_not
    q2, p2 = rng.choice([(q, p) for q, p in picks if not isinstance(q, Range)])
    combos = [
        (q1, p1),
        (
            Bool(must=[q1], must_not=[q2]),
            f"({p1}) AND NOT COALESCE({p2}, FALSE)",
        ),
    ]
    return combos


def test_dynamic_dotpath_counts_match_duckdb(dyn):
    searcher, src = dyn
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW u AS SELECT * FROM read_json_auto('{src}')"
    )
    rng = random.Random(2026)
    mismatches = []
    for i in range(14):
        for ast, pred in _queries(rng):
            want = con.execute(
                f"SELECT COUNT(*) FROM u WHERE COALESCE({pred}, FALSE)"
            ).fetchone()[0]
            got = searcher.count(ast)
            if got != want:
                mismatches.append((i, ast, got, want))
        if mismatches:
            break
    assert not mismatches, mismatches[:3]
