"""Simulate the driver's correctness gate locally.

Runs every `__spark_entry__.queries()` entry at the given sf_dir and
compares row-count, column names/dtypes, and order-insensitive values
against the matching `oracle_sql()` run in DuckDB with the parquet
tables registered as views. Usage:

    python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append(round(v, 6))
            elif hasattr(v, "isoformat"):
                out.append(v.isoformat())
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from quickwit_spark.session import get_spark

    spark = get_spark("entry_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        except duckdb.Error:
            pass

    qs = entrymod.queries()
    only = set(sys.argv[2:])
    if only:  # optional: check just the named entries
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(got)} (no oracle — rows-only)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {e}")
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        else:
            g, e = normalize(got), normalize(exp)
            if g != e:
                diff = [
                    (a, b) for a, b in zip(g, e) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name}: rows={len(got)}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
