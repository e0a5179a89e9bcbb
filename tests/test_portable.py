"""Portable (engine-reproducible) hash modes used by the oracle gate.

The portable pipeline must (a) match a plain-Python reimplementation of
its documented arithmetic, and (b) keep the LSH semantics of the fast
xxhash64 path (banding completeness / candidate containment).
"""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.portable import P31, WEIGHTS, perm_constants, portable_hash
from quickwit_spark.datapipe.dedup import (
    minhash_signatures,
    simhash,
    simhash_near_pairs,
)


def _ph_py(s: str) -> int:
    return sum((ord(c) % 128) * WEIGHTS[i % 8] for i, c in enumerate(s))


def test_portable_hash_matches_python(spark):
    strs = ["a", "hello world", "spark join stream", "0 1 2 3 4 5", "z" * 40,
            "café naïve ünïcode", "日本語テスト"]
    df = spark.createDataFrame([(s,) for s in strs], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_hash(F.col("s")).alias("h")).collect()
    }
    for s in strs:
        assert got[s] == _ph_py(s), s


def test_portable_minhash_matches_python(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sigs = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(df, "doc_id", num_perm=8, portable=True).collect()
    }
    consts = perm_constants(8)
    for doc_id, text in texts:
        toks = text.split()
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        for i, (a, b) in enumerate(consts):
            expect = min((_ph_py(s) % P31 * a + b) % P31 for s in sh)
            assert sigs[doc_id][i] == expect


def test_portable_simhash_banding_is_exhaustive(spark):
    # bands > max_hamming ⇒ banded pair set == brute-force Hamming pairs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base) for i in range(3)] + [
        (10, base.replace("gamma", "gxmma")),
        (11, "totally different words here nothing shared at all friend"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = simhash(df, "doc_id", portable=True)
    fps = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    assert all(0 <= v < (1 << 62) for v in fps.values())

    max_h = 8
    banded = {
        (r["key_a"], r["key_b"]): r["hamming"]
        for r in simhash_near_pairs(
            fp, "doc_id", max_hamming=max_h, bands=max_h + 1, bits=62
        ).collect()
    }
    keys = sorted(fps)
    brute = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for ai, a in enumerate(keys)
        for b in keys[ai + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= max_h
    }
    assert banded == brute
    assert (0, 1) in banded and banded[(0, 1)] == 0  # identical docs


def test_perm_constants_deterministic_and_bounded():
    c1, c2 = perm_constants(16), perm_constants(16)
    assert c1 == c2
    assert len({ab for ab in c1}) == 16
    for a, b in c1:
        assert 1 <= a <= 10**9 and 0 <= b < P31
