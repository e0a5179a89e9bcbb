"""Distributed BPE training vs a pure-Python golden implementation."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from quickwit_spark.datapipe.bpe import (
    bpe_encode,
    train_bpe,
    vocab,
    word_histogram,
)
from quickwit_spark.datapipe.textstats import BPE_PRETOKEN_RE


# ------------------------------------------------------------- golden
def golden_pretokenize(text: str) -> list[str]:
    return [m for m in re.findall(BPE_PRETOKEN_RE, text) if m]


def golden_train(texts: list[str], num_merges: int, min_pair_count: int = 2):
    """Canonical driver-local BPE on a word histogram; ties break
    lexicographically on the pair, matching train_bpe."""
    hist = Counter()
    for t in texts:
        hist.update(golden_pretokenize(t))
    words = {w: list(w) for w in hist}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += hist[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words, hist


def golden_encode(text: str, words: dict) -> list[str]:
    out = []
    for w in golden_pretokenize(text):
        out.extend(words.get(w, list(w)))
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker they come, the quicker they go",
    "lower lowest slower slowest in the lower town",
    "new newer newest renewal of the new deal",
    "it's the dog's day: 1234 dogs, 99 foxes!",
    "wide widely widen widening the widest web",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_word_histogram_matches_golden(docs):
    got = {
        r["word"]: r["n"] for r in word_histogram(docs).collect()
    }
    exp = Counter()
    for t in TEXTS:
        exp.update(golden_pretokenize(t))
    assert got == dict(exp)


def test_train_matches_golden_merges_and_pieces(docs):
    hist = word_histogram(docs)
    merges, pieces = train_bpe(hist, num_merges=40, checkpoint_every=8)
    g_merges, g_words, _ = golden_train(TEXTS, 40)
    assert merges == g_merges
    assert len(merges) > 10  # the corpus genuinely trains
    got = {r["word"]: list(r["pieces"]) for r in pieces.collect()}
    assert got == g_words


def test_encode_matches_golden_and_roundtrips(docs, spark):
    hist = word_histogram(docs)
    merges, pieces = train_bpe(hist, num_merges=25)
    enc = bpe_encode(docs, pieces, key="doc_id", text_col="text")
    rows = {r["doc_id"]: list(r["tokens"]) for r in enc.collect()}
    _, g_words, _ = golden_train(TEXTS, 25)
    for i, t in enumerate(TEXTS):
        assert rows[i] == golden_encode(t, g_words)
        # lossless: concatenating tokens reproduces the pre-token stream
        assert "".join(rows[i]) == "".join(golden_pretokenize(t))
    # OOV text falls back to characters for unseen words
    oov = spark.createDataFrame([(99, "zzyzx the")], ["doc_id", "text"])
    r = bpe_encode(oov, pieces).collect()[0]
    assert "".join(r["tokens"]) == "zzyzx the"
    assert r["n_tokens"] == len(list("zzyzx")) + len(
        golden_encode(" the", g_words)
    )


def test_empty_and_zero_token_docs(docs, spark):
    hist = word_histogram(docs)
    _, pieces = train_bpe(hist, num_merges=5)
    weird = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bpe_encode(weird, pieces).collect()}
    assert rows[1]["n_tokens"] == 0 and list(rows[1]["tokens"]) == []
    assert rows[3]["n_tokens"] == 0
    # "   " pre-tokenizes to nothing word-like? GPT-2 regex: ' ?[^\sA-Za-z0-9]+'
    # does not match pure whitespace, so zero tokens
    assert rows[2]["n_tokens"] == 0


def test_vocab_is_dense_and_ordered(docs):
    hist = word_histogram(docs)
    merges, pieces = train_bpe(hist, num_merges=8)
    v = vocab(merges, pieces).collect()
    ids = sorted(r["token_id"] for r in v)
    assert ids == list(range(len(v)))
    # token strings are unique (dup merge-concats keep their first id)
    assert len({r["token"] for r in v}) == len(v)
    by_id = {r["token_id"]: r["token"] for r in v}
    chars = sorted({c for w in {r["word"] for r in pieces.collect()} for c in w})
    expect, seen = list(chars), set(chars)
    for a, b in merges:
        if a + b not in seen:
            seen.add(a + b)
            expect.append(a + b)
    assert [by_id[i] for i in range(len(v))] == expect


def test_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([(0, "ab ab cd")], ["doc_id", "text"])
    hist = word_histogram(docs)
    merges, _ = train_bpe(hist, num_merges=10, min_pair_count=2)
    # only ('a','b') reaches count 2; ('c','d') is 1 → stop
    assert merges == [("a", "b")]


def test_plan_stays_jvm_side(docs):
    """No Python UDF anywhere in the training hot path."""
    hist = word_histogram(docs)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    work = hist.select(
        "word", "n", F.split(F.col("word"), "").alias("syms")
    )
    from quickwit_spark.datapipe.bpe import _adjacent_pairs

    pairs = work.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
    plan2 = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2
