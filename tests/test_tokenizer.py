"""Tokenizer parity goldens (FIXTURES.md §4).

Expected values follow tantivy's `default` analyzer semantics
(SimpleTokenizer + RemoveLong(255) + LowerCaser, reference registration
at `quickwit-query/src/tokenizers/mod.rs:56-60`) and the reference's own
raw-tokenizer test shapes (`tokenizers/mod.rs:140-159`).
"""

import pandas as pd
import pytest

from quickwit_spark.analysis import get_tokenizer, tokenize_series

default = get_tokenizer("default")


@pytest.mark.parametrize(
    "text,expected",
    [
        ("Hello, happy tax payer!", ["hello", "happy", "tax", "payer"]),
        # default tokenizer does NOT split camelCase or fold accents
        ("PigCaféFactory2", ["pigcaféfactory2"]),
        ("snake_case splits_on_underscore", ["snake", "case", "splits", "on", "underscore"]),
        ("a-b--c", ["a", "b", "c"]),
        ("123 45.6 7e8", ["123", "45", "6", "7e8"]),
        ("", []),
        ("!!!", []),
        ("ALLCAPS", ["allcaps"]),
        ("naïve Grüße", ["naïve", "grüße"]),  # lowercase, no ascii folding
        ("日本語 text", ["日本語", "text"]),
        ("x" + "·" + "y", ["x", "y"]),  # U+00B7 middle dot is not alphanumeric
    ],
)
def test_default_tokenizer_goldens(text, expected):
    assert default(text) == expected


def test_remove_long_before_lowercase():
    # 255-byte token kept, 256-byte token dropped (measured pre-lowercase)
    keep = "A" * 255
    drop = "B" * 256
    assert default(f"{keep} {drop} ok") == ["a" * 255, "ok"]
    # multi-byte chars: 128 × 'É' (2 bytes) = 256 bytes → dropped
    assert default("É" * 128 + " ok") == ["ok"]


def test_whitespace_and_raw():
    ws = get_tokenizer("whitespace")
    assert ws("Foo  Bar\tbaz") == ["Foo", "Bar", "baz"]  # no lowercase
    raw = get_tokenizer("raw")
    haiku = "white sandy beach\na strong wind is coming\nsand in my face"
    assert raw(haiku) == [haiku]  # single token
    assert raw("x" * 256) == []  # dropped
    rl = get_tokenizer("raw_lowercase")
    assert rl("MiXeD Case") == ["mixed case"]


def test_ascii_space_fast_path_matches_default_on_corpus_charset():
    fast = get_tokenizer("ascii_space")
    texts = ["the fast key order", "a  b   c", "spark group query row"]
    for t in texts:
        assert fast(t) == default(t)


def test_tokenize_series_shape():
    s = pd.Series(["one two", None, "three"])
    out = tokenize_series(s)
    assert list(out) == [["one", "two"], [], ["three"]]


def test_unknown_tokenizer_raises():
    with pytest.raises(NotImplementedError):
        get_tokenizer("en_stem_v99")


# ---------------------------------------------------------------------------
# Arrow fast-path parity (indexing hot path vs pure-Python reference)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from quickwit_spark.analysis.tokenizer import tokenize_flat_arrow


def _flatten_python(texts, tokenizer="default"):
    toks, idx = [], []
    fn = get_tokenizer(tokenizer)
    for i, t in enumerate(texts):
        for tok in fn(t or ""):
            toks.append(tok)
            idx.append(i)
    return toks, idx


@given(
    st.lists(
        st.text(
            # BMP only: above it, utf8proc/RE2 (Unicode 15) and CPython
            # 3.11 (Unicode 14) disagree on newly-assigned codepoints
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0xFFFF
            ),
            max_size=80,
        ),
        max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_arrow_default_matches_python(texts):
    flat, doc_idx = tokenize_flat_arrow(pd.Series(texts, dtype=object), "default")
    got = ([t.as_py() for t in flat] if not isinstance(flat, list) else flat)
    exp_toks, exp_idx = _flatten_python(texts, "default")
    assert list(got) == exp_toks
    assert list(doc_idx) == exp_idx


def test_arrow_default_long_token_and_nulls():
    texts = pd.Series(["A" * 255 + " " + "B" * 256 + " ok", None, "É" * 128])
    flat, doc_idx = tokenize_flat_arrow(texts, "default")
    assert [t.as_py() for t in flat] == ["a" * 255, "ok"]
    assert list(doc_idx) == [0, 0]


def test_arrow_whitespace_matches_python():
    texts = pd.Series(["Foo  Bar\tbaz", "", "x Y"])
    flat, doc_idx = tokenize_flat_arrow(texts, "whitespace")
    assert [t.as_py() for t in flat] == ["Foo", "Bar", "baz", "x", "Y"]
    assert list(doc_idx) == [0, 0, 0, 2, 2]


def test_arrow_fallback_raw():
    texts = pd.Series(["One Two", "x" * 256])
    flat, doc_idx = tokenize_flat_arrow(texts, "raw")
    assert list(flat) == ["One Two"]
    assert list(doc_idx) == [0]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0x01, max_codepoint=0x7F),
            max_size=300,
        ),
        max_size=30,
    )
)
@settings(max_examples=300, deadline=None)
def test_arrow_ascii_fast_path_matches_python(texts):
    flat, doc_idx = tokenize_flat_arrow(pd.Series(texts, dtype=object), "default")
    got = [t.as_py() for t in flat]
    exp_toks, exp_idx = _flatten_python(texts, "default")
    assert got == exp_toks
    assert list(doc_idx) == exp_idx


def test_chinese_compatible():
    tok = get_tokenizer("chinese_compatible")
    assert tok("你好world 世界") == ["你", "好", "world", "世", "界"]
    assert tok("Hello你好!") == ["hello", "你", "好"]
    assert tok("abc123") == ["abc123"]
    assert tok("") == []
