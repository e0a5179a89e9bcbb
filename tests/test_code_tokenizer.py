"""source_code / multilang / custom (ngram, regex) analyzers.

Code-tokenizer expectations mirror the reference's own test vectors
(`quickwit-query/src/tokenizers/code_tokenizer.rs:425-800`,
`tokenizers/mod.rs:160-175`).
"""

import pytest

from quickwit_spark.analysis.code_tokenizer import code_tokens
from quickwit_spark.analysis.tokenizer import (
    get_tokenizer,
    make_ngram_tokenizer,
    make_regex_tokenizer,
    register_tokenizer,
)

PLAIN_VECTORS = [
    ("PigCaféFactory2", ["Pig", "Café", "Factory", "2"]),
    ("PIG_CAFE_FACTORY", ["PIG", "CAFE", "FACTORY"]),
    ("TPigCafeFactory", ["T", "Pig", "Cafe", "Factory"]),
    ("PIG# Cafe@FACTORY", ["PIG", "Cafe", "FACTORY"]),
    ("RPCResult", ["RPC", "Result"]),
]

HEX_VECTORS = [
    (
        "fa63bbbf-0fb9-5ec8-ae63-561dc0f444aa",
        ["fa63bbbf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    (
        "FA63BBBF-0FB9-5EC8-AE63-561DC0F444AA",
        ["FA63BBBF", "0FB9", "5EC8", "AE63", "561DC0F444AA"],
    ),
    (
        "fa63bbbf-0fb9-5ec8-ae63-561dc0f444a",
        ["fa63bbbf", "0fb9", "5ec8", "ae63", "561", "dc", "0", "f", "444", "a"],
    ),
    (
        "fa63bbbf-0fb9-5ec8-ae6-561dc0f444aa",
        ["fa63bbbf", "0fb9", "5ec8", "ae", "6", "561dc0f444aa"],
    ),
    (
        "Fa63bbbf-0fb9-5ec8-ae63-561dc0f444aa",
        ["Fa", "63", "bbbf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    (
        "fa63Bbbf-0fb9-5ec8-ae63-561dc0f444aa",
        ["fa", "63", "Bbbf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    (
        "fa63bbBf-0fb9-5ec8-ae63-561dc0f444aa",
        ["fa", "63", "bb", "Bf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    (
        "fA63BBBF-0FB9-5EC8-AE63-561DC0F444AA",
        ["f", "A", "63", "BBBF", "0FB9", "5EC8", "AE63", "561DC0F444AA"],
    ),
    (
        "fa63bgbf-0fb9-5ec8-ae63-561dc0f444aa",
        ["fa", "63", "bgbf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    (
        "fa6③bbbf-0fb9-5ec8-ae63-561dc0f444aa",
        ["fa", "6③", "bbbf", "0fb9", "5ec8", "ae63", "561dc0f444aa"],
    ),
    ("301ms", ["301", "ms"]),
    ("301cd", ["301", "cd"]),
    ("30ms", ["30", "ms"]),
    ("30cd", ["30cd"]),
    ("ABCDef", ["ABC", "Def"]),
]


@pytest.mark.parametrize("text,want", PLAIN_VECTORS)
def test_code_tokenizer_plain(text, want):
    assert code_tokens(text, enable_hex=False) == want


@pytest.mark.parametrize("text,want", HEX_VECTORS)
def test_code_tokenizer_hex(text, want):
    assert code_tokens(text, enable_hex=True) == want


def test_hex_mode_leaves_plain_identifiers_alone():
    for text, want in PLAIN_VECTORS:
        assert code_tokens(text, enable_hex=True) == want


def test_source_code_default_analyzer_lowercases_and_folds():
    # reference mod.rs:160-175: "PigCaféFactory2" → pig cafe factory 2
    tok = get_tokenizer("source_code_default")
    assert tok("PigCaféFactory2") == ["pig", "cafe", "factory", "2"]


def test_source_code_with_hex_analyzer():
    tok = get_tokenizer("source_code_with_hex")
    # hex engages only at token start (post-delimiter), like the reference
    assert tok("Request 30cd FA63") == ["request", "30cd", "fa63"]
    assert tok("Request30cd") == ["request", "30", "cd"]


def test_multilang_prefixes_and_detection():
    tok = get_tokenizer("multilang_default")
    assert tok("ENG:Hello World") == ["hello", "world"]
    assert tok("") == []
    # Korean (space-delimited) keeps word runs
    assert tok("안녕하세요 세계") == ["안녕하세요", "세계"]
    # Chinese segments per ideograph
    assert tok("CMN:你好世界") == ["你", "好", "世", "界"]
    # Japanese kana also per character
    assert tok("こんにちは") == ["こ", "ん", "に", "ち", "は"]
    # latin text without prefix → simple tokens
    assert tok("Spark SQL 3") == ["spark", "sql", "3"]


def test_ngram_tokenizer():
    tok = make_ngram_tokenizer(2, 3)
    assert tok("abcd") == ["ab", "abc", "bc", "bcd", "cd"]
    pref = make_ngram_tokenizer(2, 3, prefix_only=True)
    assert pref("abcd") == ["ab", "abc"]
    with pytest.raises(ValueError):
        make_ngram_tokenizer(0, 2)


def test_regex_tokenizer_and_registration():
    tok = make_regex_tokenizer(r"[A-Za-z]+")
    assert tok("a1-B2_c3") == ["a", "b", "c"]
    register_tokenizer("letters_only", tok)
    assert get_tokenizer("letters_only")("Xy 9z") == ["xy", "z"]


def test_custom_tokenizer_indexes_end_to_end(spark):
    # config-defined analyzer (reference: doc-mapping `tokenizers`
    # entries) — the spec is serialized in IndexConfig so executor
    # processes and later sessions rebuild the same analyzer
    import tempfile

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    df = spark.createDataFrame(
        [
            (0, "parseHttpRequest fa63bbbf"),
            (1, "writeJsonResponse deadbeef"),
            (2, "HttpServer startup"),
        ],
        ["doc_id", "body"],
    )
    idx = tempfile.mkdtemp(prefix="qws_code_")
    cfg = IndexConfig(
        fields=[FieldConfig("body", tokenizer="src")],
        doc_key="doc_id",
        num_partitions=1,
        tokenizers={
            "src": {
                "type": "source_code",
                "hex": True,
                "filters": ["remove_long", "lower_caser", "ascii_folding"],
            }
        },
    )
    build_index(spark, df, idx, cfg)
    s = IndexSearcher(spark, idx)
    # camel fragment matches; hex id kept whole
    assert s.count("body:http") == 2
    assert s.count("body:fa63bbbf") == 1
    assert s.count("body:fa63") == 0


def test_config_ngram_tokenizer_end_to_end(spark):
    import tempfile

    from quickwit_spark.index.builder import FieldConfig, IndexConfig, build_index
    from quickwit_spark.search.engine import IndexSearcher

    df = spark.createDataFrame(
        [(0, "sparkle"), (1, "parking"), (2, "stream")], ["doc_id", "body"]
    )
    idx = tempfile.mkdtemp(prefix="qws_ngram_")
    cfg = IndexConfig(
        fields=[FieldConfig("body", tokenizer="tri")],
        doc_key="doc_id",
        num_partitions=1,
        tokenizers={"tri": {"type": "ngram", "min_gram": 3, "max_gram": 3}},
    )
    build_index(spark, df, idx, cfg)
    s = IndexSearcher(spark, idx)
    assert s.count("body:par") == 2  # sPARkle + PARking
    assert s.count("body:ing") == 1
