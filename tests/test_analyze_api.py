"""`/analyze` and `/parse-query` endpoint analogs.

Reference: `quickwit-serve/src/index_api/rest_handler.rs:129-220`
(AnalyzeRequest = flattened TokenizerConfig + text; ParseQueryRequest
= query + search_field → QueryAst serde JSON), tokenizer semantics in
`quickwit-doc-mapper/src/doc_mapper/tokenizer_entry.rs:44-145`.
Neither endpoint touches an index, so no SparkSession is needed.
"""

import pytest

from quickwit_spark.analysis.analyze import analyze_text
from quickwit_spark.api import QuickwitSpark
from quickwit_spark.query.reference_json import parse_query_reference


def _facade() -> QuickwitSpark:
    # analyze/parse-query are schema-less: no spark, no index root used
    return QuickwitSpark.__new__(QuickwitSpark)


# ---------------- analyze ----------------


def test_analyze_simple_tokens_and_offsets():
    toks = analyze_text("Hello, World!", {"type": "simple"})
    assert [t["text"] for t in toks] == ["Hello", "World"]
    assert [(t["offset_from"], t["offset_to"]) for t in toks] == [(0, 5), (7, 12)]
    assert [t["position"] for t in toks] == [0, 1]
    assert all(t["position_length"] == 1 for t in toks)


def test_analyze_byte_offsets_multibyte():
    # é is 2 utf-8 bytes: offsets are BYTE offsets like tantivy's
    toks = analyze_text("é b", {"type": "simple"})
    assert toks[0]["offset_to"] == 2
    assert toks[1] == {
        "offset_from": 3,
        "offset_to": 4,
        "position": 1,
        "position_length": 1,
        "text": "b",
    }


def test_analyze_filters_order_and_semantics():
    toks = analyze_text(
        "Crème BRÛLÉE", {"type": "simple", "filters": ["lower_caser", "ascii_folding"]}
    )
    assert [t["text"] for t in toks] == ["creme", "brulee"]
    # no filters → raw token text (the endpoint applies ONLY the
    # configured filters; `simple` has no implicit lowercasing)
    raw = analyze_text("Crème", {"type": "simple"})
    assert raw[0]["text"] == "Crème"


def test_analyze_remove_long_is_exclusive_and_keeps_positions():
    long_tok = "a" * 255
    toks = analyze_text(
        f"{long_tok} b", {"type": "simple", "filters": ["remove_long"]}
    )
    # the 255-byte token is removed (tantivy limit is exclusive: keep <255)
    assert [t["text"] for t in toks] == ["b"]
    # the removed token still consumed position slot 0
    assert toks[0]["position"] == 1
    kept = analyze_text(
        "a" * 254 + " b", {"type": "simple", "filters": ["remove_long"]}
    )
    assert [t["text"] for t in kept] == ["a" * 254, "b"]


def test_analyze_ngram_order_positions_and_prefix_only():
    toks = analyze_text("hello", {"type": "ngram", "min_gram": 2, "max_gram": 3})
    # start-major, size-ascending; every gram at position 0 (tantivy
    # NgramTokenizer never advances positions)
    assert [t["text"] for t in toks] == ["he", "hel", "el", "ell", "ll", "llo", "lo"]
    assert all(t["position"] == 0 for t in toks)
    pfx = analyze_text(
        "hello", {"type": "ngram", "min_gram": 2, "max_gram": 3, "prefix_only": True}
    )
    assert [t["text"] for t in pfx] == ["he", "hel"]


def test_analyze_regex_and_source_code():
    toks = analyze_text("ab-12,cd", {"type": "regex", "pattern": "[a-z]+"})
    assert [t["text"] for t in toks] == ["ab", "cd"]
    code = analyze_text("snake_caseCamel", {"type": "source_code"})
    assert [t["text"] for t in code] == ["snake", "case", "Camel"]


def test_analyze_multilang_prefix_offsets_relative_to_stripped_text():
    # reference slices &text[4..] so offsets restart at 0 (multilang.rs:139)
    toks = analyze_text("KOR:일본입니다", {"type": "multilang"})
    assert toks[0]["offset_from"] == 0


def test_analyze_validation_errors():
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "nope"})
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "ngram", "min_gram": 0, "max_gram": 3})
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "ngram", "min_gram": 2})
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "regex"})
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "regex", "pattern": "("})
    with pytest.raises(ValueError):
        analyze_text("x", {"type": "simple", "filters": ["nope"]})
    with pytest.raises(ValueError):
        # deny_unknown_fields on the option structs (tokenizer_entry.rs)
        analyze_text("x", {"type": "ngram", "min_gram": 1, "max_gram": 2, "bad": 1})


def test_analyze_facade_request_shape():
    f = _facade()
    toks = f.analyze({"type": "simple", "text": "a b", "filters": []})
    assert [t["text"] for t in toks] == ["a", "b"]
    with pytest.raises(ValueError):
        f.analyze({"type": "simple"})  # missing text


# ---------------- parse-query ----------------


def test_parse_query_fulltext_default_and():
    # query_ast_from_user_text pins default_operator And (mod.rs:321-329)
    out = parse_query_reference("hello world", ["body"])
    assert out["type"] == "bool"
    texts = [c["text"] for c in out["must"]]
    assert texts == ["hello", "world"]
    for c in out["must"]:
        assert c["params"]["mode"] == {"type": "phrase_fallback_to_intersection"}
        assert c["lenient"] is False
        assert "zero_terms_query" not in c["params"]  # "none" is skipped


def test_parse_query_phrase_slop_and_prefix():
    out = parse_query_reference('t:"a b"~2')
    assert out == {
        "type": "full_text",
        "field": "t",
        "text": "a b",
        "params": {"mode": {"type": "phrase", "slop": 2}},
        "lenient": False,
    }
    # slop 0 is the serde default and omitted
    zero = parse_query_reference('t:"a b"')
    assert zero["params"]["mode"] == {"type": "phrase"}
    pfx = parse_query_reference('t:"a b"*')
    assert pfx["type"] == "phrase_prefix"
    assert pfx["phrase"] == "a b"
    assert pfx["max_expansions"] == 50  # DEFAULT_PHRASE_QUERY_MAX_EXPANSION


def test_parse_query_range_bounds_serde_shape():
    out = parse_query_reference("ts:[2021-01-01 TO 2021-02-01}")
    assert out["lower_bound"] == {"Included": "2021-01-01"}
    assert out["upper_bound"] == {"Excluded": "2021-02-01"}
    half = parse_query_reference("n:>=3")
    assert half["lower_bound"] == {"Included": "3"}
    assert half["upper_bound"] == "Unbounded"


def test_parse_query_term_set_exists_wildcard():
    ts = parse_query_reference("f:IN [b a b]")
    assert ts == {"type": "term_set", "terms_per_field": {"f": ["a", "b"]}}
    assert parse_query_reference("f:*") == {"type": "field_presence", "field": "f"}
    wc = parse_query_reference("f:wi*d")
    assert wc == {"type": "wildcard", "field": "f", "value": "wi*d", "lenient": False}
    assert parse_query_reference("*") == {"type": "match_all"}


def test_parse_query_not_unsugars_to_bare_must_not():
    out = parse_query_reference("a:x AND -b:y")
    neg = out["must"][1]
    assert neg == {
        "type": "bool",
        "must_not": [
            {
                "type": "full_text",
                "field": "b",
                "text": "y",
                "params": {"mode": {"type": "phrase_fallback_to_intersection"}},
                "lenient": False,
            }
        ],
    }


def test_parse_query_multi_default_fields_expand_to_should():
    out = parse_query_reference("hello", ["a", "b"])
    assert out["type"] == "bool"
    assert [c["field"] for c in out["should"]] == ["a", "b"]


def test_parse_query_reference_error_messages():
    with pytest.raises(ValueError, match="default search field"):
        parse_query_reference("hello")
    with pytest.raises(ValueError, match="range query without field"):
        parse_query_reference("[1 TO 2]")
    with pytest.raises(ValueError, match="multiple fields"):
        parse_query_reference("[1 TO 2]", ["a", "b"])
    with pytest.raises(ValueError, match="set query"):
        parse_query_reference("IN [a b]")


def test_parse_query_facade_validation():
    f = _facade()
    out = f.parse_query({"query": "t:x", "search_field": "a,b"})
    assert out["field"] == "t"
    with pytest.raises(ValueError):
        f.parse_query({"query": 3})
    with pytest.raises(ValueError):
        f.parse_query({"query": "x", "search_field": ["a"], "bad": 1})
