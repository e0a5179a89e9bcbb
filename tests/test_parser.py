"""Query-string parser (reference `docs/reference/query-language.md`)."""

import pytest

from quickwit_spark.query.ast import (
    Bool,
    Exists,
    FullText,
    MatchAll,
    Phrase,
    Range,
    TermSet,
    Wildcard,
)
from quickwit_spark.query.parser import parse_query

F2 = ["text", "lang"]


def ft(field, text, op="and", fallback=True):
    # parser output for unquoted literals carries phrase_fallback
    # (reference PhraseFallbackToIntersection, user_input_query.rs:251)
    return FullText(field=field, text=text, operator=op, phrase_fallback=fallback)


def test_field_scoped_group():
    assert parse_query("text:(spark OR join)", F2) == Bool(
        should=[ft("text", "spark"), ft("text", "join")]
    )
    got = parse_query("lang:en AND text:(a b)", F2)
    assert got == Bool(
        must=[ft("lang", "en"), Bool(must=[ft("text", "a"), ft("text", "b")])]
    )


def test_nested_field_group_keeps_scope():
    got = parse_query("text:(a AND (b OR c))", F2)
    assert got == Bool(
        must=[ft("text", "a"), Bool(should=[ft("text", "b"), ft("text", "c")])]
    )


def test_unfielded_group_uses_default_fields():
    got = parse_query("(spark) AND lang:en", F2)
    assert got == Bool(
        must=[
            Bool(should=[ft("text", "spark"), ft("lang", "spark")]),
            ft("lang", "en"),
        ]
    )


def test_basics_still_parse():
    assert parse_query("*", F2) == MatchAll()
    assert parse_query("lang:IN [en de]", F2) == TermSet("lang", ("en", "de"))
    r = parse_query("warc_ts:[2024-01-01 TO *]", F2)
    assert isinstance(r, Range) and r.gte == "2024-01-01"
    w = parse_query("text:qu*", F2)
    assert w == Wildcard("text", "qu*")
    neg = parse_query("-text:slow", F2)
    assert neg == Bool(must=[MatchAll()], must_not=[ft("text", "slow")])


def test_phrase_in_field_group():
    got = parse_query('text:("a b" OR c)', F2, position_fields={"text"})
    assert got == Bool(should=[Phrase(field="text", text="a b"), ft("text", "c")])


def test_exists_clause():
    # doc "Exists `field:*`": bare star on a field is presence, not a
    # wildcard expansion; unfielded `*` stays MatchAll
    assert parse_query("lang:*", F2) == Exists(field="lang")
    assert parse_query("* AND lang:en", F2) == Bool(
        must=[MatchAll(), ft("lang", "en")]
    )


def test_rfc3339_range_bounds():
    # doc "Datetime": rfc3339 bounds contain ':' — they must lex as one
    # value (reference grammar allows unescaped ':' in range bounds)
    r = parse_query("warc_ts:[2021-04-13T22:45:41Z TO *]", F2)
    assert r == Range(field="warc_ts", gte="2021-04-13T22:45:41Z")
    r = parse_query(
        "warc_ts:{2024-01-01T00:00:00Z TO 2024-01-02T12:30:00Z]", F2
    )
    assert r.gt == "2024-01-01T00:00:00Z" and r.lte == "2024-01-02T12:30:00Z"
    # IPv6 bounds (doc "IP addresses": range queries instead of CIDR)
    r = parse_query("ip:[::1 TO ::ffff]", F2)
    assert r.gte == "::1" and r.lte == "::ffff"


def test_escaped_specials():
    # doc "Escaping Special Characters"
    assert parse_query(r"text:a\:b", F2) == ft("text", "a:b")
    assert parse_query(r"k8s\.component\.name:quickwit", F2) == ft(
        "k8s.component.name", "quickwit"
    )
    # escaped star is a literal, not a wildcard
    assert parse_query(r"text:lit\*eral", F2) == ft("text", "lit*eral")
    # unescaped value colons after the first split colon join by adjacency
    assert parse_query("warc_ts:2021-04-13T22:45:41Z", F2) == ft(
        "warc_ts", "2021-04-13T22:45:41Z"
    )


def test_termset_with_datetime_values():
    got = parse_query("warc_ts:IN [2021-04-13T22:45:41Z x]", F2)
    assert got == TermSet("warc_ts", ("2021-04-13T22:45:41Z", "x"))


def test_comparison_shorthand_ranges():
    """`field:<b` / `>b` / `<=b` / `>=b` — the reference's half-open
    range shorthand (docs/reference/query-language.md §Half-Open
    bounds), incl. rfc3339 values with colon joins."""
    from quickwit_spark.query.ast import Range

    assert parse_query("n_chars:>=5", F2) == Range("n_chars", gte="5")
    assert parse_query("n_chars:>5", F2) == Range("n_chars", gt="5")
    assert parse_query("warc_ts:<=2024-01-01", F2) == Range(
        "warc_ts", lte="2024-01-01"
    )
    assert parse_query("warc_ts:<2021-04-13T22:45:41Z", F2) == Range(
        "warc_ts", lt="2021-04-13T22:45:41Z"
    )
    with pytest.raises(ValueError, match="missing bound"):
        parse_query("n_chars:<", F2)
