"""Query-string parser (reference `docs/reference/query-language.md`)."""

import pytest

from quickwit_spark.query.ast import (
    Bool,
    FullText,
    MatchAll,
    Phrase,
    Range,
    TermSet,
    Wildcard,
)
from quickwit_spark.query.parser import parse_query

F2 = ["text", "lang"]


def ft(field, text, op="and"):
    return FullText(field=field, text=text, operator=op)


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
