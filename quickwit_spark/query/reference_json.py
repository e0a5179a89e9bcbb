"""`POST /api/v1/parse-query` analog — user text → reference-shaped AST JSON.

The reference endpoint
(`quickwit-serve/src/index_api/rest_handler.rs:175-220`) parses the
request's `query` with the tantivy query grammar, resolves fieldless
clauses against the request's `search_field` list
(`query_ast_from_user_text(query, search_fields).parse_user_query(&[])`),
and returns the `QueryAst` in its serde form: externally tagged with
`"type"` in snake_case (`quickwit-query/src/query_ast/mod.rs:50-70`),
`Bound<JsonLiteral>` bounds as `{"Included": v}` / `{"Excluded": v}` /
`"Unbounded"`, `FullTextMode` tagged the same way
(`full_text_query.rs:171-197`), and empty bool sections omitted.

This module serializes the engine's own parsed AST (`query/parser.py`)
into that shape. Documented deltas from the reference, both about
normalization rather than semantics:

- clause grouping: the engine's parser applies OR-looser-than-AND
  precedence producing nested bools, where tantivy's grammar emits one
  flat occur-marked clause list — `a AND b OR c` serializes here as
  `bool{should:[bool{must:[a,b]}, c]}` vs the reference's flat
  `bool{must:[a,b], should:[c]}`. Same matching semantics.
- a single-quoted phrase prefix (`'a b'*`) keeps `mode: phrase` in its
  `params` instead of the reference's `bool{operator: And}` — the
  engine resolves the delimiter before the prefix flag.
"""

from __future__ import annotations

from quickwit_spark.query import ast as A
from quickwit_spark.query.parser import _lex_spans, _Parser

_SENTINEL = "\x00default\x00"


class _AllFields:
    """Membership-always set: parse-query has no schema, so every field
    is treated as position-recording (the reference endpoint likewise
    parses without a doc mapper — double-quoted literals are always
    FullTextMode::Phrase)."""

    def __contains__(self, _item) -> bool:
        return True


def parse_query_reference(
    query: str, search_fields: list[str] | None = None
) -> dict:
    """Parse `query` and return the reference's QueryAst serde JSON.

    Raises ValueError with the reference's message for fieldless
    clauses that cannot resolve (`user_input_query.rs:139-171,246`).
    """
    fields = [str(f) for f in (search_fields or [])]
    q = (query or "").strip()
    if not q or q == "*":
        return {"type": "match_all"}
    parser = _Parser(
        _lex_spans(q),
        default_fields=[_SENTINEL],
        default_operator="and",
        position_fields=_AllFields(),
    )
    node = parser.parse_expr()
    return _to_json(node, fields)


def ast_to_reference_json(node: A.QueryAst) -> dict:
    """Serialize an already-resolved engine AST (no sentinel handling)."""
    return _to_json(node, [])


def _expand(make, fields: list[str], what: str) -> dict:
    if not fields:
        raise ValueError(
            "query requires a default search field and none was supplied"
            if what == "literal"
            else f"{what} query without field is not supported"
        )
    subs = [make(f) for f in fields]
    if len(subs) == 1:
        return subs[0]
    return {"type": "bool", "should": subs}


def _full_text_params(mode: dict) -> dict:
    # zero_terms_query: "none" is the serde default and is skipped
    return {"mode": mode}


def _to_json(node: A.QueryAst, fields: list[str]) -> dict:
    if isinstance(node, A.MatchAll):
        return {"type": "match_all"}
    if isinstance(node, A.MatchNone):
        return {"type": "match_none"}
    if isinstance(node, A.Term):
        return {"type": "term", "field": node.field, "value": node.value}
    if isinstance(node, A.TermSet):
        flds = fields if node.field == _SENTINEL else [node.field]
        if not flds:
            raise ValueError("set query need to target a specific field")
        values = sorted(set(str(v) for v in node.values))
        return {
            "type": "term_set",
            "terms_per_field": {f: values for f in flds},
        }
    if isinstance(node, A.Exists):
        return {"type": "field_presence", "field": node.field}
    if isinstance(node, A.FullText):
        if node.phrase_fallback:
            mode = {"type": "phrase_fallback_to_intersection"}
        else:
            mode = {
                "type": "bool",
                "operator": "And" if node.operator == "and" else "Or",
            }
        params = _full_text_params(mode)
        if node.zero_terms_match_all:
            params["zero_terms_query"] = "all"

        def make(f):
            return {
                "type": "full_text",
                "field": f,
                "text": node.text,
                "params": params,
                "lenient": False,
            }

        if node.field == _SENTINEL:
            return _expand(make, fields, "literal")
        return make(node.field)
    if isinstance(node, A.Phrase):
        mode: dict = {"type": "phrase"}
        if node.slop:
            mode["slop"] = node.slop

        def make(f):
            return {
                "type": "full_text",
                "field": f,
                "text": node.text,
                "params": _full_text_params(mode),
                "lenient": False,
            }

        if node.field == _SENTINEL:
            return _expand(make, fields, "literal")
        return make(node.field)
    if isinstance(node, A.PhrasePrefix):

        def make(f):
            return {
                "type": "phrase_prefix",
                "field": f,
                "phrase": node.text,
                "max_expansions": node.max_expansions,
                "params": _full_text_params({"type": "phrase"}),
                "lenient": False,
            }

        if node.field == _SENTINEL:
            return _expand(make, fields, "literal")
        return make(node.field)
    if isinstance(node, A.Wildcard):

        def make(f):
            return {
                "type": "wildcard",
                "field": f,
                "value": node.pattern,
                "lenient": False,
            }

        if node.field == _SENTINEL:
            return _expand(make, fields, "literal")
        return make(node.field)
    if isinstance(node, A.Regex):
        return {"type": "regex", "field": node.field, "regex": node.pattern}
    if isinstance(node, A.Range):
        if node.field == _SENTINEL:
            if not fields:
                raise ValueError("range query without field is not supported")
            if len(fields) > 1:
                raise ValueError(
                    "range query with multiple fields is not supported"
                )
            field = fields[0]
        else:
            field = node.field

        def bound(inc, exc):
            if inc is not None:
                return {"Included": str(inc)}
            if exc is not None:
                return {"Excluded": str(exc)}
            return "Unbounded"

        return {
            "type": "range",
            "field": field,
            "lower_bound": bound(node.gte, node.gt),
            "upper_bound": bound(node.lte, node.lt),
        }
    if isinstance(node, A.Bool):
        # un-sugar the parser's NOT encoding (must=[MatchAll], must_not=[x])
        # back to the reference's bare must_not clause
        if (
            len(node.must) == 1
            and isinstance(node.must[0], A.MatchAll)
            and node.must_not
            and not node.should
            and not node.filter
        ):
            return {
                "type": "bool",
                "must_not": [_to_json(c, fields) for c in node.must_not],
            }
        out: dict = {"type": "bool"}
        for key, clauses in (
            ("must", node.must),
            ("must_not", node.must_not),
            ("should", node.should),
            ("filter", node.filter),
        ):
            if clauses:
                out[key] = [_to_json(c, fields) for c in clauses]
        if node.minimum_should_match is not None:
            out["minimum_should_match"] = node.minimum_should_match
        return out
    if isinstance(node, A.Boost):
        return {
            "type": "boost",
            "underlying": _to_json(node.query, fields),
            "boost": float(node.boost),
        }
    raise ValueError(f"cannot serialize query node {type(node).__name__}")
