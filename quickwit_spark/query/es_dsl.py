"""Elasticsearch-compatible query DSL → QueryAst.

Mirrors the reference's converters (`quickwit-query/src/elastic_query_dsl/
*.rs`, docs `docs/reference/es_compatible_api.md:369-709`): the JSON
body of an ES `_search` `query` clause becomes the same QueryAst the
native query string produces. Supported set (the reference's):

    match_all / match_none / term / terms / exists / range /
    match / match_phrase / match_phrase_prefix / multi_match /
    query_string / bool / boost (per-clause) / regexp / wildcard

`match_phrase` on a field indexed with record:'position' becomes a
true positional Phrase (slop honored); on freq-only fields it degrades
to an AND conjunction (the reference's PhraseFallbackToIntersection).
`match_phrase_prefix` requires positions (errors otherwise, like
`full_text_query.rs:140-147`).
"""

from __future__ import annotations

from quickwit_spark.query.ast import (
    Bool,
    Boost,
    Exists,
    FullText,
    MatchAll,
    MatchNone,
    Phrase,
    PhrasePrefix,
    QueryAst,
    Range,
    Regex,
    Term,
    TermSet,
    Wildcard,
)
from quickwit_spark.query.parser import parse_query


def _field_value(body: dict) -> tuple[str, dict]:
    """ES `{field: {...}}` / `{field: value}` single-entry bodies."""
    if len(body) != 1:
        raise ValueError(f"expected a single field key, got {sorted(body)}")
    field, spec = next(iter(body.items()))
    if not isinstance(spec, dict):
        spec = {"value": spec}
    return field, spec


def _boost(ast: QueryAst, spec: dict) -> QueryAst:
    b = spec.get("boost")
    return Boost(ast, float(b)) if b is not None and float(b) != 1.0 else ast


def from_es_query(
    q: dict,
    default_fields: list[str] | None = None,
    position_fields: set[str] | None = None,
) -> QueryAst:
    """Convert one ES query clause object to QueryAst. `position_fields`
    = fields indexed with record:'position' (phrase semantics)."""
    default_fields = default_fields or ["text"]
    position_fields = position_fields or set()
    if len(q) != 1:
        raise ValueError(f"ES query object must have one key, got {sorted(q)}")
    kind, body = next(iter(q.items()))

    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()

    if kind == "term":
        field, spec = _field_value(body)
        return _boost(Term(field, str(spec["value"])), spec)

    if kind == "terms":
        entries = {k: v for k, v in body.items() if k != "boost"}
        field, values = next(iter(entries.items()))
        ast: QueryAst = TermSet(field, [str(v) for v in values])
        return _boost(ast, body)

    if kind == "exists":
        return Exists(body["field"])

    if kind == "range":
        field, spec = _field_value(body)
        kw = {k: spec[k] for k in ("gte", "gt", "lte", "lt") if k in spec}
        return _boost(Range(field, **kw), spec)

    if kind == "match":
        field, spec = _field_value(body)
        if "query" not in spec and "value" in spec:
            spec["query"] = spec.pop("value")
        op = str(spec.get("operator", "or")).lower()
        zero = str(spec.get("zero_terms_query", "none")).lower() == "all"
        return _boost(
            FullText(field, str(spec["query"]), op, zero_terms_match_all=zero), spec
        )

    if kind == "match_phrase":
        field, spec = _field_value(body)
        if "query" not in spec and "value" in spec:
            spec["query"] = spec.pop("value")
        if field in position_fields:
            slop = int(spec.get("slop", 0))
            return _boost(Phrase(field, str(spec["query"]), slop=slop), spec)
        return _boost(FullText(field, str(spec["query"]), "and"), spec)

    if kind == "match_phrase_prefix":
        field, spec = _field_value(body)
        if "query" not in spec and "value" in spec:
            spec["query"] = spec.pop("value")
        if field not in position_fields:
            raise ValueError(
                f"match_phrase_prefix on {field!r} requires record: position"
            )
        cap = int(spec.get("max_expansions", 50))
        return _boost(
            PhrasePrefix(field, str(spec["query"]), max_expansions=cap), spec
        )

    if kind == "match_bool_prefix":
        # reference `match_bool_prefix_query.rs` / ES semantics: every
        # token matches as a term except the LAST, which matches as a
        # prefix; combined under `operator` (default or). The prefix
        # leg lowers to Wildcard, whose planning expands it against the
        # term dictionary with the standard cap.
        field, spec = _field_value(body)
        if "query" not in spec and "value" in spec:
            spec["query"] = spec.pop("value")
        op = str(spec.get("operator", "or")).lower()
        toks = str(spec["query"]).lower().split()
        if not toks:
            return MatchNone()
        legs: list[QueryAst] = [Term(field, t) for t in toks[:-1]]
        legs.append(Wildcard(field, toks[-1] + "*"))
        if len(legs) == 1:
            return _boost(legs[0], spec)
        ast = Bool(must=legs) if op == "and" else Bool(should=legs)
        return _boost(ast, spec)

    if kind == "multi_match":
        fields = body.get("fields") or default_fields
        op = str(body.get("operator", "or")).lower()
        clauses = [FullText(f, str(body["query"]), op) for f in fields]
        return clauses[0] if len(clauses) == 1 else Bool(should=clauses)

    if kind == "query_string":
        fields = body.get("fields") or body.get("default_field") or default_fields
        if isinstance(fields, str):
            fields = [fields]
        return parse_query(
            body["query"],
            fields,
            str(body.get("default_operator", "and")).lower(),
            position_fields=position_fields,
        )

    if kind == "wildcard":
        field, spec = _field_value(body)
        return _boost(Wildcard(field, str(spec["value"])), spec)

    if kind == "regexp":
        field, spec = _field_value(body)
        return _boost(Regex(field, str(spec["value"])), spec)

    if kind == "bool":
        def clauses(key):
            v = body.get(key, [])
            v = v if isinstance(v, list) else [v]
            return [from_es_query(c, default_fields, position_fields) for c in v]

        msm = body.get("minimum_should_match")
        return Bool(
            must=clauses("must"),
            must_not=clauses("must_not"),
            should=clauses("should"),
            filter=clauses("filter"),
            minimum_should_match=int(msm) if msm is not None else None,
        )

    raise NotImplementedError(f"unsupported ES query kind {kind!r}")


def from_es_body(
    body: dict,
    default_fields: list[str] | None = None,
    position_fields: set[str] | None = None,
) -> QueryAst:
    """Convert a full `_search` body (uses its `query` member)."""
    return from_es_query(
        body.get("query", {"match_all": {}}), default_fields, position_fields
    )
