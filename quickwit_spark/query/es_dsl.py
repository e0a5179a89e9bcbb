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
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(
            f"expected a single field key, got {sorted(body) if isinstance(body, dict) else type(body).__name__}"
        )
    field, spec = next(iter(body.items()))
    if not isinstance(spec, dict):
        spec = {"value": spec}
    return field, spec


def _boost(ast: QueryAst, spec: dict) -> QueryAst:
    b = spec.get("boost")
    return Boost(ast, float(b)) if b is not None and float(b) != 1.0 else ast


def _canon(v) -> str:
    """Canonical term string for a JSON value: the form the builder
    indexes typed leaves under (`term: {actor.id: 1762355}` and
    `term: {actor.id: "1762355"}` match identically; booleans are
    "true"/"false")."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


_KNOWN_ANALYZERS = {
    "default", "raw", "raw_lowercase", "lowercase", "whitespace", "en_stem",
    "chinese_compatible", "multilang_default", "source_code_default",
    "source_code_with_hex",
}


def _analyzer_override(field: str, spec: dict, query: str) -> QueryAst | None:
    """ES `analyzer` param on match-family queries: validate the name
    (unknown → error, like the reference's tokenizer registry), and for
    non-splitting analyzers lower the query to its exact expansion
    (a single-token analyzed text is a pure prefix/term match)."""
    analyzer = spec.get("analyzer")
    if analyzer is None:
        return None
    if analyzer not in _KNOWN_ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    from quickwit_spark.analysis.tokenizer import resolve_tokenizer

    toks = resolve_tokenizer(analyzer)(query)
    if len(toks) == 1:
        # single analyzed token: the phrase degenerates to a prefix scan
        # (Wildcard has no escape syntax; these analyzers never emit
        # `*`/`?` metacharacters into tokens from plain text)
        return Wildcard(field, toks[0] + "*")
    raise NotImplementedError(
        "analyzer override supported for single-token analyzers only"
    )


def _resolve_msm(msm, n_should: int) -> int | None:
    """Lucene `minimum_should_match` forms → concrete count: integer
    (negative = that many optional clauses may be missing), percentage
    string "50%" / "-25%" (rounded down before use). A resolved value
    ≤ 0 means no constraint — a pure disjunction still needs ≥1 match
    (Lucene BooleanQuery semantics; reference scenario 0009 steps
    16-19 assert exactly this clamping)."""
    if msm is None:
        return None
    if isinstance(msm, str):
        s = msm.strip()
        if s.endswith("%"):
            pct = float(s[:-1])
            val = int(n_should * abs(pct) / 100.0)
            val = n_should - val if pct < 0 else val
        else:
            val = int(s)
            if val < 0:
                val = n_should + val
    else:
        val = int(msm)
        if val < 0:
            val = n_should + val
    return val if val > 0 else None


def from_es_query(
    q: dict,
    default_fields: list[str] | None = None,
    position_fields: set[str] | None = None,
    known_fields: set[str] | None = None,
) -> QueryAst:
    """Convert one ES query clause object to QueryAst. `position_fields`
    = fields indexed with record:'position' (phrase semantics).
    `known_fields` (when given) enables the reference's non-lenient
    `query_string` validation: an explicitly-requested field absent from
    the mapping is a 400 unless `lenient: true` (rest scenarios 0005)."""
    default_fields = default_fields or ["text"]
    position_fields = position_fields or set()
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError(
            "ES query object must have one key, got "
            f"{sorted(q) if isinstance(q, dict) else type(q).__name__}"
        )
    kind, body = next(iter(q.items()))

    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()
    if not isinstance(body, dict):
        # every remaining ES clause body is a JSON object; a list/scalar
        # here must become a 400 envelope, not an AttributeError 500
        raise ValueError(f"{kind} query body must be an object")

    if kind == "term":
        field, spec = _field_value(body)
        return _boost(Term(field, _canon(spec["value"])), spec)

    if kind == "terms":
        entries = {k: v for k, v in body.items() if k != "boost"}
        if len(entries) != 1:
            # zero fields (incl. boost-only) or several → 400, like the
            # reference's serde one-field-map (`terms_query.rs` via
            # OneFieldMap); a bare next(iter()) here raised StopIteration
            raise ValueError(
                f"terms query expects exactly one field, got {sorted(entries)}"
            )
        field, values = next(iter(entries.items()))
        if not isinstance(values, (list, tuple)):
            raise ValueError("terms query values must be an array")
        ast: QueryAst = TermSet(field, [_canon(v) for v in values])
        return _boost(ast, body)

    if kind == "exists":
        return Exists(body["field"])

    if kind == "range":
        field, spec = _field_value(body)
        kw = {k: spec[k] for k in ("gte", "gt", "lte", "lt") if k in spec}
        if spec.get("format"):
            kw["format"] = spec["format"]
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
        override = _analyzer_override(field, spec, str(spec["query"]))
        if override is not None:
            return _boost(override, spec)
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
        fields = body.get("fields")
        if fields is not None and not fields:
            raise ValueError("multi_match with empty fields")
        if isinstance(fields, str):  # ES accepts a bare string here
            fields = [fields]
        fields = fields or default_fields
        op = str(body.get("operator", "or")).lower()
        mm_type = str(body.get("type", "most_fields")).lower()
        q = str(body["query"])
        slop = int(body.get("slop", 0))
        if mm_type == "phrase":
            clauses = [
                Phrase(f, q, slop=slop)
                if f in position_fields
                else FullText(f, q, "and")
                for f in fields
            ]
        elif mm_type == "phrase_prefix":
            clauses = [
                PhrasePrefix(f, q)
                if f in position_fields
                else FullText(f, q, "and")
                for f in fields
            ]
        else:  # best_fields / most_fields / bool_prefix-less default
            clauses = [FullText(f, q, op) for f in fields]
        return clauses[0] if len(clauses) == 1 else Bool(should=clauses)

    if kind == "query_string":
        fields = body.get("fields")
        if fields is not None and isinstance(fields, str):
            # ES rejects a bare string for query_string's `fields`
            # (unlike multi_match) — the reference's scenarios assert
            # the 400
            raise ValueError("query_string `fields` must be an array")
        if fields and body.get("default_field"):
            raise ValueError(
                "query_string takes `fields` OR `default_field`, not both"
            )
        explicit = fields or body.get("default_field")
        fields = explicit or default_fields
        if isinstance(fields, str):
            fields = [fields]
        if explicit and known_fields is not None:
            missing = [f for f in fields if f not in known_fields]
            if missing and not body.get("lenient"):
                raise ValueError(
                    f"query_string field(s) do not exist: {missing}"
                )
            fields = [f for f in fields if f not in missing] or ["__none__"]
        qs = body["query"]
        if not isinstance(qs, str):
            # ES requires a string here; None/number must 400, and
            # parse_query would AttributeError on a non-string
            raise ValueError("query_string `query` must be a string")
        return parse_query(
            qs,
            fields,
            # ES default operator is OR (reference BooleanOperand
            # #[default] Or, `quickwit-query/src/lib.rs:48-53`) — unlike
            # the native query-string API where juxtaposition means AND
            str(body.get("default_operator", "or")).lower(),
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
            v = body.get(key) or []  # explicit null = absent (ES)
            v = v if isinstance(v, list) else [v]
            return [
                from_es_query(c, default_fields, position_fields, known_fields)
                for c in v
            ]

        should = clauses("should")
        msm = _resolve_msm(body.get("minimum_should_match"), len(should))
        out = Bool(
            must=clauses("must"),
            must_not=clauses("must_not"),
            should=should,
            filter=clauses("filter"),
            minimum_should_match=msm,
        )
        if not (out.must or out.must_not or out.should or out.filter):
            return MatchAll()  # `bool: {}` matches everything (ES)
        return out

    raise NotImplementedError(f"unsupported ES query kind {kind!r}")


def from_es_body(
    body: dict,
    default_fields: list[str] | None = None,
    position_fields: set[str] | None = None,
    known_fields: set[str] | None = None,
) -> QueryAst:
    """Convert a full `_search` body (uses its `query` member)."""
    return from_es_query(
        body.get("query", {"match_all": {}}),
        default_fields,
        position_fields,
        known_fields,
    )
