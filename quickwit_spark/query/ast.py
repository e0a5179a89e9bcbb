"""QueryAst — the engine's logical query model.

Mirrors the reference's QueryAst variants
(`quickwit-query/src/query_ast/mod.rs:50-70`): Term, TermSet, FullText
(Bool AND/OR of tokenized terms), Phrase (slop-tolerant, requires
`record: position`), PhrasePrefix (`match_phrase_prefix` autocomplete,
last term expanded against the dictionary capped at `max_expansions`,
ref `query_ast/phrase_prefix_query.rs:66-93`), Range, Bool (must/
must_not/should/filter + minimum_should_match), Boost, MatchAll/
MatchNone, FieldPresence (`exists`), Wildcard, Regex.

Scoring semantics (reference `query_ast/bool_query.rs` +
`tantivy_query_ast.rs`): must and should clauses contribute score,
filter and must_not never do; Boost multiplies the subtree's score.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class QueryAst:
    """Marker base class."""


@dataclass(frozen=True)
class Term(QueryAst):
    field: str
    value: str  # pre-normalized (not re-tokenized), like the reference


@dataclass(frozen=True)
class TermSet(QueryAst):
    field: str
    values: tuple

    def __init__(self, field: str, values):
        object.__setattr__(self, "field", field)
        object.__setattr__(self, "values", tuple(values))


@dataclass(frozen=True)
class FullText(QueryAst):
    """Query text is tokenized with the field's tokenizer, then combined
    with `operator` ('and' | 'or'). Zero tokens → MatchAll semantics when
    zero_terms_match_all else MatchNone (reference
    `query_ast/full_text_query.rs:36-44,108-110`).

    `phrase_fallback` marks an UNQUOTED user-input literal: the
    reference evaluates those as FullTextMode::PhraseFallbackToIntersection
    (`user_input_query.rs:251`, `full_text_query.rs:151-161`) — a slop-0
    phrase when the field records positions, else an AND intersection.
    The engine resolves the flag driver-side (it knows the field's
    record option and tokenizer); the kernel never sees it."""

    field: str
    text: str
    operator: str = "or"
    zero_terms_match_all: bool = False
    phrase_fallback: bool = False


@dataclass(frozen=True)
class Phrase(QueryAst):
    """Phrase over a position-indexed field (reference
    FullTextMode::Phrase, requires `record: position` — errors otherwise
    like `full_text_query.rs:140-147`). slop=0 is exact adjacency;
    slop>0 tolerates up to `slop` position moves between consecutive
    terms (a transposition costs 2, the Lucene/tantivy convention)."""

    field: str
    text: str
    slop: int = 0


@dataclass(frozen=True)
class PhrasePrefix(QueryAst):
    """`match_phrase_prefix`: all but the last term match as a phrase;
    the last token is a PREFIX expanded against the term dictionary in
    sorted order, capped at `max_expansions` (reference
    `query_ast/phrase_prefix_query.rs:66-93`, default 50).
    `expansions` is filled in by the engine's planning step (the
    automaton-range analog) before kernel evaluation."""

    field: str
    text: str
    max_expansions: int = 50
    expansions: tuple | None = None


@dataclass(frozen=True)
class Range(QueryAst):
    """Range over a fast (docmap) column; bounds are python values."""

    field: str
    gte: object = None
    lte: object = None
    gt: object = None
    lt: object = None
    # ES `format` parameter: datetime pattern the bounds are written in
    format: str | None = None


@dataclass(frozen=True)
class Exists(QueryAst):
    field: str


@dataclass(frozen=True)
class Wildcard(QueryAst):
    """`wil?car*d` — expanded against the term dictionary with a derived
    literal-prefix range scan, truncated (in term order) at
    `max_expansions` (None → engine default)."""

    field: str
    pattern: str
    max_expansions: int | None = None


@dataclass(frozen=True)
class Regex(QueryAst):
    field: str
    pattern: str
    max_expansions: int | None = None


@dataclass(frozen=True)
class Bool(QueryAst):
    must: tuple = ()
    must_not: tuple = ()
    should: tuple = ()
    filter: tuple = ()
    minimum_should_match: int | None = None

    def __init__(self, must=(), must_not=(), should=(), filter=(), minimum_should_match=None):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "filter", tuple(filter))
        object.__setattr__(self, "minimum_should_match", minimum_should_match)


@dataclass(frozen=True)
class Boost(QueryAst):
    query: QueryAst
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAll(QueryAst):
    pass


@dataclass(frozen=True)
class MatchNone(QueryAst):
    pass


def collect_fulltext_terms(ast: QueryAst, tokenizer_for_field) -> list[tuple[str, str]]:
    """All (field, term) pairs whose postings the query needs (warmup
    analog of the reference's `query_builder.rs:90-141`)."""
    out: list[tuple[str, str]] = []

    def walk(node: QueryAst):
        if isinstance(node, Term):
            out.append((node.field, node.value))
        elif isinstance(node, TermSet):
            out.extend((node.field, v) for v in node.values)
        elif isinstance(node, (FullText, Phrase)):
            fn = tokenizer_for_field(node.field)
            out.extend((node.field, t) for t in fn(node.text))
        elif isinstance(node, PhrasePrefix):
            fn = tokenizer_for_field(node.field)
            toks = fn(node.text)
            out.extend((node.field, t) for t in toks[:-1])
            for t in node.expansions or ():
                out.append((node.field, t))
        elif isinstance(node, Bool):
            for cl in (*node.must, *node.must_not, *node.should, *node.filter):
                walk(cl)
        elif isinstance(node, Boost):
            walk(node.query)
        # Range/Exists → fast columns; Wildcard/Regex expanded separately

    walk(ast)
    return out


# ---------- JSON (de)serialization — the reference serializes QueryAst
# with serde for its KV-stored scroll contexts (`scroll_context.rs`);
# this is the same shape: a `$type` tag + the dataclass fields ----------

import datetime as _dt
from dataclasses import fields as _dc_fields


def ast_to_json(node: QueryAst) -> dict:
    def enc(v):
        if isinstance(v, QueryAst):
            return ast_to_json(v)
        if isinstance(v, (list, tuple)):
            return [enc(x) for x in v]
        if isinstance(v, _dt.datetime):
            return {"$dt": v.isoformat()}
        return v

    out = {"$type": type(node).__name__}
    for f in _dc_fields(node):
        out[f.name] = enc(getattr(node, f.name))
    return out


def ast_from_json(d: dict) -> QueryAst:
    classes = {
        c.__name__: c
        for c in (
            Term, TermSet, FullText, Phrase, PhrasePrefix, Range, Exists,
            Wildcard, Regex, Bool, Boost, MatchAll, MatchNone,
        )
    }

    def dec(v):
        if isinstance(v, dict) and "$type" in v:
            return ast_from_json(v)
        if isinstance(v, dict) and "$dt" in v:
            return _dt.datetime.fromisoformat(v["$dt"])
        if isinstance(v, list):
            return [dec(x) for x in v]
        return v

    cls = classes[d["$type"]]
    kwargs = {k: dec(v) for k, v in d.items() if k != "$type"}
    return cls(**kwargs)
