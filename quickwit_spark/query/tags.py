"""Tag extraction + split pruning predicates.

Mirrors the reference's manifest-level tag pruning
(`quickwit-doc-mapper/src/tag_pruning.rs:35-120` extraction,
`:215-275` simplification, `:286-308` expansion): a query is lowered to
a conjunctive/disjunctive predicate over "{field}:{value}" tags; a
segment whose recorded tag set fails the predicate provably contains no
matching document and is skipped before any scan.

Differences from the reference, on purpose:
- FullText/Phrase values go through the field's tokenizer (AND of token
  tags / OR for op=or) instead of using the raw query text — the
  reference marks its raw-text behavior "TODO This is a bug in a sense"
  (`tag_pruning.rs:87-90`); tokenizing is correct for raw-tokenizer tag
  fields (token == value) and collapses to Uninformative for analyzed
  fields (which are never tag fields).
- Wildcard/PhrasePrefix are Uninformative here: the reference records
  their unexpanded pattern as a literal tag, which can over-prune a
  split whose tag set is exhaustive for the field.

Evaluation semantics (`tag_pruning.rs:286-308`): each positive term
predicate expands to `¬{field}! ∨ {field}:{value}` — a segment that
does not declare the field as a tag field (no `{field}!` marker, e.g.
cardinality cap exceeded or pre-tag manifest) is never pruned on it.
Negative predicates are uninformative (`tag_pruning.rs:262-272`):
tags don't record absence.
"""

from __future__ import annotations

from dataclasses import dataclass

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


def field_tag(field: str) -> str:
    """Marker tag: `field` is in the index's tag_fields (recorded)."""
    return f"{field}!"


def term_tag(field: str, value: str) -> str:
    return f"{field}:{value}"


# ---------------------------------------------------------------- filter AST


@dataclass(frozen=True)
class TagFilter:
    """Predicate over a segment's tag set. op in {"and","or","tag"}."""

    op: str
    children: tuple = ()
    tag: str | None = None
    is_present: bool = True

    def evaluate(self, tag_set: set[str]) -> bool:
        if self.op == "and":
            return all(c.evaluate(tag_set) for c in self.children)
        if self.op == "or":
            return any(c.evaluate(tag_set) for c in self.children)
        return (self.tag in tag_set) == self.is_present


def _and(children):
    return TagFilter("and", tuple(children))


def _or(children):
    return TagFilter("or", tuple(children))


def _tag(tag, present=True):
    return TagFilter("tag", tag=tag, is_present=present)


# ------------------------------------------------- unsimplified extraction

# leaf sentinel: a node that may be true or false regardless of tags
_UNINFORMATIVE = ("uninformative",)


def _u_and(children):
    return ("and", children)


def _u_or(children):
    return ("or", children)


def _u_tag(field, value, present=True):
    return ("tag", field, value, present)


def _negate(node):
    """De Morgan push-down (`tag_pruning.rs:348-367`)."""
    if node[0] == "and":
        return _u_or([_negate(c) for c in node[1]])
    if node[0] == "or":
        return _u_and([_negate(c) for c in node[1]])
    if node[0] == "tag":
        return ("tag", node[1], node[2], not node[3])
    return _UNINFORMATIVE


def _extract(node: QueryAst, tokenize) -> tuple:
    if isinstance(node, Bool):
        clause = []
        for occur, children in (
            ("must", node.must),
            ("must", node.filter),
            ("should", node.should),
            ("must_not", node.must_not),
        ):
            for c in children:
                clause.append((occur, _extract(c, tokenize)))
        if not clause:
            return _UNINFORMATIVE
        if any(occ == "must" for occ, _ in clause):
            # `should` clauses are optional next to a must — drop them
            # (`tag_pruning.rs:379-394`)
            return _u_and(
                [
                    _negate(ast) if occ == "must_not" else ast
                    for occ, ast in clause
                    if occ != "should"
                ]
            )
        return _u_or(
            [_negate(ast) if occ == "must_not" else ast for occ, ast in clause]
        )
    if isinstance(node, Boost):
        return _extract(node.query, tokenize)
    if isinstance(node, Term):
        return _u_tag(node.field, node.value)
    if isinstance(node, TermSet):
        return _u_or([_u_tag(node.field, v) for v in node.values])
    if isinstance(node, (FullText, Phrase)):
        toks = tokenize(node.field, node.text) if tokenize else []
        if not toks:
            return _UNINFORMATIVE
        tags = [_u_tag(node.field, t) for t in toks]
        if isinstance(node, FullText) and node.operator == "or":
            return _u_or(tags)
        return _u_and(tags)  # AND / phrase: every token must be present
    # Range/Wildcard/Regex/PhrasePrefix/Exists/MatchAll/MatchNone:
    # no sound positive-tag predicate
    if isinstance(
        node, (Range, Wildcard, Regex, PhrasePrefix, Exists, MatchAll, MatchNone)
    ):
        return _UNINFORMATIVE
    return _UNINFORMATIVE


def _simplify(node) -> tuple | None:
    """Strip uninformative leaves; None means True (`tag_pruning.rs:231-274`)."""
    if node[0] == "and":
        kept = [s for c in node[1] if (s := _simplify(c)) is not None]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ("and", kept)
    if node[0] == "or":
        kept = []
        for c in node[1]:
            s = _simplify(c)
            if s is None:  # True disjunct ⇒ whole Or is True
                return None
            kept.append(s)
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ("or", kept)
    if node[0] == "tag":
        if node[3]:
            return node
        return None  # negative predicates can't prune (tags record presence)
    return None  # uninformative


def _expand(node) -> TagFilter:
    """Term → `¬field! ∨ field:value` (`tag_pruning.rs:286-308`)."""
    if node[0] == "and":
        return _and([_expand(c) for c in node[1]])
    if node[0] == "or":
        return _or([_expand(c) for c in node[1]])
    _, field, value, _present = node
    return _or([_tag(field_tag(field), present=False), _tag(term_tag(field, value))])


def extract_tag_filter(ast: QueryAst, tokenize=None) -> TagFilter | None:
    """Lower a resolved QueryAst to a tag predicate, or None (no pruning
    possible). `tokenize(field, text) -> list[str]` resolves FullText /
    Phrase values through the field's analyzer."""
    simplified = _simplify(_extract(ast, tokenize))
    if simplified is None:
        return None
    return _expand(simplified)
