r"""Query-string mini-DSL parser (subset of the reference's language).

Grammar subset of `docs/reference/query-language.md` /
`query_ast/user_input_query.rs:61-128`:

    clause   := '-'/'NOT' clause | '(' expr ')' | leaf
    expr     := clause ((AND|OR)? clause)*      (default operator AND)
    leaf     := '*'                             MatchAll
              | field ':' '*'                   Exists (doc: "Exists `field:*`")
              | field ':' 'IN' '[' v+ ']'       TermSet
              | field ':' '[' a 'TO' b ']'      Range (inclusive; '{' '}' excl.)
              | field ':' value                 FullText on that field
              | value                           FullText on default fields

A value containing '*' or '?' becomes a Wildcard. Unfielded clauses
resolve against `default_search_fields` (reference resolution at
`quickwit-config/src/index_config/mod.rs:166-169`) — multiple defaults
become a should-Bool.

Lexing details matching `docs/reference/query-language.md`:
- backslash escapes the reserved characters (`\:`, `\.`, `\*`, ...)
  inside unquoted terms and field names;
- values and range bounds may contain unescaped ':' runs when the
  pieces are character-adjacent (rfc3339 datetimes `...T22:45:41Z`,
  IPv6 `::1`) — the field separator is only the FIRST colon after a
  leading word.
"""

from __future__ import annotations

import re

from quickwit_spark.query.ast import (
    Bool,
    Exists,
    FullText,
    MatchAll,
    Phrase,
    PhrasePrefix,
    QueryAst,
    Range,
    TermSet,
    Wildcard,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<lpar>\()|(?P<rpar>\))|(?P<lbrk>\[)|(?P<rbrk>\])|(?P<lbrc>\{)|(?P<rbrc>\})
    |(?P<quoted>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
    |(?P<word>(?:\\.|[^\s()\[\]{}:"\\])+)
    |(?P<colon>:)
    """,
    re.VERBOSE,
)

_ESCAPE_RE = re.compile(r"\\(.)")


def _unescape(s: str) -> str:
    return _ESCAPE_RE.sub(r"\1", s)


def _is_quoted(t: str) -> bool:
    """Token is a complete quoted literal (either delimiter,
    `docs/reference/query-language.md` "In quoted terms, the quote
    character in use `'` or `\"` needs to be escaped")."""
    return len(t) >= 2 and t[0] in "\"'" and t[-1] == t[0]


def _lex(q: str) -> list[str]:
    return [m.group(0) for m in _TOKEN_RE.finditer(q)]


def _lex_spans(q: str) -> list[tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(q)]


class _Parser:
    def __init__(
        self,
        tokens: list[tuple[str, int, int]],
        default_fields: list[str],
        default_operator: str,
        position_fields: set[str] | None = None,
    ):
        self.spans = tokens
        self.toks = [t for t, _, _ in tokens]
        self.i = 0
        self.default_fields = default_fields
        self.default_operator = default_operator
        self.position_fields = position_fields or set()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def _join_value(self, first: str) -> str:
        """Extend a just-consumed word token with character-adjacent
        word/colon tokens: `2021-04-13T22:45:41Z` lexes as
        word ':' word ':' word but is ONE value (rfc3339); same for
        IPv6 `::1`. Adjacency (no whitespace) is the joining rule —
        `a :b` stays two clauses."""
        out = first
        end = self.spans[self.i - 1][2]
        while self.i < len(self.spans):
            t, s, e = self.spans[self.i]
            is_joinable = t == ":" or (t not in "()[]{}" and not _is_quoted(t))
            if s != end or not is_joinable:
                break
            out += t
            end = e
            self.i += 1
        return out

    def _bound(self) -> str:
        """One range bound / term-set value: a quoted token (quotes
        stripped) or an adjacency-joined word (escapes resolved)."""
        t = self.next()
        if t is None:
            raise ValueError("malformed range")
        if _is_quoted(t):
            return t[1:-1].replace("\\" + t[0], t[0])
        return _unescape(self._join_value(t))

    def parse_expr(self) -> QueryAst:
        clauses: list[tuple[str, QueryAst]] = []  # (connector-before, clause)
        conn = None
        while True:
            t = self.peek()
            if t is None or t == ")":
                break
            if t in ("AND", "OR"):
                self.next()
                conn = t.lower()
                continue
            clause = self.parse_clause()
            clauses.append((conn or self.default_operator, clause))
            conn = None
        if conn is not None:
            # trailing binary operator: `a OR` is a syntax error (the
            # reference's grammar rejects it; its scenarios assert 400)
            raise ValueError(f"dangling {conn.upper()} at end of query")
        if not clauses:
            return MatchAll()
        if len(clauses) == 1:
            return clauses[0][1]
        # group: OR binds looser than AND — split into OR groups of AND runs
        or_groups: list[list[QueryAst]] = [[clauses[0][1]]]
        for connector, clause in clauses[1:]:
            if connector == "or":
                or_groups.append([clause])
            else:
                or_groups[-1].append(clause)
        ands = [
            g[0] if len(g) == 1 else _make_and(g)
            for g in or_groups
        ]
        if len(ands) == 1:
            return ands[0]
        return Bool(should=ands)

    def parse_clause(self) -> QueryAst:
        t = self.peek()
        if t in ("-", "NOT") or (t and t.startswith("-") and len(t) > 1):
            if t in ("-", "NOT"):
                self.next()
            else:
                self.toks[self.i] = t[1:]
            inner = self.parse_clause()
            return Bool(must_not=[inner], must=[MatchAll()])
        if t == "(":
            self.next()
            inner = self.parse_expr()
            if self.peek() == ")":
                self.next()
            return inner
        return self.parse_leaf()

    def parse_leaf(self) -> QueryAst:
        t = self.next()
        if t is None:
            # `NOT`/`-` with nothing after them (the reference's grammar
            # rejects a trailing unary operator with a 400, like `a OR`)
            raise ValueError("unexpected end of query")
        if t == "*":
            return MatchAll()
        field = None
        if self.peek() == ":":
            self.next()
            field = _unescape(t)
            t = self.next()
            if t is None:
                raise ValueError(f"dangling field {field!r}")
        # bare `field:*` is Exists, never a wildcard expansion
        # (docs/reference/query-language.md "Exists `field:*`")
        if t == "*" and field is not None:
            return Exists(field=field)
        # field-scoped group: `field:(a OR b)` — every unfielded clause
        # inside resolves to `field` (reference query-language grouping)
        if t == "(" and field is not None:
            saved = self.default_fields
            self.default_fields = [field]
            try:
                inner = self.parse_expr()
            finally:
                self.default_fields = saved
            if self.peek() == ")":
                self.next()
            return inner
        # range: [a TO b] / {a TO b} — bounds may contain ':' runs
        # (rfc3339 datetimes, IPv6), joined by character adjacency
        if t in ("[", "{"):
            lo = self._bound()
            to = self.next()
            hi = self._bound()
            close = self.next()
            if to != "TO" or close not in ("]", "}"):
                raise ValueError("malformed range")
            kw: dict = {}
            if lo != "*":
                kw["gte" if t == "[" else "gt"] = lo
            if hi != "*":
                kw["lte" if close == "]" else "lt"] = hi
            return Range(field=field or self.default_fields[0], **kw)
        # comparison shorthand for half-open ranges: `field:<b`,
        # `field:>b`, `field:<=b`, `field:>=b`
        # (docs/reference/query-language.md "Half-Open bounds")
        m = re.match(r"(<=|>=|<|>)(.*)$", t)
        if m:
            op, rest = m.groups()
            if not rest:
                raise ValueError(f"missing bound after {field or '?'}:{op}")
            val = _unescape(self._join_value(rest))
            key = {"<": "lt", "<=": "lte", ">": "gt", ">=": "gte"}[op]
            if field is not None:
                return Range(field=field, **{key: val})
            # unfielded shorthand applies to the default field(s) — the
            # reference's query_string scenarios use `>=N` with
            # default_field (0005 steps 19-20)
            return _multi_field(
                [Range(field=f, **{key: val}) for f in self.default_fields]
            )
        # term set: IN [a b c]
        if t == "IN" and self.peek() == "[":
            self.next()
            vals = []
            while self.peek() not in ("]", None):
                vals.append(self._bound())
            if self.peek() == "]":
                self.next()
            return TermSet(field=field or self.default_fields[0], values=vals)
        if _is_quoted(t):
            # quoted literal — `"a b"~N` sets slop, `"a b"*` is a phrase
            # prefix (reference query language). Delimiter semantics
            # follow `user_input_query.rs:251-255`: double quotes →
            # FullTextMode::Phrase{slop}; SINGLE quotes → Bool(And) of
            # the tokens, no positions needed, slop ignored. Fields
            # indexed with record:'position' get true positional
            # semantics; freq-only fields degrade to an AND conjunction.
            delim = t[0]
            text = t[1:-1].replace("\\" + delim, delim)
            nxt = self.peek()
            slop = 0
            prefix = False
            if nxt is not None and re.fullmatch(r"~\d+", nxt):
                slop = int(nxt[1:])
                self.next()
            elif nxt == "*":
                prefix = True
                self.next()
            if delim == "'" and not prefix:
                # reference prefix check precedes the mode, so `'a b'*`
                # still builds a PhrasePrefixQuery (user_input_query.rs:266)
                return self._fulltext(field, text, operator="and")
            return self._phrase(field, text, slop, prefix)
        t = self._join_value(t)
        # wildcard check on the escape-stripped view so `\*` stays literal
        if re.search(r"[*?]", _ESCAPE_RE.sub("", t)):
            if field is None:
                return _multi_field(
                    [Wildcard(field=f, pattern=t) for f in self.default_fields]
                )
            return Wildcard(field=field, pattern=t)
        # unquoted literal: the reference mode is
        # PhraseFallbackToIntersection (`user_input_query.rs:251`) —
        # matters only when the field's tokenizer splits the single
        # lexed token into several (e.g. `f:hello-world`), resolved by
        # the engine against the field's record option
        return self._fulltext(field, _unescape(t), operator="and", fallback=True)

    def _fulltext(
        self, field: str | None, text: str, operator: str, fallback: bool = False
    ) -> QueryAst:
        if field is not None:
            return FullText(
                field=field, text=text, operator=operator, phrase_fallback=fallback
            )
        return _multi_field(
            [
                FullText(field=f, text=text, operator=operator, phrase_fallback=fallback)
                for f in self.default_fields
            ]
        )

    def _phrase(self, field: str | None, text: str, slop: int, prefix: bool) -> QueryAst:
        def one(f: str) -> QueryAst:
            if f in self.position_fields:
                if prefix:
                    return PhrasePrefix(field=f, text=text)
                return Phrase(field=f, text=text, slop=slop)
            return FullText(field=f, text=text, operator="and")

        if field is not None:
            return one(field)
        return _multi_field([one(f) for f in self.default_fields])


def _make_and(clauses: list[QueryAst]) -> QueryAst:
    return Bool(must=clauses)


def _multi_field(clauses: list[QueryAst]) -> QueryAst:
    return clauses[0] if len(clauses) == 1 else Bool(should=clauses)


def parse_query(
    q: str,
    default_fields: list[str] | None = None,
    default_operator: str = "and",
    position_fields: set[str] | None = None,
) -> QueryAst:
    """`position_fields`: fields indexed with record:'position' — quoted
    clauses on them become true Phrase/PhrasePrefix nodes; on other
    fields they degrade to an AND of the terms."""
    q = q.strip()
    if not q or q == "*":
        return MatchAll()
    return _Parser(
        _lex_spans(q), default_fields or ["text"], default_operator, position_fields
    ).parse_expr()
