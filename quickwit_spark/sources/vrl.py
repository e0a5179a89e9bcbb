"""VRL-subset compiler: reference transform scripts → Column pipelines.

The reference runs an optional VRL program over every ingested doc
(qw/quickwit-indexing/src/actors/vrl_processing.rs: compile once,
parse → transform → re-emit per doc; configured as `transform.script`
in source configs, reference docs/configuration/source-config.md:
248-289). The repo's `sources.transform.Transform` hook already sits
in the same pipeline position but takes Column steps — this module
closes the porting gap: a user's existing VRL script (the common
subset) compiles to a `Transform` whose steps are pure Column
expressions, so Catalyst folds the whole program into the scan
(column pruning + codegen) instead of running an interpreter per doc.

Supported subset (the verbs real configs use — both reference doc
examples compile unmodified):
  .field = <expr>          derive/overwrite an event field
  var = <expr>             local binding (inlined at use sites)
  del(.a, .b)              drop fields
  expressions: .field / .nested.path refs, vars, literals
    (strings/numbers/bools/null), `expr[i]` / `expr["key"]`
    subscripts, arithmetic + - * /, comparisons, && || !,
    function calls with VRL's fallible `!` marker
  functions: string, to_string, to_int, to_float, downcase, upcase,
    trim, length, split, replace, contains, starts_with, ends_with,
    parse_json, parse_csv, now, sha256, md5

Semantics mapping, where Spark differs:
  - VRL's fallible `f!(x)` aborts the doc on error; Spark expressions
    yield NULL instead (try_-style). The doc survives with a null
    field — the lossy-but-total choice every SQL engine makes.
  - `parse_json!` produces a VARIANT; subscripting it lowers to
    `try_variant_get(..., "$.key")` (string-typed — chain `to_int!`/
    `to_float!` like VRL programs already do).
  - `parse_csv!` lowers to a comma `split` (no quoted-field support;
    a quoted CSV needs `from_csv` with a declared schema).
  - `now()` is Spark's query-constant current_timestamp.
  - assignment targets must be top-level fields (`.a.b = ...` would
    need struct rebuilds; reference examples only assign top-level).
  - local bindings are lazy Column aliases, not eager copies: mutating
    a field AFTER binding a var that reads it changes the var's later
    uses too. Bind-then-use-then-mutate (the doc examples' shape) is
    identical to VRL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from quickwit_spark.sources.transform import Transform


class VrlCompileError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t]+)
  | (?P<comment>\#[^\n]*)
  | (?P<nl>[\n;]+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d+|\d+)
  | (?P<field>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*(?:!(?=\())?)  # `f!(` fallible call, but `x != y` stays a comparison
  | (?P<op>==|!=|<=|>=|&&|\|\||[=+\-*/<>!\[\](),])
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise VrlCompileError(f"vrl: cannot tokenize at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _Val:
    """Compile-time value: a Column plus enough type flavor to lower
    subscripts correctly (variant vs array)."""

    def __init__(self, col: Column, flavor: str = "plain"):
        self.col = col
        self.flavor = flavor  # plain | variant | array


_FUNCS = {
    "string": lambda a: _Val(a[0].col.cast("string")),
    "to_string": lambda a: _Val(a[0].col.cast("string")),
    "to_int": lambda a: _Val(a[0].col.cast("long")),
    "to_float": lambda a: _Val(a[0].col.cast("double")),
    "downcase": lambda a: _Val(F.lower(a[0].col)),
    "upcase": lambda a: _Val(F.upper(a[0].col)),
    "trim": lambda a: _Val(F.trim(a[0].col)),
    "length": lambda a: _Val(F.length(a[0].col)),
    "split": lambda a: _Val(F.split(a[0].col, a[1].col), "array"),
    "replace": lambda a: _Val(F.replace(a[0].col, a[1].col, a[2].col)),
    "contains": lambda a: _Val(F.contains(a[0].col, a[1].col)),
    "starts_with": lambda a: _Val(F.startswith(a[0].col, a[1].col)),
    "ends_with": lambda a: _Val(F.endswith(a[0].col, a[1].col)),
    "parse_json": lambda a: _Val(
        F.try_parse_json(a[0].col.cast("string")), "variant"
    ),
    "parse_csv": lambda a: _Val(F.split(a[0].col, ","), "array"),
    "now": lambda a: _Val(F.current_timestamp()),
    "sha256": lambda a: _Val(F.sha2(a[0].col.cast("string"), 256)),
    "md5": lambda a: _Val(F.md5(a[0].col.cast("string"))),
}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], env: dict):
        self.toks = tokens
        self.i = 0
        self.env = env  # local variables: name -> _Val

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str):
        kind, tok = self.next()
        if tok != text:
            raise VrlCompileError(f"vrl: expected {text!r}, got {tok!r}")

    # expression grammar: or → and → cmp → add → mul → unary → postfix
    def expr(self) -> _Val:
        left = self.and_()
        while self.peek()[1] == "||":
            self.next()
            left = _Val(left.col | self.and_().col)
        return left

    def and_(self) -> _Val:
        left = self.cmp()
        while self.peek()[1] == "&&":
            self.next()
            left = _Val(left.col & self.cmp().col)
        return left

    def cmp(self) -> _Val:
        left = self.add()
        ops = {
            "==": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            ">": lambda a, b: a > b,
            "<=": lambda a, b: a <= b,
            ">=": lambda a, b: a >= b,
        }
        while self.peek()[1] in ops:
            op = self.next()[1]
            left = _Val(ops[op](left.col, self.add().col))
        return left

    def add(self) -> _Val:
        left = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.mul()
            left = _Val(
                left.col + right.col if op == "+" else left.col - right.col
            )
        return left

    def mul(self) -> _Val:
        left = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            right = self.unary()
            left = _Val(
                left.col * right.col if op == "*" else left.col / right.col
            )
        return left

    def unary(self) -> _Val:
        if self.peek()[1] == "!":
            self.next()
            return _Val(~self.unary().col)
        if self.peek()[1] == "-":
            self.next()
            return _Val(-self.unary().col)
        return self.postfix()

    def postfix(self) -> _Val:
        v = self.primary()
        while self.peek()[1] == "[":
            self.next()
            kind, tok = self.next()
            self.expect("]")
            if v.flavor == "variant":
                if kind == "string":
                    key = tok[1:-1]
                    v = _Val(
                        F.try_variant_get(v.col, f"$.{key}", "string"),
                        "plain",
                    )
                elif kind == "number":
                    v = _Val(
                        F.try_variant_get(v.col, f"$[{tok}]", "string"),
                        "plain",
                    )
                else:
                    raise VrlCompileError(
                        f"vrl: variant subscript must be literal, got {tok!r}"
                    )
            elif kind == "number":
                v = _Val(F.get(v.col, int(tok)))
            elif kind == "string":
                v = _Val(v.col.getItem(tok[1:-1]))
            else:
                raise VrlCompileError(
                    f"vrl: subscript must be a literal, got {tok!r}"
                )
        return v

    def primary(self) -> _Val:
        kind, tok = self.next()
        if tok == "(":
            v = self.expr()
            self.expect(")")
            return v
        if kind == "string":
            import json as _json

            try:
                # VRL string escapes are JSON's (\n, \t, \", \\, \uXXXX)
                return _Val(F.lit(_json.loads(tok)))
            except ValueError as e:
                raise VrlCompileError(
                    f"vrl: bad string literal {tok}: {e}"
                ) from e
        if kind == "number":
            return _Val(F.lit(float(tok) if "." in tok else int(tok)))
        if kind == "field":
            path = tok[1:].split(".")
            col = F.col(path[0])
            for part in path[1:]:
                col = col.getField(part)
            return _Val(col)
        if kind == "name":
            base = tok.rstrip("!")
            if self.peek()[1] == "(":
                self.next()
                args: list[_Val] = []
                if self.peek()[1] != ")":
                    args.append(self.expr())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.expr())
                self.expect(")")
                if base not in _FUNCS:
                    raise VrlCompileError(
                        f"vrl: unsupported function {base!r} (supported: "
                        f"{', '.join(sorted(_FUNCS))})"
                    )
                return _FUNCS[base](args)
            if base == "true":
                return _Val(F.lit(True))
            if base == "false":
                return _Val(F.lit(False))
            if base == "null":
                return _Val(F.lit(None))
            if base in self.env:
                return self.env[base]
            raise VrlCompileError(f"vrl: unknown variable {base!r}")
        raise VrlCompileError(f"vrl: unexpected token {tok!r}")


def compile_vrl(script: str) -> Transform:
    """VRL-subset script → `Transform` of pure Column steps. Raises
    `VrlCompileError` on anything outside the subset (fail at config
    load, like the reference compiles the program at source start)."""
    tokens = _tokenize(script)
    env: dict[str, _Val] = {}
    t = Transform()
    p = _Parser(tokens, env)
    while p.peek()[0] != "eof":
        if p.peek()[0] == "nl":
            p.next()
            continue
        kind, tok = p.next()
        # del(.a, .b)
        if kind == "name" and tok.rstrip("!") == "del" and p.peek()[1] == "(":
            p.next()
            drops: list[str] = []
            while True:
                k2, t2 = p.next()
                if k2 != "field" or "." in t2[1:]:
                    raise VrlCompileError(
                        f"vrl: del() takes top-level fields, got {t2!r}"
                    )
                drops.append(t2[1:])
                if p.peek()[1] == ",":
                    p.next()
                    continue
                break
            p.expect(")")
            t.drop(*drops)
            continue
        if kind == "field":
            target = tok[1:]
            if "." in target:
                raise VrlCompileError(
                    f"vrl: only top-level assignment targets supported, got {tok!r}"
                )
            p.expect("=")
            val = p.expr()
            t.with_columns(**{target: val.col})
            # later statements referencing .target see the new value
            # because each assignment is its own withColumns step
            continue
        if kind == "name" and p.peek()[1] == "=":
            p.next()
            env[tok.rstrip("!")] = p.expr()
            continue
        raise VrlCompileError(f"vrl: unexpected statement start {tok!r}")
    return t
