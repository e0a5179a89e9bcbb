"""Analyzers with tantivy/Quickwit-`default` parity, batch-vectorized.

The reference registers these analyzers
(`quickwit-query/src/tokenizers/mod.rs:36-104`):

    raw             whole input as one token, drop if > 255 bytes
    raw_lowercase   same + lowercase
    lowercase       same as raw_lowercase
    default         SimpleTokenizer (split on non-alphanumeric runs)
                    + RemoveLong(255 bytes, pre-lowercase) + LowerCaser
    whitespace      split on whitespace, no lowercase, no length filter
    en_stem         default + English stemmer        (not implemented)
    chinese_compatible / source_code_* / multilang   (not implemented)

Parity notes for `default`:
- tantivy's SimpleTokenizer keeps maximal runs of ``char::is_alphanumeric()``
  chars (Unicode Alphabetic | Nd | Nl | No). We scan with Python's ``\\w+``
  (a superset: it also matches '_' and combining marks) and post-split any
  matched run on chars where ``str.isalnum()`` is False — Python's
  ``isalnum`` agrees with Rust's ``is_alphanumeric`` on L*/Nd/Nl/No.
- RemoveLongFilter runs BEFORE LowerCaser (tokens measured in UTF-8
  bytes of the original-case token), matching the reference filter order.

All entry points take/return pandas Series — the per-batch vectorized
shape used by `applyInPandas` / `mapInPandas` callers. The common case
(token == its ``\\w+`` run) stays on the C fast path.
"""

from __future__ import annotations

import re

import pandas as pd

DEFAULT_REMOVE_TOKEN_LENGTH = 255

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_WS_RE = re.compile(r"\S+")


def _split_non_alnum(run: str) -> list[str]:
    """Split a ``\\w+`` run on chars Rust would not treat as alphanumeric."""
    out: list[str] = []
    cur: list[str] = []
    for ch in run:
        if ch.isalnum():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _simple_tokens(text: str) -> list[str]:
    out: list[str] = []
    for run in _WORD_RE.findall(text):
        if run.isalnum():  # fast path: the whole run is a token
            out.append(run)
        else:
            out.extend(_split_non_alnum(run))
    return out


def _default_tokenize(text: str) -> list[str]:
    return [
        t.lower()
        for t in _simple_tokens(text)
        if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH
    ]


def _ascii_space_tokenize(text: str) -> list[str]:
    """Fast path equivalent to `default` for lowercase [a-z0-9 ] text."""
    return text.split()


def _whitespace_tokenize(text: str) -> list[str]:
    return _WS_RE.findall(text)


def _raw_tokenize(text: str) -> list[str]:
    return [text] if len(text.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH else []


def _raw_lowercase_tokenize(text: str) -> list[str]:
    t = text.lower()
    return [t] if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH else []


_TOKENIZERS = {
    "default": _default_tokenize,
    "ascii_space": _ascii_space_tokenize,
    "whitespace": _whitespace_tokenize,
    "raw": _raw_tokenize,
    "raw_lowercase": _raw_lowercase_tokenize,
    "lowercase": _raw_lowercase_tokenize,
}


def get_tokenizer(name: str):
    try:
        return _TOKENIZERS[name]
    except KeyError:
        raise NotImplementedError(
            f"tokenizer {name!r} not implemented (available: {sorted(_TOKENIZERS)})"
        ) from None


def tokenize_series(texts: pd.Series, tokenizer: str = "default") -> pd.Series:
    """Tokenize a pandas Series of strings → Series of list[str]."""
    fn = get_tokenizer(tokenizer)
    return texts.fillna("").map(fn)
