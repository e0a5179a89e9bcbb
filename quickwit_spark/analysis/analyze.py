"""`POST /api/v1/analyze` analog — tokenize text with an ad-hoc config.

Mirrors the reference endpoint
(`quickwit-serve/src/index_api/rest_handler.rs:129-159` →
`quickwit-doc-mapper/src/doc_mapper/tokenizer_entry.rs:44-118`
`analyze_text`): the request carries a flattened `TokenizerConfig`
(`type`: simple | multilang | source_code | ngram | regex, plus the
ngram/regex options and a `filters` list of
remove_long | lower_caser | ascii_folding) and a `text`; the response
is the tantivy token stream as JSON objects
`{"offset_from", "offset_to", "position", "position_length", "text"}`
with BYTE offsets into the analyzed text.

Tokenizer parity notes (all public tantivy semantics):
- `simple` splits on non-alphanumeric code points; positions count
  tokens 0,1,2,…
- `ngram(min_gram, max_gram, prefix_only)` emits char-window grams
  start-major then size-ascending; every gram keeps position 0 (the
  tantivy NgramTokenizer never advances positions).
- `regex(pattern)` emits non-overlapping matches in order.
- `source_code` reuses this repo's CodeTokenizer port
  (`analysis/code_tokenizer.py`).
- `multilang` routes on the `KOR:`/`JPN:`/`CMN:`/`ENG:` prefix or
  Unicode-script detection (the sandbox approximation documented on
  `_multilang_tokenize`); offsets are relative to the text AFTER a
  language prefix is stripped, exactly like the reference
  (`tokenizers/multilang.rs:139` slices `&text[4..]`).
- `remove_long` keeps tokens with utf-8 byte length < 255
  (tantivy `RemoveLongFilter::limit(DEFAULT_REMOVE_TOKEN_LENGTH)`,
  an exclusive limit).
- `ascii_folding` is the NFKD-strip approximation shared with the
  indexing analyzers (`_ascii_fold`).
"""

from __future__ import annotations

import re

from quickwit_spark.analysis.tokenizer import (
    DEFAULT_REMOVE_TOKEN_LENGTH,
    _ascii_fold,
    _is_cjk,
    _HANGUL,
    _KANA,
    _any_in,
)

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_VALID_FILTERS = ("remove_long", "lower_caser", "ascii_folding")


def _simple_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) char spans of SimpleTokenizer tokens: maximal runs
    of alphanumeric code points (Rust `char::is_alphanumeric`)."""
    spans: list[tuple[int, int]] = []
    start = None
    for i, ch in enumerate(text):
        if ch.isalnum():
            if start is None:
                start = i
        elif start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(text)))
    return spans


def _ngram_spans(
    text: str, min_gram: int, max_gram: int, prefix_only: bool
) -> list[tuple[int, int]]:
    if min_gram <= 0:
        raise ValueError("min_gram must be greater than 0")
    if min_gram > max_gram:
        raise ValueError("min_gram must not be greater than max_gram")
    n = len(text)
    spans: list[tuple[int, int]] = []
    starts = [0] if prefix_only else range(n)
    for s in starts:
        for size in range(min_gram, max_gram + 1):
            if s + size > n:
                break
            spans.append((s, s + size))
    return spans


def _regex_spans(text: str, pattern: str) -> list[tuple[int, int]]:
    try:
        rx = re.compile(pattern)
    except re.error as e:
        raise ValueError(f"invalid regex tokenizer: {e}") from e
    return [m.span() for m in rx.finditer(text) if m.end() > m.start()]


def _multilang_spans(text: str) -> tuple[str, list[tuple[int, int]]]:
    """Returns (analyzed_text, spans) — analyzed_text has any language
    prefix stripped and spans index into it (reference behavior)."""
    lang = None
    for pfx in ("KOR:", "JPN:", "CMN:", "ENG:"):
        if text.startswith(pfx):
            lang = pfx[:3]
            text = text[4:]
            break
    if lang is None:
        if _any_in(text, _HANGUL):
            lang = "KOR"
        elif _any_in(text, _KANA):
            lang = "JPN"
        elif any(_is_cjk(c) for c in text):
            lang = "CMN"
        else:
            lang = "ENG"
    if lang in ("CMN", "JPN"):
        # per-CJK/kana-char segmentation, other alnum runs stay whole
        spans: list[tuple[int, int]] = []
        start = None
        for i, ch in enumerate(text):
            cjkish = _is_cjk(ch) or any(lo <= ord(ch) <= hi for lo, hi in _KANA)
            if cjkish:
                if start is not None:
                    spans.append((start, i))
                    start = None
                spans.append((i, i + 1))
            elif ch.isalnum():
                if start is None:
                    start = i
            elif start is not None:
                spans.append((start, i))
                start = None
        if start is not None:
            spans.append((start, len(text)))
        return text, spans
    return text, _simple_spans(text)


def analyze_text(text: str, config: dict) -> list[dict]:
    """Reference `analyze_text(text, TokenizerConfig)` — returns the
    serialized tantivy Token list."""
    if not isinstance(text, str):
        raise ValueError("`text` must be a string")
    cfg = dict(config)
    ttype = cfg.pop("type", None)
    filters = cfg.pop("filters", [])
    if not isinstance(filters, (list, tuple)):
        raise ValueError("`filters` must be a list")
    for f in filters:
        if f not in _VALID_FILTERS:
            raise ValueError(f"unknown token filter {f!r}")

    analyzed = text
    positions: list[int] | None = None  # default: 0,1,2,…
    if ttype == "simple":
        _reject_unknown(cfg, ())
        spans = _simple_spans(text)
    elif ttype == "source_code":
        _reject_unknown(cfg, ())
        from quickwit_spark.analysis.code_tokenizer import code_token_spans

        spans = code_token_spans(text)
    elif ttype == "multilang":
        _reject_unknown(cfg, ())
        analyzed, spans = _multilang_spans(text)
    elif ttype == "ngram":
        opts = _take_opts(cfg, {"min_gram": None, "max_gram": None, "prefix_only": False})
        if opts["min_gram"] is None or opts["max_gram"] is None:
            raise ValueError("ngram tokenizer requires min_gram and max_gram")
        spans = _ngram_spans(
            text, int(opts["min_gram"]), int(opts["max_gram"]), bool(opts["prefix_only"])
        )
        positions = [0] * len(spans)
    elif ttype == "regex":
        opts = _take_opts(cfg, {"pattern": None})
        if opts["pattern"] is None:
            raise ValueError("regex tokenizer requires a pattern")
        spans = _regex_spans(text, str(opts["pattern"]))
    else:
        raise ValueError(f"unknown tokenizer type {ttype!r}")

    # byte offsets: prefix utf-8 lengths of the analyzed text
    byte_at = [0]
    for ch in analyzed:
        byte_at.append(byte_at[-1] + len(ch.encode("utf-8")))

    # position = the underlying tokenizer's slot (span index): tantivy's
    # RemoveLongFilter skips tokens but the tokenizer below it still
    # advances the position counter, so removed tokens consume slots.
    tokens: list[dict] = []
    for idx, (s, e) in enumerate(spans):
        tok = analyzed[s:e]
        for f in filters:
            if f == "remove_long":
                if len(tok.encode("utf-8")) >= DEFAULT_REMOVE_TOKEN_LENGTH:
                    tok = None
                    break
            elif f == "lower_caser":
                tok = tok.lower()
            elif f == "ascii_folding":
                tok = _ascii_fold(tok)
        if tok is None:
            continue
        tokens.append(
            {
                "offset_from": byte_at[s],
                "offset_to": byte_at[e],
                "position": positions[idx] if positions is not None else idx,
                "position_length": 1,
                "text": tok,
            }
        )
    return tokens


def _reject_unknown(cfg: dict, allowed: tuple):
    extra = [k for k in cfg if k not in allowed]
    if extra:
        raise ValueError(f"unknown tokenizer config fields: {extra}")


def _take_opts(cfg: dict, defaults: dict) -> dict:
    out = {}
    for k, dv in defaults.items():
        out[k] = cfg.pop(k, dv)
    _reject_unknown(cfg, ())
    return out
