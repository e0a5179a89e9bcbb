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


_CJK_RANGES = (
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0x3400, 0x4DBF),   # Extension A
    (0x20000, 0x2A6DF), # Extension B
    (0xF900, 0xFAFF),   # Compatibility Ideographs
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _chinese_compatible_tokenize(text: str) -> list[str]:
    """Reference `chinese_compatible` analyzer
    (`quickwit-query/src/tokenizers/chinese_compatible.rs`): each CJK
    ideograph is its own token; other alphanumeric runs tokenize like
    `default`; then RemoveLong + LowerCaser."""
    out: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            out.append("".join(cur))
            cur.clear()

    for ch in text:
        if _is_cjk(ch):
            flush()
            out.append(ch)
        elif ch.isalnum():
            cur.append(ch)
        else:
            flush()
    flush()
    return [
        t.lower()
        for t in out
        if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH
    ]


def _en_stem_tokenize(text: str) -> list[str]:
    """default pipeline + Snowball English (Porter2) stemming — the
    reference's `en_stem` (`tokenizers/mod.rs:60-66`)."""
    from quickwit_spark.analysis.stemmer import make_cached_stemmer

    stem = make_cached_stemmer()
    return [stem(t) for t in _default_tokenize(text)]


_TOKENIZERS = {
    "default": _default_tokenize,
    "ascii_space": _ascii_space_tokenize,
    "whitespace": _whitespace_tokenize,
    "raw": _raw_tokenize,
    "raw_lowercase": _raw_lowercase_tokenize,
    "lowercase": _raw_lowercase_tokenize,
    "en_stem": _en_stem_tokenize,
    "chinese_compatible": _chinese_compatible_tokenize,
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


# ---------------------------------------------------------------------------
# Arrow-native flat tokenization (the indexing hot path)
# ---------------------------------------------------------------------------
#
# The segment builder needs (flat token stream, doc index per token), not
# per-doc lists. Doing the split/lower/length-filter in Arrow C++ kernels
# (RE2 `[^\pL\pN]+` split == maximal `[\pL\pN]+` runs == the `default`
# analyzer's token boundaries; utf8proc lowercase) keeps the whole
# tokenize stage out of Python object churn — ~10× less allocator/memory
# traffic per worker, which is what lets 32 concurrent executor threads
# scale instead of fighting over memory bandwidth.
#
# Parity: equivalent to `_default_tokenize` (token = maximal L*/N* run,
# drop tokens whose pre-lowercase UTF-8 length > 255, then lowercase) —
# property-tested against the pure-Python reference in
# tests/test_tokenizer.py.

_ARROW_SPLIT_PATTERNS = {
    "default": r"[^\pL\pN]+",
    "whitespace": r"\s+",
}


def _luts():
    import numpy as np

    alnum = np.zeros(256, dtype=bool)
    for lo, hi in ((0x30, 0x39), (0x41, 0x5A), (0x61, 0x7A)):
        alnum[lo : hi + 1] = True
    lower = np.arange(256, dtype=np.uint8)
    lower[0x41 : 0x5A + 1] += 32
    return alnum, lower


_ALNUM_LUT = None
_LOWER_LUT = None


def _tokenize_ascii_numpy(arr):
    """Pure-ASCII fast path for the `default` analyzer: byte-LUT run
    detection over the Arrow string buffer — no regex, no per-token
    Python objects. Returns (tokens pa.StringArray, doc_idx int64) or
    None if the batch contains non-ASCII bytes (caller falls back to
    the RE2 path, which is parity-equivalent)."""
    import numpy as np
    import pyarrow as pa

    global _ALNUM_LUT, _LOWER_LUT
    if _ALNUM_LUT is None:
        _ALNUM_LUT, _LOWER_LUT = _luts()

    if arr.type != pa.utf8() or len(arr) == 0 or arr.buffers()[1] is None:
        if len(arr) == 0:
            return pa.array([], type=pa.string()), np.zeros(0, np.int64)
        return None
    # int32 throughout: besides halving memory traffic, it keeps every
    # temp under glibc's 32 MiB mmap-threshold cap so buffers come from
    # the reusable heap — large mmap'd temps mean fresh page faults on
    # every call, which serialize catastrophically under 32 concurrent
    # workers on virtualized hosts.
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    base = int(buf_off[0])
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[base : int(buf_off[-1])]
    if data.size and int(data.max()) >= 0x80:
        return None
    offsets = buf_off - base if base else buf_off
    is_tok = _ALNUM_LUT[data]
    if not data.size:
        return pa.array([], type=pa.string()), np.zeros(0, np.int64)
    prev = np.empty_like(is_tok)
    prev[0] = False
    prev[1:] = is_tok[:-1]
    inner = offsets[1:-1]
    prev[inner[inner < data.size]] = False  # doc boundary breaks a run
    starts = np.flatnonzero(is_tok & ~prev).astype(np.int32)
    nxt = np.empty_like(is_tok)
    nxt[-1] = False
    nxt[:-1] = is_tok[1:]
    pos = inner[inner > 0] - 1
    nxt[pos[pos < data.size]] = False
    ends = np.flatnonzero(is_tok & ~nxt).astype(np.int32) + 1
    lengths = ends - starts
    keep = lengths <= DEFAULT_REMOVE_TOKEN_LENGTH
    if not keep.all():
        starts, lengths = starts[keep], lengths[keep]
    doc_idx = (np.searchsorted(offsets, starts, side="right") - 1).astype(np.int64)
    cum = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=cum[1:])
    total = int(cum[-1])
    # gather indices via cumsum-scatter (one pass; a ragged np.repeat
    # here costs 10× more than everything else combined)
    if total:
        g = np.ones(total, np.int32)
        g[0] = starts[0]
        if len(starts) > 1:
            g[cum[1:-1]] = starts[1:] - (starts[:-1] + lengths[:-1]) + 1
        gather = np.cumsum(g, dtype=np.int32)
    else:
        gather = np.zeros(0, np.int32)
    packed = _LOWER_LUT[data[gather]]
    tokens = pa.Array.from_buffers(
        pa.utf8(),
        len(lengths),
        [None, pa.py_buffer(cum.tobytes()), pa.py_buffer(packed.tobytes())],
    )
    return tokens, doc_idx


def tokenize_flat_arrow(texts, tokenizer: str = "default"):
    """texts (pa.Array/pd.Series of str) → (tokens np.ndarray[object],
    doc_idx np.ndarray[int64]) — the flattened token stream.

    Falls back to the pure-Python tokenizer for analyzers without an
    Arrow kernel (raw/lowercase are trivial; exotic ones keep parity).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.Array.from_pandas(texts, type=pa.string())
    if tokenizer not in _ARROW_SPLIT_PATTERNS:
        series = pd.Series(texts.to_pandas())
        lists = tokenize_series(series, tokenizer)
        lens = np.fromiter((len(t) for t in lists), dtype=np.int64, count=len(lists))
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for toks in lists:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
        return flat, np.repeat(np.arange(len(lists), dtype=np.int64), lens)

    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if tokenizer == "default":
        fast = _tokenize_ascii_numpy(texts)
        if fast is not None:
            return fast
    lists = pc.split_pattern_regex(texts, _ARROW_SPLIT_PATTERNS[tokenizer])
    flat = pc.list_flatten(lists)
    doc_idx = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    # RemoveLong(255 bytes) measured pre-lowercase, like the reference
    # filter order; empty strings are split artifacts at text edges.
    blen = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    mask = blen > 0
    if tokenizer == "default":
        mask &= blen <= DEFAULT_REMOVE_TOKEN_LENGTH
    if not mask.all():
        pa_mask = pa.array(mask)
        flat = pc.filter(flat, pa_mask)
        doc_idx = doc_idx[mask]
    if tokenizer == "default":
        flat = pc.utf8_lower(flat)
    return flat, doc_idx
