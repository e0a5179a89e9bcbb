"""Analyzers with tantivy/Quickwit-`default` parity, batch-vectorized.

The reference registers these analyzers
(`quickwit-query/src/tokenizers/mod.rs:36-104`):

    raw             whole input as one token, drop if > 255 bytes
    raw_lowercase   same + lowercase
    lowercase       same as raw_lowercase
    default         SimpleTokenizer (split on non-alphanumeric runs)
                    + RemoveLong(255 bytes, pre-lowercase) + LowerCaser
    whitespace      split on whitespace, no lowercase, no length filter
    en_stem         default + English (Porter2) stemmer
    chinese_compatible   CJK char-per-token + default elsewhere
    source_code_default / source_code_with_hex   camelCase/hex splitter
                    + RemoveLong + LowerCaser + AsciiFolding
    multilang_default    language-routed (KOR:/JPN:/CMN:/ENG: prefixes)
    + config-defined ngram/regex analyzers via register_tokenizer()

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


def _ascii_fold(t: str) -> str:
    """AsciiFoldingFilter analog: NFKD-decompose and strip combining
    marks (é→e, ü→u); non-Latin scripts pass through."""
    import unicodedata

    if t.isascii():
        return t
    return "".join(
        c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c)
    )


def _make_source_code_tokenize(enable_hex: bool):
    """Reference `source_code_default` / `source_code_with_hex`
    (`tokenizers/mod.rs:77-96`): CodeTokenizer + RemoveLong(255)
    + LowerCaser + AsciiFoldingFilter."""
    from quickwit_spark.analysis.code_tokenizer import code_tokens

    def tokenize(text: str) -> list[str]:
        return [
            _ascii_fold(t.lower())
            for t in code_tokens(text, enable_hex)
            if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH
        ]

    return tokenize


_HANGUL = ((0xAC00, 0xD7AF), (0x1100, 0x11FF), (0x3130, 0x318F))
_KANA = ((0x3040, 0x309F), (0x30A0, 0x30FF), (0x31F0, 0x31FF))


def _any_in(text: str, ranges) -> bool:
    return any(any(lo <= ord(c) <= hi for lo, hi in ranges) for c in text)


def _multilang_tokenize(text: str) -> list[str]:
    """Reference `multilang_default` (`tokenizers/multilang.rs`):
    language-routed analysis with the documented `KOR:`/`JPN:`/`CMN:`/
    `ENG:` prefix override, then RemoveLong + LowerCaser.

    Sandbox approximation, stated openly: the reference segments CJK
    with lindera dictionaries (CcCedict/IPADIC/KoDic) and detects
    language with whichlang — neither ships here. Detection falls back
    to Unicode-script inspection, Chinese/Japanese segment per CJK/kana
    character (the same convention as `chinese_compatible`), and Korean
    (space-delimited Hangul) uses simple-token runs. Token STREAM shape
    (per-doc list[str], filters, prefixes) matches the reference
    contract; dictionary-segmentation boundaries do not."""
    lang = None
    for pfx in ("KOR:", "JPN:", "CMN:", "ENG:"):
        if text.startswith(pfx):
            lang = pfx[:3]
            text = text[4:]
            break
    if not text.strip():
        return []
    if lang is None:
        if _any_in(text, _HANGUL):
            lang = "KOR"
        elif _any_in(text, _KANA):
            lang = "JPN"
        elif _any_in(text, _CJK_RANGES):
            lang = "CMN"
        else:
            lang = "ENG"
    if lang in ("CMN", "JPN"):
        out: list[str] = []
        cur: list[str] = []

        def flush():
            if cur:
                out.append("".join(cur))
                cur.clear()

        perchar = _CJK_RANGES + (_KANA if lang == "JPN" else ())
        for ch in text:
            cp = ord(ch)
            if any(lo <= cp <= hi for lo, hi in perchar):
                flush()
                out.append(ch)
            elif ch.isalnum():
                cur.append(ch)
            else:
                flush()
        flush()
        toks = out
    else:  # KOR and ENG: simple-token runs
        toks = _simple_tokens(text)
    return [
        t.lower()
        for t in toks
        if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH
    ]


_TOKENIZERS = {
    "default": _default_tokenize,
    "ascii_space": _ascii_space_tokenize,
    "whitespace": _whitespace_tokenize,
    "raw": _raw_tokenize,
    "raw_lowercase": _raw_lowercase_tokenize,
    "lowercase": _raw_lowercase_tokenize,
    "en_stem": _en_stem_tokenize,
    "chinese_compatible": _chinese_compatible_tokenize,
    "source_code_default": _make_source_code_tokenize(False),
    "source_code_with_hex": _make_source_code_tokenize(True),
    "multilang_default": _multilang_tokenize,
}


def get_tokenizer(name: str):
    try:
        return _TOKENIZERS[name]
    except KeyError:
        raise NotImplementedError(
            f"tokenizer {name!r} not implemented (available: {sorted(_TOKENIZERS)})"
        ) from None


# ---------------------------------------------------------------------------
# config-defined custom tokenizers (reference: doc-mapping `tokenizers`
# entries, `doc_mapper/tokenizer_entry.rs:25-150` — ngram / regex /
# simple types composed with remove_long / lower_caser / ascii_folding
# filters)
# ---------------------------------------------------------------------------


def _apply_filters(toks: list[str], filters) -> list[str]:
    for f in filters:
        if f == "remove_long":
            toks = [
                t for t in toks if len(t.encode("utf-8")) <= DEFAULT_REMOVE_TOKEN_LENGTH
            ]
        elif f == "lower_caser":
            toks = [t.lower() for t in toks]
        elif f == "ascii_folding":
            toks = [_ascii_fold(t) for t in toks]
        else:
            raise NotImplementedError(f"token filter {f!r}")
    return toks


def register_tokenizer(name: str, fn) -> None:
    """Register a custom analyzer under `name` for use in FieldConfig."""
    _TOKENIZERS[name] = fn


def make_ngram_tokenizer(
    min_gram: int,
    max_gram: int,
    prefix_only: bool = False,
    filters=("remove_long", "lower_caser"),
):
    """tantivy NgramTokenizer semantics (`tokenizer_entry.rs:133-140`):
    all character n-grams of the text with min_gram ≤ len ≤ max_gram,
    in position order (start asc, length asc); `prefix_only` keeps only
    the grams anchored at offset 0."""
    if not (0 < min_gram <= max_gram):
        raise ValueError("require 0 < min_gram <= max_gram")

    def tokenize(text: str) -> list[str]:
        out = []
        starts = (0,) if prefix_only else range(len(text))
        for i in starts:
            for g in range(min_gram, max_gram + 1):
                if i + g > len(text):
                    break
                out.append(text[i : i + g])
        return _apply_filters(out, filters)

    return tokenize


def make_regex_tokenizer(pattern: str, filters=("remove_long", "lower_caser")):
    """tantivy RegexTokenizer semantics (`tokenizer_entry.rs:142-144`):
    every non-overlapping match of `pattern` is a token."""
    rx = re.compile(pattern)

    def tokenize(text: str) -> list[str]:
        return _apply_filters([m.group(0) for m in rx.finditer(text)], filters)

    return tokenize


def build_tokenizer(spec: dict):
    """Instantiate an analyzer from a config spec (the serializable form
    that travels in IndexConfig.tokenizers so executors reconstruct the
    SAME analyzer — reference `TokenizerConfig.text_analyzer()`,
    `tokenizer_entry.rs:44-80`). spec = {"type": "ngram"|"regex"|
    "simple"|"source_code"|"multilang", ...options, "filters": [...]}"""
    t = spec.get("type")
    filters = tuple(spec.get("filters", ("remove_long", "lower_caser")))
    if t == "ngram":
        return make_ngram_tokenizer(
            spec["min_gram"], spec["max_gram"], spec.get("prefix_only", False), filters
        )
    if t == "regex":
        return make_regex_tokenizer(spec["pattern"], filters)
    if t == "simple":

        def tokenize(text: str) -> list[str]:
            return _apply_filters(_simple_tokens(text), filters)

        return tokenize
    if t == "source_code":
        from quickwit_spark.analysis.code_tokenizer import code_tokens

        enable_hex = bool(spec.get("hex", False))

        def tokenize(text: str) -> list[str]:
            return _apply_filters(code_tokens(text, enable_hex), filters)

        return tokenize
    if t == "multilang":
        return _multilang_tokenize
    raise NotImplementedError(f"tokenizer type {t!r}")


def resolve_tokenizer(name: str, custom: dict | None = None):
    """Resolve `name` against config-defined specs first, then the
    built-in registry. `custom` is IndexConfig.tokenizers."""
    if custom and name in custom:
        return build_tokenizer(custom[name])
    return get_tokenizer(name)


def tokenize_series(texts: pd.Series, tokenizer="default") -> pd.Series:
    """Tokenize a pandas Series of strings → Series of list[str].
    `tokenizer` is a registry name or a callable analyzer."""
    fn = tokenizer if callable(tokenizer) else get_tokenizer(tokenizer)
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
    # run edges from ONE diff pass over the mask (a shifted-copy
    # prev/nxt formulation costs two extra full-array passes)
    dd = np.diff(is_tok.view(np.int8))
    starts = (np.flatnonzero(dd == 1) + 1).astype(np.int32)
    ends = (np.flatnonzero(dd == -1) + 1).astype(np.int32)
    if is_tok[0]:
        starts = np.concatenate(([np.int32(0)], starts))
    if is_tok[-1]:
        ends = np.concatenate((ends, [np.int32(data.size)]))
    # a doc boundary strictly inside a run splits it (tokens never span
    # documents); breaks are few (≤ num docs) so the sorted merge via
    # searchsorted+insert is O(T) with tiny constants
    inner = offsets[1:-1]
    inner = inner[(inner > 0) & (inner < data.size)]
    brk = inner[is_tok[inner - 1] & is_tok[inner]]
    if brk.size:
        brk = np.unique(brk).astype(np.int32)
        starts = np.insert(starts, np.searchsorted(starts, brk), brk)
        ends = np.insert(ends, np.searchsorted(ends, brk), brk)
    lengths = ends - starts
    keep = lengths <= DEFAULT_REMOVE_TOKEN_LENGTH
    if not keep.all():
        starts, lengths = starts[keep], lengths[keep]
    # docs ≪ tokens: count token starts per doc with a D·log T search,
    # then ONE repeat — the per-token T·log D searchsorted costs ~5×
    tok_per_doc = np.diff(np.searchsorted(starts, offsets))
    doc_idx = np.repeat(np.arange(len(tok_per_doc), dtype=np.int64), tok_per_doc)
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


def tokenize_flat_arrow(texts, tokenizer="default"):
    """texts (pa.Array/pd.Series of str) → (tokens np.ndarray[object],
    doc_idx np.ndarray[int64]) — the flattened token stream.

    Falls back to the pure-Python tokenizer for analyzers without an
    Arrow kernel (raw/lowercase are trivial; exotic ones keep parity).
    `tokenizer` may be a callable analyzer (config-defined custom).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.Array.from_pandas(texts, type=pa.string())
    if callable(tokenizer) or tokenizer not in _ARROW_SPLIT_PATTERNS:
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
