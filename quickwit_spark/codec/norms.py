"""Fieldnorm (document length) 1-byte quantization.

Quickwit/tantivy store one byte per (doc, field): a quantized document
token count used by the BM25 length normalization (reference behavior:
`quickwit-search/src/leaf.rs:394-402` warms fieldnorms only when
scoring; the BM25 fixture `quickwit-search/src/tests.rs:616-700`
exercises the decoded values).

The encoding below follows the public Lucene ``SmallFloat`` int4 scheme
(3 explicit mantissa bits + implicit leading bit, subnormal values 0-7
exact), which tantivy's fieldnorm code mirrors: small lengths are exact,
larger lengths collapse onto a geometric grid, and the decoded value is
always <= the true length (round-down), monotonically non-decreasing in
the id.
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint64)
    for idx in range(256):
        bits = idx & 0x07
        shift = (idx >> 3) - 1
        if shift == -1:  # subnormal: 0..7 exact
            table[idx] = bits
        else:
            table[idx] = (bits | 0x08) << shift
    return table


#: id -> decoded fieldnorm (token count). Strictly increasing.
FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(lengths: np.ndarray) -> np.ndarray:
    """Quantize exact token counts to 1-byte fieldnorm ids (round down)."""
    lengths = np.asarray(lengths, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, lengths, side="right") - 1
    return ids.astype(np.uint8)


def id_to_fieldnorm(ids: np.ndarray) -> np.ndarray:
    """Decode 1-byte fieldnorm ids back to (quantized) token counts."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.uint8)]
