"""BM25 scoring kernel (numpy, f32-parity and f64-oracle modes).

Implements the Lucene/tantivy BM25 used by the reference when a query
sorts by ``_score`` (opt-in; reference behavior documented at
`quickwit-search/src/collector.rs:821-831`, golden scores at
`quickwit-search/src/tests.rs:616-700`, requirement of record=freq +
fieldnorms at `docs/overview/concepts/querying.md:107`):

    idf(n, N)  = ln(1 + (N - n + 0.5) / (n + 0.5))
    weight     = idf * (k1 + 1)
    score(d)   = weight * tf_d / (tf_d + k1 * (1 - b + b * dl_d / avgdl))

with k1 = 1.2, b = 0.75, dl the (1-byte-quantized, decoded) fieldnorm of
the doc and avgdl = total_tokens / num_docs of the SAME segment —
statistics are per-segment, never global, exactly like the reference's
per-split Searcher (`quickwit-search/src/leaf.rs:437-500`).

``dtype=float32`` reproduces the reference's f32 arithmetic for
rank-identity; ``dtype=float64`` is the oracle-comparable mode used by
queries checked against DuckDB SQL.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(doc_freq, doc_count, dtype=np.float32):
    """ln(1 + (N - n + 0.5)/(n + 0.5)), computed in `dtype`."""
    n = np.asarray(doc_freq, dtype=dtype)
    big_n = np.asarray(doc_count, dtype=dtype)
    x = (big_n - n + dtype(0.5)) / (n + dtype(0.5))
    return np.log1p(x).astype(dtype)


def bm25_weight(doc_freq, doc_count, boost=1.0, dtype=np.float32, k1=K1):
    """idf * (k1 + 1) * boost — the per-term multiplier. `k1` must be
    the index's configured value (the tf-norm honors it too; a
    mismatched multiplier breaks the early-termination score bounds)."""
    return (idf(doc_freq, doc_count, dtype) * dtype(1.0 + k1) * dtype(boost)).astype(
        dtype
    )


def tf_component(tfs, doc_lens, avgdl, dtype=np.float32):
    """tf / (tf + k1*(1 - b + b*dl/avgdl)) — per-posting factor in [0,1)."""
    tf = np.asarray(tfs, dtype=dtype)
    dl = np.asarray(doc_lens, dtype=dtype)
    norm = dtype(K1) * (dtype(1.0 - B) + dtype(B) * dl / dtype(avgdl))
    return (tf / (tf + norm)).astype(dtype)


def bm25_scores(
    tfs, doc_lens, avgdl, doc_freq, doc_count, boost=1.0, dtype=np.float32, k1=K1
):
    """Full per-posting BM25 scores for one term in one segment."""
    w = bm25_weight(doc_freq, doc_count, boost, dtype, k1)
    return (w * tf_component(tfs, doc_lens, avgdl, dtype)).astype(dtype)
