"""BM25 golden-score parity (FIXTURES.md §3).

Expected constants are the reference's own asserted values from its
`test_sort_bm25` fixture (`quickwit-search/src/tests.rs:616-700`):
3 docs, fields with record=freq + fieldnorms, query `title:one` must
yield f32 scores [(0.1738279, d2), (0.15965714, d1), (0.12343242, d0)].
"""

import numpy as np
import pytest

from quickwit_spark.codec import fieldnorm_to_id, id_to_fieldnorm
from quickwit_spark.search.bm25 import bm25_scores

# fixture docs: d0 title="one pad", d1 title="one", d2 title="one one"
TITLE_LENS = np.array([2, 1, 2])  # token counts
TITLE_TFS_ONE = np.array([1, 1, 2])  # tf of "one" per doc
N_DOCS = 3
DOC_FREQ_ONE = 3
TOTAL_TOKENS = 5


def _decoded_lens(lens):
    return id_to_fieldnorm(fieldnorm_to_id(np.asarray(lens, np.uint64)))


def test_title_one_scores_f32():
    avgdl = np.float32(TOTAL_TOKENS) / np.float32(N_DOCS)
    scores = bm25_scores(
        TITLE_TFS_ONE,
        _decoded_lens(TITLE_LENS),
        avgdl,
        DOC_FREQ_ONE,
        N_DOCS,
        dtype=np.float32,
    )
    # reference: d2=0.1738279, d1=0.15965714, d0=0.12343242
    expected = np.array([0.12343242, 0.15965714, 0.1738279], dtype=np.float32)
    assert scores == pytest.approx(expected, rel=1e-6)
    # ranking: d2 > d1 > d0
    assert list(np.argsort(-scores)) == [2, 1, 0]


def test_nofreq_two_scores_and_tie():
    # field `nofreq` has record=basic → tf is always 1 at scoring time
    lens = np.array([2, 1, 2])  # "two pad", "two", "two two"
    tfs = np.ones(3)
    avgdl = np.float32(5) / np.float32(3)
    scores = bm25_scores(tfs, _decoded_lens(lens), avgdl, 3, 3, dtype=np.float32)
    expected = np.array([0.12343242, 0.15965714, 0.12343242], dtype=np.float32)
    assert scores == pytest.approx(expected, rel=1e-6)
    # d0 and d2 tie exactly; reference breaks ties by docid DESC → [1, 2, 0]
    order = sorted(range(3), key=lambda d: (-scores[d], -d))
    assert order == [1, 2, 0]


def test_combined_query_sums_term_scores():
    # "title:one nofreq:two" → per-doc sum; reference golden:
    # [(0.31931427, 1), (0.2972603, 2), (0.24686484, 0)]
    avgdl = np.float32(5) / np.float32(3)
    s_one = bm25_scores(
        TITLE_TFS_ONE, _decoded_lens(TITLE_LENS), avgdl, 3, 3, dtype=np.float32
    )
    s_two = bm25_scores(
        np.ones(3), _decoded_lens(np.array([2, 1, 2])), avgdl, 3, 3, dtype=np.float32
    )
    total = (s_one + s_two).astype(np.float32)
    expected = np.array([0.24686484, 0.31931427, 0.2972603], dtype=np.float32)
    assert total == pytest.approx(expected, rel=1e-6)
    assert list(np.argsort(-total)) == [1, 2, 0]
