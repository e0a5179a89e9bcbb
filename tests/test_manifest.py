"""Manifest-level metastore operations — Spark-free.

`list_splits` mirrors the reference metastore's ListSplitsQuery filters
(state, timestamp-range overlap, tags, maturity) over the commit log;
`delete_index` is the ES DELETE handler's metastore+storage path.
"""

import os

import pytest

from quickwit_spark.index.manifest import (
    PUBLISHED,
    REPLACED,
    STAGED,
    SegmentRecord,
    commit,
    delete_index,
    list_splits,
)


def _seed(index_dir: str):
    commit(
        index_dir,
        [
            SegmentRecord("seg-a", state=PUBLISHED, num_docs=10,
                          time_range=[0, 100], tags=["lang:en"], merge_gen=0),
            SegmentRecord("seg-b", state=PUBLISHED, num_docs=20,
                          time_range=[100, 200], tags=["lang:de"], merge_gen=1),
            SegmentRecord("seg-c", state=STAGED, num_docs=5,
                          time_range=None, tags=[], merge_gen=0),
        ],
    )
    # a later commit flips seg-a to replaced (merged away)
    commit(index_dir, [SegmentRecord("seg-a", state=REPLACED, num_docs=10)])


def test_list_splits_filters(tmp_path):
    idx = str(tmp_path / "idx")
    _seed(idx)

    ids = lambda rs: [r.segment_id for r in rs]  # noqa: E731
    assert ids(list_splits(idx)) == ["seg-a", "seg-b", "seg-c"]
    assert ids(list_splits(idx, states=(PUBLISHED,))) == ["seg-b"]
    assert ids(list_splits(idx, states=(STAGED,))) == ["seg-c"]
    assert ids(list_splits(idx, states=(REPLACED,))) == ["seg-a"]
    # time overlap; records without a range always match (seg-c is
    # staged-with-no-range, seg-a's LATEST record carries no range)
    assert ids(list_splits(idx, time_range=(150, 300))) == [
        "seg-a", "seg-b", "seg-c",
    ]
    assert ids(list_splits(idx, time_range=(300, 400))) == ["seg-a", "seg-c"]
    assert ids(list_splits(idx, tags_any=("lang:de", "lang:fr"))) == ["seg-b"]
    assert ids(list_splits(idx, min_merge_gen=1)) == ["seg-b"]
    # reconcile semantics: seg-a reports its LATEST state
    (a,) = [r for r in list_splits(idx) if r.segment_id == "seg-a"]
    assert a.state == REPLACED


def test_delete_index(tmp_path):
    idx = str(tmp_path / "idx2")
    _seed(idx)
    assert delete_index(idx) >= 2  # at least the two commit files
    assert not os.path.exists(idx)
    with pytest.raises(FileNotFoundError):
        delete_index(str(tmp_path / "never_an_index"))
