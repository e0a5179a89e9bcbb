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


def test_snapshot_compaction_preserves_state(tmp_path):
    """compact_manifest folds the log into one snapshot: reconcile,
    per-kind checkpoints, delete opstamps, and next_seq are identical
    before and after; leftover commit files at or below the snapshot
    seq are ignored (crash idempotence)."""
    import json

    from quickwit_spark.index import manifest as mf

    d = str(tmp_path / "idx")
    commit(d, [SegmentRecord(segment_id="s1", num_docs=5)],
           checkpoint={"b0": {"docs": 5}}, kind="build")
    commit(d, [SegmentRecord(segment_id="s2", num_docs=7, doc_mapping_uid=1)],
           checkpoint={"b1": {"docs": 7}}, kind="build")
    commit(d, [], checkpoint={"3": {"query": "x"}}, kind="delete")
    commit(d, [SegmentRecord(segment_id="s1", state=REPLACED, num_docs=5),
               SegmentRecord(segment_id="m1", num_docs=5, merge_gen=1)],
           checkpoint={"m1": {"inputs": ["s1"]}}, kind="merge")

    before_rec = {k: vars(v) for k, v in mf.reconcile(d).items()}
    before_build = mf.committed_checkpoints(d, "build")
    before_merge = mf.committed_checkpoints(d, "merge")
    before_delete = mf.committed_checkpoints(d, "delete")
    seq_before = mf.next_seq(d)

    name = mf.compact_manifest(d)
    assert name is not None and name.startswith("snapshot-")
    assert mf._commit_files(d) == []  # all folded

    assert {k: vars(v) for k, v in mf.reconcile(d).items()} == before_rec
    assert mf.committed_checkpoints(d, "build") == before_build
    assert mf.committed_checkpoints(d, "merge") == before_merge
    assert mf.committed_checkpoints(d, "delete") == before_delete
    assert mf.next_seq(d) == seq_before

    # new commits after the snapshot fold in normally
    commit(d, [SegmentRecord(segment_id="s3", num_docs=1)],
           checkpoint={"b2": {"docs": 1}}, kind="build")
    rec = mf.reconcile(d)
    assert set(rec) == {"s1", "s2", "m1", "s3"}
    assert rec["s1"].state == REPLACED
    assert rec["s2"].doc_mapping_uid == 1
    assert mf.committed_checkpoints(d, "build") == {
        **before_build, "b2": {"docs": 1},
    }

    # crash idempotence: a stale commit file at a folded seq is ignored
    stale = os.path.join(d, "_manifest", "commit-00000000-deadbeef.json")
    with open(stale, "w") as f:
        json.dump({"seq": 0, "kind": "build", "checkpoint": {"bX": {}},
                   "segments": [{"segment_id": "ghost"}]}, f)
    assert "ghost" not in mf.reconcile(d)
    assert "bX" not in mf.committed_checkpoints(d, "build")

    # a second compaction folds snapshot + new commits into one again
    mf.compact_manifest(d)
    assert set(mf.reconcile(d)) == {"s1", "s2", "m1", "s3"}
    assert len(mf._snapshot_files(d)) == 1


def test_auto_compaction_threshold(tmp_path, monkeypatch):
    from quickwit_spark.index import manifest as mf

    monkeypatch.setattr(mf, "COMPACT_EVERY", 10)
    d = str(tmp_path / "idx2")
    for i in range(25):
        commit(d, [SegmentRecord(segment_id=f"s{i}", num_docs=1)],
               checkpoint={f"b{i}": {}}, kind="build")
    # the log never grows past the threshold
    assert len(mf._commit_files(d)) < 10
    assert len(mf._snapshot_files(d)) == 1
    assert set(mf.reconcile(d)) == {f"s{i}" for i in range(25)}
    assert set(mf.committed_checkpoints(d, "build")) == {
        f"b{i}" for i in range(25)
    }


def test_reader_vs_concurrent_compaction_torn_view(tmp_path, monkeypatch):
    """A lock-free read_commits that interleaves with a compaction must
    NOT return a view missing a prefix of commits. Deterministic
    reproduction of the race: the reader's first commit-file listing
    reflects the pre-compaction log, but a compaction (snapshot write +
    file deletions) completes before the reader opens the files — the
    reader must detect the tear and retry onto the consistent
    snapshot+suffix view."""
    from quickwit_spark.index import manifest as mf

    d = str(tmp_path / "idx3")
    for i in range(6):
        commit(d, [SegmentRecord(segment_id=f"s{i}", num_docs=1)],
               checkpoint={f"b{i}": {}}, kind="build")
    expected = set(mf.reconcile(d))

    real_listing = mf._commit_files
    state = {"fired": False}

    def racing_listing(index_dir):
        files = real_listing(index_dir)
        if not state["fired"] and files:
            state["fired"] = True
            # compaction lands AFTER the listing, BEFORE the opens
            mf.compact_manifest(index_dir)
            return files  # stale: these files are now deleted
        return files

    monkeypatch.setattr(mf, "_commit_files", racing_listing)
    commits = mf.read_commits(d)
    assert state["fired"]
    segs = {r["segment_id"] for c in commits for r in c["segments"]}
    assert segs == expected  # no lost prefix, no empty manifest


def test_reader_vs_concurrent_compaction_snapshot_moved(tmp_path, monkeypatch):
    """Variant: the reader sees NO snapshot at first, then the listing
    runs after compaction deleted every commit file. Without the
    before/after snapshot-seq check this returned an EMPTY manifest."""
    from quickwit_spark.index import manifest as mf

    d = str(tmp_path / "idx4")
    for i in range(4):
        commit(d, [SegmentRecord(segment_id=f"s{i}", num_docs=1)], kind="build")
    expected = set(mf.reconcile(d))

    real_snap = mf._latest_snapshot
    state = {"calls": 0}

    def racing_snapshot(index_dir):
        state["calls"] += 1
        if state["calls"] == 1:
            # reader's first snapshot probe: pre-compaction (none yet);
            # the compaction then fully completes before the listing
            mf.compact_manifest(index_dir)
            return None
        return real_snap(index_dir)

    monkeypatch.setattr(mf, "_latest_snapshot", racing_snapshot)
    commits = mf.read_commits(d)
    segs = {r["segment_id"] for c in commits for r in c["segments"]}
    assert segs == expected
