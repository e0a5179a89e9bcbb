"""Retention + garbage collection (the reference's janitor tail).

Mirrors `quickwit-janitor/src/retention_policy_execution.rs` (drop
splits whose time range is entirely past retention) and
`actors/garbage_collector.rs` (delete files of dead splits).

Retention is a manifest-only operation: segments age out by flipping
state to `replaced` in one commit — searches prune them immediately,
files stay until GC. GC removes a batch directory only when EVERY
segment ever published from it is dead (build batches hold several
segments; merge outputs are one-segment batches), so a GC pass can
never touch live data.
"""

from __future__ import annotations

import os
import shutil

from quickwit_spark.index import manifest as mf


def apply_retention(index_dir: str, cutoff_micros: int) -> list[str]:
    """Retire every published segment whose time range ends before
    `cutoff_micros`. Segments without a time range never expire.
    Returns the retired segment ids."""
    retired = []
    records = []
    for s in mf.live_segments(index_dir):
        if s.time_range is not None and s.time_range[1] < cutoff_micros:
            s.state = mf.REPLACED
            records.append(s)
            retired.append(s.segment_id)
    if records:
        mf.commit(
            index_dir,
            records,
            checkpoint={"retention": {"cutoff_micros": cutoff_micros, "retired": retired}},
            kind="retention",
        )
    return retired


def _batch_of(rec: mf.SegmentRecord) -> str:
    return (rec.lineage or {}).get("batch_id") or rec.segment_id


def garbage_collect(index_dir: str, dry_run: bool = False) -> list[str]:
    """Remove batch partition dirs whose segments are ALL dead.
    Returns the removed (or would-remove) relative paths."""
    all_segs = mf.reconcile(index_dir)
    live_batches = {
        _batch_of(r) for r in all_segs.values() if r.state == mf.PUBLISHED
    }
    known_batches = {_batch_of(r) for r in all_segs.values()}
    removed: list[str] = []
    # per-generation docmap datasets (builder.docs_path): docs_uid<N>
    # dirs exist after a non-additive doc-mapping update
    gen_docs = [
        e
        for e in sorted(os.listdir(index_dir))
        if e.startswith("docs_uid") and os.path.isdir(os.path.join(index_dir, e))
    ] if os.path.isdir(index_dir) else []
    for sub in ("inv", "docs", *gen_docs):
        base = os.path.join(index_dir, sub)
        if not os.path.isdir(base):
            continue
        for entry in sorted(os.listdir(base)):
            if not entry.startswith("batch_id="):
                continue
            batch = entry.split("=", 1)[1]
            # only collect batches the manifest knows and proves dead —
            # an unknown dir might belong to an in-flight build
            if batch in known_batches and batch not in live_batches:
                removed.append(f"{sub}/{entry}")
                if not dry_run:
                    shutil.rmtree(os.path.join(base, entry), ignore_errors=True)

    # merge-op tombstone sidecars (deletes_compact/<op_id>): per-op
    # scratch, dead once the manifest carries the op's merged segment
    from quickwit_spark.index.deletes import COMPACT_DIR, DELETES_DIR

    comp = os.path.join(index_dir, COMPACT_DIR)
    if os.path.isdir(comp):

        def _scratch_owner(entry: str) -> str:
            # sidecars carry execution nonces: `<op>_tomb_<nonce>` /
            # `<op>_perm_<nonce>` (legacy: bare `<op>` and `<op>_perm`)
            for marker in ("_tomb_", "_perm_"):
                if marker in entry:
                    return entry.split(marker)[0]
            if entry.endswith("_perm"):
                return entry[: -len("_perm")]
            return entry

        for entry in sorted(os.listdir(comp)):
            # dead once the owner op's merged segment is in the
            # manifest; an op that crashed before commit keeps its
            # scratch (conservative — a rerun may still want the
            # tombstone compaction, and we cannot tell it apart from
            # an op that is mid-flight right now)
            if _scratch_owner(entry) in all_segs:
                removed.append(f"{COMPACT_DIR}/{entry}")
                if not dry_run:
                    shutil.rmtree(os.path.join(comp, entry), ignore_errors=True)

    # tombstone partitions (deletes/opstamp=N): dead once NO segment
    # they target is still published (every target replaced/rewritten)
    ddir = os.path.join(index_dir, DELETES_DIR)
    if os.path.isdir(ddir):
        import pyarrow as pa
        import pyarrow.dataset as pads

        live_ids = {
            r.segment_id for r in all_segs.values() if r.state == mf.PUBLISHED
        }
        for entry in sorted(os.listdir(ddir)):
            if not entry.startswith("opstamp="):
                continue
            try:
                targets = set(
                    pads.dataset(os.path.join(ddir, entry))
                    .to_table(columns=["segment_id"])
                    .column("segment_id")
                    .to_pylist()
                )
            except (OSError, pa.ArrowInvalid):
                continue  # unreadable/in-flight — leave it
            if targets and not (targets & live_ids):
                removed.append(f"{DELETES_DIR}/{entry}")
                if not dry_run:
                    shutil.rmtree(os.path.join(ddir, entry), ignore_errors=True)
    return removed
