"""Delete tasks — delete-by-query applied lazily at merge.

Mirrors the reference's janitor/delete-task design
(`quickwit-janitor/src/actors/delete_task_planner.rs`, merge-side
application `quickwit-indexing/src/actors/merge_executor.rs:351-510`):
a delete is a QUERY recorded with a monotonically increasing
`delete_opstamp`; documents stay searchable until a merge/rewrite
applies pending deletes, filters the doomed docs, COMPACTS docids, and
publishes a rewritten segment with refreshed BM25 statistics.

Mechanics here:
- `delete_by_query` resolves the query to concrete (segment_id, doc_id)
  tombstones (one search job), anti-joins them against tombstones
  already recorded by earlier ops (so overlapping delete queries count
  each doc EXACTLY ONCE), writes only the new ones under
  `<index>/deletes/opstamp=<n>/` (a direct partition-directory write —
  never a static overwrite that would truncate sibling opstamps), and
  commits a `delete` manifest record carrying per-(segment, field)
  corrections (deleted docs + their exact token counts, decoded from
  the norms sidecar BY A SPARK JOB — only the tiny per-(segment,field)
  totals ever reach the driver).
- `plan_delete_rewrites` emits one single-input merge op per affected
  segment (the janitor's stale-opstamp planning).
- `execute_merge(..., apply_deletes=True)` (merge.py) drops doomed docids,
  shifts the survivors down (searchsorted compaction), rewrites norms
  and the docmap with the same mapping, and publishes corrected stats.
  The doomed-docid sets themselves never transit the driver: they are
  COMPACTED into a per-op parquet sidecar by `compact_tombstones` (a
  distributed job) and lazily memory-mapped by each executor via
  `load_tombstones` (per-process cache) — the 10⁸-doc delete stays on
  the executors.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from quickwit_spark.codec.postings import varint_decode
from quickwit_spark.index import manifest as mf

DELETES_DIR = "deletes"
COMPACT_DIR = "deletes_compact"


def _committed_opstamps(index_dir: str) -> set[int]:
    ops: set[int] = set()
    for c in mf.read_commits(index_dir):
        if c["kind"] == "delete":
            ops.update(int(k) for k in (c.get("checkpoint") or {}))
    return ops


def _on_disk_opstamps(index_dir: str) -> set[int]:
    d = os.path.join(index_dir, DELETES_DIR)
    out: set[int] = set()
    if os.path.isdir(d):
        for n in os.listdir(d):
            if n.startswith("opstamp="):
                try:
                    out.add(int(n.split("=", 1)[1]))
                except ValueError:
                    pass
    return out


def _next_opstamp(index_dir: str) -> int:
    # max over BOTH the committed ops and the on-disk partitions: a
    # crash between the tombstone write and mf.commit leaves an
    # orphaned partition, and reusing its opstamp would overwrite it
    # while simultaneously anti-joining against it (erasing the retried
    # delete). Orphans are never read (see _tombstone_paths) — they
    # just park their number.
    return max([0, *_committed_opstamps(index_dir), *_on_disk_opstamps(index_dir)]) + 1


def _tombstone_paths(index_dir: str) -> list[str]:
    """Partition dirs of COMMITTED delete ops only. An orphaned
    partition (crash before commit) has no manifest record — its stat
    corrections never happened, so applying or anti-joining its
    tombstones would desync counts from the manifest."""
    live = _committed_opstamps(index_dir) & _on_disk_opstamps(index_dir)
    d = os.path.join(index_dir, DELETES_DIR)
    return [os.path.join(d, f"opstamp={n}") for n in sorted(live)]


def delete_by_query(searcher, query, time_range=None) -> int:
    """Record a delete for every doc matching `query`. Returns the
    delete_opstamp. Docs remain searchable until a rewrite applies the
    delete (reference semantics)."""
    spark: SparkSession = searcher.spark
    index_dir = searcher.index_dir
    opstamp = _next_opstamp(index_dir)

    doomed = searcher.match_docs(query, time_range=time_range).select(
        "segment_id", "doc_id"
    )
    out_dir = os.path.join(index_dir, DELETES_DIR)
    prior_paths = _tombstone_paths(index_dir)
    if prior_paths:
        # overlapping delete queries may match docs an earlier op already
        # doomed — record each doc once so stat corrections never
        # double-subtract (ADVICE: corrections_for summed across
        # opstamps). Committed partitions only: an orphaned partition
        # from a crashed op must not suppress re-dooming its docs.
        prior = spark.read.parquet(*prior_paths).select(
            "segment_id", "doc_id"
        )
        doomed = doomed.join(prior, ["segment_id", "doc_id"], "left_anti")
    # write straight into this op's partition directory: a static
    # `.mode('overwrite').partitionBy('opstamp')` would truncate ALL
    # sibling opstamp partitions in a fresh session (ADVICE high)
    doomed.write.mode("overwrite").parquet(f"{out_dir}/opstamp={opstamp}")

    new_tomb = spark.read.parquet(f"{out_dir}/opstamp={opstamp}")
    seg_counts = {
        r["segment_id"]: r["n"]
        for r in new_tomb.groupBy("segment_id").agg(F.count("*").alias("n")).collect()
    }

    # per-(segment, field) corrections: #docs and Σ exact token lengths
    # of the doomed docs, decoded from the norms rows — computed as a
    # cogrouped Spark job (norm blobs and doomed-id sets stay on the
    # executors; only one tiny totals row per (segment, field) returns)
    corrections: dict[str, dict] = {}
    if seg_counts:
        norms = (
            searcher.inv()
            .filter(
                (F.col("kind") == "norms")
                & F.col("segment_id").isin(list(seg_counts))
            )
            .select("segment_id", "field", "term", "doc_freq", "payload2")
        )

        def corr_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            sid = key[0]
            ids = np.sort(right["doc_id"].to_numpy(dtype=np.int64))
            out = []
            by_field: dict[str, dict] = {}
            for _, r in left.iterrows():
                lens = varint_decode(r["payload2"], r["doc_freq"])
                # chunked norms rows carry their docid-range start in the
                # term column ("" == 0 for single-row build output)
                start = int(r["term"]) if r["term"] else 0
                sel = ids[(ids >= start) & (ids < start + len(lens))]
                agg = by_field.setdefault(
                    r["field"], {"deleted_docs": 0, "deleted_tokens": 0}
                )
                agg["deleted_docs"] += int(len(sel))
                agg["deleted_tokens"] += int(lens[sel - start].sum())
            for fld, agg in by_field.items():
                out.append(
                    {
                        "segment_id": sid,
                        "field": fld,
                        "deleted_docs": agg["deleted_docs"],
                        "deleted_tokens": agg["deleted_tokens"],
                    }
                )
            return pd.DataFrame(
                out,
                columns=["segment_id", "field", "deleted_docs", "deleted_tokens"],
            )

        corr_rows = (
            norms.groupBy("segment_id")
            .cogroup(new_tomb.groupBy("segment_id"))
            .applyInPandas(
                corr_fn,
                "segment_id string, field string, deleted_docs long, deleted_tokens long",
            )
            .collect()
        )
        for r in corr_rows:
            corrections.setdefault(r["segment_id"], {})[r["field"]] = {
                "deleted_docs": int(r["deleted_docs"]),
                "deleted_tokens": int(r["deleted_tokens"]),
            }
    mf.commit(
        index_dir,
        [],
        checkpoint={
            str(opstamp): {
                "query": repr(query),
                "segments": {s: int(n) for s, n in seg_counts.items()},
                "corrections": corrections,
            }
        },
        kind="delete",
    )
    return opstamp


def pending_deletes(index_dir: str) -> dict[int, dict]:
    """opstamp → delete record, EVERY committed op — the reference's
    `list_delete_tasks` likewise returns the full task list (the
    janitor decides staleness by comparing split delete_opstamps, not
    by mutating tasks). Use `unapplied_deletes` when only ops that
    still target a live segment matter."""
    out: dict[int, dict] = {}
    for c in mf.read_commits(index_dir):
        if c["kind"] == "delete":
            for k, v in (c.get("checkpoint") or {}).items():
                out[int(k)] = v
    return out


def unapplied_deletes(index_dir: str) -> dict[int, dict]:
    """The subset of delete ops with at least one target segment still
    published — everything else has been fully applied by rewrites and
    can be skipped by planners."""
    live = {s.segment_id for s in mf.live_segments(index_dir)}
    return {
        op: rec
        for op, rec in pending_deletes(index_dir).items()
        if live & set((rec.get("segments") or {}).keys())
    }


_TOMB_CHUNK = 1 << 20  # ids per compact row — keeps parquet cells bounded


def compact_tombstones(
    spark: SparkSession, index_dir: str, segment_ids: list[str], out_path: str
) -> dict[str, int]:
    """Distributed compaction of all pending tombstones for `segment_ids`
    into sorted-unique int64 blobs at `out_path` (rows: segment_id,
    start_rank, n, ids-binary). Returns {segment_id: tombstone_count} —
    the only thing that reaches the driver. Idempotent (overwrite)."""
    paths = _tombstone_paths(index_dir)
    if not paths:
        return {}

    def compact(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(pdf["doc_id"].to_numpy(dtype=np.int64))
        rows = []
        for lo in range(0, len(ids), _TOMB_CHUNK):
            part = ids[lo : lo + _TOMB_CHUNK]
            rows.append(
                {
                    "segment_id": key[0],
                    "start_rank": lo,
                    "n": len(part),
                    "ids": part.tobytes(),
                }
            )
        return pd.DataFrame(
            rows, columns=["segment_id", "start_rank", "n", "ids"]
        )

    (
        spark.read.parquet(*paths)
        .filter(F.col("segment_id").isin(segment_ids))
        .groupBy("segment_id")
        .applyInPandas(
            compact, "segment_id string, start_rank long, n long, ids binary"
        )
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return {
        r["segment_id"]: r["total"]
        for r in spark.read.parquet(out_path)
        .groupBy("segment_id")
        .agg(F.sum("n").alias("total"))
        .collect()
    }


_TOMB_CACHE: dict[str, dict] = {}
_TOMB_CACHE_MAX = 4  # per-op scratch; cap worker memory


def load_tombstones(path: str) -> dict[str, np.ndarray]:
    """Executor-side lazy load of a compact tombstone sidecar:
    {segment_id: sorted int64 doc_ids}. Cached per python worker process
    so a sidecar is read once per executor, not once per task."""
    cached = _TOMB_CACHE.get(path)
    if cached is not None:
        return cached
    out: dict[str, np.ndarray] = {}
    if os.path.isdir(path):
        import pyarrow.parquet as pq

        tbl = pq.read_table(path).to_pandas()
        for sid, g in tbl.groupby("segment_id", sort=False):
            g = g.sort_values("start_rank")
            out[sid] = np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in g["ids"]]
            )
    _TOMB_CACHE[path] = out
    while len(_TOMB_CACHE) > _TOMB_CACHE_MAX:
        _TOMB_CACHE.pop(next(iter(_TOMB_CACHE)))
    return out


def corrections_for(index_dir: str, segment_ids: list[str]) -> dict[str, dict]:
    """Merged per-(segment, field) stat corrections across delete ops.
    Safe to sum across opstamps: delete_by_query anti-joins new
    tombstones against prior ones, so each doomed doc's stats appear in
    exactly one op's corrections."""
    out: dict[str, dict] = {}
    for rec in pending_deletes(index_dir).values():
        for seg, fields in (rec.get("corrections") or {}).items():
            if seg not in segment_ids:
                continue
            for fld, c in fields.items():
                agg = out.setdefault(seg, {}).setdefault(
                    fld, {"deleted_docs": 0, "deleted_tokens": 0}
                )
                agg["deleted_docs"] += c["deleted_docs"]
                agg["deleted_tokens"] += c["deleted_tokens"]
    return out


def plan_delete_rewrites(index_dir: str) -> list:
    """One single-input rewrite op per published segment that has
    tombstones (the janitor's stale-delete_opstamp planning)."""
    from quickwit_spark.index.merge import MergeOp

    affected: set[str] = set()
    for rec in unapplied_deletes(index_dir).values():
        affected.update((rec.get("segments") or {}).keys())
    ops = []
    for s in mf.live_segments(index_dir):
        if s.segment_id in affected:
            ops.append(
                MergeOp(
                    op_id=f"del-{s.segment_id}-g{s.merge_gen + 1}",
                    segment_ids=[s.segment_id],
                    partition_id=s.partition_id,
                    merge_gen=s.merge_gen + 1,
                    # the rewrite must read/write the segment's OWN
                    # doc-mapping generation's docmap dataset — with
                    # the default uid 0, a generation>=1 segment's
                    # permutation read found zero rows and the rewrite
                    # published an empty segment (data loss)
                    doc_mapping_uid=s.doc_mapping_uid,
                )
            )
    return ops
