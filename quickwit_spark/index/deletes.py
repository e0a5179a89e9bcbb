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
  tombstones (one search job), writes them under `<index>/deletes/`,
  and commits a `delete` manifest record carrying per-(segment, field)
  corrections (deleted docs + their exact token counts, decoded from
  the norms sidecar) so the rewrite can compute exact post-delete
  stats without re-reading anything.
- `plan_delete_rewrites` emits one single-input merge op per affected
  segment (the janitor's stale-opstamp planning).
- `execute_merge(..., tombstones=...)` (merge.py) drops doomed docids,
  shifts the survivors down (searchsorted compaction), rewrites norms
  and the docmap with the same mapping, and publishes corrected stats.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from quickwit_spark.codec.postings import varint_decode
from quickwit_spark.index import manifest as mf

DELETES_DIR = "deletes"


def _next_opstamp(index_dir: str) -> int:
    ops = [0]
    for c in mf.read_commits(index_dir):
        if c["kind"] == "delete":
            ops.extend(int(k) for k in (c.get("checkpoint") or {}))
    return max(ops) + 1


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
    (
        doomed.withColumn("opstamp", F.lit(opstamp))
        .write.mode("overwrite")
        .partitionBy("opstamp")
        .parquet(out_dir)
    )

    # per-(segment, field) corrections: #docs and Σ exact token lengths
    # of the doomed docs, decoded from the norms rows
    doomed_pdf = (
        spark.read.parquet(f"{out_dir}/opstamp={opstamp}")
        .groupBy("segment_id")
        .agg(F.collect_list("doc_id").alias("ids"))
        .toPandas()
    )
    by_seg = {
        r["segment_id"]: np.sort(np.asarray(r["ids"], dtype=np.int64))
        for _, r in doomed_pdf.iterrows()
    }
    corrections: dict[str, dict] = {}
    if by_seg:
        norm_rows = (
            searcher.inv()
            .filter(
                (F.col("kind") == "norms")
                & F.col("segment_id").isin(list(by_seg))
            )
            .select("segment_id", "field", "doc_freq", "payload2")
            .collect()
        )
        for r in norm_rows:
            lens = varint_decode(r["payload2"], r["doc_freq"])
            ids = by_seg[r["segment_id"]]
            ids = ids[ids < len(lens)]
            corrections.setdefault(r["segment_id"], {})[r["field"]] = {
                "deleted_docs": int(len(ids)),
                "deleted_tokens": int(lens[ids].sum()),
            }
    mf.commit(
        index_dir,
        [],
        checkpoint={
            str(opstamp): {
                "query": repr(query),
                "segments": {s: int(len(v)) for s, v in by_seg.items()},
                "corrections": corrections,
            }
        },
        kind="delete",
    )
    return opstamp


def pending_deletes(index_dir: str) -> dict[int, dict]:
    """opstamp → delete record, for ops not yet applied everywhere."""
    out: dict[int, dict] = {}
    for c in mf.read_commits(index_dir):
        if c["kind"] == "delete":
            for k, v in (c.get("checkpoint") or {}).items():
                out[int(k)] = v
    return out


def tombstones_for(spark: SparkSession, index_dir: str, segment_ids: list[str]):
    """{segment_id: sorted int64 doomed doc_ids} across all delete ops."""
    d = os.path.join(index_dir, DELETES_DIR)
    if not os.path.isdir(d):
        return {}
    pdf = (
        spark.read.parquet(d)
        .filter(F.col("segment_id").isin(segment_ids))
        .groupBy("segment_id")
        .agg(F.collect_set("doc_id").alias("ids"))
        .toPandas()
    )
    return {
        r["segment_id"]: np.sort(np.asarray(r["ids"], dtype=np.int64))
        for _, r in pdf.iterrows()
    }


def corrections_for(index_dir: str, segment_ids: list[str]) -> dict[str, dict]:
    """Merged per-(segment, field) stat corrections across delete ops."""
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
    for rec in pending_deletes(index_dir).values():
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
                )
            )
    return ops
