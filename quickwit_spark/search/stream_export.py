"""search_stream output formats + partition_by_fast_field.

The reference's search_stream exports one (or a few) fast-field columns
for ALL matching docs as CSV or ClickHouseRowBinary, optionally split
by a `partition_by_fast_field` value
(`quickwit-search/src/search_stream/leaf.rs:51-290`). Spark-native
re-expression:

  csv        `df.write.csv` — distributed part files; with
             `partition_by` Spark's partitionBy lays out one directory
             per field value (the partition_by_fast_field analog)
  rowbinary  ClickHouse RowBinary: per row, fixed-width numerics as
             little-endian bytes and strings as LEB128-length-prefixed
             UTF-8. Encoded in `mapInArrow` batches: all-fixed-width
             schemas use a numpy structured array (one `tobytes()`
             interleaves the row bytes — no per-row Python); string
             columns fall back to a per-row pack inside the Arrow
             batch. Returns chunk rows (partition value, chunk bytes)
             so the caller streams/concats them; `write_rowbinary`
             assembles a file per partition value.

Column types supported for rowbinary: long→Int64, int→Int32,
double→Float64, float→Float32, string→String(LEB128+UTF8) — the
ClickHouse types the reference emits (i64/u64/f64/text fast fields).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIXED = {
    "bigint": "<i8",
    "int": "<i4",
    "double": "<f8",
    "float": "<f4",
    "timestamp": "<i8",  # micros since epoch (DateTime64(6) analog)
}


def _leb128(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def rowbinary_chunks(
    df: DataFrame, columns: list[str], partition_by: str | None = None
) -> DataFrame:
    """→ (partition string, chunk binary): RowBinary-encoded batches.
    With `partition_by`, rows are hash-clustered by that column first so
    every chunk belongs to exactly one partition value (the
    partition_by_fast_field analog); partition is '' otherwise."""
    dtypes = dict(df.dtypes)
    for c in columns:
        if dtypes[c] not in _FIXED and dtypes[c] != "string":
            raise NotImplementedError(
                f"rowbinary: unsupported column type {dtypes[c]!r} for {c!r}"
            )
    sel = list(columns) + ([partition_by] if partition_by and partition_by not in columns else [])
    work = df.select(*sel)
    if partition_by:
        work = work.repartition(partition_by).sortWithinPartitions(partition_by)
    col_types = [(c, dtypes[c]) for c in columns]

    def encode(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            if partition_by:
                pvals = batch.column(partition_by).to_numpy(zero_copy_only=False)
                bounds = [0] + [
                    i
                    for i in range(1, len(pvals))
                    if pvals[i] != pvals[i - 1]
                ] + [len(pvals)]
            else:
                pvals = None
                bounds = [0, batch.num_rows]
            for bi in range(len(bounds) - 1):
                lo, hi = bounds[bi], bounds[bi + 1]
                if lo == hi:
                    continue
                n = hi - lo
                arrays = {}
                has_str = False
                for c, t in col_types:
                    a = batch.column(c).slice(lo, n)
                    if a.null_count:
                        # non-Nullable RowBinary has no null marker —
                        # a numeric NaN→astype(int) would silently emit
                        # INT64_MIN garbage and a null string would
                        # become '' (indistinguishable from a real
                        # empty string), so refuse both
                        raise ValueError(
                            f"RowBinary export: column {c!r} contains "
                            "NULLs; filter them or export a coalesced "
                            "column"
                        )
                    if t == "string":
                        has_str = True
                        arrays[c] = a.to_pylist()
                    elif t == "timestamp":
                        arrays[c] = (
                            a.cast(pa.timestamp("us"))
                            .to_numpy(zero_copy_only=False)
                            .astype("datetime64[us]")
                            .astype("<i8")
                        )
                    else:
                        arrays[c] = a.to_numpy(zero_copy_only=False).astype(
                            _FIXED[t]
                        )
                if not has_str:
                    # fixed-width only: ONE structured-array write
                    # interleaves the row bytes — no per-row Python
                    rec = np.empty(
                        n, dtype=[(c, _FIXED[t]) for c, t in col_types]
                    )
                    for c, _t in col_types:
                        rec[c] = arrays[c]
                    blob = rec.tobytes()
                else:
                    parts = []
                    for i in range(n):
                        for c, t in col_types:
                            if t == "string":
                                s = (arrays[c][i] or "").encode("utf-8")
                                parts.append(_leb128(len(s)))
                                parts.append(s)
                            else:
                                parts.append(arrays[c][i].tobytes())
                    blob = b"".join(parts)
                pkey = str(pvals[lo]) if pvals is not None else ""
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([pkey], type=pa.string()),
                        pa.array([n], type=pa.int64()),
                        pa.array([blob], type=pa.binary()),
                    ],
                    names=["partition", "num_rows", "chunk"],
                )

    return work.mapInArrow(encode, "partition string, num_rows long, chunk binary")


def write_rowbinary(
    df: DataFrame,
    columns: list[str],
    path: str,
    partition_by: str | None = None,
    keep_parts: bool = False,
) -> dict[str, int]:
    """Assemble RowBinary file(s) under `path`: one `<value>.bin` per
    partition value (or `all.bin`). → {file: rows written}.

    Distributed: executors stream their encoded chunks straight into
    per-task part files under `path/_parts/` (never through the
    driver — this is the API whose contract is "export EVERY matching
    doc", so chunk bytes must not funnel through one process); the
    driver collects only the tiny (part-file, partition-value, rows)
    manifest and concatenates part files in deterministic
    (partition-id, chunk) order, which byte-matches the previous
    single-writer output. `path` must be storage every executor can
    reach (same contract as any Spark writer — local FS under
    local[*], shared FS/object store on a cluster).

    Part files carry the TASK ATTEMPT id in their name, so a
    speculative or zombie duplicate attempt of the same partition
    writes its own files; only the attempt whose manifest row the
    collect() returned (the winning attempt — Spark commits exactly
    one result per partition) contributes to the final output, and
    orphaned loser-attempt files are swept with `_parts/`.

    `keep_parts=True` is the 100×-scale escape hatch: the driver-side
    concatenation into one file per partition value is inherently a
    single-filesystem funnel, so for exports too large for single-file
    assembly this mode skips it — `_parts/` is left in place along
    with `_manifest.json` (ordered [part file, partition value, rows]
    rows; concatenating each value's parts in manifest order yields
    byte-identical output), and the returned dict maps partition
    values to row counts instead of final files."""
    import os
    import shutil

    parts_dir = os.path.join(path, "_parts")
    os.makedirs(parts_dir, exist_ok=True)
    chunks = rowbinary_chunks(df, columns, partition_by)

    def write_parts(batches):
        import os as _os

        import pyarrow as pa
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        att = ctx.taskAttemptId() if ctx is not None else 0
        handles: dict[str, object] = {}
        rows: dict[str, int] = {}
        fname: dict[str, str] = {}
        seq = 0
        try:
            for batch in batches:
                pvals = batch.column("partition").to_pylist()
                nrows = batch.column("num_rows").to_pylist()
                blobs = batch.column("chunk")
                for i, pval in enumerate(pvals):
                    if pval not in handles:
                        # partition values may not be filename-safe:
                        # name parts by (task, attempt, seq) and carry
                        # the value in the manifest. The attempt id
                        # keeps a concurrent duplicate attempt of this
                        # partition from opening (and corrupting) the
                        # same file.
                        name = f"part-{pid:05d}-a{att:08d}-{seq:05d}.bin"
                        seq += 1
                        handles[pval] = open(  # noqa: SIM115
                            _os.path.join(parts_dir, name), "wb"
                        )
                        fname[pval] = name
                        rows[pval] = 0
                    handles[pval].write(blobs[i].as_py())
                    rows[pval] += nrows[i]
        finally:
            for h in handles.values():
                h.close()
        if rows:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([fname[p] for p in rows], type=pa.string()),
                    pa.array(list(rows), type=pa.string()),
                    pa.array([rows[p] for p in rows], type=pa.int64()),
                ],
                names=["file", "partition", "num_rows"],
            )

    manifest = chunks.mapInArrow(
        write_parts, "file string, partition string, num_rows long"
    ).collect()

    if keep_parts:
        import json

        # prune loser-attempt orphans so _parts/ holds exactly the
        # manifest's files, then persist the assembly recipe
        keep = {r["file"] for r in manifest}
        for f in os.listdir(parts_dir):
            if f not in keep:
                os.unlink(os.path.join(parts_dir, f))
        ordered = sorted(manifest, key=lambda r: (r["partition"], r["file"]))
        with open(os.path.join(path, "_manifest.json"), "w") as mf:
            json.dump(
                [
                    {
                        "file": r["file"],
                        "partition": r["partition"],
                        "num_rows": r["num_rows"],
                    }
                    for r in ordered
                ],
                mf,
            )
        # keyed by the RAW partition value ('' included): the ''→'all'
        # merge is a filename-assembly concern, and keep_parts skips
        # assembly — counts here must reconcile 1:1 with the manifest
        out: dict[str, int] = {}
        for r in manifest:
            key = r["partition"]
            out[key] = out.get(key, 0) + r["num_rows"]
        return out

    out = {}
    # group by FINAL FILENAME, not partition value: '' and the literal
    # string 'all' both render to all.bin and must append (like the old
    # shared-handle writer), not overwrite each other
    by_name: dict[str, list] = {}
    for r in manifest:
        by_name.setdefault(f"{r['partition'] or 'all'}.bin", []).append(r)
    try:
        for name, frags in sorted(by_name.items()):
            fp = os.path.join(path, name)
            # (partition value, part file) order = the previous
            # single-writer's stable sort-by-value then task order
            frags = sorted(frags, key=lambda r: (r["partition"], r["file"]))
            if len(frags) == 1:
                os.replace(os.path.join(parts_dir, frags[0]["file"]), fp)
            else:
                with open(fp, "wb") as dst:
                    for r in frags:
                        with open(os.path.join(parts_dir, r["file"]), "rb") as src:
                            shutil.copyfileobj(src, dst)
            out[fp] = sum(r["num_rows"] for r in frags)
    finally:
        shutil.rmtree(parts_dir, ignore_errors=True)
    return out


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    header: bool = True,
) -> None:
    """CSV export; `partition_by` lays out one directory per field
    value via Spark's writer (partition pruning on read — the
    partition_by_fast_field analog)."""
    w = df.write.mode("overwrite").option("header", str(header).lower())
    if partition_by:
        w = w.partitionBy(partition_by)
    w.csv(path)
