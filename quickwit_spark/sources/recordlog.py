"""Durable multi-queue record log — the mrecordlog/WAL analog.

Both reference ingest generations buffer not-yet-indexed documents in
an append-only on-disk record log (`mrecordlog`, cited from
qw/quickwit-ingest/Cargo.toml + docs/internals/ingest-v2.md: V1 keeps
a `queues/` directory, V2 distributes `wal/` shards): records are
appended with monotonically increasing positions, consumers replay
from a checkpointed position, and the log is truncated once splits
covering those positions are durably published. This module is that
durability story for the Spark engine — the piece Structured-Streaming
checkpoints alone don't provide when docs arrive through the
synchronous ingest/REST path rather than from a replayable source.

On-disk shape (public-format, self-describing):
  <root>/<queue>/wal-<start_position>.log     segment files
  frame = MAGIC(2) | len u32 LE | crc32 u32 LE | payload bytes

Semantics mirrored from mrecordlog:
  - `append` → position (u64, monotonic per queue, gap-free)
  - `read_after(position)` replays strictly-after records in order
  - `truncate(position)` drops records ≤ position; whole segments are
    unlinked, the partially-covered head segment is kept (positions
    are filtered on read) — O(files), no rewrites
  - crash safety: fsync per append batch; recovery scans frames and
    STOPS at the first torn/corrupt frame (checksum or length
    mismatch), truncating the tail — exactly the torn-write contract
    of any WAL. A queue's next position derives from replay, so a
    recovered log continues gap-free.

Scale note: the WAL is a per-ingest-node buffer (the reference runs
one per indexer node, balanced by the control plane) — it is never a
corpus-sized structure, so plain local-file appends are the right
shape; the distributed work starts after `run_source` hands the
records to the ordinary ingest path.
"""

from __future__ import annotations

import os
import struct
import zlib


def _fsync_dir(path: str) -> None:
    """Durably persist a directory entry (newly created file/dir):
    fsync on the file alone does not make its NAME durable across
    power loss — the WAL contract needs both."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # pragma: no cover - platform without dir-open
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)

_MAGIC = b"QW"
_HEADER = struct.Struct("<2sII")  # magic, len, crc32
_SEGMENT_MAX_BYTES = 64 << 20


class RecordLog:
    """One multi-queue record log rooted at a directory."""

    def __init__(self, root: str, segment_max_bytes: int = _SEGMENT_MAX_BYTES):
        self.root = root
        self.segment_max_bytes = segment_max_bytes
        os.makedirs(root, exist_ok=True)
        # queue -> (next_position, open segment path or None)
        self._state: dict[str, int] = {}
        for queue in self.queues():
            self._state[queue] = self._recover(queue)

    # ------------------------------------------------------------ layout

    def _qdir(self, queue: str) -> str:
        if not queue or "/" in queue or queue.startswith("."):
            raise ValueError(f"invalid queue name {queue!r}")
        return os.path.join(self.root, queue)

    @staticmethod
    def _segments(qdir: str) -> list[tuple[int, str]]:
        out = []
        if not os.path.isdir(qdir):
            return out
        for name in os.listdir(qdir):
            if name.startswith("wal-") and name.endswith(".log"):
                out.append((int(name[4:-4]), os.path.join(qdir, name)))
        return sorted(out)

    def queues(self) -> list[str]:
        return sorted(
            q
            for q in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, q))
        )

    # ------------------------------------------------------------ frames

    @classmethod
    def _scan(cls, path: str):
        """→ yields (offset, payload) for every intact frame; stops at
        the first torn/corrupt frame (WAL tail contract)."""
        with open(path, "rb") as f:
            buf = f.read()
        pos = 0
        while pos + _HEADER.size <= len(buf):
            magic, ln, crc = _HEADER.unpack_from(buf, pos)
            start = pos + _HEADER.size
            if magic != _MAGIC or start + ln > len(buf):
                break
            payload = buf[start : start + ln]
            if zlib.crc32(payload) & 0xFFFFFFFF != crc:
                break
            yield pos, payload
            pos = start + ln

    def _recover(self, queue: str) -> int:
        """Replay a queue directory → next position; truncates any torn
        tail in the LAST segment so appends continue on a clean frame
        boundary."""
        qdir = self._qdir(queue)
        segments = self._segments(qdir)
        if not segments:
            return 0
        next_pos = segments[0][0]
        for i, (start_pos, path) in enumerate(segments):
            next_pos = start_pos
            last_good_end = 0
            for off, payload in self._scan(path):
                next_pos += 1
                last_good_end = off + _HEADER.size + len(payload)
            if i == len(segments) - 1:
                size = os.path.getsize(path)
                if size != last_good_end:
                    with open(path, "r+b") as f:
                        f.truncate(last_good_end)
                        f.flush()
                        os.fsync(f.fileno())
        return next_pos

    # ------------------------------------------------------------ api

    def last_position(self, queue: str) -> int | None:
        """Position of the newest record, None for an empty queue."""
        nxt = self._state.get(queue)
        if not nxt:
            return None
        return nxt - 1

    def append(self, queue: str, payload: bytes) -> int:
        return self.append_batch(queue, [payload])[0]

    def append_batch(self, queue: str, payloads: list[bytes]) -> list[int]:
        """Append records with ONE fsync for the whole batch (the
        mrecordlog grouping that makes the ingest path's durability
        affordable). → their positions."""
        if not payloads:
            return []
        qdir = self._qdir(queue)
        new_qdir = not os.path.isdir(qdir)
        os.makedirs(qdir, exist_ok=True)
        if new_qdir:
            _fsync_dir(self.root)
        next_pos = self._state.get(queue, 0)
        segments = self._segments(qdir)
        new_segment = False
        if segments and os.path.getsize(segments[-1][1]) < self.segment_max_bytes:
            path = segments[-1][1]
        else:
            path = os.path.join(qdir, f"wal-{next_pos:020d}.log")
            new_segment = True
        positions = []
        with open(path, "ab") as f:
            for payload in payloads:
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                f.write(
                    _HEADER.pack(
                        _MAGIC, len(payload), zlib.crc32(payload) & 0xFFFFFFFF
                    )
                )
                f.write(payload)
                positions.append(next_pos)
                next_pos += 1
            f.flush()
            os.fsync(f.fileno())
        if new_segment:
            # a new segment's NAME must be durable too, or an acked
            # batch can vanish wholesale on power loss
            _fsync_dir(qdir)
        self._state[queue] = next_pos
        return positions

    def read_after(self, queue: str, position: int | None):
        """→ yields (position, payload) strictly after `position`
        (None = from the beginning) in append order."""
        qdir = self._qdir(queue)
        floor = -1 if position is None else position
        for start_pos, path in self._segments(qdir):
            pos = start_pos
            for _off, payload in self._scan(path):
                if pos > floor:
                    yield pos, payload
                pos += 1

    def truncate(self, queue: str, position: int) -> int:
        """Drop records with position ≤ `position` (the reference's
        suggest_truncate after split publish): fully-covered segments
        unlink; a partially-covered head stays and its already-consumed
        records are skipped on read via positions. → segments removed."""
        qdir = self._qdir(queue)
        segments = self._segments(qdir)
        removed = 0
        for i, (start_pos, path) in enumerate(segments):
            next_start = (
                segments[i + 1][0] if i + 1 < len(segments) else
                self._state.get(queue, start_pos)
            )
            if next_start - 1 <= position and next_start > start_pos:
                os.unlink(path)
                removed += 1
            else:
                break
        # remember where the log now starts so positions stay stable
        remaining = self._segments(qdir)
        if not remaining and self._state.get(queue, 0) > 0:
            # fully truncated: pin the next position with an empty
            # segment marker so recovery after restart stays gap-free
            open(
                os.path.join(qdir, f"wal-{self._state[queue]:020d}.log"), "ab"
            ).close()
            _fsync_dir(qdir)
        return removed

    def reader_floor(self, queue: str) -> int | None:
        """Smallest position still held (None if empty) — what a
        consumer must expect after a truncate."""
        segments = self._segments(self._qdir(queue))
        for start_pos, path in segments:
            pos = start_pos
            for _off, _payload in self._scan(path):
                return pos
        return None
