"""Bitpacked posting-list codec (tantivy-style 128-doc blocks).

The reference's tantivy dependency stores docid deltas as bitpacked
128-value blocks: each block packs its values at the block's own
minimal bit width. Layout here, per posting list:

    repeat per 128-value block (last block may be short):
        u8  width                  (0..64 bits per value)
        u8[ceil(block_len*width/8)] packed little-endian bit stream

Self-describing rows: builder marks bitpacked rows with meta='bp' so
readers (kernel, merge) pick the decoder per row — varint and bitpack
segments coexist in one index.

Packing/unpacking rides numpy's C-speed packbits/unpackbits on a
(block_len, width) bit matrix — no per-value Python.
"""

from __future__ import annotations

import numpy as np

from quickwit_spark.codec.postings import BLOCK_SIZE


def bitpack_encode(values: np.ndarray) -> bytes:
    """Encode uint64 values into width-prefixed 128-value blocks."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = bytearray()
    for lo in range(0, len(v), BLOCK_SIZE):
        block = v[lo : lo + BLOCK_SIZE]
        mx = int(block.max()) if len(block) else 0
        width = mx.bit_length()
        out.append(width)
        if width:
            bits = (
                (block[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.uint8)
            out += np.packbits(bits.ravel(), bitorder="little").tobytes()
    return bytes(out)


def bitpack_decode(buf: bytes, count: int) -> np.ndarray:
    """Inverse of :func:`bitpack_encode` (needs the value count)."""
    out = np.empty(count, dtype=np.uint64)
    b = memoryview(buf)
    pos = 0
    done = 0
    while done < count:
        block_len = min(BLOCK_SIZE, count - done)
        width = b[pos]
        pos += 1
        if width == 0:
            out[done : done + block_len] = 0
        else:
            nbytes = (block_len * width + 7) // 8
            bits = np.unpackbits(
                np.frombuffer(b[pos : pos + nbytes], dtype=np.uint8),
                bitorder="little",
            )[: block_len * width].reshape(block_len, width)
            out[done : done + block_len] = (
                bits.astype(np.uint64)
                << np.arange(width, dtype=np.uint64)
            ).sum(axis=1)
            pos += nbytes
        done += block_len
    return out


def bitpack_encode_grouped(values: np.ndarray, group_starts: np.ndarray) -> list[bytes]:
    """Per-group bitpacked blobs (same contract as varint_encode_grouped)."""
    gs = np.asarray(group_starts, dtype=np.int64)
    bounds = np.append(gs, len(values))
    return [
        bitpack_encode(values[bounds[i] : bounds[i + 1]]) for i in range(len(gs))
    ]
