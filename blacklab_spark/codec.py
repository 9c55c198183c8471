"""Posting-block binary codec: delta-gap + LEB128 varint, numpy-vectorized.

Mirrors the reference's posting compression ideas (Lucene VInt postings
wrapped by BlackLab's codec,
reference: engine/src/main/java/nl/inl/blacklab/codec/BlackLab40PostingsWriter.java:145-225
and the VInt/ZInt payload encoding, doc/technical/index-formats/integrated.md:84-98)
re-implemented from scratch for Arrow/numpy batches:

* ``encode_varints`` / ``decode_varints`` — unsigned LEB128, vectorized
  over the whole array (loop over ≤10 byte-lanes, never over values).
* delta-gap helpers for sorted doc-id lists and per-doc position lists.

These run inside ``applyInPandas`` kernels at build and query time, so
per-value Python loops are off the table.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized): max(1, ceil(bits/7)).

    Lets callers encode one concatenated stream for thousands of
    blocks and slice per-block byte ranges from the cumsum — the trick
    that makes block building O(batch) instead of O(blocks) pandas ops.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.ones(v.size, dtype=np.int64)
    if v.size == 0 or v.max() < 128:   # fast path: all single-byte
        return nbytes
    tmp = v >> np.uint64(7)
    while tmp.any():
        nz = tmp > 0
        nbytes[nz] += 1
        tmp = tmp >> np.uint64(7)
    return nbytes


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a 1-D array of unsigned ints (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    if v.max() < 128:          # fast path: every value is one byte
        return v.astype(np.uint8).tobytes()
    nbits = varint_lengths(v)
    offsets = np.concatenate(([0], np.cumsum(nbits)))
    out = np.zeros(offsets[-1], dtype=np.uint8)
    max_len = int(nbits.max())
    tmp = v.copy()
    for lane in range(max_len):
        active = nbits > lane
        pos = offsets[:-1][active] + lane
        byte = (tmp[active] & _MASK7).astype(np.uint8)
        not_last = nbits[active] > (lane + 1)
        byte[not_last] |= _CONT
        out[pos] = byte
        tmp >>= np.uint64(7)
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & _CONT) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = ends.size
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for lane in range(max_len):
        active = lengths > lane
        pos = starts[active] + lane
        out[active] |= (raw[pos].astype(np.uint64) & _MASK7) << np.uint64(7 * lane)
    return out


def encode_deltas(sorted_values: np.ndarray) -> bytes:
    """Delta-gap + varint encode a strictly-increasing int array."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return encode_varints(deltas)


def decode_deltas(buf: bytes) -> np.ndarray:
    deltas = decode_varints(buf)
    return np.cumsum(deltas, dtype=np.uint64)


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Encode per-doc position lists: [len, delta-gapped positions]*.

    Layout per doc: varint(n_positions), then n_positions varints where
    the first is the absolute position and the rest are gaps.
    """
    parts: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.ascontiguousarray(pos, dtype=np.uint64)
        d = np.empty(p.size + 1, dtype=np.uint64)
        d[0] = p.size
        if p.size:
            d[1] = p[0]
            np.subtract(p[1:], p[:-1], out=d[2:])
        parts.append(d)
    if not parts:
        return b""
    return encode_varints(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    """Decode → list of n_docs absolute-position arrays."""
    flat = decode_varints(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        cnt = int(flat[i]); i += 1
        out.append(np.cumsum(flat[i:i + cnt], dtype=np.uint64))
        i += cnt
    return out
