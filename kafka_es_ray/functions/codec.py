"""Posting-list compression: delta + varint (PForDelta-style blocks).

Segment postings are stored as delta-gapped varint byte streams with
fixed-length blocks carrying block-max metadata and skip pointers — the
Lucene-segment analog the reference sink feeds (SURVEY §2 E3;
BASELINE.json north_star: "delta + varint (PForDelta) compression ...
sorted, skip-pointer-annotated segments").

Everything here is vectorized numpy — no Python loop over postings:

  * encode: per-element byte length by thresholds -> cumulative offsets ->
    one masked scatter per byte position (max 10 iterations for 64-bit).
  * decode: terminator bytes (high bit clear) delimit elements ->
    ``np.add.at`` accumulates 7-bit groups into element slots.

Byte layout: LEB128 varint, little-endian 7-bit groups, high bit = "more".
Doc ids are sorted ascending and delta-gapped (first gap = doc_id of the
first posting); tfs are encoded as raw varints (no delta).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def varint_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized LEB128 encode; also returns per-element byte offsets
    (length n+1) so callers can slice out contiguous sub-ranges — used to
    encode ALL postings of a segment in one vectorized pass and then slice
    per-term byte strings (no per-term encode loop)."""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    if v.size == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += v >= t
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    starts = offsets[:-1]
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    max_nb = int(nbytes.max())
    for b in range(max_nb):
        mask = nbytes > b
        byte = (v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        more = (nbytes[mask] - 1) > b
        out[starts[mask] + b] = byte.astype(np.uint8) | (more.astype(np.uint8) << 7)
    return out.tobytes(), offsets


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64/int64 array (values >= 0)."""
    buf, _ = varint_encode_with_offsets(values)
    return buf


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size == 0:
        return np.array([], dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    n = int(is_end.sum())
    if count is not None and n != count:
        raise ValueError(f"varint stream has {n} values, expected {count}")
    # element id of every byte: 0-based index of the next terminator at/after it
    elem = np.zeros(raw.shape, dtype=np.int64)
    elem[1:] = np.cumsum(is_end)[:-1]
    # bit position of every byte within its element
    starts = np.zeros(n, dtype=np.int64)
    ends = np.flatnonzero(is_end)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(raw.size, dtype=np.int64) - starts[elem]
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, elem, (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64)))
    return vals


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """Sorted ascending doc ids -> delta gaps -> varint bytes."""
    d = np.ascontiguousarray(doc_ids).astype(np.int64, copy=False)
    if d.size == 0:
        return b""
    gaps = np.empty(d.shape, dtype=np.uint64)
    gaps[0] = np.uint64(d[0])
    if d.size > 1:
        diffs = np.diff(d)
        if (diffs <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        gaps[1:] = diffs.astype(np.uint64)
    return varint_encode(gaps)


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Varint delta gaps -> absolute sorted doc ids (int64)."""
    gaps = varint_decode(buf, count)
    if gaps.size == 0:
        return np.array([], dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))
