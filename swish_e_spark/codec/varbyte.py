"""Vectorized variable-byte codec (numpy, no Python-per-value loops).

Functional reproduction of the reference varbyte coder
(compress3/uncompress2, /root/reference/src/compress.c:141-215): 7-bit
groups with a continuation bit. This implementation uses LSB-first
groups with 0x80 = "more bytes follow" (the byte order differs from the
reference's MSB-first layout; the on-disk format here is our own — the
reference is reproduced functionally, not byte-for-byte).

All loops below are over *byte positions within a value* (≤10), never
over values — every pass is a full-array numpy operation, per the
north-rule "no per-row Python" constraint.
"""

from __future__ import annotations

import numpy as np

_EMPTY = np.empty(0, dtype=np.uint64)


def vb_encode(values) -> bytes:
    """Encode a 1-D array of non-negative ints to varbyte bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8)
        out[idx] = byte | (cont << 7)
    return out.tobytes()


def vb_decode(buf) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return _EMPTY
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j] & np.uint64(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * j)
    return vals


def delta_encode(sorted_vals) -> np.ndarray:
    """First value absolute, rest deltas (docID-delta scheme; reference
    delta-encodes filenums within a metaID run,
    /root/reference/src/index.c:2950-2953)."""
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return _EMPTY
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)
