"""Posting-list pack/unpack with positions and block-max metadata.

Layout per (term, field) posting list (functional analogue of the
reference worddata record, build_worddata /root/reference/src/db_write.c:211-335
and compress_location_positions /root/reference/src/compress.c:484-528):

- ``docs``:  varbyte(delta(doc_ids))                 — docID-delta + varbyte
- ``tfs``:   varbyte(tf per doc)
- ``pos``:   per-doc positions: flag bitmap (1 bit per doc; set = 4-bit
  nibble-packed deltas, the POS_4_BIT analogue), then for each doc
  varbyte(first_pos) followed by either nibble-packed or varbyte deltas.
  Position deltas are ≥1, so a 0 low-nibble is unambiguous padding.
- ``structs``: raw structure bytes, one per position (cf total).
- block-max metadata per BLOCK_SIZE docs: ``block_doc_lo/hi`` (int64),
  ``block_max_tf`` and ``block_min_dl``. The BM25 impact
  ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` is increasing in tf and
  decreasing in dl, so ``impact(block_max_tf, block_min_dl, avgdl)`` is a
  valid per-block upper bound for ANY avgdl — this keeps shard packing a
  single pass with no global-stats barrier, and is the block-max WAND
  bound (new vs the reference, which scores every posting —
  /root/reference/src/search.c:1766-1813; required by the north rule).

Everything is numpy-vectorized; the per-doc nibble/varbyte choice is made
with array masks, not Python loops over docs.
"""

from __future__ import annotations

import numpy as np

from .varbyte import delta_decode, delta_encode, vb_decode, vb_encode

BLOCK_SIZE = 128
K1 = 1.2
B = 0.75


def bm25_impact(tfs, doc_lens, avgdl, k1=K1, b=B):
    """Idf-independent BM25 term contribution (vectorized)."""
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(doc_lens, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / max(avgdl, 1e-9)))


def _pack_positions(positions: np.ndarray, tfs: np.ndarray) -> bytes:
    """positions = concatenated per-doc sorted position arrays."""
    n_docs = tfs.size
    if n_docs == 0:
        return b""
    pos = np.ascontiguousarray(positions, dtype=np.uint64)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    # per-doc delta encode in one pass: subtract shifted, then restore
    # each doc's first position as absolute
    deltas = np.empty_like(pos)
    deltas[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=deltas[1:])
    deltas[starts] = pos[starts]
    # nibble eligibility: docs whose non-first deltas are all in [1,15]
    big = np.zeros(n_docs, dtype=bool)
    if pos.size:
        nonfirst = np.ones(pos.size, dtype=bool)
        nonfirst[starts] = False
        too_big_idx = np.flatnonzero(nonfirst & (deltas >= 16))
        if too_big_idx.size:
            big[np.searchsorted(ends, too_big_idx, side="right")] = True
    nibble = (~big) & (tfs > 1)
    flags = np.packbits(nibble)
    chunks: list[bytes] = [flags.tobytes()]
    # first positions for every doc, varbyte, in doc order — encoded as
    # one array; likewise the remaining deltas per class. To preserve
    # per-doc interleaving on decode we store three sections:
    #   A: varbyte(first_pos for all docs)
    #   B: nibble bytes for nibble docs (concatenated, doc order)
    #   C: varbyte(non-first deltas of non-nibble docs, doc order)
    chunks.append(vb_encode(pos[starts]))
    if nibble.any():
        nib_tf = tfs[nibble] - 1
        nib_mask = np.zeros(pos.size, dtype=bool)
        for_docs = np.flatnonzero(nibble)
        # mark non-first positions of nibble docs
        seg = np.zeros(pos.size + 1, dtype=np.int8)
        seg[starts[for_docs] + 1] += 1
        seg[ends[for_docs]] -= 1
        nib_mask = np.cumsum(seg[:-1]) > 0
        nib_mask[starts] = False
        nd = deltas[nib_mask].astype(np.uint8)
        # pack two deltas per byte per doc (pad odd tf with 0 nibble)
        n_bytes = (nib_tf + 1) // 2
        b_ends = np.cumsum(n_bytes)
        b_starts = b_ends - n_bytes
        out = np.zeros(int(b_ends[-1]) if b_ends.size else 0, dtype=np.uint8)
        d_ends = np.cumsum(nib_tf)
        d_starts = d_ends - nib_tf
        # high nibble = even-index delta, low nibble = odd-index delta
        doc_of_delta = np.repeat(np.arange(nib_tf.size), nib_tf)
        local = np.arange(nd.size) - d_starts[doc_of_delta]
        byte_idx = b_starts[doc_of_delta] + local // 2
        hi = (local % 2) == 0
        np.bitwise_or.at(out, byte_idx[hi], nd[hi] << 4)
        np.bitwise_or.at(out, byte_idx[~hi], nd[~hi])
        chunks.append(np.concatenate(
            [np.frombuffer(np.uint32(out.size).tobytes(), dtype=np.uint8), out]
        ).tobytes())
    else:
        chunks.append(np.uint32(0).tobytes())
    vb_docs = np.flatnonzero((~nibble) & (tfs > 1))
    if vb_docs.size:
        seg = np.zeros(pos.size + 1, dtype=np.int8)
        seg[starts[vb_docs] + 1] += 1
        seg[ends[vb_docs]] -= 1
        vmask = np.cumsum(seg[:-1]) > 0
        vmask[starts] = False
        chunks.append(vb_encode(deltas[vmask]))
    return b"".join(chunks)


def _unpack_positions(buf: bytes, tfs: np.ndarray) -> np.ndarray:
    n_docs = tfs.size
    if n_docs == 0:
        return np.empty(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    nflag = (n_docs + 7) // 8
    nibble = np.unpackbits(raw[:nflag])[:n_docs].astype(bool)
    off = nflag
    # section A: first positions (n_docs varbyte values)
    firsts, consumed = _vb_decode_n(raw[off:], n_docs)
    off += consumed
    # section B: nibble bytes
    nib_len = int(np.frombuffer(raw[off:off + 4].tobytes(), dtype=np.uint32)[0])
    off += 4
    nib_bytes = raw[off:off + nib_len]
    off += nib_len
    # section C: varbyte deltas for non-nibble docs
    vb_docs = (~nibble) & (tfs > 1)
    n_vb_deltas = int((tfs[vb_docs] - 1).sum())
    vdeltas, _ = _vb_decode_n(raw[off:], n_vb_deltas)

    ends = np.cumsum(tfs)
    starts = ends - tfs
    deltas = np.zeros(int(ends[-1]), dtype=np.uint64)
    deltas[starts] = firsts
    if nibble.any():
        nib_tf = tfs[nibble] - 1
        n_bytes = (nib_tf + 1) // 2
        b_ends = np.cumsum(n_bytes)
        b_starts = b_ends - n_bytes
        doc_of_delta = np.repeat(np.arange(nib_tf.size), nib_tf)
        d_ends = np.cumsum(nib_tf)
        d_starts = d_ends - nib_tf
        local = np.arange(int(d_ends[-1]) if d_ends.size else 0) - d_starts[doc_of_delta]
        byte_idx = b_starts[doc_of_delta] + local // 2
        vals = np.where((local % 2) == 0,
                        nib_bytes[byte_idx] >> 4,
                        nib_bytes[byte_idx] & 0x0F).astype(np.uint64)
        # scatter into delta slots of nibble docs
        nib_doc_idx = np.flatnonzero(nibble)
        tgt = starts[nib_doc_idx][doc_of_delta] + 1 + local
        deltas[tgt] = vals
    if n_vb_deltas:
        vb_doc_idx = np.flatnonzero(vb_docs)
        vtf = tfs[vb_doc_idx] - 1
        doc_of = np.repeat(np.arange(vtf.size), vtf)
        d_ends = np.cumsum(vtf)
        d_starts = d_ends - vtf
        local = np.arange(n_vb_deltas) - d_starts[doc_of]
        tgt = starts[vb_doc_idx][doc_of] + 1 + local
        deltas[tgt] = vdeltas
    # per-doc cumsum: global cumsum then subtract previous doc's total
    positions = np.cumsum(deltas, dtype=np.uint64)
    if n_docs > 1:
        carry = positions[ends[:-1] - 1]
        positions[ends[0]:] -= np.repeat(carry, tfs[1:])
    return positions.astype(np.int64)


def _vb_decode_n(raw: np.ndarray, n: int):
    """Decode exactly n varbyte values from raw; return (vals, bytes used)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    stop = int(ends[n - 1]) + 1
    return vb_decode(raw[:stop].tobytes()), stop


def pack_posting_list(doc_ids, tfs, positions, structures, doc_lens,
                      block_size=BLOCK_SIZE):
    """Pack one (term, field) posting list. Inputs sorted by doc_id.

    Returns a dict with binary columns + block-max arrays (FIXTURES.md §3
    `segments` schema). Requires no global statistics — the block bound
    is (max tf, min dl) per block, valid for any avgdl at query time.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(doc_lens, dtype=np.int64)
    n = doc_ids.size
    nblocks = (n + block_size - 1) // block_size
    pad = nblocks * block_size - n
    lo = doc_ids[::block_size]
    hi = doc_ids[block_size - 1::block_size]
    if hi.size < nblocks:
        hi = np.concatenate([hi, doc_ids[-1:]])
    tf_pad = np.pad(tfs, (0, pad), constant_values=0)
    dl_pad = np.pad(dls, (0, pad), constant_values=2**31 - 1)
    block_max_tf = tf_pad.reshape(nblocks, block_size).max(axis=1)
    block_min_dl = dl_pad.reshape(nblocks, block_size).min(axis=1)
    return {
        "df": int(n),
        "cf": int(tfs.sum()),
        "docs_bin": vb_encode(delta_encode(doc_ids.astype(np.uint64))),
        "tfs_bin": vb_encode(tfs.astype(np.uint64)),
        "dls_bin": vb_encode(dls.astype(np.uint64)),
        "pos_bin": _pack_positions(np.asarray(positions), tfs),
        "structs_bin": (b"" if structures is None else
                        np.ascontiguousarray(
                            structures, dtype=np.uint8).tobytes()),
        "block_doc_lo": lo.tolist(),
        "block_doc_hi": hi.tolist(),
        "block_max_tf": block_max_tf.astype(np.int32).tolist(),
        "block_min_dl": block_min_dl.astype(np.int32).tolist(),
    }


def unpack_posting_list(docs_bin, tfs_bin, pos_bin=None, structs_bin=None,
                        dls_bin=None):
    """Inverse of pack_posting_list →
    (doc_ids, tfs, positions, structures[, doc_lens])."""
    doc_ids = delta_decode(vb_decode(docs_bin)).astype(np.int64)
    tfs = vb_decode(tfs_bin).astype(np.int64)
    positions = (_unpack_positions(pos_bin, tfs)
                 if pos_bin is not None else None)
    structures = (np.frombuffer(structs_bin, dtype=np.uint8)
                  if structs_bin is not None else None)
    if dls_bin is None:
        return doc_ids, tfs, positions, structures
    return doc_ids, tfs, positions, structures, \
        vb_decode(dls_bin).astype(np.int64)
