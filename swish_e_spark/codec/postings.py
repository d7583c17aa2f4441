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


def _vb_encode_scalar(vals) -> bytes:
    """Scalar varbyte for short lists — for tiny Zipf-tail runs the
    Python loop beats the ~10 full-array numpy calls of vb_encode."""
    out = bytearray()
    for v in vals:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


_SMALL_RUN = 64  # below this df, scalar paths win


def _pack_small(doc_ids, tfs, positions, structures, doc_lens,
                block_size):
    """Scalar fast path for short posting lists (one block)."""
    n = len(doc_ids)
    doc_ids = [int(d) for d in doc_ids]
    tfs = [int(t) for t in tfs]
    dls = [int(d) for d in doc_lens]
    pos = [int(p) for p in positions]
    # doc deltas
    deltas = [doc_ids[0]] + [doc_ids[i] - doc_ids[i - 1]
                             for i in range(1, n)]
    # positions: flag bitmap + firsts + nibble/varbyte sections
    nibble = []
    firsts = []
    nib = bytearray()
    vb_deltas = []
    off = 0
    for i, tf in enumerate(tfs):
        p = pos[off:off + tf]
        off += tf
        firsts.append(p[0])
        pd = [p[j] - p[j - 1] for j in range(1, tf)]
        if tf > 1 and all(d < 16 for d in pd):
            nibble.append(True)
            for j in range(0, len(pd) - 1, 2):
                nib.append((pd[j] << 4) | pd[j + 1])
            if len(pd) % 2:
                nib.append(pd[-1] << 4)
        else:
            nibble.append(False)
            vb_deltas.extend(pd)
    flags = bytearray((n + 7) // 8)
    for i, fl in enumerate(nibble):
        if fl:
            flags[i >> 3] |= 0x80 >> (i & 7)
    pos_bin = (bytes(flags) + _vb_encode_scalar(firsts)
               + len(nib).to_bytes(4, "little") + bytes(nib)
               + _vb_encode_scalar(vb_deltas))
    nblocks = (n + block_size - 1) // block_size
    lo = [doc_ids[b * block_size] for b in range(nblocks)]
    hi = [doc_ids[min((b + 1) * block_size, n) - 1]
          for b in range(nblocks)]
    bmax = [max(tfs[b * block_size:(b + 1) * block_size])
            for b in range(nblocks)]
    bmin = [min(dls[b * block_size:(b + 1) * block_size])
            for b in range(nblocks)]
    return {
        "df": n, "cf": sum(tfs),
        "docs_bin": _vb_encode_scalar(deltas),
        "tfs_bin": _vb_encode_scalar(tfs),
        "dls_bin": _vb_encode_scalar(dls),
        "pos_bin": pos_bin,
        "structs_bin": (b"" if structures is None else bytes(
            bytearray(int(s) for s in structures))),
        "block_doc_lo": lo, "block_doc_hi": hi,
        "block_max_tf": bmax, "block_min_dl": bmin,
    }


def pack_posting_list(doc_ids, tfs, positions, structures, doc_lens,
                      block_size=BLOCK_SIZE):
    """Pack one (term, field) posting list. Inputs sorted by doc_id.

    Returns a dict with binary columns + block-max arrays (FIXTURES.md §3
    `segments` schema). Requires no global statistics — the block bound
    is (max tf, min dl) per block, valid for any avgdl at query time.
    Short Zipf-tail runs take a scalar fast path; long runs the
    vectorized numpy path. Both produce identical bytes.
    """
    if len(doc_ids) <= _SMALL_RUN and len(positions) <= 4 * _SMALL_RUN:
        return _pack_small(doc_ids, tfs, positions, structures,
                           doc_lens, block_size)
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


def _vb_decode_scalar(buf: bytes) -> list:
    out = []
    v = 0
    shift = 0
    for byte in buf:
        v |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            out.append(v)
            v = 0
            shift = 0
    return out


def unpack_posting_list_small(docs_bin, tfs_bin, pos_bin=None,
                              structs_bin=None, dls_bin=None):
    """Scalar decode for short lists (merge-stage hot path). Returns
    plain Python lists; same values as unpack_posting_list."""
    deltas = _vb_decode_scalar(docs_bin)
    doc_ids = []
    acc = 0
    for d in deltas:
        acc += d
        doc_ids.append(acc)
    tfs = _vb_decode_scalar(tfs_bin)
    dls = _vb_decode_scalar(dls_bin) if dls_bin is not None else None
    positions = None
    if pos_bin is not None:
        n = len(tfs)
        nflag = (n + 7) // 8
        flags = pos_bin[:nflag]
        rest = pos_bin[nflag:]
        vals = _vb_decode_scalar(rest)  # over-decodes; split by counts
        firsts = vals[:n]
        # re-scan rest to find byte offset after n varbyte values
        cnt = 0
        off = 0
        for i, byte in enumerate(rest):
            if not (byte & 0x80):
                cnt += 1
                if cnt == n:
                    off = i + 1
                    break
        nib_len = int.from_bytes(rest[off:off + 4], "little")
        nib = rest[off + 4:off + 4 + nib_len]
        vb_rest = _vb_decode_scalar(rest[off + 4 + nib_len:])
        positions = []
        ni = 0
        vi = 0
        for i, tf in enumerate(tfs):
            p = [firsts[i]]
            is_nib = bool(flags[i >> 3] & (0x80 >> (i & 7)))
            if is_nib and tf > 1:
                nd = []
                nbytes = (tf - 1 + 1) // 2
                for b in nib[ni:ni + nbytes]:
                    nd.append(b >> 4)
                    nd.append(b & 0x0F)
                nd = nd[:tf - 1]
                ni += nbytes
                for d in nd:
                    p.append(p[-1] + d)
            elif tf > 1:
                for d in vb_rest[vi:vi + tf - 1]:
                    p.append(p[-1] + d)
                vi += tf - 1
            positions.extend(p)
    structures = structs_bin
    return doc_ids, tfs, positions, structures, dls


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
