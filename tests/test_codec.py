"""Codec round-trip tests: varbyte, delta, nibble-packed positions,
block-max metadata (spec: SURVEY.md §1.4,
/root/reference/src/compress.c:141-528 functional semantics)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from swish_e_spark.codec.postings import (
    BLOCK_SIZE, bm25_impact, pack_posting_list, unpack_posting_list,
)
from swish_e_spark.codec.varbyte import (
    delta_decode, delta_encode, vb_decode, vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (vb_decode(vb_encode(arr)) == arr).all()


@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=500, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert (delta_decode(delta_encode(arr)) == arr).all()


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_posting_list_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=300))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 25, size=n).astype(np.int64)
    spread = data.draw(st.sampled_from([5, 12, 200]))  # nibble vs varbyte mix
    positions = np.concatenate([
        np.cumsum(rng.integers(1, spread, size=tf)) for tf in tfs
    ])
    structures = rng.integers(0, 256, size=int(tfs.sum())).astype(np.uint8)
    doc_lens = rng.integers(10, 500, size=n)
    packed = pack_posting_list(doc_ids, tfs, positions, structures,
                               doc_lens)
    d, t, p, s = unpack_posting_list(packed["docs_bin"], packed["tfs_bin"],
                                     packed["pos_bin"], packed["structs_bin"])
    assert (d == doc_ids).all()
    assert (t == tfs).all()
    assert (p == positions).all()
    assert (s == structures).all()


def test_block_max_is_upper_bound():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    positions = np.concatenate([np.arange(1, tf + 1) for tf in tfs])
    doc_lens = rng.integers(20, 400, size=n)
    packed = pack_posting_list(doc_ids, tfs, positions, None, doc_lens)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(packed["block_max_tf"]) == nblocks
    for avgdl in (50.0, 100.0, 300.0):
        impacts = bm25_impact(tfs, doc_lens, avgdl)
        for b in range(nblocks):
            sl = slice(b * BLOCK_SIZE, (b + 1) * BLOCK_SIZE)
            ub = bm25_impact([packed["block_max_tf"][b]],
                             [packed["block_min_dl"][b]], avgdl)[0]
            assert ub >= impacts[sl].max() - 1e-9
            assert packed["block_doc_lo"][b] == doc_ids[sl][0]
            assert packed["block_doc_hi"][b] == doc_ids[sl][-1]


def test_compression_is_compact():
    # doc-delta varbyte of dense ids should be ~1 byte/doc
    doc_ids = np.arange(0, 100000, 3, dtype=np.int64)
    tfs = np.ones(doc_ids.size, dtype=np.int64)
    positions = np.ones(doc_ids.size, dtype=np.int64)
    packed = pack_posting_list(doc_ids, tfs, positions, None,
                               np.full(doc_ids.size, 100))
    assert len(packed["docs_bin"]) < doc_ids.size * 1.2
