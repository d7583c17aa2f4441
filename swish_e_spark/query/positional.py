"""Positional predicates shared by the oracle and the Spark kernels.

NEAR semantics follow the reference exactly (nearresultlists +
KeepPos, /root/reference/src/search.c:1915-2240): a NEAR result's
position data ("posdata") is a flat list with ``0`` separators between
*series* — one series per operand of the chain so far (the reference
inserts "an extra zero ... to make sure ALL words/terms of a previous
near-operation also have a proximity to this new word/term",
/root/reference/src/search.c:2198-2201). Token positions in this
engine start at 1, so 0 is unambiguous, exactly as in the reference.

A chained ``a nearD b nearD c`` therefore requires some position of
``c`` to be within D of a kept ``a`` position AND a kept ``b``
position (KeepPos checks the candidate against EVERY series,
/root/reference/src/search.c:1915-1963) — the documented
"all three words in an area of D words" rule
(/root/reference/src/search.c:1970-1975).

The whole-batch helpers vectorize the common no-separator case with
row-keyed ``searchsorted`` over concatenated position arrays — no
per-row Python objects (VERDICT round-1 item 4).
"""

from __future__ import annotations

import numpy as np

# row-key stride for batch kernels: positions are int32 (< 2^31), so
# row*STRIDE + pos is collision-free in int64 and window probes of
# +/- dist never cross a row band
_STRIDE = np.int64(1) << np.int64(32)


def split_series(pos):
    """Split zero-separated posdata into its series; a flat list (no
    zeros — not produced by NEAR) is one series."""
    out, cur = [], []
    has_zero = False
    for p in pos:
        if p == 0:
            out.append(cur)
            cur = []
            has_zero = True
        else:
            cur.append(p)
    if not has_zero:
        return [cur]
    out.append(cur)
    return out


def near_chain(lpos, rpos, dist):
    """One NEAR step of the reference algorithm
    (nearresultlists, /root/reference/src/search.c:1979-2240).

    ``lpos`` is the left operand's posdata (may contain 0 separators
    from an earlier NEAR in the chain); ``rpos`` is the right
    operand's flat positions. Returns the merged posdata
    ``kept(series_1) + [0] + ... + kept(series_k) + [0] + kept(right)``
    or None when the doc does not match.

    Equivalence note: the reference accepts a (pos1, pos2) pair iff
    |pos1-pos2| <= dist and KeepPos(pos2) — pos2 within dist of at
    least one position of EVERY series. Any such pos2 gives every
    series a qualifying pair, so the doc matches iff some pos2
    satisfies KeepPos; kept left positions are those within dist of a
    qualifying pos2. Duplicated appends in the reference's O(n*m) loop
    only repeat values — series membership is what later steps test —
    so each kept series is stored sorted and de-duplicated.
    """
    series = split_series(lpos)
    if any(not s for s in series):
        return None  # degenerate (empty series can never detect)
    # a right-nested NEAR result (via parens) carries 0 separators in
    # ITS posdata; 0 is never a token position (positions start at 1)
    # and the reference treats an operand's positions as a flat list
    rp = sorted(set(rpos) - {0})
    valid2 = [p2 for p2 in rp
              if all(any(abs(p1 - p2) <= dist for p1 in s)
                     for s in series)]
    if not valid2:
        return None
    out = []
    for s in series:
        kept = sorted({p1 for p1 in s
                       if any(abs(p1 - p2) <= dist for p2 in valid2)})
        out.extend(kept)
        out.append(0)
    out.extend(valid2)
    return out


def _row_keys(arrs, lens):
    """Concatenate per-row sorted position arrays into one int64 key
    array row*STRIDE + pos (globally sorted because rows ascend)."""
    if not arrs:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    cat = np.concatenate(arrs).astype(np.int64, copy=False)
    rows = np.repeat(np.arange(len(arrs), dtype=np.int64), lens)
    return rows * _STRIDE + cat, rows


def batch_near_flat(lp_list, rp_list, dist):
    """Vectorized pairwise NEAR over a batch of rows whose left
    posdata has NO series separators (the non-chained common case).

    ``lp_list``/``rp_list``: per-row sorted position arrays.
    Returns ``(ok, l_hit, r_hit)``: ok[i] row matched; l_hit/r_hit are
    lists of per-row boolean masks over the input arrays (positions
    within dist of the other side), only meaningful where ok.
    """
    n = len(lp_list)
    llens = np.fromiter((len(a) for a in lp_list), dtype=np.int64,
                        count=n)
    rlens = np.fromiter((len(a) for a in rp_list), dtype=np.int64,
                        count=n)
    lkeys, lrows = _row_keys(lp_list, llens)
    rkeys, rrows = _row_keys(rp_list, rlens)

    def probe(a_keys, a_rows, b_keys_sorted):
        """For each a: is some b within [a-dist, a+dist] in-row?"""
        if not len(a_keys) or not len(b_keys_sorted):
            return np.zeros(len(a_keys), dtype=bool)
        lo = np.maximum(a_keys - dist, a_rows * _STRIDE)
        i = np.searchsorted(b_keys_sorted, lo, side="left")
        safe = np.minimum(i, len(b_keys_sorted) - 1)
        return (i < len(b_keys_sorted)) \
            & (b_keys_sorted[safe] <= a_keys + dist)

    # b-side must be sorted for searchsorted; per-row arrays may be
    # unsorted (AND concatenates unsorted), so sort the key arrays —
    # row bands keep keys grouped, so one global sort sorts in-row
    l_hit_flat = probe(lkeys, lrows, np.sort(rkeys))
    r_hit_flat = probe(rkeys, rrows, np.sort(lkeys))
    ok = np.zeros(n, dtype=bool)
    if len(lkeys):
        np.logical_or.at(ok, lrows[l_hit_flat], True)
    l_ends = np.cumsum(llens)
    r_ends = np.cumsum(rlens)
    l_hit = np.split(l_hit_flat, l_ends[:-1]) if n else []
    r_hit = np.split(r_hit_flat, r_ends[:-1]) if n else []
    return ok, l_hit, r_hit


def near_batch(pl_series, pr_series, dist):
    """Batch NEAR over two iterables of per-row position arrays (the
    kernel-side driver used by both the BM25 and swish-rank NEAR
    kernels). Rows whose left posdata carries series separators (an
    earlier NEAR in the chain) take the scalar reference algorithm;
    all others are vectorized whole-batch.

    Returns ``(keep, merged)``: boolean ndarray over rows, and the
    list of merged posdata arrays (int32, with the new 0 separator,
    /root/reference/src/search.c:2198-2204) for kept rows in order.
    """
    lp_list = [np.asarray(a if a is not None else [], dtype=np.int64)
               for a in pl_series]
    rp_list = [np.asarray(a if a is not None else [], dtype=np.int64)
               for a in pr_series]
    # strip series separators from the RIGHT operand (right-nested
    # NEAR via parens): 0 is a separator, never a real position, and
    # the flat kernel would otherwise match |p1 - 0| <= dist
    rp_list = [a[a != 0] for a in rp_list]
    n = len(lp_list)
    chain = np.fromiter(
        (a.size > 0 and bool((a == 0).any()) for a in lp_list),
        dtype=bool, count=n)
    keep = np.zeros(n, dtype=bool)
    merged: dict = {}
    flat_idx = np.flatnonzero(~chain)
    if len(flat_idx):
        ok, l_hit, r_hit = batch_near_flat(
            [lp_list[i] for i in flat_idx],
            [rp_list[i] for i in flat_idx], dist)
        zero = np.zeros(1, dtype=np.int64)
        for k, i in enumerate(flat_idx):
            if ok[k]:
                keep[i] = True
                merged[i] = np.concatenate(
                    [lp_list[i][l_hit[k]], zero,
                     rp_list[i][r_hit[k]]]).astype(np.int32)
    for i in np.flatnonzero(chain):
        res = near_chain(lp_list[i].tolist(), rp_list[i].tolist(),
                         dist)
        if res is not None:
            keep[i] = True
            merged[i] = np.asarray(res, dtype=np.int32)
    return keep, [merged[i] for i in np.flatnonzero(keep)]


def batch_phrase(p_lists, offsets):
    """Vectorized phrase adjacency over a batch of rows.

    ``p_lists[j]`` is the per-row sorted position arrays of phrase
    term j; ``offsets[j]`` its offset within the phrase (stopword gaps
    skipped). A row matches when some base position p of term 0 has
    p - offsets[0] + offsets[j] present in term j's array for all j
    (phraseresultlists with distance 1,
    /root/reference/src/search.c:2561-2637). Returns ok[n] bool.
    """
    n = len(p_lists[0])
    lens0 = np.fromiter((len(a) for a in p_lists[0]), dtype=np.int64,
                        count=n)
    keys0, rows0 = _row_keys(p_lists[0], lens0)
    cand = np.ones(len(keys0), dtype=bool)
    for j in range(1, len(p_lists)):
        lensj = np.fromiter((len(a) for a in p_lists[j]),
                            dtype=np.int64, count=n)
        keysj = np.sort(_row_keys(p_lists[j], lensj)[0])
        target = keys0 + np.int64(offsets[j] - offsets[0])
        if not len(keysj):
            cand[:] = False
            break
        i = np.searchsorted(keysj, target, side="left")
        safe = np.minimum(i, len(keysj) - 1)
        cand &= (i < len(keysj)) & (keysj[safe] == target)
    ok = np.zeros(n, dtype=bool)
    if len(keys0):
        np.logical_or.at(ok, rows0[cand], True)
    return ok
