"""Property-based hardening (hypothesis): the vectorized positional
kernels against scalar references, and the fast HTML lexer against
html.parser on arbitrary small inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from swish_e_spark.query.positional import (
    batch_phrase, near_batch, near_chain, split_series,
)

pos_arrays = st.lists(
    st.lists(st.integers(min_value=1, max_value=200), min_size=0,
             max_size=12).map(sorted),
    min_size=1, max_size=8)


def _near_naive(lp, rp, d):
    return any(abs(a - b) <= d for a in lp for b in rp)


class TestNearBatchProperty:
    @settings(max_examples=300, deadline=None)
    @given(pos_arrays, pos_arrays, st.integers(1, 30))
    def test_flat_near_matches_naive(self, lps, rps, d):
        n = min(len(lps), len(rps))
        lps, rps = lps[:n], rps[:n]
        keep, merged = near_batch(lps, rps, d)
        it = iter(merged)
        for i in range(n):
            want = _near_naive(lps[i], rps[i], d)
            assert bool(keep[i]) == want, (lps[i], rps[i], d)
            if want:
                m = next(it)
                # merged posdata = kept left ++ [0] ++ kept right;
                # every kept position is within d of the other side
                series = split_series(m.tolist())
                assert len(series) == 2
                ka, kb = series
                assert all(any(abs(a - b) <= d for b in rps[i])
                           for a in ka)
                assert all(any(abs(a - b) <= d for a in lps[i])
                           for b in kb)
                assert set(ka) <= set(lps[i])
                assert set(kb) <= set(rps[i])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(1, 120),
                    min_size=0, max_size=8).map(sorted),
           st.lists(st.integers(1, 120),
                    min_size=0, max_size=8).map(sorted),
           st.lists(st.integers(1, 120),
                    min_size=0, max_size=8).map(sorted),
           st.integers(1, 20))
    def test_chain_brute_force(self, a, b, c, d):
        """near_chain over two steps equals the brute-force area rule:
        the doc matches iff some pc is within d of a kept pa AND a
        valid pb, where valid pb are near some pa and kept pa near
        some valid pb."""
        step1 = near_chain(list(a), list(b), d)
        vb = sorted({pb for pb in b if any(abs(pa - pb) <= d
                                           for pa in a)})
        if not vb:
            assert step1 is None
            return
        ka = sorted({pa for pa in a if any(abs(pa - pb) <= d
                                           for pb in vb)})
        assert step1 == ka + [0] + vb
        step2 = near_chain(step1, list(c), d)
        vc = sorted({pc for pc in c
                     if any(abs(pc - pa) <= d for pa in ka)
                     and any(abs(pc - pb) <= d for pb in vb)})
        if not vc:
            assert step2 is None
        else:
            assert step2 is not None
            assert step2[-len(vc):] == vc

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.tuples(
        st.lists(st.integers(1, 60), min_size=1, max_size=6)
        .map(sorted),
        st.lists(st.integers(1, 60), min_size=1, max_size=6)
        .map(sorted),
        st.lists(st.integers(1, 60), min_size=1, max_size=6)
        .map(sorted)), min_size=1, max_size=6),
        st.lists(st.integers(0, 4), min_size=3, max_size=3))
    def test_batch_phrase_matches_naive(self, rows, offs):
        offsets = [offs[0], offs[0] + 1 + offs[1],
                   offs[0] + 2 + offs[1] + offs[2]]
        p_lists = [[np.asarray(r[j], dtype=np.int64) for r in rows]
                   for j in range(3)]
        ok = batch_phrase(p_lists, offsets)
        for i, (p0, p1, p2) in enumerate(rows):
            want = any((p - offsets[0] + offsets[1]) in p1
                       and (p - offsets[0] + offsets[2]) in p2
                       for p in p0)
            assert bool(ok[i]) == want, (rows[i], offsets)


class TestFastLexerProperty:
    @settings(max_examples=400, deadline=None)
    @given(st.lists(st.sampled_from(
        list("<>ab /=\"'&;#!-?xyZ9\n\t") + ["&amp;", "<p>",
             "</p>", "<!--", "-->", "<em>", "</em>", "<meta ",
             "name=", "content=", "<b/>", "<!doctype html>"]),
        min_size=0, max_size=24).map("".join))
    def test_accepted_inputs_match_html_parser(self, raw):
        from swish_e_spark.textproc.extractor import (
            _SwishHTMLParser, _fast_feed,
        )

        fast = _SwishHTMLParser()
        if not _fast_feed(fast, raw):
            return  # bailed: html.parser path is used in production
        fast._flush()
        slow = _SwishHTMLParser()
        slow.feed(raw)
        slow.close()
        slow._flush()
        f = [(e.field_name, e.text, e.structure, e.hard_break)
             for e in fast.doc.events]
        s = [(e.field_name, e.text, e.structure, e.hard_break)
             for e in slow.doc.events]
        assert f == s, repr(raw)
        assert fast.doc.noindex == slow.doc.noindex


class TestCodecProperty:
    """Image codecs under arbitrary content: GIF round-trips exactly
    (indexed color is lossless); JPEG stays within a quantization
    error bound and never crashes on random pixel fields."""

    @settings(max_examples=60, deadline=None)
    @given(st.integers(2, 40), st.integers(2, 40),
           st.sampled_from([2, 4, 16, 256]), st.integers(0, 2 ** 31))
    def test_gif_roundtrip_exact(self, h, w, n_pal, seed):
        from swish_e_spark.ops.gif import decode_gif, encode_gif

        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
        idx = rng.integers(0, n_pal, (h, w), dtype=np.uint8)
        gray = decode_gif(encode_gif(idx, pal))
        want = pal[idx].astype(np.float32).mean(axis=2) / 255.0
        assert gray is not None and gray.shape == (h, w)
        assert np.allclose(gray, want)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.sampled_from([1, 3]), st.booleans(),
           st.integers(0, 3), st.integers(0, 2 ** 31))
    def test_jpeg_roundtrip_bounded(self, h, w, c, sub, ri, seed):
        from swish_e_spark.ops.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        data = encode_jpeg(img, subsample=sub, restart_interval=ri)
        dh, dw, dc, dec = decode_jpeg(data)
        assert (dh, dw, dc) == (h, w, c)
        # random noise is the worst case for a DCT codec: assert the
        # decode is bounded and sane, not visually faithful
        assert dec.dtype == np.uint8 and dec.shape == (h, w, c)
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 96.0

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.sampled_from([1, 3]), st.booleans(), st.integers(0, 3),
           st.sampled_from([1, 4, 16]), st.integers(0, 2 ** 31))
    def test_progressive_bit_identical_to_baseline(self, h, w, c, sub,
                                                   ri, q, seed):
        # the progressive entropy layer is lossless over the same
        # quantized coefficients: decodes must be EQUAL, not close
        from swish_e_spark.ops.jpeg import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality_scale=q,
                                       subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality_scale=q, restart_interval=ri, subsample=sub))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])
