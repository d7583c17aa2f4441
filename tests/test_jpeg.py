"""Baseline JPEG codec: round-trip pins + malformed-stream probes +
multimodal kernel integration (real decode path for image payloads)."""

import numpy as np
import pytest

from swish_e_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, c, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 5) % 200 + 20
    img = np.stack([(base + 10 * k) for k in range(c)], -1)
    return np.clip(img + rng.integers(-2, 3, img.shape), 0,
                   255).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("shape,sub,ri", [
        ((16, 24, 3), False, 0),   # 4:4:4 color
        ((16, 24, 3), True, 0),    # 4:2:0 color
        ((8, 8, 1), False, 0),     # single-block grayscale
        ((13, 17, 3), True, 0),    # odd dims + subsampling (MCU pad)
        ((5, 7, 1), False, 0),     # sub-block image
        ((32, 40, 3), False, 3),   # restart markers every 3 MCUs
        ((32, 40, 1), False, 1),   # restart interval 1, grayscale
        ((32, 40, 3), True, 2),    # restarts + subsampling
    ])
    def test_reconstruction_error_bounded(self, shape, sub, ri):
        h, w, c = shape
        img = _gradient(h, w, c)
        data = encode_jpeg(img, subsample=sub, restart_interval=ri)
        dh, dw, dc, dec = decode_jpeg(data)
        assert (dh, dw, dc) == (h, w, c)
        assert dec.shape == (h, w, c)
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        # smooth gradient content: lossy error stays small; the wrap
        # seam of the %200 ramp dominates on the larger images
        assert err < 12.0

    @pytest.mark.parametrize("shape", [(24, 40, 3), (17, 23, 3),
                                       (8, 8, 3)])
    def test_multi_scan_baseline_equals_interleaved(self, shape):
        """A legal baseline file with one non-interleaved SOS per
        component (T.81 B.2.3) must decode identically to the
        interleaved form — the decoder accumulates scans rather than
        returning after the first (which left chroma planes empty)."""
        rng = np.random.default_rng(sum(shape))
        px = (rng.random(shape) * 255).astype(np.uint8)
        inter = decode_jpeg(encode_jpeg(px))
        multi = decode_jpeg(encode_jpeg(px, separate_scans=True))
        assert inter[:3] == multi[:3]
        assert np.array_equal(inter[3], multi[3])

    def test_flat_image_near_exact(self):
        img = np.full((24, 24, 3), 128, np.uint8)
        _, _, _, dec = decode_jpeg(encode_jpeg(img))
        assert np.abs(dec.astype(int) - 128).max() <= 2

    def test_deterministic_bytes(self):
        img = _gradient(16, 16, 3)
        assert encode_jpeg(img) == encode_jpeg(img)


class TestMalformed:
    def test_not_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"GIF89a not a jpeg")

    def test_lossless_rejected(self):
        img = _gradient(8, 8, 1)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC3  # SOF0 -> SOF3 (lossless)
        with pytest.raises(ValueError, match="unsupported"):
            decode_jpeg(bytes(data))

    def test_baseline_stream_mislabeled_progressive_rejected(self):
        # a baseline SOS (Ss=0, Se=63) is an invalid progressive band
        img = _gradient(8, 8, 1)
        data = bytearray(encode_jpeg(img))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="scan band"):
            decode_jpeg(bytes(data))

    def test_truncated_entropy_stream_still_returns_image(self):
        # zero-padded reads past truncation: decode degrades, never
        # crashes — executor kernels must survive corrupt web media
        img = _gradient(16, 16, 1)
        data = encode_jpeg(img)
        h, w, c, dec = decode_jpeg(data[: len(data) - 20])
        assert (h, w, c) == (16, 16, 1)

    def test_corrupt_sof_fields_raise_valueerror(self):
        """Zero sampling factors, zero dimensions, and absurd
        dimensions must all raise ValueError BEFORE any allocation
        sized from the untrusted header (no ZeroDivisionError, no
        multi-GB numpy allocs from a 200-byte payload)."""
        img = _gradient(16, 16, 3)
        base = bytearray(encode_jpeg(img))
        i = bytes(base).find(b"\xff\xc0")
        hv0 = bytearray(base)
        hv0[i + 11] = 0x00  # first component sampling factors -> 0
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg(bytes(hv0))
        h0 = bytearray(base)
        h0[i + 5:i + 7] = (0).to_bytes(2, "big")
        with pytest.raises(ValueError, match="dimensions"):
            decode_jpeg(bytes(h0))
        huge = bytearray(base)
        huge[i + 5:i + 7] = (60000).to_bytes(2, "big")
        huge[i + 7:i + 9] = (60000).to_bytes(2, "big")
        with pytest.raises(ValueError, match="pixel cap"):
            decode_jpeg(bytes(huge))

    def test_fill_bytes_before_markers(self):
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker; real encoders emit them for alignment
        img = _gradient(16, 16, 3)
        data = encode_jpeg(img)
        want = decode_jpeg(data)
        i = data.find(b"\xff\xdb")  # before DQT
        j = data.find(b"\xff\xda")  # before SOS
        padded = (data[:i] + b"\xff\xff\xff" + data[i:j]
                  + b"\xff" + data[j:])
        got = decode_jpeg(padded)
        assert want[:3] == got[:3]
        assert np.array_equal(want[3], got[3])

    def test_missing_sos(self):
        img = _gradient(8, 8, 1)
        data = encode_jpeg(img)
        i = data.find(b"\xff\xda")
        with pytest.raises(ValueError, match="no SOS"):
            decode_jpeg(data[:i] + b"\xff\xd9")


class TestProgressive:
    """Progressive DCT (T.81 Annex G). The entropy layer is lossless
    over the same quantized coefficients, so a progressive encoding of
    the same pixels must decode BIT-IDENTICALLY to the baseline
    encoding's decode — an exact pin, not a tolerance."""

    @staticmethod
    def _contents():
        rng = np.random.default_rng(3)
        out = {"flat": np.full((40, 40, 3), 77, np.uint8)}
        imp = np.full((40, 40), 128, np.uint8)
        imp[::7, ::5] = 255  # isolated impulses: ZRL runs
        out["impulse"] = imp
        g = np.linspace(0, 255, 40)
        out["grad"] = ((g[:, None] + g[None, :])[..., None]
                       .repeat(3, 2) / 2).astype(np.uint8)
        out["noise"] = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        x = rng.random((40, 40)) * 20 + 100
        for _ in range(3):
            x = (x + np.roll(x, 1, 0) + np.roll(x, -1, 0)
                 + np.roll(x, 1, 1) + np.roll(x, -1, 1)) / 5
        out["smooth"] = x.astype(np.uint8)  # sparse coefs: EOB runs
        return out

    @pytest.mark.parametrize("q", [1, 4, 16])
    def test_bit_identical_to_baseline(self, q):
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive

        for name, px in self._contents().items():
            base = decode_jpeg(encode_jpeg(px, quality_scale=q))
            prog = decode_jpeg(encode_jpeg_progressive(
                px, quality_scale=q))
            assert base[:3] == prog[:3], (name, q)
            assert np.array_equal(base[3], prog[3]), (name, q)

    @pytest.mark.parametrize("shape", [(9, 9), (8, 8), (31, 17, 3),
                                       (64, 63, 3)])
    def test_odd_sizes_with_restarts_every_scan(self, shape):
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(sum(shape))
        px = (rng.random(shape) * 255).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px))
        prog = decode_jpeg(encode_jpeg_progressive(
            px, restart_interval=2))
        assert np.array_equal(base[3], prog[3])

    @pytest.mark.parametrize("shape", [(16, 16, 3), (31, 17, 3),
                                       (13, 21, 3), (64, 63, 3)])
    @pytest.mark.parametrize("ri", [0, 2])
    def test_subsampled_420_bit_identical(self, shape, ri):
        # 4:2:0 exercises the v*h>1 interleaved DC walk and the
        # non-MCU-padded component AC grid — the geometry most
        # real-world progressive JPEGs use
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(sum(shape) + ri)
        px = (rng.random(shape) * 255).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(px, subsample=True))
        prog = decode_jpeg(encode_jpeg_progressive(
            px, subsample=True, restart_interval=ri))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])

    def test_headers_only_progressive_raises(self):
        # SOF2 parsed but zero scans decoded must NOT reconstruct a
        # bogus flat-gray image
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive

        px = _gradient(24, 24, 3)
        data = bytes(encode_jpeg_progressive(px))
        cut = data[: data.find(b"\xff\xda")] + b"\xff\xd9"
        with pytest.raises(ValueError, match="no SOS"):
            decode_jpeg(cut)

    def test_truncated_progressive_returns_partial_image(self):
        # dropping the tail scans loses refinement detail, never crashes
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive

        px = _gradient(24, 24, 3)
        data = bytes(encode_jpeg_progressive(px))
        # cut cleanly at a later scan boundary: refinement scans lost
        offs = []
        i = data.find(b"\xff\xda")
        while i != -1:
            offs.append(i)
            i = data.find(b"\xff\xda", i + 2)
        assert len(offs) >= 4
        cut = data[: offs[3]] + b"\xff\xd9"
        h, w, c, dec = decode_jpeg(cut)
        assert (h, w, c) == (24, 24, 3)
        # mid-segment truncation raises ValueError, never IndexError
        # (the multimodal boundary catches ValueError only)
        for frac in (0.2, 0.35, 0.6, 0.9):
            try:
                decode_jpeg(data[: int(len(data) * frac)])
            except ValueError:
                pass

    def test_decode_stub_routes_progressive(self):
        from swish_e_spark.ops.jpeg import encode_jpeg_progressive
        from swish_e_spark.ops.multimodal import THUMB, _decode_stub

        px = _gradient(48, 32, 3)
        thumb = _decode_stub(encode_jpeg_progressive(px), "image",
                             fake=False)  # must decode FOR REAL
        assert thumb.shape == (THUMB, THUMB)
        assert 0.0 <= thumb.min() and thumb.max() <= 1.0
        assert thumb.std() > 0.01


class TestMultimodalIntegration:
    def test_decode_stub_routes_jpeg(self):
        from swish_e_spark.ops.multimodal import THUMB, _decode_stub

        img = _gradient(40, 40, 3)
        thumb = _decode_stub(encode_jpeg(img), "image", fake=False)
        assert thumb.shape == (THUMB, THUMB)
        # grayscale thumb of the ramp: values in [0,1], non-constant
        assert 0.0 <= thumb.min() and thumb.max() <= 1.0
        assert thumb.std() > 0.01

    def test_feature_kernel_over_jpeg_payloads(self, spark):
        import pandas as pd

        from swish_e_spark.ops.multimodal import extract_features

        rows = []
        for mid in range(6):
            img = _gradient(24, 24, 3, seed=mid)
            rows.append({"media_id": mid, "kind": "image",
                         "payload": encode_jpeg(img),
                         "width": 24, "height": 24, "sample_rate": 0})
        media = spark.createDataFrame(pd.DataFrame(rows))
        out = extract_features(media, fake=False).toPandas()
        assert len(out) == 6
        assert all(len(f) == 16 for f in out["feature"])
