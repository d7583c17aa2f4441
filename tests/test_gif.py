"""GIF codec: lossless indexed-color round-trips, interlace,
malformed probes, and multimodal kernel routing."""

import struct

import numpy as np
import pytest

from swish_e_spark.ops.gif import decode_gif, encode_gif


def _fixture(hw, n, seed=3):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, hw, dtype=np.uint8)
    return idx, pal


class TestRoundTrip:
    @pytest.mark.parametrize("hw,n", [
        ((17, 23), 4), ((32, 32), 16), ((8, 5), 2), ((40, 33), 256)])
    def test_lossless(self, hw, n):
        idx, pal = _fixture(hw, n)
        gray = decode_gif(encode_gif(idx, pal))
        want = pal[idx].astype(np.float32).mean(axis=2) / 255.0
        assert gray is not None and gray.shape == hw
        assert np.allclose(gray, want)

    def test_interlaced(self):
        # build an interlaced stream by permuting rows into GIF pass
        # order and setting the interlace flag; the decoder must
        # restore the original row order exactly
        idx, pal = _fixture((19, 11), 8)
        h = idx.shape[0]
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        data = bytearray(encode_gif(idx[np.array(order)], pal))
        i = data.index(0x2C, 13 + len(pal) * 3)
        data[i + 9] |= 0x40  # image-descriptor interlace flag
        gray = decode_gif(bytes(data))
        want = pal[idx].astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(gray, want)

    def test_local_color_table_and_extension_skip(self):
        idx, pal = _fixture((9, 9), 4)
        base = encode_gif(idx, pal)
        # rebuild: drop the global table, add a graphic-control
        # extension, attach the palette as a LOCAL table instead
        hdr = bytearray(base[:13])
        hdr[10] &= 0x7F  # clear global-color-table flag
        body = base[13 + len(pal) * 3:]
        ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        desc = bytearray(body[:10])
        desc[9] = 0x80 | (len(pal) - 1).bit_length() - 1
        rebuilt = bytes(hdr) + ext + bytes(desc) + \
            pal.astype(np.uint8).tobytes() + body[10:]
        want = pal[idx].astype(np.float32).mean(axis=2) / 255.0
        assert np.allclose(decode_gif(rebuilt), want)


class TestMalformed:
    def test_not_gif(self):
        assert decode_gif(b"\x89PNG\r\n") is None
        assert decode_gif(b"GIF89a" + b"\x00" * 3) is None

    def test_truncated_lzw(self):
        idx, pal = _fixture((16, 16), 16)
        data = encode_gif(idx, pal)
        assert decode_gif(data[: len(data) // 2]) is None

    def test_trailer_only(self):
        assert decode_gif(
            b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
            + b"\x3B") is None


class TestMultimodalIntegration:
    def test_decode_stub_routes_gif(self):
        from swish_e_spark.ops.multimodal import THUMB, _decode_stub

        idx, pal = _fixture((48, 48), 16)
        thumb = _decode_stub(encode_gif(idx, pal), "image", fake=False)
        assert thumb.shape == (THUMB, THUMB)
        assert 0.0 <= thumb.min() and thumb.max() <= 1.0
