"""Dependency-free GIF87a/GIF89a decode (public spec: GIF89a
specification + LZW per the original GIF data-stream format), plus a
minimal single-frame encoder used only for deterministic test
fixtures (this container ships no image library).

Decode scope (what the multimodal feature kernel needs): first frame,
global or local color table, interlaced or sequential row order,
variable-width LZW with clear/EOI handling. Later animation frames
are ignored — frame-sample plumbing treats animated media as video
elsewhere (ops/multimodal.py frame_sample).

Indexed-color GIF is lossless, so fixture round-trips assert exact
pixel equality (contrast the JPEG codec, pinned by error bounds).

The reference engine has no image handling (swish-e indexes only
text/HTML/XML, /root/reference/src/html.c); this exists for the
training-data-pipeline brief."""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expect: int):
    """GIF LZW: variable-width codes, clear/EOI, output byte stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary: code -> bytes
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + entry[:1]
                    next_code += 1
            else:
                entry = prev + prev[:1]
                if next_code < 4096:
                    table[next_code] = entry
                    next_code += 1
            out.extend(entry)
            prev = entry
            if next_code == (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out)
    return bytes(out)


def decode_gif(payload: bytes):
    """First frame of a GIF87a/89a as float32 grayscale (H, W) in
    [0,1], or None if not a GIF / malformed."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(payload) < 13:
        return None
    _w, _h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            return None
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b0 != 0x2C:  # image descriptor
            return None
        _x, _y, iw, ih, iflags = struct.unpack_from("<HHHHB", payload,
                                                    pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(payload, np.uint8, n * 3,
                               pos).reshape(-1, 3)
            pos += n * 3
        if ct is None or iw <= 0 or ih <= 0:
            return None
        min_code = payload[pos]
        pos += 1
        blocks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            blocks.append(payload[pos + 1:pos + 1 + ln])
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(min_code, b"".join(blocks), iw * ih)
        if len(idx) < iw * ih:
            return None
        px = np.frombuffer(idx[:iw * ih], np.uint8).reshape(ih, iw)
        px = np.minimum(px, len(ct) - 1)
        if iflags & 0x40:  # interlaced: de-interlace pass order
            rows = np.empty(ih, np.int64)
            order = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                order.extend(range(start, ih, step))
            rows[np.array(order)] = np.arange(ih)
            px = px[rows]
        rgb = ct[px]
        return rgb.astype(np.float32).mean(axis=2) / 255.0
    return None


# ------------------------------------------------------------ encoder
def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = b""
    for ch in data:
        cur = prev + bytes([ch])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([ch])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Fixture encoder: one frame, global color table, no interlace.
    indices HxW uint8 into palette (Nx3 uint8, N a power of two >=2)."""
    h, w = indices.shape
    n = len(palette)
    depth = max(1, int(n - 1).bit_length())
    assert n == 1 << depth
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, depth)
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices.astype(np.uint8).tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


