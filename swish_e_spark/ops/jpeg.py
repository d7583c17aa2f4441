"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

Decode path (used by the multimodal feature kernel): baseline
sequential DCT and progressive DCT (spectral selection + successive
approximation, T.81 Annex G), 8-bit precision, grayscale or YCbCr
with generic 1-2 h/v chroma subsampling factors (4:4:4 / 4:2:2 /
4:2:0), restart markers. Arithmetic / lossless / 12-bit streams
raise ValueError and stay at the documented codec stub in
ops.multimodal.

Encode path: a minimal baseline encoder with the Annex K default
quantization + Huffman tables — used for thumbnail writing and for
deterministic test fixtures (this container ships no image library,
so fixtures are produced by our own encoder and the decoder is
pinned by round-trip error bounds against known pixel fields).

The reference engine has no image handling at all (swish-e indexes
only text/HTML/XML, /root/reference/src/html.c); this module exists
for the training-data-pipeline brief: multimodal columns travel as
opaque binary and decode executor-side inside Arrow-batched kernels.

Everything here implements the public ITU-T T.81 spec directly:
Annex C (canonical Huffman code construction), F.2 (decode
procedures, DC prediction + EXTEND), F.1 (encode), K.1/K.3 (default
tables), plus the JFIF YCbCr<->RGB matrix (ITU-R BT.601).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- zigzag
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 8x8 DCT-II basis (orthonormal); IDCT is B.T @ X @ B
def _dct_basis() -> np.ndarray:
    k = np.arange(8)
    n = np.arange(8)
    b = np.cos((2 * n[None, :] + 1) * k[:, None] * np.pi / 16)
    b[0] *= 1 / np.sqrt(2)
    return b * 0.5


_B = _dct_basis()


def idct2(block: np.ndarray) -> np.ndarray:
    return _B.T @ block @ _B


def dct2(block: np.ndarray) -> np.ndarray:
    return _B @ block @ _B.T


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past end
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller handles
                else:
                    break  # real marker: stop feeding
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        if self.nbits < n:  # truncated stream: zero-pad
            self.acc <<= (n - self.nbits)
            self.nbits = n
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self):
        """Skip to just past the next RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                return
            i += 1
        self.pos = len(d)


def _build_huff(counts: list, symbols: bytes) -> dict:
    """(length, code) -> symbol, per T.81 Annex C canonical order."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline or progressive JPEG. Returns (height, width,
    channels, pixels ndarray HxWxC uint8). Corrupt streams raise
    ValueError (the multimodal codec boundary's contract)."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"corrupt JPEG: {e!r}") from e


def _decode_jpeg(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    coef: dict = {}
    scans_decoded = 0
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # any number of 0xFF fill bytes may precede a marker (B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            break  # lone trailing FF on a truncated stream
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(payload):
            break  # segment length truncated away
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128], ">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64], np.uint8)
                    i += 64
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                symbols = seg[i + 17:i + 17 + n]
                if len(counts) < 16 or len(symbols) < n:
                    raise ValueError("truncated DHT")
                (huff_ac if tc else huff_dc)[th] = \
                    _build_huff(counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            # validate BEFORE any allocation sized from these fields: a
            # corrupt 200-byte payload must not allocate gigabytes or
            # divide by a zero sampling factor
            if h <= 0 or w <= 0 or not 1 <= nc <= 4:
                raise ValueError("bad SOF dimensions")
            if h * w > MAX_PIXELS:
                raise ValueError("image exceeds decoder pixel cap")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                if not (1 <= hv >> 4 <= 4 and 1 <= hv & 15 <= 4):
                    raise ValueError("bad sampling factors")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "prog": marker == 0xC2}
            coef = _alloc_coefs(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (lossless/arith/12-bit)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c:3 + 2 * c]
                scomp.append((cs, tt >> 4, tt & 15))
            data_start = pos + seglen
            if not frame["prog"]:
                end = _decode_base_scan(payload, data_start, frame,
                                        scomp, huff_dc, huff_ac,
                                        restart_interval, coef)
            else:
                ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
                end = _decode_prog_scan(payload, data_start, frame,
                                        scomp, ss, se, ahal >> 4,
                                        ahal & 15, huff_dc, huff_ac,
                                        restart_interval, coef)
            scans_decoded += 1
            # skip to the next true marker (entropy data may contain
            # stuffed FF00 and RSTn bytes the outer loop must not parse)
            p = end
            while p + 1 < len(payload):
                if payload[p] == 0xFF and payload[p + 1] != 0x00 \
                        and not 0xD0 <= payload[p + 1] <= 0xD7:
                    break
                p += 1
            pos = p
            continue
        pos += seglen
    if frame is not None and scans_decoded:
        return _reconstruct_prog(frame, coef, qt)
    raise ValueError("no SOS in JPEG")


MAX_PIXELS = 1 << 26  # 67M px (~8K x 8K): a corrupt header must not
                      # size an allocation; real pipeline media is far
                      # smaller and a legit larger image should be
                      # downscaled before the feature kernel anyway


def _decode_base_scan(data, start, frame, scomp, huff_dc, huff_ac,
                      restart_interval, coef):
    """One baseline sequential scan decoded into the coefficient
    store: interleaved MCU walk when ns > 1, else the single
    component's OWN block raster (T.81 A.2.2 — non-interleaved scans
    are not MCU-padded). Accumulating scans like the progressive path
    makes multi-scan baseline files (one SOS per component, a legal
    and extant encoder output) decode correctly instead of returning
    after the first scan with the other components' planes empty."""
    by_id = {c["id"]: c for c in frame["comps"]}
    _hmax, _vmax, mcux, mcuy = _geometry(frame)
    br = _BitReader(data, start)
    pred = {cs: 0 for cs, _, _ in scomp}

    def block(blk, td, ta, cid):
        t = _huff_decode(br, huff_dc[td])
        pred[cid] += _extend(br.read(t), t)
        blk[0] = pred[cid]
        k = 1
        while k < 64:
            rs = _huff_decode(br, huff_ac[ta])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                break
            blk[ZIGZAG[k]] = _extend(br.read(s), s)
            k += 1

    interleaved = len(scomp) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        bh, bw = _comp_blocks(frame, by_id[scomp[0][0]])
        n_units = bh * bw
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            br.align_restart()
            for kk in pred:
                pred[kk] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for cid, td, ta in scomp:
                c = by_id[cid]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        block(coef[cid][my * c["v"] + vy,
                                        mx * c["h"] + vx], td, ta, cid)
        else:
            cid, td, ta = scomp[0]
            block(coef[cid][u // bw, u % bw], td, ta, cid)
    return br.pos


def _planes_to_pixels(planes, comps, hmax, vmax, h, w):
    """Upsample component planes to full resolution, crop, and color
    convert (JFIF YCbCr->RGB, ITU-R BT.601)."""
    out = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pix = np.clip(out[0], 0, 255).astype(np.uint8)[:, :, None]
        return h, w, 1, pix
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    pix = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    return h, w, 3, pix


# ------------------------------------------------- progressive (G.2)


def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_blocks(frame, c):
    """Non-interleaved block grid of one component (T.81 A.2.2:
    ceil of the scaled sample dims, NOT the MCU-padded grid)."""
    hmax, vmax, _, _ = _geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _alloc_coefs(frame):
    """Per-component coefficient store over the MCU-padded grid,
    natural (de-zigzagged) order, filled in across scans."""
    _, _, mcux, mcuy = _geometry(frame)
    return {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              np.int32)
            for c in frame["comps"]}


def _decode_prog_scan(data, start, frame, scomp, ss, se, ah, al,
                      huff_dc, huff_ac, restart_interval, coef):
    """One progressive scan (T.81 G.2): DC or AC band, first pass
    (Ah=0) or successive-approximation refinement. Returns the byte
    position just past the consumed entropy-coded data."""
    if ss > 63 or se > 63 or se < ss or (ss == 0) != (se == 0):
        raise ValueError("bad progressive scan band")
    if ss > 0 and len(scomp) != 1:
        raise ValueError("progressive AC scan must be one component")
    by_id = {c["id"]: c for c in frame["comps"]}
    hmax, vmax, mcux, mcuy = _geometry(frame)
    br = _BitReader(data, start)
    state = {"eobrun": 0}
    pred = {cs: 0 for cs, _, _ in scomp}

    def dc_block(blk, td):
        if ah == 0:
            t = _huff_decode(br, huff_dc[td])
            pred[cid] += _extend(br.read(t), t)
            blk[0] = pred[cid] << al
        else:
            blk[0] |= br.read(1) << al

    def ac_first(blk, ta):
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(br, huff_ac[ta])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read(r)
                return
            k += r
            if k > se:
                return  # corrupt run: drop the rest of the band
            blk[ZIGZAG[k]] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine(blk, ta):
        # T.81 G.1.2.3 correction-bit procedure
        p1, m1 = 1 << al, -1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(br, huff_ac[ta])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.read(r)
                        break
                    val = 0  # ZRL: 16 zero-history positions
                else:
                    val = p1 if br.read(1) else m1
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z]:
                        if br.read(1) and not blk[z] & p1:
                            blk[z] += p1 if blk[z] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[ZIGZAG[k]] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = ZIGZAG[k]
                if blk[z]:
                    if br.read(1) and not blk[z] & p1:
                        blk[z] += p1 if blk[z] > 0 else m1
                k += 1
            state["eobrun"] -= 1

    interleaved = len(scomp) > 1
    if ss == 0:  # DC scan (the only multi-component scan kind)
        if interleaved:
            n_units = mcux * mcuy
        else:
            bh, bw = _comp_blocks(frame, by_id[scomp[0][0]])
            n_units = bh * bw
        for u in range(n_units):
            if restart_interval and u and u % restart_interval == 0:
                br.align_restart()
                state["eobrun"] = 0
                for k in pred:
                    pred[k] = 0
            if interleaved:
                my, mx = divmod(u, mcux)
                for cid, td, _ta in scomp:
                    c = by_id[cid]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            dc_block(coef[cid][my * c["v"] + vy,
                                               mx * c["h"] + vx], td)
            else:
                cid, td, _ta = scomp[0]
                dc_block(coef[cid][u // bw, u % bw], td)
    else:  # AC scan: exactly one component, non-interleaved
        cid, _td, ta = scomp[0]
        bh, bw = _comp_blocks(frame, by_id[cid])
        fn = ac_first if ah == 0 else ac_refine
        for u in range(bh * bw):
            if restart_interval and u and u % restart_interval == 0:
                br.align_restart()
                state["eobrun"] = 0
            fn(coef[cid][u // bw, u % bw], ta)
    return br.pos


def _reconstruct_prog(frame, coef, qt):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks per component) and assemble pixels."""
    comps = frame["comps"]
    hmax, vmax, _, _ = _geometry(frame)
    planes = {}
    for c in comps:
        blocks = coef[c["id"]]
        bh, bw, _ = blocks.shape
        q = qt[c["tq"]].reshape(-1)
        deq = (blocks.reshape(-1, 64) * q).astype(np.float64) \
            .reshape(-1, 8, 8)
        # per-block idct2, same op as the baseline path: progressive
        # and baseline decodes of equal coefficients stay bit-equal
        # (batched matmul takes a different BLAS path and drifts ±1)
        px = np.stack([idct2(d) for d in deq]) + 128.0
        planes[c["id"]] = px.reshape(bh, bw, 8, 8) \
            .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _planes_to_pixels(planes, comps, hmax, vmax,
                             frame["h"], frame["w"])


# ------------------------------------------------------------ encoder
# (test-fixture generation only — T.81 Annex K default tables)

STD_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int32).reshape(8, 8)

STD_CHR_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int32).reshape(8, 8)

# Annex K.3 default huffman specs: (bits list len16, value bytes)
K3_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             bytes(range(12)))
K3_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             bytes(range(12)))
K3_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
             bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))
K3_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
             bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]))


def _enc_huff(spec):
    counts, symbols = spec
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | code
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag(v: int):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


# ------------------------------------------- progressive encoder
# (fixtures only). One flat Huffman table keeps the encoder trivial:
# 255 symbols at 8 bits + 1 at 9 (the all-ones max-length code stays
# unused, as T.81 C.2 requires).
_FLAT_HUFF = ([0] * 7 + [255, 1] + [0] * 7, bytes(range(256)))


class _ScanWriter:
    """Per-scan entropy writer for the progressive fixture encoder:
    owns the bit buffer and the restart-marker plumbing shared by
    every scan kind."""

    def __init__(self, out: bytearray, enc: dict, restart_interval: int):
        self.out = out
        self.enc = enc
        self.ri = restart_interval
        self.bwr = _BitWriter()
        self.rst = 0

    def put(self, sym: int):
        ln, c = self.enc[sym]
        self.bwr.write(c, ln)

    def bits(self, code: int, n: int):
        self.bwr.write(code, n)

    def restart_if_needed(self, u: int, before=None) -> bool:
        """At a restart boundary: run `before` (e.g. an EOB flush —
        an EOB run cannot span a restart), byte-align, emit RSTn."""
        if not (self.ri and u and u % self.ri == 0):
            return False
        if before is not None:
            before()
        self.bwr.flush()
        self.out.extend(self.bwr.out)
        self.bwr = _BitWriter()
        self.out.extend(bytes([0xFF, 0xD0 + (self.rst % 8)]))
        self.rst += 1
        return True

    def close(self):
        self.bwr.flush()
        self.out.extend(self.bwr.out)


def encode_jpeg_progressive(pixels: np.ndarray, quality_scale: int = 1,
                            restart_interval: int = 0,
                            subsample: bool = False) -> bytes:
    """Encode HxWx{1,3} uint8 as a progressive JPEG (SOF2) with
    spectral selection AND successive approximation — fixture
    generation for the progressive decoder. 4:4:4 by default;
    subsample=True emits 4:2:0 (2x2 luma factors, box-averaged
    chroma — same plane math as the baseline encoder, so the two
    encoders quantize identical coefficients and their decodes pin
    bit-identical). Scan script: DC all-comps first pass (Al=1); per
    component AC bands 1-5 and 6-63 first pass (Al=1); per component
    AC refinement of both bands (Ah=1, Al=0); DC refinement (Ah=1,
    Al=0). restart_interval, if set, applies to EVERY scan (EOB runs
    are flushed at each restart boundary, as the spec requires)."""
    h, w = pixels.shape[:2]
    nc = 1 if pixels.ndim == 2 or pixels.shape[2] == 1 else 3
    px = pixels.reshape(h, w, nc).astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        chans = [0.299 * r + 0.587 * g + 0.114 * b,
                 -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
                 0.5 * r - 0.418688 * g - 0.081312 * b + 128]
    else:
        chans = [px[..., 0]]
    ql = np.maximum(STD_LUM_Q // quality_scale, 1)
    qc = np.maximum(STD_CHR_Q // quality_scale, 1)
    sub = 2 if (subsample and nc == 3) else 1
    mcux = -(-w // (8 * sub))
    mcuy = -(-h // (8 * sub))

    def pad_plane(p, fh, fv):
        ph, pw = p.shape
        outp = np.empty((mcuy * fv * 8, mcux * fh * 8))
        outp[:ph, :pw] = p
        outp[ph:, :pw] = p[ph - 1:ph, :]
        outp[:, pw:] = outp[:, pw - 1:pw]
        return outp

    # per-component geometry + quantized coefficients (zigzag order,
    # raster over the FULL MCU-padded grid; AC scans later walk only
    # the ceil(comp/8) sub-grid — MCU-pad blocks are DC-only per spec)
    comps = []
    for ci, ch in enumerate(chans):
        fh = fv = sub if (ci == 0 and nc == 3) else 1
        plane = pad_plane(ch, sub, sub)
        if fh == 1 and sub == 2:  # chroma under 4:2:0: 2x2 box-average
            plane = plane.reshape(plane.shape[0] // 2, 2, -1, 2) \
                .mean((1, 3))
        bw_f, bh_f = mcux * fh, mcuy * fv
        blocks = plane.reshape(bh_f, 8, bw_f, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        q = ql if ci == 0 else qc
        # per-block dct2 (same op as the baseline encoder): batched
        # einsum rounds exact-.5 quantization boundaries differently,
        # which would break the bit-identity pin vs the baseline path
        x = np.stack([np.round(dct2(blk) / q) for blk in blocks])
        comps.append({
            "fh": fh, "fv": fv, "bw_f": bw_f,
            # non-interleaved AC grid (T.81 A.2.2): ceil of the
            # component's own scaled dims, NOT the MCU-padded grid
            "cbh": -(--(-h * fv // sub) // 8),
            "cbw": -(--(-w * fh // sub) // 8),
            "zz": x.astype(np.int32).reshape(-1, 64)[:, ZIGZAG],
        })

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, ql), (1, qc))[:2 if nc == 3 else 1]:
        seg(0xDB, bytes([tq]) + bytes(
            q.reshape(-1)[ZIGZAG].astype(np.uint8).tolist()))
    body = struct.pack(">BHHB", 8, h, w, nc)
    for ci, c in enumerate(comps):
        body += bytes([ci + 1, (c["fh"] << 4) | c["fv"],
                       0 if ci == 0 else 1])
    seg(0xC2, body)
    for tc_th in (0x00, 0x10):  # same flat table as DC 0 and AC 0
        counts, symbols = _FLAT_HUFF
        seg(0xC4, bytes([tc_th]) + bytes(counts) + symbols)
    enc = _enc_huff(_FLAT_HUFF)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    def sos(scomp, ss, se, ah, al):
        body = bytes([len(scomp)])
        for cid in scomp:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    def mcu_blocks(u):
        """Block ids of MCU u in interleaved walk order."""
        my, mx = divmod(u, mcux)
        for ci, c in enumerate(comps):
            for vy in range(c["fv"]):
                for vx in range(c["fh"]):
                    yield ci, (my * c["fv"] + vy) * c["bw_f"] \
                        + (mx * c["fh"] + vx)

    def trunc(v, n):  # AC point transform: toward-zero division
        return -((-v) >> n) if v < 0 else v >> n

    def dc_scan(refine):
        sos(list(range(1, nc + 1)), 0, 0, int(refine), 1 - int(refine))
        sw = _ScanWriter(out, enc, restart_interval)
        pred = [0] * nc
        for u in range(mcux * mcuy):
            if sw.restart_if_needed(u):
                pred = [0] * nc
            for ci, ub in mcu_blocks(u):
                dc = int(comps[ci]["zz"][ub, 0])
                if refine:
                    sw.bits(dc & 1, 1)
                else:
                    v = dc >> 1  # DC point transform: arithmetic >> Al
                    t, code = _mag(v - pred[ci])
                    pred[ci] = v
                    sw.put(t)
                    if t:
                        sw.bits(code, t)
        sw.close()

    def ac_first_scan(ci, ss, se):
        sos([ci + 1], ss, se, 0, 1)
        sw = _ScanWriter(out, enc, restart_interval)
        c = comps[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            sw.put(r << 4)
            if r:
                sw.bits(eobrun - (1 << r), r)
            eobrun = 0

        for u in range(c["cbh"] * c["cbw"]):
            sw.restart_if_needed(u, before=flush_eob)
            ub = (u // c["cbw"]) * c["bw_f"] + u % c["cbw"]
            band = [trunc(int(c["zz"][ub, k]), 1)
                    for k in range(ss, se + 1)]
            last = -1
            for i, v in enumerate(band):
                if v:
                    last = i
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for v in band[:last + 1]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.put(0xF0)
                    run -= 16
                t, code = _mag(v)
                sw.put((run << 4) | t)
                sw.bits(code, t)
                run = 0
            if last < len(band) - 1:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        sw.close()

    def ac_refine_scan(ci, ss, se):
        sos([ci + 1], ss, se, 1, 0)
        sw = _ScanWriter(out, enc, restart_interval)
        c = comps[ci]
        eobrun = 0
        pending: list = []

        def flush_eob():
            nonlocal eobrun
            if not eobrun:
                return
            r = eobrun.bit_length() - 1
            sw.put(r << 4)
            if r:
                sw.bits(eobrun - (1 << r), r)
            for bit in pending:
                sw.bits(bit, 1)
            pending.clear()
            eobrun = 0

        for u in range(c["cbh"] * c["cbw"]):
            sw.restart_if_needed(u, before=flush_eob)
            ub = (u // c["cbw"]) * c["bw_f"] + u % c["cbw"]
            # T.81 figure G.7 flow: absvalues at this level; a
            # coefficient is history-significant if its magnitude
            # exceeds 1 here (it was nonzero at the prior level),
            # newly significant if exactly 1
            absv = [abs(int(c["zz"][ub, k])) for k in range(ss, se + 1)]
            eob_k = -1  # last newly-significant position
            for i, a in enumerate(absv):
                if a == 1:
                    eob_k = i
            br_bits: list = []  # correction bits since last symbol
            run = 0
            for i, a in enumerate(absv):
                if a == 0:
                    run += 1
                    continue
                # ZRLs only when not foldable into the EOB run
                while run > 15 and i <= eob_k:
                    flush_eob()
                    sw.put(0xF0)
                    for bit in br_bits:
                        sw.bits(bit, 1)
                    br_bits = []
                    run -= 16
                if a > 1:  # history: just a correction bit
                    br_bits.append(a & 1)
                    continue
                flush_eob()
                sw.put((run << 4) | 1)
                sw.bits(1 if int(c["zz"][ub, ss + i]) > 0 else 0, 1)
                for bit in br_bits:
                    sw.bits(bit, 1)
                br_bits = []
                run = 0
            if run or br_bits:
                eobrun += 1
                pending.extend(br_bits)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        sw.close()

    dc_scan(refine=False)
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            ac_first_scan(ci, ss, se)
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            ac_refine_scan(ci, ss, se)
    dc_scan(refine=True)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_jpeg(pixels: np.ndarray, quality_scale: int = 1,
                subsample: bool = False,
                restart_interval: int = 0,
                separate_scans: bool = False) -> bytes:
    """Encode HxWx{1,3} uint8 to baseline JPEG (fixtures only).
    quality_scale divides the Annex K tables (1 = default).
    separate_scans emits one non-interleaved SOS per component
    (4:4:4 only) — the multi-scan baseline form real encoders also
    produce, which the decoder must accumulate across scans."""
    h, w = pixels.shape[:2]
    nc = 1 if pixels.ndim == 2 or pixels.shape[2] == 1 else 3
    px = pixels.reshape(h, w, nc).astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        chans = [y, cb, cr]
    else:
        chans = [px[..., 0]]
    ql = np.maximum(STD_LUM_Q // quality_scale, 1)
    qc = np.maximum(STD_CHR_Q // quality_scale, 1)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(body) + 2) + body)

    for tq, q in ((0, ql), (1, qc))[:2 if nc == 3 else 1]:
        seg(0xDB, bytes([tq]) + bytes(q.reshape(-1)[ZIGZAG].astype(
            np.uint8).tolist()))
    # SOF0
    sub_h = 2 if (subsample and nc == 3) else 1
    body = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hv = (sub_h << 4 | sub_h) if ci == 0 and nc == 3 else 0x11
        body += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    seg(0xC0, body)
    specs = [(0x00, K3_DC_LUM), (0x10, K3_AC_LUM)]
    if nc == 3:
        specs += [(0x01, K3_DC_CHR), (0x11, K3_AC_CHR)]
    for tc_th, (counts, symbols) in specs:
        seg(0xC4, bytes([tc_th]) + bytes(counts) + symbols)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    dc_lum, ac_lum = _enc_huff(K3_DC_LUM), _enc_huff(K3_AC_LUM)
    dc_chr, ac_chr = _enc_huff(K3_DC_CHR), _enc_huff(K3_AC_CHR)
    bw = _BitWriter()
    hmax = sub_h
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * hmax - 1) // (8 * hmax)

    def pad_plane(p, fh, fv):
        H = mcuy * fv * 8
        W = mcux * fh * 8
        ph, pw = p.shape
        outp = np.empty((H, W))
        outp[:ph, :pw] = p
        outp[ph:, :pw] = p[ph - 1:ph, :]
        outp[:, pw:] = outp[:, pw - 1:pw]
        return outp

    if nc == 3 and sub_h == 2:
        yp = pad_plane(chans[0], 2, 2)
        # 2x2 box-average chroma
        cbp = pad_plane(chans[1], 2, 2)
        crp = pad_plane(chans[2], 2, 2)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean((1, 3))
        comp_planes = [(yp, 2, 2, ql, dc_lum, ac_lum),
                       (cbs, 1, 1, qc, dc_chr, ac_chr),
                       (crs, 1, 1, qc, dc_chr, ac_chr)]
    else:
        comp_planes = []
        for ci, ch in enumerate(chans):
            q = ql if ci == 0 else qc
            dt = dc_lum if ci == 0 else dc_chr
            at = ac_lum if ci == 0 else ac_chr
            comp_planes.append((pad_plane(ch, 1, 1), 1, 1, q, dt, at))

    def enc_block(bw_, p, y0, x0, q, dt, at, pred_v):
        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
        co = np.round(dct2(blk) / q).astype(np.int32)
        zz = co.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred_v
        t, code = _mag(diff)
        ln, c = dt[t]
        bw_.write(c, ln)
        if t:
            bw_.write(code, t)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, c = at[0xF0]
                bw_.write(c, ln)
                run -= 16
            t, code = _mag(v)
            ln, c = at[(run << 4) | t]
            bw_.write(c, ln)
            bw_.write(code, t)
            run = 0
        if last < 63:
            ln, c = at[0x00]
            bw_.write(c, ln)
        return int(zz[0])

    if separate_scans:
        # one SOS per component (legal baseline, T.81 B.2.3): each
        # scan walks the component's own block raster non-interleaved.
        # Fixture mode restricted to the geometry where the component
        # raster equals its padded grid (no subsampling, no restarts).
        assert not subsample and not restart_interval
        for ci, (p, fh, fv, q, dt, at) in enumerate(comp_planes):
            seg(0xDA, bytes([1, ci + 1, 0x00 if ci == 0 else 0x11,
                             0, 63, 0]))
            bw = _BitWriter()
            pred_c = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    pred_c = enc_block(bw, p, my * 8, mx * 8, q, dt,
                                       at, pred_c)
            bw.flush()
            out.extend(bw.out)
        out.extend(b"\xff\xd9")
        return bytes(out)

    body = bytes([nc])
    for ci in range(nc):
        body += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    body += bytes([0, 63, 0])
    seg(0xDA, body)
    pred = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                bw = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                pred = [0] * nc
            mcu += 1
            for ci, (p, fh, fv, q, dt, at) in enumerate(comp_planes):
                for vy in range(fv):
                    for vx in range(fh):
                        pred[ci] = enc_block(
                            bw, p, (my * fv + vy) * 8,
                            (mx * fh + vx) * 8, q, dt, at, pred[ci])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


