"""ISO base media file format (MP4) container parsing — dependency-free.

The reference engine has no media handling at all (swish-e indexes
text; /root/reference/src has no codec paths) — this module serves the
LLM-training-pipeline brief: treat video/audio as opaque binary columns
and do REAL container-level work (box tree, track metadata, per-sample
offsets/sizes/timestamps, sample extraction) while the codec payload
itself (H.264 NAL / AAC) stays behind the documented fake boundary in
``multimodal._decode_stub``.

Implements the public ISO/IEC 14496-12 box structure:
  box = u32 size, 4cc type [, u64 largesize if size==1]; size==0 = to
  end of file. FullBox adds u8 version + u24 flags.
  ftyp(major/minor/compatible), moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
  minf(stbl(stsd, stts, stsc, stsz/stz2, stco/co64))))), mdat.
Sample resolution walks the four sample-table boxes: stsc runs assign
samples to chunks, stco gives chunk file offsets, stsz per-sample
sizes (offset inside a chunk = chunk offset + preceding sizes), stts
run-length-encodes per-sample durations (dts deltas).

Untrusted-input discipline matches the image decoders
(multimodal.py): explicit caps on box depth/count and sample count,
bounds-checked reads, ValueError on malformed structure — never trust
a declared size.
"""

from __future__ import annotations

import struct

MAX_BOXES = 4096       # total boxes visited
MAX_DEPTH = 16         # container nesting
MAX_SAMPLES = 1 << 20  # per track
MAX_TRACKS = 64

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta", b"mvex", b"moof", b"traf"}


def _u32(b, o):
    return struct.unpack_from(">I", b, o)[0]


def _u64(b, o):
    return struct.unpack_from(">Q", b, o)[0]


def _boxes(buf, start, end, depth, budget):
    """Yield (type, body_start, body_end) for boxes in [start, end)."""
    o = start
    while o < end:
        if o + 8 > end:
            raise ValueError("truncated box header")
        size = _u32(buf, o)
        typ = bytes(buf[o + 4:o + 8])
        body = o + 8
        if size == 1:
            if body + 8 > end:
                raise ValueError("truncated largesize")
            size = _u64(buf, body)
            body += 8
            if size < 16:
                raise ValueError("bad largesize")
        elif size == 0:
            size = end - o
        elif size < 8:
            raise ValueError("bad box size")
        if o + size > end:
            raise ValueError("box overruns parent")
        budget[0] -= 1
        if budget[0] < 0:
            raise ValueError("too many boxes")
        yield typ, body, o + size
        o += size


def _full(buf, o):
    """FullBox header -> (version, flags, offset past header)."""
    v = buf[o]
    flags = int.from_bytes(bytes(buf[o + 1:o + 4]), "big")
    return v, flags, o + 4


def _parse_stbl(buf, start, end, budget):
    t = {"stts": [], "stsc": [], "stsz": None, "stco": [],
         "codec": None}
    for typ, b, e in _boxes(buf, start, end, 0, budget):
        if typ == b"stsd":
            _v, _f, o = _full(buf, b)
            n = _u32(buf, o)
            if n >= 1 and o + 12 <= e:
                t["codec"] = bytes(buf[o + 8:o + 12]).decode(
                    "latin-1")
        elif typ == b"stts":
            _v, _f, o = _full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("stts too large")
            o += 4
            if o + 8 * n > e:
                raise ValueError("stts truncated")
            t["stts"] = [(_u32(buf, o + 8 * i), _u32(buf, o + 8 * i + 4))
                         for i in range(n)]
        elif typ == b"stsc":
            _v, _f, o = _full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("stsc too large")
            o += 4
            if o + 12 * n > e:
                raise ValueError("stsc truncated")
            t["stsc"] = [(_u32(buf, o + 12 * i),
                          _u32(buf, o + 12 * i + 4),
                          _u32(buf, o + 12 * i + 8))
                         for i in range(n)]
        elif typ == b"stsz":
            _v, _f, o = _full(buf, b)
            fixed = _u32(buf, o)
            n = _u32(buf, o + 4)
            if n > MAX_SAMPLES:
                raise ValueError("stsz too large")
            o += 8
            if fixed:
                t["stsz"] = (fixed, n)
            else:
                if o + 4 * n > e:
                    raise ValueError("stsz truncated")
                t["stsz"] = (0, [_u32(buf, o + 4 * i)
                                 for i in range(n)])
        elif typ in (b"stco", b"co64"):
            _v, _f, o = _full(buf, b)
            n = _u32(buf, o)
            if n > MAX_SAMPLES:
                raise ValueError("stco too large")
            o += 4
            w = 8 if typ == b"co64" else 4
            if o + w * n > e:
                raise ValueError("stco truncated")
            rd = _u64 if typ == b"co64" else _u32
            t["stco"] = [rd(buf, o + w * i) for i in range(n)]
    return t


def _resolve_samples(t, file_len):
    """Sample tables -> list of (offset, size, dts). Validates every
    offset against the file length."""
    fixed, sz = t["stsz"] if t["stsz"] is not None else (0, [])
    n = sz if fixed else len(sz)
    sizes = ([fixed] * n) if fixed else sz
    if n == 0:
        return []
    if not t["stco"] or not t["stsc"]:
        raise ValueError("missing chunk tables")
    # expand stsc runs: entry i applies from first_chunk_i until the
    # next entry's first_chunk (1-based chunk numbering)
    spc = []
    runs = t["stsc"]
    for i, (first, per, _sdi) in enumerate(runs):
        last = runs[i + 1][0] if i + 1 < len(runs) \
            else len(t["stco"]) + 1
        if first < 1 or last < first or per < 1:
            raise ValueError("bad stsc run")
        spc.extend([per] * (last - first))
    # dts deltas from stts runs
    deltas = []
    for cnt, delta in t["stts"]:
        if len(deltas) + cnt > n:
            cnt = n - len(deltas)
        deltas.extend([delta] * cnt)
        if len(deltas) >= n:
            break
    deltas.extend([deltas[-1] if deltas else 0] * (n - len(deltas)))
    out = []
    si = 0
    dts = 0
    for ci, coff in enumerate(t["stco"]):
        if si >= n:
            break
        per = spc[ci] if ci < len(spc) else spc[-1] if spc else 1
        off = coff
        for _ in range(per):
            if si >= n:
                break
            size = sizes[si]
            if off + size > file_len:
                raise ValueError("sample overruns file")
            out.append((off, size, dts))
            dts += deltas[si]
            off += size
            si += 1
    if si < n:
        raise ValueError("chunk tables cover fewer samples than stsz")
    return out


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO-BMFF container. Returns
    {brand, timescale, duration, tracks: [{handler, codec, timescale,
    duration, n_samples, samples: [(offset, size, dts), ...]}]}.
    Raises ValueError on anything malformed."""
    buf = memoryview(payload)
    budget = [MAX_BOXES]
    info = {"brand": None, "timescale": 0, "duration": 0, "tracks": []}
    saw_ftyp = False
    for typ, b, e in _boxes(buf, 0, len(buf), 0, budget):
        if typ == b"ftyp":
            if e - b < 8:
                raise ValueError("ftyp too short")
            info["brand"] = bytes(buf[b:b + 4]).decode("latin-1")
            saw_ftyp = True
        elif typ == b"moov":
            _parse_moov(buf, b, e, budget, info)
    if not saw_ftyp or info["timescale"] == 0:
        raise ValueError("not an ISO-BMFF file")
    return info


def _parse_moov(buf, start, end, budget, info):
    for typ, b, e in _boxes(buf, start, end, 1, budget):
        if typ == b"mvhd":
            v, _f, o = _full(buf, b)
            if v == 1:
                info["timescale"] = _u32(buf, o + 16)
                info["duration"] = _u64(buf, o + 20)
            else:
                info["timescale"] = _u32(buf, o + 8)
                info["duration"] = _u32(buf, o + 12)
            if info["timescale"] == 0:
                raise ValueError("zero timescale")
        elif typ == b"trak":
            if len(info["tracks"]) >= MAX_TRACKS:
                raise ValueError("too many tracks")
            info["tracks"].append(
                _parse_trak(buf, b, e, budget, len(buf)))


def _parse_trak(buf, start, end, budget, file_len):
    tr = {"handler": None, "codec": None, "timescale": 0,
          "duration": 0, "n_samples": 0, "samples": []}
    for typ, b, e in _boxes(buf, start, end, 2, budget):
        if typ == b"mdia":
            for t2, b2, e2 in _boxes(buf, b, e, 3, budget):
                if t2 == b"mdhd":
                    v, _f, o = _full(buf, b2)
                    if v == 1:
                        tr["timescale"] = _u32(buf, o + 16)
                        tr["duration"] = _u64(buf, o + 20)
                    else:
                        tr["timescale"] = _u32(buf, o + 8)
                        tr["duration"] = _u32(buf, o + 12)
                elif t2 == b"hdlr":
                    _v, _f, o = _full(buf, b2)
                    tr["handler"] = bytes(buf[o + 4:o + 8]).decode(
                        "latin-1")
                elif t2 == b"minf":
                    for t3, b3, e3 in _boxes(buf, b2, e2, 4, budget):
                        if t3 == b"stbl":
                            t = _parse_stbl(buf, b3, e3, budget)
                            tr["codec"] = t["codec"]
                            tr["samples"] = _resolve_samples(
                                t, file_len)
                            tr["n_samples"] = len(tr["samples"])
    return tr


def mp4_sample(payload: bytes, track: int, idx: int) -> bytes:
    """Extract one sample's raw bytes by resolved file offset."""
    info = parse_mp4(payload)
    off, size, _dts = info["tracks"][track]["samples"][idx]
    return payload[off:off + size]


# --------------------------------------------------------------------
# Deterministic fixture writer (tests + driver oracle round-trip): a
# minimal but fully valid single-track file — ftyp, mdat with the
# samples back to back, moov with real sample tables pointing into it.
# --------------------------------------------------------------------

def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _fullbox(typ: bytes, version: int, flags: int,
             body: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big")
                + body)


_UNITY = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                     0x40000000)


def build_mp4(samples, timescale: int = 1000,
              sample_delta: int = 40, handler: bytes = b"vide",
              codec: bytes = b"mp4v") -> bytes:
    """Write a valid one-track ISO-BMFF file whose mdat holds
    ``samples`` (list of bytes) with constant per-sample duration
    ``sample_delta`` (in ``timescale`` units). Chunking: one chunk for
    all samples (stsc single run, stco one offset)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isom" + b"iso2" + b"mp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    data_off = len(ftyp) + 8  # samples start right after mdat header
    n = len(samples)
    dur = n * sample_delta

    stsd_entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                      + b"\x00" * 16)
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _fullbox(b"stts", 0, 0,
                    struct.pack(">III", 1, n, sample_delta))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", 0, 0,
                    struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(s))
                               for s in samples))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">II", 1, data_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _fullbox(b"dref", 0, 0, struct.pack(">I", 1)
                    + _fullbox(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fullbox(b"hdlr", 0, 0, struct.pack(">I", 0) + handler
                    + b"\x00" * 12 + b"swish\x00")
    # mdhd language: 'und' packed 3x5bit
    lang = ((ord("u") - 0x60) << 10) | ((ord("n") - 0x60) << 5) \
        | (ord("d") - 0x60)
    mdhd = _fullbox(b"mdhd", 0, 0,
                    struct.pack(">IIIIHH", 0, 0, timescale, dur,
                                lang, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fullbox(b"tkhd", 0, 7,
                    struct.pack(">IIII", 0, 0, 1, 0)
                    + struct.pack(">I", dur) + b"\x00" * 8
                    + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY
                    + struct.pack(">II", 64 << 16, 64 << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fullbox(b"mvhd", 0, 0,
                    struct.pack(">IIII", 0, 0, timescale, dur)
                    + struct.pack(">IHH", 0x10000, 0x0100, 0)
                    + b"\x00" * 8 + _UNITY + b"\x00" * 24
                    + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
