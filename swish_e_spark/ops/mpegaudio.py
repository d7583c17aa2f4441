"""MPEG audio (MP3) frame-level parsing — dependency-free.

Like mp4.py this serves the LLM-pipeline brief (the reference engine
has no media paths): REAL bitstream-level work — header fields, frame
walking with resync, Xing/Info VBR metadata, duration/bitrate — from
the public MPEG-1/2 audio framing (ISO/IEC 11172-3 / 13818-3 headers).

Scope boundary, stated precisely: PCM reconstruction (the subband
synthesis window of Table B.3 and the Layer III Huffman code tables of
Table B.7) is TABULATED spec data that cannot be re-derived from a
formula; shipping approximated tables would be a silently-wrong
decoder, so the sample payload stays behind ``multimodal._decode_stub``
's documented fake boundary while everything structural here is real
and fixture-pinned.

Header (32 bits, big-endian):
  11 sync | 2 version (3=MPEG1, 2=MPEG2, 0=MPEG2.5) | 2 layer
  (3=I, 2=II, 1=III) | 1 no-crc | 4 bitrate idx | 2 samplerate idx |
  1 padding | 1 private | 2 channel mode (3=mono) | 2 mode ext |
  1 copyright | 1 original | 2 emphasis
Frame size: Layer I  (12*bitrate/samplerate + pad) * 4 bytes;
Layers II/III  spf/8 * bitrate/samplerate + pad bytes, where spf
(samples per frame) is 384 for Layer I, 1152 for Layer II, and for
Layer III 1152 (MPEG-1) / 576 (MPEG-2/2.5).
"""

from __future__ import annotations

import struct

# bitrate tables in kbit/s, index 1..14 (0=free, 15=bad)
_BITRATE_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
        384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320),
}
_BITRATE_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224,
        256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SAMPLERATE = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}


def parse_header(word: int) -> dict | None:
    """32-bit big-endian header word -> field dict, or None if not a
    valid frame header."""
    if (word >> 21) & 0x7FF != 0x7FF:
        return None
    version = (word >> 19) & 3
    layer_bits = (word >> 17) & 3
    if version == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits            # 1, 2 or 3
    br_idx = (word >> 12) & 0xF
    sr_idx = (word >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                   # free-format unsupported
    table = _BITRATE_V1 if version == 3 else _BITRATE_V2
    bitrate = table[layer][br_idx] * 1000
    samplerate = _SAMPLERATE[version][sr_idx]
    padding = (word >> 9) & 1
    mode = (word >> 6) & 3
    if layer == 1:
        spf = 384
        size = (12 * bitrate // samplerate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 3) else 576
        size = spf // 8 * bitrate // samplerate + padding
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version],
        "layer": layer, "bitrate": bitrate, "samplerate": samplerate,
        "padding": padding, "mode": mode,
        "channels": 1 if mode == 3 else 2,
        "crc": not ((word >> 16) & 1),
        "spf": spf, "size": size,
    }


def _side_info_len(h: dict) -> int:
    """Layer III side-info bytes (MPEG-1: 17 mono / 32 stereo;
    MPEG-2/2.5: 9 / 17)."""
    if h["version"] == "1":
        return 17 if h["channels"] == 1 else 32
    return 9 if h["channels"] == 1 else 17


def parse_xing(frame: bytes, h: dict) -> dict | None:
    """Xing/Info VBR header inside the first frame (after the side
    info for Layer III)."""
    if h["layer"] != 3:
        return None
    off = 4 + (2 if h["crc"] else 0) + _side_info_len(h)
    tag = frame[off:off + 4]
    if tag not in (b"Xing", b"Info"):
        return None
    flags = struct.unpack_from(">I", frame, off + 4)[0]
    o = off + 8
    out = {"vbr": tag == b"Xing"}
    if flags & 1:
        out["frames"] = struct.unpack_from(">I", frame, o)[0]
        o += 4
    if flags & 2:
        out["bytes"] = struct.unpack_from(">I", frame, o)[0]
        o += 4
    return out


def walk_frames(payload: bytes, max_frames: int = 1 << 20):
    """Yield (offset, header_dict) for each frame, resyncing across
    garbage. A sync is accepted only if the header is valid AND the
    next frame's header (when in range) is also valid — the standard
    defense against pseudo-syncs in arbitrary bytes."""
    n = len(payload)
    o = 0
    count = 0
    while o + 4 <= n and count < max_frames:
        word = struct.unpack_from(">I", payload, o)[0]
        h = parse_header(word)
        if h is None or h["size"] < 4:
            o += 1
            continue
        nxt = o + h["size"]
        if nxt + 4 <= n:
            h2 = parse_header(struct.unpack_from(">I", payload, nxt)[0])
            if h2 is None:
                o += 1
                continue
        yield o, h
        count += 1
        o = nxt


def mpeg_audio_info(payload: bytes) -> dict | None:
    """Stream-level metadata from a frame walk: frame count, total
    samples, duration_ms, average bitrate, CBR/VBR, layer/version/
    samplerate/channels of the first frame. None when no frame parses
    (not MPEG audio)."""
    frames = []
    first = None
    bitrates = set()
    total_samples = 0
    for off, h in walk_frames(payload):
        if first is None:
            first = h
            xing = parse_xing(payload[off:off + h["size"]], h)
            if xing:
                first = dict(h, xing=xing)
        frames.append(off)
        bitrates.add(h["bitrate"])
        total_samples += h["spf"]
    if first is None:
        return None
    sr = first["samplerate"]
    return {
        "n_frames": len(frames),
        "total_samples": total_samples,
        "duration_ms": total_samples * 1000 // sr,
        "samplerate": sr,
        "channels": first["channels"],
        "layer": first["layer"],
        "version": first["version"],
        "avg_bitrate": (sum(bitrates) // len(bitrates)
                        if len(bitrates) == 1 else None),
        "vbr": len(bitrates) > 1 or bool(
            first.get("xing", {}).get("vbr")),
    }


# --------------------------------------------------------------------
# Deterministic fixture writer: syntactically valid CBR Layer III
# frames (correct sync/size arithmetic; payload bytes seeded junk —
# the walker under test reads structure, not PCM).
# --------------------------------------------------------------------

def build_mp3(n_frames: int, bitrate_idx: int = 9, sr_idx: int = 0,
              mono: bool = False, seed: int = 0) -> bytes:
    """MPEG-1 Layer III CBR stream: ``n_frames`` frames at bitrate
    index ``bitrate_idx`` (table index 1..14) and samplerate index
    ``sr_idx`` (0=44100, 1=48000, 2=32000)."""
    if not 1 <= bitrate_idx <= 14 or not 0 <= sr_idx <= 2:
        raise ValueError("bad bitrate/samplerate index")
    mode = 3 if mono else 0
    word = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (bitrate_idx << 12) | (sr_idx << 10) | (mode << 6)
    h = parse_header(word)
    out = bytearray()
    x = seed & 0xFFFFFFFF
    for _ in range(n_frames):
        out += struct.pack(">I", word)
        body = bytearray()
        for _ in range(h["size"] - 4):
            x = (x * 1103515245 + 12345) & 0xFFFFFFFF
            body.append((x >> 16) & 0xFF)
        out += body
    return bytes(out)
