"""Stdlib-only media decoders for the multimodal ``mode="real"`` seam.

PNG is zlib (stdlib) plus per-scanline unfiltering and WAV is a RIFF
header parse over ``np.frombuffer`` — the two simplest real formats,
implemented without any image/audio library (none exist in this
container; see multimodal.py).  Scope is deliberately minimal but
real: 8-bit non-interlaced PNG in grayscale / gray+alpha / RGB / RGBA,
and integer-PCM WAV.  For video the CONTAINER is demuxed for real —
``parse_mp4_samples`` walks the ISO BMFF box tree (ISO/IEC 14496-12)
and resolves per-sample byte ranges + keyframe flags from the stbl
tables — while the codec bitstream decode (H.264 etc.) stays behind
the ffmpeg seam; extraction is the container's job, decoding is the
codec's.

Unfiltering is vectorized where the filter's data dependency allows:
None/Up are pure array adds, Sub is a per-byte-lane cumulative sum
(uint8 cumsum wraps mod 256, exactly PNG's arithmetic), Average and
Paeth carry a left dependency and fall back to a per-pixel loop on the
rows that use them (rare in practice; correctness over speed at this
seam).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (height, width, channels)
    uint8 array."""
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_MAGIC)
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR or IDAT")
    ch = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * ch + 1  # one filter byte per scanline
    if len(raw) != height * stride:
        raise ValueError("PNG data length does not match dimensions")
    rows = raw.reshape(height, stride)
    filters = rows[:, 0]
    out = np.empty((height, width * ch), dtype=np.uint8)
    prev = np.zeros(width * ch, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = rows[y, 1:]
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: per-lane cumsum mod 256
            lanes = line.reshape(width, ch)
            out[y] = np.cumsum(lanes, axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average (left dependency -> scalar loop)
            o = out[y]
            for x in range(width * ch):
                left = int(o[x - ch]) if x >= ch else 0
                o[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth (left dependency -> scalar loop)
            o = out[y]
            for x in range(width * ch):
                a = int(o[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                o[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (filter 0 scanlines) for fixtures and tests;
    accepts (h, w) or (h, w, channels) uint8."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1
    ).tobytes()
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an integer-PCM WAV to ((n_samples, channels) array,
    sample_rate).  8-bit -> uint8, 16-bit -> int16, 32-bit -> int32."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_format, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format} (only PCM)")
            if bits not in (8, 16, 32):
                raise ValueError(f"unsupported WAV bit depth {bits}")
            fmt = (channels, rate, bits)
        elif ctype == b"data":
            samples = body
    if fmt is None or samples is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    channels, rate, bits = fmt
    dtype = {8: np.uint8, 16: np.int16, 32: np.int32}[bits]
    arr = np.frombuffer(samples, dtype=dtype)
    n = len(arr) // channels
    return arr[: n * channels].reshape(n, channels), rate


# ---------------------------------------------------------------- MP4

def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for ISO BMFF boxes in
    [start, end); handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr:
            raise ValueError("corrupt MP4: box smaller than its header")
        yield btype, pos + hdr, min(pos + size, end)
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """First box at the given nested path; (body_start, body_end) or None."""
    if not path:
        return start, end
    for btype, b0, b1 in _walk_boxes(data, start, end):
        if btype == path[0]:
            return _find_box(data, b0, b1, path[1:])
    return None


def parse_mp4_samples(data: bytes) -> list[tuple[int, int, bool]]:
    """Demux an MP4 (ISO BMFF) video track WITHOUT decoding: returns
    [(file_offset, size, is_sync), ...] per sample, derived from the
    sample tables (stsz sizes, stsc sample-to-chunk, stco/co64 chunk
    offsets, stss sync samples; ISO/IEC 14496-12).  The payload bits
    stay codec-encoded — only their decode needs ffmpeg; the container
    walk does not."""
    end = len(data)
    # pick the first track whose handler is video
    moov = _find_box(data, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    stbl = None
    for btype, b0, b1 in _walk_boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find_box(data, b0, b1, [b"mdia"])
        if mdia is None:
            continue
        hdlr = _find_box(data, *mdia, [b"hdlr"])
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _find_box(data, *mdia, [b"minf", b"stbl"])
        break
    if stbl is None:
        raise ValueError("MP4 has no video track")

    tables: dict[bytes, tuple[int, int]] = {}
    for btype, b0, b1 in _walk_boxes(data, *stbl):
        tables[btype] = (b0, b1)

    def full_box(name: bytes):
        if name not in tables:
            return None
        b0, b1 = tables[name]
        return b0 + 4, b1  # skip version+flags

    # sizes
    sz = full_box(b"stsz")
    if sz is None:
        raise ValueError("MP4 video track missing stsz")
    p, _ = sz
    uniform, count = struct.unpack(">II", data[p : p + 8])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", data[p + 8 : p + 8 + 4 * count]))
    # chunk offsets (stco 32-bit or co64)
    co = full_box(b"stco")
    wide = False
    if co is None:
        co = full_box(b"co64")
        wide = True
    if co is None:
        raise ValueError("MP4 video track missing stco/co64")
    p, _ = co
    (n_chunks,) = struct.unpack(">I", data[p : p + 4])
    fmt = ">%d%s" % (n_chunks, "Q" if wide else "I")
    offs = list(struct.unpack(fmt, data[p + 4 : p + 4 + (8 if wide else 4) * n_chunks]))
    # sample->chunk mapping
    sc = full_box(b"stsc")
    if sc is None:
        raise ValueError("MP4 video track missing stsc")
    p, _ = sc
    (n_ent,) = struct.unpack(">I", data[p : p + 4])
    ents = [
        struct.unpack(">III", data[p + 4 + 12 * i : p + 16 + 12 * i]) for i in range(n_ent)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)
    # sync table (absent = every sample is sync)
    ss = full_box(b"stss")
    sync: set[int] | None = None
    if ss is not None:
        p, _ = ss
        (n_sync,) = struct.unpack(">I", data[p : p + 4])
        sync = set(struct.unpack(f">{n_sync}I", data[p + 4 : p + 4 + 4 * n_sync]))

    out: list[tuple[int, int, bool]] = []
    sample = 0  # 0-based
    for i, (first_chunk, per_chunk, _desc) in enumerate(ents):
        last_chunk = ents[i + 1][0] - 1 if i + 1 < len(ents) else n_chunks
        for chunk in range(first_chunk, last_chunk + 1):
            pos = offs[chunk - 1]
            for _ in range(per_chunk):
                if sample >= count:
                    break
                size = sizes[sample]
                is_sync = sync is None or (sample + 1) in sync
                out.append((pos, size, is_sync))
                pos += size
                sample += 1
    if sample != count:
        raise ValueError(f"MP4 sample tables inconsistent: mapped {sample} of {count}")
    return out


def mp4_keyframes(data: bytes, n_frames: int) -> list[bytes]:
    """Up to ``n_frames`` evenly-spaced SYNC samples' payload bytes
    (still codec-encoded — extraction is the container's job, decoding
    is the codec's)."""
    samples = parse_mp4_samples(data)
    syncs = [(o, s) for o, s, k in samples if k] or [(o, s) for o, s, _ in samples]
    take = min(n_frames, len(syncs))
    idx = [(i * len(syncs)) // take for i in range(take)]
    return [bytes(data[o : o + s]) for o, s in (syncs[i] for i in idx)]
