"""Stdlib-only media decoders for the multimodal ``mode="real"`` seam.

PNG is zlib (stdlib) plus per-scanline unfiltering and WAV is a RIFF
header parse over ``np.frombuffer`` — the two simplest real formats,
implemented without any image/audio library (none exist in this
container; see multimodal.py).  Scope is deliberately minimal but
real: 8-bit non-interlaced PNG in grayscale / gray+alpha / RGB / RGBA,
and integer-PCM WAV.  Video (MP4) stays behind the ffmpeg seam — a
container demuxer + codec is not a two-format stdlib exercise.

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
