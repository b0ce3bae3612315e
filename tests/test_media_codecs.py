"""Stdlib-only PNG/WAV decoders (round-5: the real mode behind the
multimodal seam).  WAV fixtures come from the stdlib `wave` module —
an independent writer; PNG filter coverage is driven by hand-built
IDAT streams so every unfilter path is exercised regardless of what an
encoder would choose."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from cpp_parquet_spark.pipeline.media_codecs import (
    decode_png,
    decode_wav,
    encode_png,
)


def _png_from_filtered(scanlines, width, height, color_type):
    magic = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)


def test_png_every_filter_type():
    """Decode a gray 8-bit image whose rows use filters 0..4; expected
    pixels computed by the PNG spec's recurrences in pure Python."""
    w, h = 7, 5
    rng = np.random.default_rng(3)
    filt = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4]
    # reference decode, straight from the spec
    recon = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        f = filters[y]
        for x in range(w):
            a = recon[y, x - 1] if x > 0 else 0
            b = recon[y - 1, x] if y > 0 else 0
            c = recon[y - 1, x - 1] if x > 0 and y > 0 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            recon[y, x] = (int(filt[y, x]) + pred) & 0xFF
    scan = b"".join(bytes([filters[y]]) + filt[y].tobytes() for y in range(h))
    out = decode_png(_png_from_filtered(scan, w, h, color_type=0))
    assert np.array_equal(out[:, :, 0], recon.astype(np.uint8))


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"this is text, not an image")
    img = np.zeros((2, 2), np.uint8)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth byte inside IHDR
    # recompute nothing: decoder must reject before CRC matters
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))


def test_wav_roundtrip_against_stdlib_writer():
    rate = 8000
    samples = (np.sin(np.arange(1600) / 20.0) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        interleaved = np.column_stack([samples, -samples]).reshape(-1)
        wf.writeframes(interleaved.tobytes())
    out, got_rate = decode_wav(buf.getvalue())
    assert got_rate == rate
    assert out.shape == (1600, 2)
    assert np.array_equal(out[:, 0], samples)
    assert np.array_equal(out[:, 1], -samples)


def test_wav_8bit_mono_and_rejects():
    buf = io.BytesIO()
    data = np.arange(256, dtype=np.uint8)
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(11025)
        wf.writeframes(data.tobytes())
    out, rate = decode_wav(buf.getvalue())
    assert rate == 11025
    assert np.array_equal(out[:, 0], data)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all.....")


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, body: bytes) -> bytes:  # version 0, flags 0
    return _box(btype, b"\x00\x00\x00\x00" + body)


def _mini_mp4(samples, sync_1based, chunk_split):
    """Hand-built minimal MP4: mdat carries `samples` (list of bytes),
    split into chunks after `chunk_split` samples each; stss marks
    `sync_1based`.  Returns (mp4_bytes, expected_offsets)."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # place mdat right after ftyp; moov at the end (offsets into mdat)
    mdat_body = b"".join(samples)
    mdat = _box(b"mdat", mdat_body)
    mdat_data_start = len(ftyp) + 8

    # chunk layout
    chunks, i = [], 0
    for cnt in chunk_split:
        chunks.append(samples[i : i + cnt])
        i += cnt
    assert i == len(samples)
    offs, pos, expected = [], mdat_data_start, []
    for ch in chunks:
        offs.append(pos)
        for s in ch:
            expected.append(pos)
            pos += len(s)

    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(b"avc1", b"\x00" * 16))
    stts = _full(b"stts", struct.pack(">III", 1, len(samples), 1))
    # stsc entries: runs of equal samples-per-chunk
    ents = []
    for ci, ch in enumerate(chunks):
        if not ents or ents[-1][1] != len(ch):
            ents.append((ci + 1, len(ch)))
    stsc = _full(
        b"stsc",
        struct.pack(">I", len(ents))
        + b"".join(struct.pack(">III", fc, spc, 1) for fc, spc in ents),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco", struct.pack(">I", len(offs)) + b"".join(struct.pack(">I", o) for o in offs)
    )
    stss = _full(
        b"stss",
        struct.pack(">I", len(sync_1based))
        + b"".join(struct.pack(">I", s) for s in sync_1based),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", stbl)
    hdlr = _full(b"hdlr", b"\x00\x00\x00\x00" + b"vide" + b"\x00" * 12 + b"v\x00")
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov, expected


def test_mp4_demux_sample_tables():
    from cpp_parquet_spark.pipeline.media_codecs import mp4_keyframes, parse_mp4_samples

    samples = [bytes([65 + i]) * (10 + 3 * i) for i in range(7)]  # distinct sizes
    sync = [1, 4, 6]
    data, expected_offs = _mini_mp4(samples, sync, chunk_split=[3, 2, 2])
    got = parse_mp4_samples(data)
    assert len(got) == 7
    assert [o for o, _, _ in got] == expected_offs
    assert [s for _, s, _ in got] == [len(s) for s in samples]
    assert [k for _, _, k in got] == [i + 1 in sync for i in range(7)]
    # keyframe extraction returns the exact sync samples' bytes
    frames = mp4_keyframes(data, 3)
    assert frames == [samples[0], samples[3], samples[5]]
    # asking for more than available: capped, still sync-only
    assert mp4_keyframes(data, 10) == [samples[0], samples[3], samples[5]]


def test_mp4_demux_rejects_non_video():
    from cpp_parquet_spark.pipeline.media_codecs import parse_mp4_samples

    with pytest.raises(ValueError, match="moov"):
        parse_mp4_samples(b"GIF89a this is not an mp4 at all........")
