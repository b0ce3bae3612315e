"""Parquet RLE / bit-packed hybrid codec — vectorized numpy.

Wire grammar reimplemented from the reference's documentation
(/root/reference/parquet-file/util/rle-encoding.h:36-75):

    encoded-block := run*
    run           := literal-run | repeated-run
    literal-run   := varint(num_groups << 1 | 1) <num_groups * 8 values,
                     bit-packed LSB-first>
    repeated-run  := varint(count << 1) <value, ceil(width/8) bytes LE>

Invariants preserved from the reference encoder
(rle-encoding.h:269-400): literal runs are always a whole number of
8-value groups; only the *final* group of the *final* literal run may be
zero-padded (the decoder stops after ``n`` values); repeated runs
require >= 8 identical values (the break-even threshold at
rle-encoding.h:59-62, 289).

Unlike the reference's value-at-a-time ``Put`` loop, encoding here is
run-oriented: maximal equal-value runs are found with one ``np.diff``,
and only runs of length >= 8 (candidates for repeated encoding) are
visited in Python — O(#long-runs), not O(#values).  This is the
engine's innermost codec: Dremel levels (O8) and dictionary indices
both use it.
"""

from __future__ import annotations

import numpy as np

from cpp_parquet_spark.kernels.bitpack import (
    decode_vlq,
    encode_vlq,
    pack_bits,
    unpack_bits,
)


def _flush_literal(out: bytearray, v: np.ndarray, start: int, length: int, width: int) -> None:
    """Emit one literal run covering v[start:start+length].

    Mid-stream callers guarantee length % 8 == 0; the final call may be
    ragged and is zero-padded to a full group (rle-encoding.h:49-57).
    """
    if length == 0:
        return
    groups = (length + 7) // 8
    out += encode_vlq((groups << 1) | 1)
    seg = v[start : start + length]
    if length % 8:
        seg = np.concatenate([seg, np.zeros(groups * 8 - length, dtype=np.uint64)])
    out += pack_bits(seg, width)


def encode_hybrid(values: np.ndarray, bit_width: int) -> bytes:
    """Encode unsigned ints (< 2**bit_width) into the hybrid format."""
    n = len(values)
    if n == 0:
        return b""
    if bit_width < 1 or bit_width > 64:
        raise ValueError(f"bit_width {bit_width} out of range [1, 64]")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    value_bytes = (bit_width + 7) // 8

    # Maximal equal-value runs.
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    lens = np.diff(np.concatenate((starts, [n])))

    out = bytearray()
    lit_start = 0  # start of the pending (unflushed) literal region
    lit_len = 0
    # Only runs long enough to possibly become repeated runs need a
    # Python-level visit; short runs merge into the literal region.
    cand = np.flatnonzero(lens >= 8)
    for ci in cand.tolist():
        s = int(starts[ci])
        run_len = int(lens[ci])
        # everything between the last flush point and this run is literal
        lit_len = s - lit_start
        # steal from the run's head so the literal region is group-aligned
        pad = (-lit_len) % 8
        if run_len - pad < 8:
            continue  # demote: run joins the literal region
        _flush_literal(out, v, lit_start, lit_len + pad, bit_width)
        rep = run_len - pad
        out += encode_vlq(rep << 1)
        out += int(v[s]).to_bytes(value_bytes, "little")
        lit_start = s + run_len
    lit_len = n - lit_start
    _flush_literal(out, v, lit_start, lit_len, bit_width)
    return bytes(out)


def decode_hybrid(buf: bytes | memoryview, bit_width: int, n: int) -> np.ndarray:
    """Decode ``n`` values; inverse of :func:`encode_hybrid` (and a
    vectorized equivalent of the reference RleDecoder,
    rle-encoding.h:233-265)."""
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    if bit_width < 1 or bit_width > 64:
        raise ValueError(f"bit_width {bit_width} out of range [1, 64]")
    value_bytes = (bit_width + 7) // 8
    mv = memoryview(buf)
    pos = 0
    filled = 0
    while filled < n:
        indicator, pos = decode_vlq(mv, pos)
        if indicator & 1:  # literal run
            groups = indicator >> 1
            count = groups * 8
            nbytes = (count * bit_width + 7) // 8
            vals = unpack_bits(np.frombuffer(mv[pos : pos + nbytes], dtype=np.uint8), bit_width, count)
            pos += nbytes
            take = min(count, n - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
        else:  # repeated run
            count = indicator >> 1
            value = int.from_bytes(mv[pos : pos + value_bytes], "little")
            pos += value_bytes
            take = min(count, n - filled)
            out[filled : filled + take] = value
            filled += take
        if count == 0:
            # zero-length run = corrupt stream; fail fast instead of
            # spinning (an executor hung on garbage is worse than an
            # error at 1000-executor scale)
            raise ValueError("corrupt hybrid-RLE stream: zero-length run")
    return out
