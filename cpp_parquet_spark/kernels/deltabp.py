"""Parquet-spec DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY encoders.

These are *wire* encodings from the public Parquet format spec
(Encodings.md), beyond the reference's PLAIN-only pages
(parquet-column.cc:385-388).  DELTA_LENGTH_BYTE_ARRAY is the spec's
version of the same idea the engine's SGC chunks already use internally
(kernels/plain.py:59-72: a packed lengths stream + contiguous payload
instead of interleaved u32 prefixes): decode is a cumsum over lengths +
one zero-copy payload wrap, and the lengths cost ~bit_width(len)/8
bytes per value instead of 4.

Layout (DELTA_BINARY_PACKED, block=128, 4 miniblocks of 32):
  <block size: ULEB128> <miniblocks per block: ULEB128>
  <total value count: ULEB128> <first value: zigzag ULEB128>
  then per block:
  <min delta: zigzag ULEB128> <bit width: 1 byte per miniblock>
  <miniblock values bit-packed LSB-first at its width>

Unused trailing miniblocks of the last block get width 0 and no data;
partially-filled miniblocks are zero-padded (readers stop at the total
count).  Everything is vectorized numpy (np.diff + pack_bits).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from cpp_parquet_spark.kernels.bitpack import encode_vlq, pack_bits

_BLOCK = 128
_MINIBLOCKS = 4
_MB_VALUES = _BLOCK // _MINIBLOCKS  # 32


def _zigzag_vlq(v: int) -> bytes:
    return encode_vlq((v << 1) ^ (v >> 63)) if v >= 0 else encode_vlq(((-v) << 1) - 1)


def encode_delta_binary_packed(values: np.ndarray) -> bytes:
    """Encode int64 values (deltas must fit int64 — callers pass lengths
    or int32-range data, never full-range int64)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    out = bytearray()
    out += encode_vlq(_BLOCK)
    out += encode_vlq(_MINIBLOCKS)
    out += encode_vlq(n)
    out += _zigzag_vlq(int(v[0]) if n else 0)
    if n <= 1:
        return bytes(out)
    deltas = np.diff(v)
    for s in range(0, len(deltas), _BLOCK):
        blk = deltas[s : s + _BLOCK]
        mind = int(blk.min())
        out += _zigzag_vlq(mind)
        adj = (blk - mind).astype(np.uint64)
        if len(adj) < _BLOCK:
            adj = np.concatenate([adj, np.zeros(_BLOCK - len(adj), np.uint64)])
        widths = bytearray()
        packed: list[bytes] = []
        for m in range(_MINIBLOCKS):
            if m * _MB_VALUES >= len(blk):
                widths.append(0)  # miniblock past the data: width 0, no bytes
                continue
            mb = adj[m * _MB_VALUES : (m + 1) * _MB_VALUES]
            w = int(mb.max()).bit_length()
            widths.append(w)
            if w:
                packed.append(pack_bits(mb, w))
        out += widths
        for p in packed:
            out += p
    return bytes(out)


def _as_int64(values: pa.Array) -> np.ndarray:
    """Signed-int / temporal arrow array → int64 numpy view (timestamps
    and dates are their raw integer representation on the wire)."""
    t = values.type
    if pa.types.is_timestamp(t):
        return np.asarray(values.cast(pa.int64()))
    if pa.types.is_date32(t):
        return np.asarray(values.cast(pa.int32())).astype(np.int64)
    return np.asarray(values).astype(np.int64, copy=False)


def delta_bp_fits(values: pa.Array) -> bool:
    """True when every block's (value - min_delta) arithmetic stays in
    int64/uint64 — i.e. max-min of the *values* fits in int64.  Callers
    fall back to PLAIN otherwise (full-range wraparound deltas are legal
    per spec but not worth the complexity for a corner case)."""
    if len(values) < 2:
        return len(values) > 0
    v = _as_int64(values)
    return int(v.max()) - int(v.min()) < (1 << 62)


def encode_delta_binary_packed_array(values: pa.Array) -> bytes:
    """Arrow signed-int/temporal array → DELTA_BINARY_PACKED page body."""
    return encode_delta_binary_packed(_as_int64(values))


def encode_delta_length_byte_array(values: pa.Array) -> bytes:
    """DELTA_LENGTH_BYTE_ARRAY: delta-packed lengths + concatenated
    value bytes (no per-value prefixes)."""
    from cpp_parquet_spark.kernels.plain import _byte_components

    if len(values) == 0:
        return encode_delta_binary_packed(np.zeros(0, dtype=np.int64))
    lengths, payload = _byte_components(values)
    return encode_delta_binary_packed(lengths) + payload.tobytes()
