"""Per-chunk min/max statistics with order-preserving binary keys.

The reference writes per-column-chunk Statistics into ColumnMetaData
(our parquet_writer does too, parquet_writer.py:_statistics); this
module brings the same idea to the engine's SGC chunk store *in a form
Spark can compare JVM-side*: every chunk-metadata row carries
``stat_min`` / ``stat_max`` as binary keys whose unsigned lexicographic
order equals the value order.  Chunk pruning is then a plain DataFrame
filter on the (tiny) metadata table — a pruned chunk's payload is never
shuffled to a Python worker, which is what predicate pushdown means for
this store at 100 TB.

Key encodings (classic order-preserving tricks):

* signed ints / timestamps / dates — value XOR sign bit, big-endian
  (two's-complement order becomes unsigned byte order);
* unsigned ints — big-endian raw;
* floats — cast to float64; IEEE-754 total order: flip all bits for
  negatives, flip only the sign bit for positives;
* booleans — one byte;
* strings / binary — raw bytes, truncated to 64; a truncated *max* is
  rounded up (last non-0xFF byte incremented, trailing 0xFFs dropped)
  so it stays an upper bound, exactly like Parquet's truncated
  statistics contract.

``None`` means "no bound" (empty or all-null chunk).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_KEY_BYTES = 64
_SIGN = 1 << 63


def _int_key(v: int) -> bytes:
    return int(v + _SIGN).to_bytes(8, "big") if -_SIGN <= v < _SIGN else _uint_key(v)


def _uint_key(v: int) -> bytes:
    return int(v).to_bytes(8, "big")


def _float_key(v: float) -> bytes:
    bits = int(np.float64(v).view(np.uint64))
    bits = (~bits) & ((1 << 64) - 1) if bits & _SIGN else bits | _SIGN
    return bits.to_bytes(8, "big")


def _bytes_key(b: bytes, round_up: bool) -> bytes | None:
    if len(b) <= MAX_KEY_BYTES:
        return b
    t = bytearray(b[:MAX_KEY_BYTES])
    if not round_up:
        return bytes(t)  # prefix <= value: valid lower bound
    while t and t[-1] == 0xFF:
        t.pop()
    if not t:
        return None  # 64 bytes of 0xFF: no finite upper bound expressible
    t[-1] += 1
    return bytes(t)


def order_key(value, dtype: pa.DataType, round_up: bool = False) -> bytes | None:
    """One value → order-preserving key.  ``round_up`` only matters for
    truncated var-length values (use it for upper bounds)."""
    if value is None:
        return None
    if pa.types.is_boolean(dtype):
        return b"\x01" if value else b"\x00"
    if pa.types.is_unsigned_integer(dtype):
        return _uint_key(int(value))
    if pa.types.is_integer(dtype):
        return _int_key(int(value))
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        # raw integer representation, same unit as the column
        if isinstance(value, (int, np.integer)):
            return _int_key(int(value))
        arr = pa.array([value], type=dtype)
        as_int = arr.cast(pa.int64() if not pa.types.is_date32(dtype) else pa.int32())
        return _int_key(int(as_int[0].as_py()))
    if pa.types.is_floating(dtype):
        return _float_key(float(value))
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return _bytes_key(value.encode("utf-8") if isinstance(value, str) else bytes(value), round_up)
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype) or pa.types.is_fixed_size_binary(dtype):
        return _bytes_key(bytes(value), round_up)
    if pa.types.is_decimal(dtype):
        # unscaled int128 in offset-binary (sign bit flipped), big-endian
        import decimal as _dec

        unscaled = int(_dec.Decimal(value).scaleb(dtype.scale))
        return ((unscaled + (1 << 127)) % (1 << 128)).to_bytes(16, "big")
    return None  # unorderable type: no stats


def chunk_stats(values: pa.Array) -> tuple[bytes | None, bytes | None]:
    """(min_key, max_key) over the defined values of one chunk, or
    (None, None) when the chunk is empty/all-null or unorderable."""
    if len(values) == 0:
        return None, None
    dtype = values.type
    try:
        mm = pc.min_max(values)
    except pa.lib.ArrowNotImplementedError:
        return None, None
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo is None:
        return None, None
    return order_key(lo, dtype, round_up=False), order_key(hi, dtype, round_up=True)
