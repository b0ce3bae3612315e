"""Unit + property tests for the bit-packing / VLQ primitives."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cpp_parquet_spark.kernels.bitpack import (
    bit_width_for,
    decode_vlq,
    encode_vlq,
    pack_bits,
    unpack_bits,
)


def test_bit_width_for():
    assert bit_width_for(0) == 1
    assert bit_width_for(1) == 1
    assert bit_width_for(2) == 2
    assert bit_width_for(3) == 2
    assert bit_width_for(4) == 3
    assert bit_width_for(255) == 8
    assert bit_width_for(256) == 9


def test_pack_bits_known_vector():
    # width 1: bits go LSB-first into each byte
    assert pack_bits(np.array([1, 0, 1, 1, 0, 0, 0, 1]), 1) == bytes([0b10001101])
    # width 4: two values per byte, first value in the low nibble
    assert pack_bits(np.array([0xA, 0x3]), 4) == bytes([0x3A])
    # width 3, 3 values = 9 bits -> 2 bytes, zero padded
    assert pack_bits(np.array([0b101, 0b011, 0b110]), 3) == bytes([0b10011101, 0b00000001])


def test_pack_empty():
    assert pack_bits(np.array([], dtype=np.uint64), 7) == b""
    assert unpack_bits(b"", 7, 0).tolist() == []


@given(
    width=st.integers(min_value=1, max_value=64),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_pack_unpack_roundtrip(width, data):
    n = data.draw(st.integers(min_value=0, max_value=300))
    hi = (1 << width) - 1
    vals = data.draw(
        st.lists(st.integers(min_value=0, max_value=hi), min_size=n, max_size=n)
    )
    arr = np.array(vals, dtype=np.uint64)
    packed = pack_bits(arr, width)
    assert len(packed) == (n * width + 7) // 8
    out = unpack_bits(packed, width, n)
    np.testing.assert_array_equal(out, arr)


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=100, deadline=None)
def test_vlq_roundtrip(v):
    enc = encode_vlq(v)
    dec, pos = decode_vlq(enc, 0)
    assert dec == v
    assert pos == len(enc)


def test_vlq_known():
    assert encode_vlq(0) == b"\x00"
    assert encode_vlq(127) == b"\x7f"
    assert encode_vlq(128) == b"\x80\x01"
    assert encode_vlq(300) == b"\xac\x02"
