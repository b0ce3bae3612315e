"""Tests for the RLE/bit-packed hybrid codec.

Fixed vectors are hand-checked against the wire grammar documented at
/root/reference/parquet-file/util/rle-encoding.h:36-75.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cpp_parquet_spark.kernels.rle import decode_hybrid, encode_hybrid


def rt(values, width):
    arr = np.asarray(values, dtype=np.uint64)
    enc = encode_hybrid(arr, width)
    out = decode_hybrid(enc, width, len(arr))
    np.testing.assert_array_equal(out, arr)
    return enc


def test_doc_example_two_repeated_runs():
    # "100 1s followed by 100 0s" (rle-encoding.h:66-69): two repeated runs
    enc = rt([1] * 100 + [0] * 100, 1)
    # varint(100<<1)=0xC8 0x01, value byte 0x01; then same for value 0
    assert enc == bytes([0xC8, 0x01, 0x01, 0xC8, 0x01, 0x00])


def test_doc_example_alternating_literal():
    # "alternating 1s and 0s (200 total) ... total 26 bytes" (rle-encoding.h:71-75)
    enc = rt([i % 2 for i in range(200)], 1)
    assert len(enc) == 26
    assert enc[0] == (25 << 1) | 1


def test_single_value():
    enc = rt([5], 3)
    # one literal group of 8, zero padded: indicator (1<<1)|1 = 3
    assert enc[0] == 3
    assert len(enc) == 1 + 3  # 8 values * 3 bits = 24 bits = 3 bytes


def test_all_same():
    enc = rt([7] * 1000, 3)
    # single repeated run: varint(2000) + 1 value byte
    assert enc == bytes([0xD0, 0x0F, 0x07])


def test_run_shorter_than_8_stays_literal():
    enc = rt([4] * 7 + [2], 3)
    assert enc[0] == 3  # one literal group, no repeated run


def test_literal_then_repeated_group_alignment():
    # 5 mixed values then 100 identical: the repeated run must donate 3
    # head values so the literal region is a whole group of 8.
    vals = [1, 2, 3, 4, 5] + [6] * 100
    enc = rt(vals, 3)
    # literal indicator: 1 group -> 3 ; then repeated varint(97<<1)
    assert enc[0] == 3
    lit_bytes = 3  # 8 * 3 bits
    rep_ind = enc[1 + lit_bytes]
    # 97<<1 = 194 -> varint 0xC2 0x01
    assert enc[1 + lit_bytes : 1 + lit_bytes + 3] == bytes([0xC2, 0x01, 0x06])


def test_demoted_run():
    # run of 9 identical after 5 literals: stealing 3 leaves 6 < 8, so the
    # whole thing becomes literal groups (no repeated run indicator).
    vals = [1, 2, 3, 4, 5] + [6] * 9
    enc = rt(vals, 3)
    assert enc[0] == (2 << 1) | 1  # 14 values -> 2 groups (final padded)


def test_wide_values():
    rt([2**63 - 1, 2**64 - 1, 0, 123456789] * 10, 64)
    rt([300, 5, 300, 300, 300, 300, 300, 300, 300, 300, 300], 9)


@given(
    width=st.integers(min_value=1, max_value=20),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_roundtrip_random(width, data):
    n = data.draw(st.integers(min_value=0, max_value=500))
    hi = (1 << width) - 1
    # mix runs and noise to exercise both run kinds
    chunks = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=hi),
                st.integers(min_value=1, max_value=40),
            ),
            min_size=0,
            max_size=30,
        )
    )
    vals = [v for v, c in chunks for _ in range(c)][:n]
    if not vals:
        vals = [0] * n
    arr = np.array(vals[:n] if n else [], dtype=np.uint64)
    enc = encode_hybrid(arr, width) if len(arr) else b""
    out = decode_hybrid(enc, width, len(arr))
    np.testing.assert_array_equal(out, arr)


def test_compression_beats_plain_on_runs():
    arr = np.repeat(np.arange(50, dtype=np.uint64), 100)
    enc = encode_hybrid(arr, 6)
    assert len(enc) < len(arr) * 6 // 8 / 10  # >10x smaller than bit-packed
