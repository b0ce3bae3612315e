"""Line-dictionary codec for source-text columns.

Source code is line-repetitive (imports, braces, boilerplate), so the
best lightweight scheme for a ``content`` column is a dictionary of
*lines* with hybrid-RLE indices — the same dictionary+RLE design the
north rule prescribes, applied at line granularity.  All heavy byte
work runs inside Arrow C++ (split_pattern / dictionary_encode /
binary_join_element_wise); Python only touches the per-line index
stream, which is ~30x smaller than the payload.  That matters doubly on
this box, whose memory bandwidth is the multicore bottleneck.

Layout: u32 n_docs | u32 forblob_len | FOR(line counts per doc) |
u32 cardinality | u32 dict_len | PLAIN dict lines |
u8 idx_width | u32 idx_len | hybrid-RLE line indices
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cpp_parquet_spark.kernels.bitpack import bit_width_for
from cpp_parquet_spark.kernels.forpack import decode_for, encode_for
from cpp_parquet_spark.kernels.plain import decode_plain, encode_plain
from cpp_parquet_spark.kernels.rle import decode_hybrid, encode_hybrid


def encode_lined(values: pa.Array) -> bytes:
    n = len(values)
    out = bytearray(n.to_bytes(4, "little"))
    if n == 0:
        return bytes(out)
    v = values.cast(pa.large_binary())
    lists = pc.split_pattern(v, b"\n")
    counts = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    flat = lists.values if hasattr(lists, "values") else lists.flatten()
    denc = flat.dictionary_encode()
    dictionary = denc.dictionary
    indices = np.asarray(denc.indices, dtype=np.uint64)
    card = len(dictionary)
    width = bit_width_for(max(card - 1, 0))

    cblob = encode_for(counts)
    out += len(cblob).to_bytes(4, "little")
    out += cblob
    dict_blob = encode_plain(dictionary, "BYTE_ARRAY")
    out += card.to_bytes(4, "little")
    out += len(dict_blob).to_bytes(4, "little")
    out += dict_blob
    idx_blob = encode_hybrid(indices, width)
    out.append(width)
    out += len(idx_blob).to_bytes(4, "little")
    out += idx_blob
    return bytes(out)


def decode_lined(buf: bytes, n: int, arrow_type: pa.DataType) -> pa.Array:
    mv = memoryview(buf)
    n_docs = int.from_bytes(mv[0:4], "little")
    assert n_docs == n
    if n == 0:
        return pa.array([], type=arrow_type)
    pos = 4
    clen = int.from_bytes(mv[pos : pos + 4], "little")
    pos += 4
    counts = decode_for(bytes(mv[pos : pos + clen]), n)
    pos += clen
    card = int.from_bytes(mv[pos : pos + 4], "little")
    dlen = int.from_bytes(mv[pos + 4 : pos + 8], "little")
    pos += 8
    dictionary = decode_plain(bytes(mv[pos : pos + dlen]), card, "BYTE_ARRAY", pa.large_binary())
    pos += dlen
    width = mv[pos]
    pos += 1
    ilen = int.from_bytes(mv[pos + 0 : pos + 4], "little")
    pos += 4
    total_lines = int(counts.sum())
    indices = decode_hybrid(mv[pos : pos + ilen], width, total_lines).astype(np.int64)

    flat = dictionary.take(pa.array(indices))  # large_binary lines, in doc order
    # Join in *binary* (no utf8 cast — r1 cast lines to pa.string(),
    # which raised on non-UTF-8 bytes): wrap the taken lines in a
    # LargeListArray (zero-copy) and let the Arrow C++ binary_join
    # kernel rebuild payloads in one pass.
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
    joined = pc.binary_join(lists, pa.scalar(b"\n", pa.large_binary()))
    return joined.cast(arrow_type)
