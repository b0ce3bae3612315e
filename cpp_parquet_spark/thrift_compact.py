"""Minimal Thrift compact-protocol *writer* — just enough for Parquet.

The reference emits its footer with a full Thrift library
(parquet-file.cc:37-60 uses TCompactProtocol over TFDTransport); its
didactic example writes the same structures by hand
(examples/parquet-file-writer.cc:49-159).  This module is the
hand-rolled equivalent for the structures a Parquet file needs:
``PageHeader``, ``ColumnMetaData``, ``RowGroup``, ``SchemaElement``,
``FileMetaData`` — all plain structs/lists/ints/strings, so the whole
protocol surface we need is ~100 lines.

Wire rules implemented (public Thrift compact-protocol spec):
  * varint        — ULEB128
  * int16/32/64   — zigzag, then varint
  * field header  — short form ``(delta << 4) | type`` when the field-id
    delta is 1..15, else ``type`` byte + zigzag-varint field id
  * bool fields   — the *type nibble* carries the value (1=true 2=false)
  * binary        — varint length + bytes
  * list header   — ``(size << 4) | elem_type`` when size < 15, else
    ``0xF0 | elem_type`` + varint size
  * struct end    — 0x00
"""

from __future__ import annotations

# compact-protocol wire-type codes
T_BOOL_TRUE = 1
T_BOOL_FALSE = 2
T_BYTE = 3
T_I16 = 4
T_I32 = 5
T_I64 = 6
T_DOUBLE = 7
T_BINARY = 8
T_LIST = 9
T_STRUCT = 12


def uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def zigzag_varint(n: int) -> bytes:
    return uvarint(((n << 1) ^ (n >> 63)) & ((1 << 64) - 1))


# A field is (field_id, wire_type, payload_bytes); bools encode the value
# in the wire type and carry no payload.


def f_bool(fid: int, v: bool) -> tuple[int, int, bytes]:
    return (fid, T_BOOL_TRUE if v else T_BOOL_FALSE, b"")


def f_i32(fid: int, v: int) -> tuple[int, int, bytes]:
    return (fid, T_I32, zigzag_varint(v))


def f_i64(fid: int, v: int) -> tuple[int, int, bytes]:
    return (fid, T_I64, zigzag_varint(v))


def f_binary(fid: int, b: bytes | str) -> tuple[int, int, bytes]:
    if isinstance(b, str):
        b = b.encode("utf-8")
    return (fid, T_BINARY, uvarint(len(b)) + b)


def f_struct(fid: int, struct_bytes: bytes) -> tuple[int, int, bytes]:
    return (fid, T_STRUCT, struct_bytes)


def f_list(fid: int, elem_type: int, elems: list[bytes]) -> tuple[int, int, bytes]:
    n = len(elems)
    if n < 15:
        hdr = bytes([(n << 4) | elem_type])
    else:
        hdr = bytes([0xF0 | elem_type]) + uvarint(n)
    return (fid, T_LIST, hdr + b"".join(elems))


def struct(*fields: tuple[int, int, bytes] | None) -> bytes:
    """Serialize a struct from (field_id, wire_type, payload) triples.

    ``None`` entries are skipped (unset optional fields).  Field ids must
    be ascending — that is how every Parquet struct is laid out and it
    keeps the short-form delta encoding valid.
    """
    out = bytearray()
    last = 0
    for f in fields:
        if f is None:
            continue
        fid, wtype, payload = f
        delta = fid - last
        if 1 <= delta <= 15:
            out.append((delta << 4) | wtype)
        else:
            out.append(wtype)
            out += zigzag_varint(fid)
        out += payload
        last = fid
    out.append(0)  # STOP
    return bytes(out)
