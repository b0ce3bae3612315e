"""Real Apache Parquet file writer: PAR1 magic + v1 data pages + Thrift
compact footer.

This completes the reference's actual deliverable — a file any
independent Parquet reader can parse.  The reference writes it with
ParquetFile::Flush (parquet-file.cc:118-177: pages per column, then a
``FileMetaData`` footer + u32 length + "PAR1") and frames every page
with a Thrift ``PageHeader`` (parquet-column.cc:383-455); its didactic
raw-Thrift recipe is examples/parquet-file-writer.cc:49-159.  Tests
mirror parquet-file-test.cc:37-50: every produced file must be parsed
by an *independent* reader (pyarrow, DuckDB, Spark).

Differences from the reference, by design:
  * multiple row groups (the reference's Flush writes exactly one);
  * Parquet-conformant PLAIN booleans (bit-packed LSB-first; the
    reference writes one byte per value, parquet-column.cc:282-284,
    which real readers reject);
  * timestamps default to INT64 micros with a TIMESTAMP logical type;
    the reference's legacy INT96 layout (parquet-column.cc:269-288) is
    available opt-in via ``int96_timestamps=True``;
  * the *correct* Dremel level maxima from schema_plan (the reference
    over-counts repetition levels, avro-schema-walker.cc:244-246).

Level streams are RLE/bit-packed hybrid with a u32 length prefix
(exactly EncodeLevels → Flush framing, parquet-column.cc:307-335,
436-443); data values are wire PLAIN (encode_plain_parquet).

Beyond the reference (which writes PLAIN/UNCOMPRESSED only and no
statistics): low-cardinality chunks get a DICTIONARY_PAGE +
RLE_DICTIONARY data pages (kernels/rle.py's hybrid coder IS the wire
format), column chunks carry min/max/null_count Statistics for
row-group pruning, and pages can be GZIP-compressed
(``compression="gzip"``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from cpp_parquet_spark import thrift_compact as tc
from cpp_parquet_spark.kernels import rle
from cpp_parquet_spark.kernels.bitpack import bit_width_for
from cpp_parquet_spark.kernels.levels import ShreddedColumn, shred
from cpp_parquet_spark.kernels.plain import encode_plain_parquet
from cpp_parquet_spark.schema_plan import ColumnPlan, plan_from_schema

MAGIC = b"PAR1"

# parquet.thrift enums (public format spec)
_T_BOOLEAN, _T_INT32, _T_INT64, _T_INT96, _T_FLOAT, _T_DOUBLE, _T_BYTE_ARRAY = 0, 1, 2, 3, 4, 5, 6
_T_FLBA = 7
_PHYS_CODE = {
    "BOOLEAN": _T_BOOLEAN,
    "INT32": _T_INT32,
    "INT64": _T_INT64,
    "FLOAT": _T_FLOAT,
    "DOUBLE": _T_DOUBLE,
    "BYTE_ARRAY": _T_BYTE_ARRAY,
    "FIXED_LEN_BYTE_ARRAY": _T_FLBA,
}
_REQUIRED, _OPTIONAL, _REPEATED = 0, 1, 2
_ENC_PLAIN, _ENC_RLE = 0, 3
_PAGE_DATA = 0
_CODEC_UNCOMPRESSED = 0
_CONV_UTF8, _CONV_MAP, _CONV_LIST, _CONV_DECIMAL, _CONV_DATE = 0, 1, 3, 5, 6
_CONV_TS_MILLIS, _CONV_TS_MICROS = 9, 10
_CONV_INT = {"int8": 15, "int16": 16, "uint8": 11, "uint16": 12, "uint32": 13, "uint64": 14}


def _logical(member_fid: int, member: bytes = tc.struct()) -> bytes:
    """LogicalType union with one member set."""
    return tc.struct(tc.f_struct(member_fid, member))


def _logical_timestamp(adjusted_to_utc: bool, unit_fid: int) -> bytes:
    """TimeUnit member fid: 1=MILLIS, 2=MICROS, 3=NANOS."""
    unit = tc.struct(tc.f_struct(unit_fid, tc.struct()))
    ts = tc.struct(tc.f_bool(1, adjusted_to_utc), tc.f_struct(2, unit))
    return _logical(8, ts)  # LogicalType{8: TIMESTAMP}


# Arrow timestamp unit -> (TimeUnit member fid, converted_type or None).
# Values are written raw in the source unit and the footer declares that
# same unit, so no unit is ever silently rescaled; 's' has no Parquet
# TimeUnit and is cast to 'us' at write time (exact).  Nanos has a
# logical type but no converted type in the spec.
_TS_UNIT = {
    "ms": (1, _CONV_TS_MILLIS),
    "us": (2, _CONV_TS_MICROS),
    "ns": (3, None),
}


def _leaf_type_info(t: pa.DataType) -> tuple[int, int | None, bytes | None]:
    """(parquet type code, converted_type or None, LogicalType bytes or None)."""
    if pa.types.is_boolean(t):
        return _T_BOOLEAN, None, None
    name = str(t)
    if name in _CONV_INT:
        # unsigned ints annotate the physical type of their own width
        # (UINT_32 may only annotate INT32); values are the raw
        # two's-complement bit pattern
        return (_T_INT64 if name == "uint64" else _T_INT32), _CONV_INT[name], None
    if pa.types.is_int32(t):
        return _T_INT32, None, None
    if pa.types.is_int64(t):
        return _T_INT64, None, None
    if pa.types.is_float32(t):
        return _T_FLOAT, None, None
    if pa.types.is_float64(t):
        return _T_DOUBLE, None, None
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return _T_BYTE_ARRAY, _CONV_UTF8, _logical(1)  # STRING
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _T_BYTE_ARRAY, None, None
    if pa.types.is_fixed_size_binary(t):
        # Avro `fixed` lowering; SchemaElement.type_length is emitted by
        # _schema_elements from the Arrow byte_width
        return _T_FLBA, None, None
    if pa.types.is_decimal(t):
        # DECIMAL as FLBA(16), big-endian unscaled two's complement
        # (public spec LogicalTypes.md); scale/precision also go into
        # SchemaElement fields 7/8 for old readers
        dec = tc.struct(tc.f_i32(1, t.scale), tc.f_i32(2, t.precision))
        return _T_FLBA, _CONV_DECIMAL, _logical(5, dec)
    if pa.types.is_date32(t):
        return _T_INT32, _CONV_DATE, _logical(6)  # DATE
    if pa.types.is_timestamp(t):
        utc = t.tz is not None
        unit = "us" if t.unit == "s" else t.unit  # seconds cast at write time
        unit_fid, conv = _TS_UNIT[unit]
        return _T_INT64, (conv if utc else None), _logical_timestamp(utc, unit_fid)
    raise TypeError(f"unsupported parquet leaf type: {t}")


def _schema_elements(
    schema: pa.Schema, int96_timestamps: bool = False
) -> tuple[list[bytes], list[list[str]]]:
    """Thrift SchemaElement list (DFS preorder, root first) + the
    path_in_schema of each leaf, in the same leaf order as
    plan_from_schema (both are DFS preorder over leaves)."""
    elems: list[bytes] = [tc.struct(tc.f_binary(4, "schema"), tc.f_i32(5, len(schema)))]
    leaf_paths: list[list[str]] = []

    def walk(f: pa.Field, path: list[str]) -> None:
        rep = _OPTIONAL if f.nullable else _REQUIRED
        t = f.type
        if pa.types.is_struct(t):
            elems.append(
                tc.struct(tc.f_i32(3, rep), tc.f_binary(4, f.name), tc.f_i32(5, t.num_fields))
            )
            for child in t:
                walk(child, path + [f.name])
            return
        if pa.types.is_map(t):
            # standard 3-level MAP group: repeated key_value with a
            # required key and the value leaf/group
            elems.append(
                tc.struct(
                    tc.f_i32(3, rep),
                    tc.f_binary(4, f.name),
                    tc.f_i32(5, 1),
                    tc.f_i32(6, _CONV_MAP),
                    tc.f_struct(10, _logical(2)),  # MAP
                )
            )
            elems.append(
                tc.struct(tc.f_i32(3, _REPEATED), tc.f_binary(4, "key_value"), tc.f_i32(5, 2))
            )
            walk(t.key_field.with_name("key"), path + [f.name, "key_value"])
            walk(t.item_field.with_name("value"), path + [f.name, "key_value"])
            return
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            # standard 3-level LIST group
            elems.append(
                tc.struct(
                    tc.f_i32(3, rep),
                    tc.f_binary(4, f.name),
                    tc.f_i32(5, 1),
                    tc.f_i32(6, _CONV_LIST),
                    tc.f_struct(10, _logical(3)),  # LIST
                )
            )
            elems.append(tc.struct(tc.f_i32(3, _REPEATED), tc.f_binary(4, "list"), tc.f_i32(5, 1)))
            walk(t.value_field.with_name("element"), path + [f.name, "list"])
            return
        if int96_timestamps and pa.types.is_timestamp(t):
            # legacy INT96 mode: bare physical type, no logical annotation
            code, conv, logical = _T_INT96, None, None
        else:
            code, conv, logical = _leaf_type_info(t)
        is_dec = pa.types.is_decimal(t)
        if is_dec:
            from cpp_parquet_spark.kernels.plain import decimal_type_length

            flba_len = decimal_type_length(t.precision)
        elif pa.types.is_fixed_size_binary(t):
            flba_len = t.byte_width
        else:
            flba_len = None
        elems.append(
            tc.struct(
                tc.f_i32(1, code),
                tc.f_i32(2, flba_len) if flba_len is not None else None,
                tc.f_i32(3, rep),
                tc.f_binary(4, f.name),
                tc.f_i32(6, conv) if conv is not None else None,
                tc.f_i32(7, t.scale) if is_dec else None,
                tc.f_i32(8, t.precision) if is_dec else None,
                tc.f_struct(10, logical) if logical is not None else None,
            )
        )
        leaf_paths.append(path + [f.name])

    for f in schema:
        walk(f, [])
    return elems, leaf_paths


_JULIAN_UNIX_EPOCH = 2440588
_MICROS_PER_DAY = 86_400_000_000


def _int96_from_timestamps(values: pa.Array) -> bytes:
    """Legacy INT96 timestamps — the reference's timestamp physical type
    (parquet-column.cc:269-288): 8 bytes nanos-of-day LE + 4 bytes
    Julian day LE, 12 bytes per value."""
    micros = np.asarray(values.cast(pa.timestamp(values.type.unit)).cast(pa.int64()))
    unit = values.type.unit
    scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
    micros = micros * scale if unit != "ns" else micros // 1000
    day = np.floor_divide(micros, _MICROS_PER_DAY)
    nanos = (micros - day * _MICROS_PER_DAY) * 1000
    out = np.zeros((len(micros), 12), dtype=np.uint8)
    out[:, :8] = nanos.astype("<u8").view(np.uint8).reshape(-1, 8)
    out[:, 8:] = (day + _JULIAN_UNIX_EPOCH).astype("<u4").view(np.uint8).reshape(-1, 4)
    return out.tobytes()


def _page_values_plain(values: pa.Array, physical: str, int96: bool = False) -> bytes:
    if physical == "BOOLEAN":
        # spec PLAIN booleans: bit-packed LSB-first (the reference's
        # byte-per-value layout, parquet-column.cc:282-284, is invalid)
        return np.packbits(np.asarray(values, dtype=bool), bitorder="little").tobytes()
    if int96 and pa.types.is_timestamp(values.type):
        return _int96_from_timestamps(values)
    return encode_plain_parquet(values, physical)


_ENC_RLE_DICT = 8
_ENC_DELTA_BP = 5
_ENC_DELTA_LENGTH_BA = 6
_PAGE_DICT = 2
_PAGE_DATA_V2 = 3
_MAX_STAT_BYTES = 64
_CODEC_GZIP = 2


def _delta_length_byte_array(values: pa.Array) -> bytes:
    from cpp_parquet_spark.kernels.deltabp import encode_delta_length_byte_array

    return encode_delta_length_byte_array(values)


def _gzip(data: bytes) -> bytes:
    import zlib

    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits=31: gzip framing
    return co.compress(data) + co.flush()


def _levels_block(sh: ShreddedColumn, plan: ColumnPlan) -> bytearray:
    """[u32+RLE rep][u32+RLE def] framing (parquet-column.cc:436-443)."""
    body = bytearray()
    if plan.max_rep > 0:
        enc = rle.encode_hybrid(sh.rep_levels, bit_width_for(plan.max_rep))
        body += len(enc).to_bytes(4, "little")
        body += enc
    if plan.max_def > 0:
        enc = rle.encode_hybrid(sh.def_levels, bit_width_for(plan.max_def))
        body += len(enc).to_bytes(4, "little")
        body += enc
    return body


def _page(page_type: int, body: bytes, dph: bytes, dph_fid: int, gzip: bool) -> tuple[bytes, int]:
    """Returns (framed page bytes, uncompressed size incl. header) —
    the second feeds ColumnMetaData.total_uncompressed_size."""
    raw_len = len(body)
    if gzip:
        body = _gzip(bytes(body))
    header = tc.struct(
        tc.f_i32(1, page_type),
        tc.f_i32(2, raw_len),  # uncompressed_page_size
        tc.f_i32(3, len(body)),  # compressed_page_size
        tc.f_struct(dph_fid, dph),
    )
    return header + bytes(body), len(header) + raw_len


def _page_values(sh: ShreddedColumn, plan: ColumnPlan, encoding: int, int96: bool) -> bytes:
    """Encoded values section of a data page (shared by v1 and v2)."""
    if encoding == _ENC_DELTA_LENGTH_BA:
        return _delta_length_byte_array(sh.values)
    if encoding == _ENC_DELTA_BP:
        from cpp_parquet_spark.kernels.deltabp import encode_delta_binary_packed_array

        return encode_delta_binary_packed_array(sh.values)
    return _page_values_plain(sh.values, plan.physical, int96=int96)


def _data_page_v2(
    sh: ShreddedColumn, plan: ColumnPlan, values_body: bytes, encoding: int, gzip: bool
) -> tuple[bytes, int]:
    """One DATA_PAGE_V2 (public Parquet spec): rep/def level runs sit
    *uncompressed* ahead of the (optionally compressed) values block,
    without v1's u32 prefixes — their byte lengths live in the header
    (definition/repetition_levels_byte_length), so readers can skip to
    the values without decoding levels."""
    rep = (
        rle.encode_hybrid(sh.rep_levels, bit_width_for(plan.max_rep))
        if plan.max_rep > 0
        else b""
    )
    deflev = (
        rle.encode_hybrid(sh.def_levels, bit_width_for(plan.max_def))
        if plan.max_def > 0
        else b""
    )
    num_rows = (
        int(np.count_nonzero(sh.rep_levels == 0)) if plan.max_rep > 0 else sh.num_entries
    )
    num_nulls = (
        sh.num_entries - int(np.count_nonzero(sh.def_levels == plan.max_def))
        if plan.max_def > 0
        else 0
    )
    comp_values = _gzip(values_body) if gzip else values_body
    raw_len = len(rep) + len(deflev) + len(values_body)
    dph = tc.struct(
        tc.f_i32(1, sh.num_entries),  # num_values incl. nulls
        tc.f_i32(2, num_nulls),
        tc.f_i32(3, num_rows),
        tc.f_i32(4, encoding),
        tc.f_i32(5, len(deflev)),  # definition_levels_byte_length
        tc.f_i32(6, len(rep)),  # repetition_levels_byte_length
        tc.f_bool(7, gzip),  # is_compressed (values block only)
    )
    header = tc.struct(
        tc.f_i32(1, _PAGE_DATA_V2),
        tc.f_i32(2, raw_len),  # uncompressed_page_size
        tc.f_i32(3, len(rep) + len(deflev) + len(comp_values)),
        tc.f_struct(8, dph),  # PageHeader.data_page_header_v2
    )
    return header + rep + deflev + bytes(comp_values), len(header) + raw_len


def _data_page(
    sh: ShreddedColumn, plan: ColumnPlan, int96: bool = False, gzip: bool = False, encoding: int = _ENC_PLAIN
) -> tuple[bytes, int]:
    """One v1 data page: PageHeader + level blocks + encoded values."""
    body = _levels_block(sh, plan)
    body += _page_values(sh, plan, encoding, int96)
    dph = tc.struct(
        tc.f_i32(1, sh.num_entries),  # num_values incl. nulls
        tc.f_i32(2, encoding),
        tc.f_i32(3, _ENC_RLE),  # definition_level_encoding
        tc.f_i32(4, _ENC_RLE),  # repetition_level_encoding
    )
    return _page(_PAGE_DATA, body, dph, 5, gzip)


def _dictionary_page(dictionary: pa.Array, physical: str, gzip: bool) -> tuple[bytes, int]:
    """Dict values PLAIN in a DICTIONARY_PAGE."""
    dict_body = encode_plain_parquet(dictionary, physical)
    return _page(
        _PAGE_DICT,
        dict_body,
        tc.struct(tc.f_i32(1, len(dictionary)), tc.f_i32(2, _ENC_PLAIN)),
        7,  # PageHeader.dictionary_page_header
        gzip,
    )


def _dict_data_page(sh: ShreddedColumn, plan: ColumnPlan, indices: np.ndarray, width: int, gzip: bool) -> tuple[bytes, int]:
    """Data page of dictionary indices: [u8 bit width][RLE/bit-packed
    hybrid] with RLE_DICTIONARY encoding — the engine's own hybrid coder
    (kernels/rle.py) IS the wire format."""
    body = _levels_block(sh, plan)
    body += bytes([width])
    body += rle.encode_hybrid(indices, width)
    dph = tc.struct(
        tc.f_i32(1, sh.num_entries),
        tc.f_i32(2, _ENC_RLE_DICT),
        tc.f_i32(3, _ENC_RLE),
        tc.f_i32(4, _ENC_RLE),
    )
    return _page(_PAGE_DATA, body, dph, 5, gzip)


def _split_pages(sh: ShreddedColumn, plan: ColumnPlan, max_records: int) -> list[tuple[ShreddedColumn, int, int]]:
    """Split a shredded chunk into page-sized sub-chunks at *record*
    boundaries (pages must start where rep == 0).  Returns
    (page_shred, value_start, value_end) triples.  A 1M-row group as a
    single page forces readers to buffer it whole — real writers bound
    page size (the reference's kDataBytesPerPage intent,
    parquet-file.h:28, which its single-Flush design never exercises)."""
    n_entries = sh.num_entries
    if plan.max_rep > 0:
        rec_starts = np.flatnonzero(sh.rep_levels == 0)
        page_starts = rec_starts[::max_records]
    else:
        page_starts = np.arange(0, n_entries, max_records, dtype=np.int64)
    if len(page_starts) <= 1:
        return [(sh, 0, len(sh.values))]
    if plan.max_def > 0:
        vcum = np.concatenate(([0], np.cumsum(sh.def_levels == plan.max_def)))
    else:
        vcum = np.arange(n_entries + 1)
    bounds = np.append(page_starts, n_entries)
    out = []
    for i in range(len(bounds) - 1):
        e0, e1 = int(bounds[i]), int(bounds[i + 1])
        v0, v1 = int(vcum[e0]), int(vcum[e1])
        out.append(
            (
                ShreddedColumn(
                    plan=plan,
                    def_levels=sh.def_levels[e0:e1] if sh.def_levels is not None else None,
                    rep_levels=sh.rep_levels[e0:e1] if sh.rep_levels is not None else None,
                    values=sh.values.slice(v0, v1 - v0),
                    num_entries=e1 - e0,
                ),
                v0,
                v1,
            )
        )
    return out


def _stat_bytes(scalar, t: pa.DataType) -> bytes | None:
    """Plain-encoded min/max value for Statistics (physical-type bytes)."""
    v = scalar.as_py()
    if v is None:
        return None
    if pa.types.is_date32(t):
        v = (scalar.cast(pa.int32())).as_py()
        return int(v).to_bytes(4, "little", signed=True)
    if pa.types.is_timestamp(t):
        return int(scalar.cast(pa.int64()).as_py()).to_bytes(8, "little", signed=True)
    if pa.types.is_integer(t):
        # width follows the PHYSICAL type (uint32 is stored as INT64);
        # unsigned values use the raw two's-complement bit pattern, the
        # same bytes the data pages carry (uint64 >= 2**63 must not
        # overflow a signed to_bytes)
        width = 8 if t.bit_width == 64 else 4
        signed = not pa.types.is_unsigned_integer(t)
        return int(v).to_bytes(width, "little", signed=signed)
    if pa.types.is_float32(t):
        return np.float32(v).tobytes()
    if pa.types.is_float64(t):
        return np.float64(v).tobytes()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        b = v.encode("utf-8")
        return b if len(b) <= _MAX_STAT_BYTES else None
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        return v if len(v) <= _MAX_STAT_BYTES else None
    if pa.types.is_decimal(t):
        import decimal as _dec

        from cpp_parquet_spark.kernels.plain import decimal_type_length

        unscaled = int(_dec.Decimal(v).scaleb(t.scale))
        return unscaled.to_bytes(decimal_type_length(t.precision), "big", signed=True)
    return None


def _statistics(sh: ShreddedColumn, plan: ColumnPlan) -> bytes | None:
    """Thrift Statistics (null_count + min_value/max_value) so readers
    can prune row groups — the reference writes none; this is part of
    making the output a first-class scan source at scale."""
    import pyarrow.compute as pc

    null_count = sh.num_entries - len(sh.values)
    head: list = []
    fields = [tc.f_i64(3, null_count)]
    t = sh.values.type
    ok_type = (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_fixed_size_binary(t)
        or pa.types.is_decimal(t)
        or pa.types.is_date32(t)
        or pa.types.is_timestamp(t)
    )
    if ok_type and len(sh.values):
        if pa.types.is_floating(t) and pc.any(pc.is_nan(sh.values)).as_py():
            return tc.struct(*fields)  # NaN breaks min/max ordering: omit
        try:
            mm = pc.min_max(sh.values)
        except pa.lib.ArrowNotImplementedError:  # e.g. FLBA on older Arrow
            return tc.struct(*fields)
        mn, mx = _stat_bytes(mm["min"], t), _stat_bytes(mm["max"], t)
        if mn is not None and mx is not None:
            # both the modern (5/6) and deprecated (1/2) field pairs:
            # Arrow C++ distrusts 5/6 from writers it cannot version-parse
            # but accepts 1/2 (what DuckDB emits); DuckDB reads either.
            # The deprecated pair implies SIGNED sort order, which is
            # wrong for unsigned logical types — omit it there.
            if not pa.types.is_unsigned_integer(t):
                head.append(tc.f_binary(1, mx))  # max (deprecated)
                head.append(tc.f_binary(2, mn))  # min (deprecated)
            fields.append(tc.f_binary(5, mx))  # max_value
            fields.append(tc.f_binary(6, mn))  # min_value
    return tc.struct(*head, *fields)


class ParquetWriter:
    """Streaming writer: open → write_row_group(table)* → close.

    The reference buffers every column whole and flushes once
    (parquet-file.cc:118-177); this writer flushes a row group per call
    so executor memory stays bounded by the row-group size — the shape a
    distributed sink needs.
    """

    def __init__(
        self,
        path: str,
        schema: pa.Schema,
        created_by: str = "cpp-parquet-spark",
        int96_timestamps: bool = False,
        use_dictionary: bool = True,
        use_delta: bool = True,
        compression: str | None = None,
        page_records: int = 20_000,
        data_page_version: int = 1,
    ):
        if compression not in (None, "none", "gzip"):
            raise ValueError("supported compression: None or 'gzip' (zlib is the only codec lib in this environment)")
        if data_page_version not in (1, 2):
            raise ValueError("data_page_version must be 1 or 2")
        self.data_page_version = data_page_version
        self.path = path
        self.schema = schema
        self.int96 = int96_timestamps
        self.use_dictionary = use_dictionary
        # DELTA_LENGTH_BYTE_ARRAY for non-dictionary string/binary
        # chunks: packed lengths + contiguous payload instead of
        # interleaved u32 prefixes — the wire form of the engine's own
        # internal PLAIN layout (kernels/plain.py)
        self.use_delta = use_delta
        self.gzip = compression == "gzip"
        self.page_records = page_records
        self.plans = plan_from_schema(schema)
        self._elems, self._leaf_paths = _schema_elements(schema, int96_timestamps)
        assert len(self._leaf_paths) == len(self.plans)
        self._created_by = created_by
        self._row_groups: list[bytes] = []
        self._num_rows = 0
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._pos = 4

    def write_row_group(self, table: pa.Table) -> None:
        n_rows = table.num_rows
        if n_rows == 0:
            return
        chunks: list[bytes] = []
        total = 0
        for plan, fpath in zip(self.plans, self._leaf_paths):
            col = table.column(plan.path[0])
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            sh = shred(arr, plan)
            use_int96 = self.int96 and pa.types.is_timestamp(plan.arrow_type)
            vt = sh.values.type
            if pa.types.is_timestamp(vt) and not use_int96 and vt.unit == "s":
                # Parquet has no SECONDS TimeUnit; the footer declares
                # MICROS for 's' columns (_leaf_type_info), so the values
                # must be scaled to match — an exact cast.  ms/us/ns are
                # written raw with their own declared unit.
                sh = ShreddedColumn(
                    plan=sh.plan,
                    def_levels=sh.def_levels,
                    rep_levels=sh.rep_levels,
                    values=sh.values.cast(pa.timestamp("us", vt.tz)),
                    num_entries=sh.num_entries,
                )
            # dictionary-encode when the chunk is meaningfully repetitive
            denc = None
            if self.use_dictionary and not use_int96 and plan.physical != "BOOLEAN" and len(sh.values):
                try:
                    d = sh.values.dictionary_encode()
                except pa.lib.ArrowError:  # pragma: no cover - defensive
                    d = None
                if d is not None and len(d.dictionary) <= max(1, len(sh.values) // 2):
                    denc = d
            encodings = [_ENC_PLAIN, _ENC_RLE]
            dict_offset = None
            chunk_len = 0
            raw_len = 0  # uncompressed bytes (ColumnMetaData field 6)
            pages = _split_pages(sh, plan, self.page_records)
            if denc is not None:
                dict_page, dict_raw = _dictionary_page(denc.dictionary, plan.physical, self.gzip)
                dict_offset = self._pos
                self._f.write(dict_page)
                chunk_len += len(dict_page)
                raw_len += dict_raw
                data_offset = self._pos + chunk_len
                indices = np.asarray(denc.indices, dtype=np.uint64)
                width = max((len(denc.dictionary) - 1).bit_length(), 1)
                for page_sh, v0, v1 in pages:
                    if self.data_page_version == 2:
                        vbody = bytes([width]) + rle.encode_hybrid(indices[v0:v1], width)
                        page, raw = _data_page_v2(page_sh, plan, vbody, _ENC_RLE_DICT, self.gzip)
                    else:
                        page, raw = _dict_data_page(page_sh, plan, indices[v0:v1], width, self.gzip)
                    self._f.write(page)
                    chunk_len += len(page)
                    raw_len += raw
                encodings.append(_ENC_RLE_DICT)
            else:
                enc = _ENC_PLAIN
                if self.use_delta and not use_int96 and plan.physical == "BYTE_ARRAY":
                    enc = _ENC_DELTA_LENGTH_BA
                    encodings = [_ENC_DELTA_LENGTH_BA, _ENC_RLE]
                elif self.use_delta and not use_int96 and plan.physical in ("INT32", "INT64"):
                    # DELTA_BINARY_PACKED for signed int / temporal
                    # chunks when it actually beats PLAIN (spec
                    # Encodings.md; unsigned columns stay PLAIN — their
                    # raw bit patterns don't fit signed delta space)
                    from cpp_parquet_spark.kernels.deltabp import (
                        delta_bp_fits,
                        encode_delta_binary_packed_array,
                    )

                    vt2 = sh.values.type
                    signed_like = (
                        pa.types.is_signed_integer(vt2)
                        or pa.types.is_timestamp(vt2)
                        or pa.types.is_date32(vt2)
                    )
                    if signed_like and len(sh.values) and delta_bp_fits(sh.values):
                        # decide on a bounded contiguous sample: trial-
                        # encoding the whole chunk doubled the encode
                        # cost of every delta column (pages re-encode
                        # the same values right below)
                        sample = sh.values.slice(0, min(len(sh.values), 8192))
                        plain_bytes = len(sample) * (4 if plan.physical == "INT32" else 8)
                        if len(encode_delta_binary_packed_array(sample)) < 0.9 * plain_bytes:
                            enc = _ENC_DELTA_BP
                            encodings = [_ENC_DELTA_BP, _ENC_RLE]
                data_offset = self._pos
                for page_sh, _, _ in pages:
                    if self.data_page_version == 2:
                        vbody = _page_values(page_sh, plan, enc, use_int96)
                        page, raw = _data_page_v2(page_sh, plan, vbody, enc, self.gzip)
                    else:
                        page, raw = _data_page(page_sh, plan, int96=use_int96, gzip=self.gzip, encoding=enc)
                    self._f.write(page)
                    chunk_len += len(page)
                    raw_len += raw
            self._pos += chunk_len
            total += chunk_len
            stats = None if use_int96 else _statistics(sh, plan)
            cmd = tc.struct(
                tc.f_i32(1, _T_INT96 if use_int96 else _PHYS_CODE[plan.physical]),
                tc.f_list(2, tc.T_I32, [tc.zigzag_varint(e) for e in encodings]),
                tc.f_list(3, tc.T_BINARY, [tc.uvarint(len(p.encode())) + p.encode() for p in fpath]),
                tc.f_i32(4, _CODEC_GZIP if self.gzip else _CODEC_UNCOMPRESSED),
                tc.f_i64(5, sh.num_entries),
                tc.f_i64(6, raw_len),  # total_uncompressed_size
                tc.f_i64(7, chunk_len),  # total_compressed_size
                tc.f_i64(9, data_offset),
                tc.f_i64(11, dict_offset) if dict_offset is not None else None,
                tc.f_struct(12, stats) if stats is not None else None,
            )
            chunks.append(
                tc.struct(tc.f_i64(2, dict_offset if dict_offset is not None else data_offset), tc.f_struct(3, cmd))
            )
        rg = tc.struct(
            tc.f_list(1, tc.T_STRUCT, chunks),
            tc.f_i64(2, total),
            tc.f_i64(3, n_rows),
        )
        self._row_groups.append(rg)
        self._num_rows += n_rows

    def close(self) -> dict:
        footer = tc.struct(
            tc.f_i32(1, 1),  # format version
            tc.f_list(2, tc.T_STRUCT, self._elems),
            tc.f_i64(3, self._num_rows),
            tc.f_list(4, tc.T_STRUCT, self._row_groups),
            tc.f_binary(6, self._created_by),
        )
        self._f.write(footer)
        self._f.write(len(footer).to_bytes(4, "little"))
        self._f.write(MAGIC)
        self._f.close()
        return {
            "path": self.path,
            "rows": self._num_rows,
            "row_groups": len(self._row_groups),
            "bytes": os.path.getsize(self.path),
        }

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if not self._f.closed:
            if exc[0] is None:
                self.close()
            else:
                self._f.close()


def row_group_slices(
    table: pa.Table, row_group_rows: int, row_group_bytes: int | None
) -> list[pa.Table]:
    """Greedy row-group packing.  With ``row_group_bytes`` set this is
    the reference's kMaxDataBytesPerRowGroup semantics
    (CalculateNumberOfRowGroups, parquet-file.cc:104-116 +
    parquet-file.h:31 — vestigial there, its Flush never calls it):
    pack rows until the next probe slice would push the group past the
    byte target, using Arrow buffer sizes as the data-byte estimate.
    Row-count remains a ceiling either way so level arrays stay bounded.
    """
    n = table.num_rows
    if n == 0:
        return [table]
    if row_group_bytes is None:
        return [table.slice(s, row_group_rows) for s in range(0, n, row_group_rows)]
    probe = max(256, min(row_group_rows, n) // 64)
    out: list[pa.Table] = []
    start = pos = 0
    acc = 0
    while pos < n:
        step = min(probe, n - pos, row_group_rows - (pos - start))
        sz = table.slice(pos, step).nbytes
        if pos > start and (acc + sz > row_group_bytes or pos - start >= row_group_rows):
            out.append(table.slice(start, pos - start))
            start, acc = pos, 0
        pos += step
        acc += sz
    out.append(table.slice(start, pos - start))
    return out


def write_table(
    table: pa.Table,
    path: str,
    row_group_rows: int = 1 << 20,
    row_group_bytes: int | None = None,
    int96_timestamps: bool = False,
    compression: str | None = None,
    use_dictionary: bool = True,
    use_delta: bool = True,
    page_records: int = 20_000,
    data_page_version: int = 1,
) -> dict:
    """Write an Arrow table as a real .parquet file (one call, N row groups)."""
    w = ParquetWriter(
        path,
        table.schema,
        int96_timestamps=int96_timestamps,
        compression=compression,
        use_dictionary=use_dictionary,
        use_delta=use_delta,
        page_records=page_records,
        data_page_version=data_page_version,
    )
    try:
        for piece in row_group_slices(table, row_group_rows, row_group_bytes):
            w.write_row_group(piece)
        return w.close()
    except BaseException:
        w._f.close()
        raise
