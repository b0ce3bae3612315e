"""O17 parity: per-record byte sizes match the reference's golden
expectations (parquet-file-test.cc record-size assertions)."""

import numpy as np
import pyarrow as pa

from cpp_parquet_spark.record_audit import record_sizes


def test_two_required_int32_is_8_bytes_per_record():
    # ref ParquetFileBasicRequiredTest (:116-157): 2 cols x 4 bytes
    t = pa.table(
        {"a": pa.array([2**31 - 1] * 500, pa.int32()), "b": pa.array([1] * 500, pa.int32())}
    ).cast(pa.schema([pa.field("a", pa.int32(), False), pa.field("b", pa.int32(), False)]))
    np.testing.assert_array_equal(record_sizes(t), np.full(500, 8))


def test_shrinking_byte_arrays():
    # ref OneRequiredVariableByteArrayColumn (:159-190): sizes 516-i
    vals = [("x" * 512)[: 512 - i] for i in range(500)]
    t = pa.table({"s": pa.array(vals, pa.string())}).cast(
        pa.schema([pa.field("s", pa.string(), False)])
    )
    np.testing.assert_array_equal(record_sizes(t), np.array([516 - i for i in range(500)]))


def test_mixed_repeated_and_scalar():
    # ref TwoColumnOfIntsOneRepeatedAndNonRepeatedData (:383-423):
    # record 1 = 4-elem array + scalar = 20B, record 2 = 1+1 = 8B
    schema = pa.schema(
        [
            pa.field("arr", pa.list_(pa.field("element", pa.int32(), False)), False),
            pa.field("x", pa.int32(), False),
        ]
    )
    t = pa.table(
        {"arr": pa.array([[1, 2, 3, 4], [5]] * 10), "x": pa.array([7, 8] * 10, pa.int32())}
    ).cast(schema)
    np.testing.assert_array_equal(record_sizes(t), np.array([20, 8] * 10))


def test_nulls_cost_zero():
    t = pa.table({"x": pa.array([1, None, 3], pa.int64()), "s": pa.array(["ab", "c", None])})
    np.testing.assert_array_equal(record_sizes(t), np.array([8 + 6, 0 + 5, 8 + 0]))
