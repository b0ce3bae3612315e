"""Schema walker tests (F7 fixture shapes from FIXTURES.md)."""

import pyarrow as pa

from cpp_parquet_spark.schema_plan import plan_from_schema


def test_flat_required():
    s = pa.schema(
        [pa.field("re", pa.float64(), nullable=False), pa.field("im", pa.float64(), nullable=False)]
    )
    plans = plan_from_schema(s)
    assert [p.dotted for p in plans] == ["re", "im"]
    assert all(p.max_def == 0 and p.max_rep == 0 for p in plans)
    assert plans[0].physical == "DOUBLE"


def test_flat_optional():
    plans = plan_from_schema(pa.schema([pa.field("x", pa.int32(), nullable=True)]))
    assert plans[0].max_def == 1 and plans[0].max_rep == 0
    assert plans[0].physical == "INT32"


def test_repeated():
    # non-nullable list of non-nullable ints: pure REPEATED (reference model)
    s = pa.schema(
        [pa.field("arr", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False)]
    )
    p = plan_from_schema(s)[0]
    assert p.max_rep == 1 and p.max_def == 1


def test_nullable_list_nullable_elem():
    s = pa.schema([pa.field("arr", pa.list_(pa.int64()), nullable=True)])
    p = plan_from_schema(s)[0]
    # opt(list) + rep + opt(element) = 3 def levels, 1 rep level
    assert p.max_def == 3 and p.max_rep == 1


def test_deep_struct_chain():
    # F6: 50-deep struct chain, required all the way, int leaf
    t = pa.field("leaf", pa.int32(), nullable=False)
    for i in range(49, 0, -1):
        t = pa.field(f"s{i}", pa.struct([t]), nullable=False)
    plans = plan_from_schema(pa.schema([t]))
    assert len(plans) == 1
    p = plans[0]
    assert p.max_def == 0 and p.max_rep == 0
    assert p.dotted == ".".join([f"s{i}" for i in range(1, 50)] + ["leaf"])


def test_deep_struct_optional_leaf():
    t = pa.field("leaf", pa.int32(), nullable=True)
    for i in range(49, 0, -1):
        t = pa.field(f"s{i}", pa.struct([t]), nullable=False)
    p = plan_from_schema(pa.schema([t]))[0]
    assert p.max_def == 1 and p.max_rep == 0


def test_optional_chain():
    # F7(b): 5-deep optional-record chain ending in optional int
    t = pa.field("leaf", pa.int32(), nullable=True)
    for i in range(5, 0, -1):
        t = pa.field(f"r{i}", pa.struct([t]), nullable=True)
    p = plan_from_schema(pa.schema([t]))[0]
    assert p.max_def == 6 and p.max_rep == 0


def test_multi_leaf_struct_preorder():
    s = pa.schema(
        [
            pa.field(
                "rec",
                pa.struct(
                    [
                        pa.field("a", pa.int32(), nullable=True),
                        pa.field("b", pa.string(), nullable=False),
                    ]
                ),
                nullable=False,
            ),
            pa.field("tail", pa.float32(), nullable=False),
        ]
    )
    plans = plan_from_schema(s)
    assert [p.dotted for p in plans] == ["rec.a", "rec.b", "tail"]
    assert [p.physical for p in plans] == ["INT32", "BYTE_ARRAY", "FLOAT"]


def test_spark_schema_roundtrip():
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from cpp_parquet_spark.schema_plan import plan_from_spark_schema

    st = StructType(
        [
            StructField("repo", StringType(), False),
            StructField("tags", ArrayType(IntegerType(), False), True),
        ]
    )
    plans = plan_from_spark_schema(st)
    assert plans[0].physical == "BYTE_ARRAY" and plans[0].max_def == 0
    assert plans[1].max_rep == 1 and plans[1].max_def == 2
