"""Avro JSON schema walker tests — mirrors the reference walker's case
matrix (avro-schema-walker-test.cc style: flat, optional, array, nested
record, symbolic refs) with the corrected level math."""

import json

import pyarrow as pa
import pytest

from cpp_parquet_spark.avro_schema import arrow_schema_from_avro, plan_from_avro_json
from cpp_parquet_spark.chunk import decode_chunk_to_column, serialize_chunk
from cpp_parquet_spark.kernels.levels import shred


def _plan_map(schema):
    return {p.dotted: p for p in plan_from_avro_json(schema)}


def test_flat_primitives():
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
        ],
    }
    plans = _plan_map(schema)
    assert plans["i"].physical == "INT32" and plans["i"].max_def == 0
    assert plans["l"].physical == "INT64"
    assert plans["s"].physical == "BYTE_ARRAY"
    assert plans["by"].physical == "BYTE_ARRAY"
    assert all(p.max_rep == 0 for p in plans.values())


def test_union_null_optional():
    # avro-schema-walker.cc:101-122: union[null, T] -> OPTIONAL
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "opt1", "type": ["null", "long"]},
            {"name": "opt2", "type": ["string", "null"]},  # order-insensitive
            {"name": "req", "type": "long"},
        ],
    }
    plans = _plan_map(schema)
    assert plans["opt1"].max_def == 1 and plans["opt1"].max_rep == 0
    assert plans["opt2"].max_def == 1
    assert plans["req"].max_def == 0


def test_array_repeated():
    # avro-schema-walker.cc:123-152: array<T> -> REPEATED
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {"name": "maybe_xs", "type": ["null", {"type": "array", "items": ["null", "string"]}]},
        ],
    }
    plans = _plan_map(schema)
    assert plans["xs"].max_rep == 1 and plans["xs"].max_def == 1
    # optional list of optional strings: opt + rep + opt = 3 def levels
    assert plans["maybe_xs"].max_rep == 1 and plans["maybe_xs"].max_def == 3


def test_nested_record_paths():
    schema = {
        "type": "record",
        "name": "Outer",
        "fields": [
            {
                "name": "inner",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {"name": "y", "type": ["null", "string"]},
                    ],
                },
            },
        ],
    }
    plans = _plan_map(schema)
    assert set(plans) == {"inner.x", "inner.y"}
    assert plans["inner.y"].max_def == 1


def test_symbolic_reference():
    # a named record used twice: second use is a symbolic ref
    schema = {
        "type": "record",
        "name": "Rec",
        "namespace": "ns",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "Point",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
            {"name": "b", "type": "Point"},
            {"name": "c", "type": ["null", "ns.Point"]},
        ],
    }
    plans = _plan_map(schema)
    assert set(plans) == {"a.x", "b.x", "c.x"}
    assert plans["c.x"].max_def == 1  # optional wrapper adds one level


def test_logical_types():
    schema = {
        "type": "record",
        "name": "Rec",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        ],
    }
    s = arrow_schema_from_avro(schema)
    assert s.field("d").type == pa.date32()
    assert s.field("ts").type == pa.timestamp("us")


def test_rejects_multi_branch_union_and_unknown_ref():
    with pytest.raises(ValueError, match="union"):
        plan_from_avro_json(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["int", "string"]}]}
        )
    with pytest.raises(ValueError, match="unresolved"):
        plan_from_avro_json(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": "Missing"}]}
        )
    # maps are supported since round 4 (Parquet MAP group lowering) —
    # they plan to key/value leaves instead of raising
    plans = plan_from_avro_json(
        {
            "type": "record",
            "name": "R",
            "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}],
        }
    )
    assert [p.dotted for p in plans] == ["m.key", "m.value"]


def test_avro_plan_roundtrips_data():
    """Data shredded/encoded under an Avro-derived plan round-trips —
    the E2 path feeds the same chunk pipeline as Arrow schemas."""
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "Doc",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "tags", "type": {"type": "array", "items": ["null", "string"]}},
                {"name": "score", "type": ["null", "double"]},
            ],
        }
    )
    arrow_schema = arrow_schema_from_avro(schema_json)
    plans = plan_from_avro_json(schema_json)
    data = {
        "id": [1, 2, 3, 4],
        "tags": [["a", None], [], ["b"], ["c", "d", "e"]],
        "score": [1.5, None, 3.25, None],
    }
    table = pa.table(data, schema=arrow_schema)
    for plan in plans:
        sh = shred(table.column(plan.path[0]).combine_chunks(), plan)
        blob, _ = serialize_chunk(sh, "plain")
        back = decode_chunk_to_column(blob, plan)
        assert back.to_pylist() == table.column(plan.path[0]).to_pylist(), plan.dotted


def test_avro_schema_to_real_parquet(tmp_path):
    """An Avro-declared schema drives the real Parquet writer and an
    independent reader parses the produced file."""
    import pyarrow.parquet as pq

    from cpp_parquet_spark.parquet_writer import write_table

    arrow_schema = arrow_schema_from_avro(
        {
            "type": "record",
            "name": "Doc",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "xs", "type": {"type": "array", "items": "double"}},
            ],
        }
    )
    t = pa.table(
        {"id": [1, 2], "name": ["a", None], "xs": [[1.0, 2.0], []]}, schema=arrow_schema
    )
    path = str(tmp_path / "avro.parquet")
    write_table(t, path)
    back = pq.read_table(path)
    assert back.to_pydict() == t.to_pydict()
