"""Avro IDL / .avpr ingestion tests.

Mirrors the reference's two non-.avsc examples: nested.avdl (a protocol
of five bottom-up-declared records chained through union{null, RecordN}
fields — reproduced inline here) and adam.avpr (a bare record schema in
a .avpr file).  The lowered schemas must flow through the same corrected
level math as the JSON walker path.
"""

import json
import os

import pytest

from cpp_parquet_spark.avro_idl import (
    arrow_schema_from_protocol,
    parse_avdl,
    plan_from_avro_file,
)

# Equivalent of the reference's examples/nested.avdl: Root4..Root0
# declared bottom-up, each wrapping the next in union { null, T }.
NESTED_AVDL = """
@namespace("org.example")
protocol Sample {
  record Root4 {
    union { null, int } primitive = null;
  }
  record Root3 {
    union { null, Root4 } root4 = null;
  }
  record Root2 {
    union { null, Root3 } root3 = null;
  }
  record Root1 {
    union { null, Root2 } root2 = null;
  }
  record Root0 {
    union { null, Root1 } root1 = null;
  }
}
"""


def test_nested_avdl_five_deep_optional_chain():
    proto = parse_avdl(NESTED_AVDL)
    assert proto["protocol"] == "Sample"
    assert proto["namespace"] == "org.example"
    assert [t["name"] for t in proto["types"]] == [f"Root{i}" for i in (4, 3, 2, 1, 0)]

    import tempfile

    from cpp_parquet_spark.schema_plan import plan_from_schema

    plans = plan_from_schema(arrow_schema_from_protocol(proto))  # root = Root0 (last)
    leaves = {p.dotted: p for p in plans}
    leaf = leaves["root1.root2.root3.root4.primitive"]
    assert leaf.physical == "INT32"
    assert leaf.max_def == 5  # one optional level per union{null, _}
    assert leaf.max_rep == 0


def test_avdl_root_selection():
    proto = parse_avdl(NESTED_AVDL)
    schema = arrow_schema_from_protocol(proto, root="Root3")
    assert schema.names == ["root4"]
    with pytest.raises(ValueError, match="not declared"):
        arrow_schema_from_protocol(proto, root="Nope")


def test_avdl_comments_defaults_annotations_messages():
    text = """
    /** Doc comment. */
    @namespace("x.y")
    protocol P {
      // line comment
      record Item {
        @order("ignore") string name = "a, b; c";
        array<union { null, long }> vals = [];
        date day;
        timestamp_ms ts;
      }
      void send(Item item);
    }
    """
    proto = parse_avdl(text)
    (item,) = proto["types"]
    fields = {f["name"]: f["type"] for f in item["fields"]}
    assert fields["name"] == "string"
    assert fields["vals"] == {"type": "array", "items": ["null", "long"]}
    assert fields["day"] == {"type": "int", "logicalType": "date"}
    assert fields["ts"] == {"type": "long", "logicalType": "timestamp-millis"}

    import pyarrow as pa

    schema = arrow_schema_from_protocol(proto)
    assert schema.field("day").type == pa.date32()
    assert schema.field("ts").type == pa.timestamp("ms")
    assert schema.field("vals").type == pa.list_(pa.field("element", pa.int64()))


def test_avdl_enum_parses_since_round4():
    # enums are lowered (→ dictionary strings) since round 4 instead of
    # raising; a bare enum still cannot be a root record
    proto = parse_avdl("protocol P { enum E { A, B } }")
    assert proto["types"] == [{"type": "enum", "name": "E", "symbols": ["A", "B"]}]
    from cpp_parquet_spark.avro_idl import arrow_schema_from_protocol

    with pytest.raises(ValueError, match="no record"):
        arrow_schema_from_protocol(proto)


def test_avpr_protocol_file(tmp_path):
    proto = {
        "protocol": "P",
        "namespace": "n",
        "types": [
            {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "v", "type": "long"}],
            },
            {
                "type": "record",
                "name": "Outer",
                "fields": [
                    {"name": "inner", "type": ["null", "Inner"]},
                    {"name": "tag", "type": "string"},
                ],
            },
        ],
    }
    path = tmp_path / "p.avpr"
    path.write_text(json.dumps(proto))
    plans = {p.dotted: p for p in plan_from_avro_file(str(path))}
    assert plans["inner.v"].max_def == 1
    assert plans["tag"].physical == "BYTE_ARRAY"


def test_avpr_bare_record_file(tmp_path):
    # the reference's adam.avpr is a bare record despite its extension
    rec = {
        "type": "record",
        "name": "ADAMRecord",
        "fields": [
            {"name": "referenceName", "type": "string"},
            {"name": "referenceId", "type": {"type": "array", "items": "int"}},
            {"name": "start", "type": "long"},
        ],
    }
    path = tmp_path / "adam.avpr"
    path.write_text(json.dumps(rec))
    plans = {p.dotted: p for p in plan_from_avro_file(str(path))}
    assert plans["referenceId"].max_rep == 1
    assert plans["start"].physical == "INT64"


def test_reference_examples_parse_if_present():
    """The actual reference example files, when readable, lower cleanly."""
    ref = "/root/reference/examples"
    avdl = os.path.join(ref, "nested.avdl")
    if os.path.exists(avdl):
        plans = {p.dotted: p for p in plan_from_avro_file(avdl)}
        leaf = plans["root1.root2.root3.root4.primitive"]
        assert leaf.max_def == 5 and leaf.max_rep == 0
    avpr = os.path.join(ref, "adam.avpr")
    if os.path.exists(avpr):
        plans = plan_from_avro_file(avpr)
        assert any(p.dotted == "referenceId" and p.max_rep == 1 for p in plans)
