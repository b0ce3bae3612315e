"""Example: drive the writer from an Avro schema file, any of the three
formats the reference ships examples for (.avsc JSON, .avpr protocol,
.avdl IDL — reference examples/{AlignmentRecord.avsc,adam.avpr,
nested.avdl}):

    python examples/avro_schema_to_parquet.py [schema-file]

The schema lowers through the corrected Dremel level math
(avro_schema.py / avro_idl.py), synthetic rows are generated to match
the plan, and the result is written as a real .parquet file that
pyarrow and DuckDB verify.  Without an argument, a built-in .avdl
protocol equivalent to the reference's nested.avdl is used.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from cpp_parquet_spark.avro_idl import arrow_schema_from_protocol, parse_avdl, plan_from_avro_file
from cpp_parquet_spark.parquet_writer import write_table
from cpp_parquet_spark.schema_plan import plan_from_schema

DEFAULT_AVDL = """
@namespace("org.example")
protocol Sample {
  record Leaf { union { null, int } primitive = null; }
  record Mid  { union { null, Leaf } leaf = null; array<long> ids = []; }
  record Root { union { null, Mid } mid = null; string name = ""; }
}
"""


def synthesize(schema: pa.Schema, n: int = 100) -> pa.Table:
    """Deterministic rows matching an arbitrary (possibly nested) schema."""

    def value(t: pa.DataType, i: int):
        if pa.types.is_struct(t):
            return {f.name: None if (f.nullable and i % 5 == 0) else value(f.type, i + 1) for f in t}
        if pa.types.is_list(t):
            return [value(t.value_type, i + j) for j in range(i % 4)]
        if pa.types.is_integer(t):
            return i * 7
        if pa.types.is_floating(t):
            return i * 0.5
        if pa.types.is_boolean(t):
            return i % 2 == 0
        return f"name-{i:04d}"

    cols = {f.name: [None if (f.nullable and i % 7 == 3) else value(f.type, i) for i in range(n)] for f in schema}
    return pa.table({k: pa.array(v, type=schema.field(k).type) for k, v in cols.items()})


def main() -> None:
    if len(sys.argv) > 1:
        plans = plan_from_avro_file(sys.argv[1])
        schema = pa.schema([(p.dotted.split(".")[0], p.arrow_type) for p in plans if "." not in p.dotted])
        # rebuild the full nested schema via the same entry the plans used
        if sys.argv[1].endswith(".avdl"):
            schema = arrow_schema_from_protocol(parse_avdl(open(sys.argv[1]).read()))
    else:
        schema = arrow_schema_from_protocol(parse_avdl(DEFAULT_AVDL))
    print("schema:", schema)
    for p in plan_from_schema(schema):
        print(f"  leaf {p.dotted:32s} {p.physical:10s} max_def={p.max_def} max_rep={p.max_rep}")
    table = synthesize(schema)
    out = tempfile.mktemp(suffix=".parquet")
    write_table(table, out, data_page_version=2)
    back = pq.read_table(out)
    assert back.equals(table), "pyarrow round-trip mismatch"
    print("pyarrow round-trip OK;", duckdb.sql(f"select count(*) from '{out}'").fetchone()[0], "rows via DuckDB")


if __name__ == "__main__":
    main()
