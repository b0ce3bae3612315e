"""Schema → column plan walker.

Reimplements the reference's schema handling — ParquetColumn tree
construction + DFS flattening (SetSchema, parquet-file.cc:179-203,
62-71) and the Avro schema walker (avro-schema-walker.cc:21-152,
218-251) — as a walk over an Arrow/Spark schema producing one
``ColumnPlan`` per leaf in depth-first preorder ("Parquet requires
columns specified as a vector that is the depth first preorder
traversal of the schema", parquet-file.h:61-63).

Level math is the *correct* Dremel formula (the reference walker passes
``level, level`` for both maxima, avro-schema-walker.cc:244-246, which
over-counts repetition levels — see SURVEY.md §1.3):

    max_def = #(optional steps) + #(repeated steps) along the path
    max_rep = #(repeated steps) along the path

Nullable list fields get the Parquet 3-level treatment (an optional
step for list-null-ness, then a repeated step), so null and empty lists
round-trip distinctly; the reference's bare-REPEATED model
(parquet-column.cc:190-212) is the degenerate non-nullable case.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# Physical types per the reference's BytesForDataType
# (parquet-column.cc:269-288). We deviate on timestamps: INT64 micros
# instead of the legacy INT96.
_PHYSICAL = {
    "int8": "INT32",
    "int16": "INT32",
    "int32": "INT32",
    "int64": "INT64",
    "uint8": "INT32",
    "uint16": "INT32",
    "uint32": "INT32",  # UINT_32 may only annotate INT32 (raw bit pattern)
    "uint64": "INT64",
    "float": "FLOAT",
    "double": "DOUBLE",
    "bool": "BOOLEAN",
    "string": "BYTE_ARRAY",
    "large_string": "BYTE_ARRAY",
    "binary": "BYTE_ARRAY",
    "large_binary": "BYTE_ARRAY",
    "date32[day]": "INT32",
}


def _physical_for(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return "INT64"
    if pa.types.is_fixed_size_binary(t):
        # Avro `fixed` lowering target; type_length travels in the
        # Arrow type (writer emits SchemaElement.type_length from it)
        return "FIXED_LEN_BYTE_ARRAY"
    if pa.types.is_decimal(t):
        # Spark DecimalType → Parquet DECIMAL as FIXED_LEN_BYTE_ARRAY
        # (decimal128: same 16-byte fixed-width buffer layout as FLBA;
        # the wire writer byte-swaps to Parquet's big-endian form)
        return "FIXED_LEN_BYTE_ARRAY"
    name = str(t)
    if name in _PHYSICAL:
        return _PHYSICAL[name]
    raise TypeError(f"unsupported leaf type: {t}")


@dataclass(frozen=True)
class Step:
    """One nesting step on the path root→leaf.

    kind: 'opt' (optional — contributes 1 def level),
          'rep' (repeated — contributes 1 def and 1 rep level),
          'struct' (named grouping, no level contribution by itself).
    """

    kind: str
    name: str = ""


@dataclass(frozen=True)
class ColumnPlan:
    path: tuple[str, ...]  # dotted name path, e.g. ('s1', 's2', 'leaf')
    steps: tuple[Step, ...]
    arrow_type: pa.DataType = field(hash=False)
    physical: str = "BYTE_ARRAY"
    max_def: int = 0
    max_rep: int = 0

    @property
    def dotted(self) -> str:
        return ".".join(self.path)


def _walk_field(
    f: pa.Field,
    path: tuple[str, ...],
    steps: list[Step],
    out: list[ColumnPlan],
    add_name: bool = True,
) -> None:
    steps = list(steps)
    if add_name:
        path = path + (f.name,)
    if f.nullable:
        steps.append(Step("opt", f.name))
    t = f.type
    if pa.types.is_struct(t):
        steps.append(Step("struct", f.name))
        for child in t:
            _walk_field(child, path, steps, out)
        return
    if pa.types.is_map(t):
        # Parquet MAP group: repeated key_value struct with a required
        # key and the value.  An Arrow MapArray is physically
        # list<struct<key,value>>, so the generic rep+struct machinery
        # shreds it; walking a synthetic entries field yields leaves
        # (name.key, name.value) in DFS preorder.
        steps.append(Step("rep", f.name))
        entries = pa.field(
            "entries",
            pa.struct([t.key_field.with_name("key"), t.item_field.with_name("value")]),
            nullable=False,
        )
        _walk_field(entries, path, steps, out, add_name=False)
        return
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        steps.append(Step("rep", f.name))
        elem = t.value_field
        # the element behaves like a field named 'element' under the list
        if pa.types.is_struct(elem.type) or pa.types.is_list(elem.type) or pa.types.is_large_list(elem.type):
            # list elements contribute no path segment of their own; the
            # struct/list machinery below consumes the next path component
            _walk_field(elem, path, steps, out, add_name=False)
            return
        if elem.nullable:
            steps.append(Step("opt", "element"))
        _emit_leaf(elem.type, path, steps, out)
        return
    _emit_leaf(t, path, steps, out)


def _emit_leaf(t: pa.DataType, path: tuple[str, ...], steps: list[Step], out: list[ColumnPlan]) -> None:
    max_def = sum(1 for s in steps if s.kind in ("opt", "rep"))
    max_rep = sum(1 for s in steps if s.kind == "rep")
    out.append(
        ColumnPlan(
            path=path,
            steps=tuple(steps),
            arrow_type=t,
            physical=_physical_for(t),
            max_def=max_def,
            max_rep=max_rep,
        )
    )


def plan_from_schema(schema: pa.Schema) -> list[ColumnPlan]:
    """Flatten an Arrow schema to leaf column plans (DFS preorder)."""
    out: list[ColumnPlan] = []
    for f in schema:
        _walk_field(f, (), [], out)
    return out


def plan_from_spark_schema(spark_schema) -> list[ColumnPlan]:
    """Flatten a Spark ``StructType`` (converted via Arrow)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return plan_from_schema(to_arrow_schema(spark_schema))
