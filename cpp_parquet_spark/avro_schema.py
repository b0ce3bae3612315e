"""Avro JSON schema ingestion — the reference's second entry point (E2).

Reimplements AvroSchemaWalker (avro-schema-walker.cc:16-25, 101-152,
218-251): an Avro JSON schema file drives the column-plan construction
with ``union[null, T]`` → OPTIONAL, ``array<T>`` → REPEATED, nested
records → struct groups, and symbolic references resolved against
previously defined named types (the walker's callback carries the
enclosing record path the same way).

Two deliberate differences:
  * the *corrected* Dremel level math — the reference passes
    ``(level, level)`` for both maxima (avro-schema-walker.cc:244-246),
    over-counting repetition levels (SURVEY.md §1.3); we translate to an
    Arrow schema and reuse ``plan_from_schema``'s correct formula;
  * Avro logical types date / timestamp-millis / timestamp-micros map
    to real temporal Arrow types so the parquet writer annotates them.

Scope covers the reference walker (records, arrays, two-branch null
unions, primitives, named refs) plus three lowerings it lacks: enum →
string leaf (the writer's dictionary page supplies the symbol table),
fixed(n) → FIXED_LEN_BYTE_ARRAY(n), and map<string,V> → the Parquet
3-level MAP group.
"""

from __future__ import annotations

import json

import pyarrow as pa

from cpp_parquet_spark.schema_plan import ColumnPlan, plan_from_schema

_PRIMITIVE = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "string": pa.string(),
    "bytes": pa.binary(),
}

_LOGICAL = {
    ("int", "date"): pa.date32(),
    ("long", "timestamp-micros"): pa.timestamp("us"),
    ("long", "timestamp-millis"): pa.timestamp("ms"),
}


def _resolve(t, env: dict, ns: str | None = None) -> tuple[pa.DataType, bool]:
    """Avro type → (arrow type, nullable).  ``ns`` is the enclosing
    namespace (Avro namespace inheritance: nested records and name
    references resolve within it)."""
    if isinstance(t, str):
        if t in _PRIMITIVE:
            return _PRIMITIVE[t], False
        if t == "null":
            raise ValueError("bare 'null' is not a column type (only inside a union)")
        # symbolic reference: try as written, then namespace-qualified
        for key in (t, f"{ns}.{t}" if ns and "." not in t else None):
            if key is not None and key in env:
                return env[key], False
        raise ValueError(f"unresolved Avro type reference: {t!r}")
    if isinstance(t, list):  # union
        non_null = [b for b in t if b != "null"]
        if "null" not in t or len(non_null) != 1:
            raise ValueError(
                f"only union[null, T] is supported (reference walker behavior, "
                f"avro-schema-walker.cc:101-122); got {t!r}"
            )
        inner, _ = _resolve(non_null[0], env, ns)
        return inner, True
    if isinstance(t, dict):
        typ = t["type"]
        if isinstance(typ, (dict, list)):
            return _resolve(typ, env, ns)
        if typ == "record":
            rec_ns = t.get("namespace", ns)  # namespace inheritance
            fields = []
            for f in t["fields"]:
                ft, fnull = _resolve(f["type"], env, rec_ns)
                fields.append(pa.field(f["name"], ft, nullable=fnull))
            st = pa.struct(fields)
            env[t["name"]] = st
            if rec_ns:
                env[f"{rec_ns}.{t['name']}"] = st
            return st, False
        if typ == "array":
            it, inull = _resolve(t["items"], env, ns)
            return pa.list_(pa.field("element", it, nullable=inull)), False
        if typ in _PRIMITIVE:
            logical = t.get("logicalType")
            if logical == "decimal" and typ == "bytes":
                return pa.decimal128(int(t["precision"]), int(t.get("scale", 0))), False
            if logical is not None:
                lt = _LOGICAL.get((typ, logical))
                if lt is not None:
                    return lt, False
            return _PRIMITIVE[typ], False
        if typ == "enum":
            # enum → string leaf: symbols are strings, and the writer's
            # dictionary page recreates the symbol-table compression an
            # Avro enum implies.  Named type: register for later refs.
            rec_ns = t.get("namespace", ns)
            st = pa.string()
            env[t["name"]] = st
            if rec_ns:
                env[f"{rec_ns}.{t['name']}"] = st
            return st, False
        if typ == "fixed":
            # fixed → FIXED_LEN_BYTE_ARRAY of the declared size;
            # fixed/bytes with logicalType decimal → Parquet DECIMAL
            rec_ns = t.get("namespace", ns)
            if t.get("logicalType") == "decimal":
                ft = pa.decimal128(int(t["precision"]), int(t.get("scale", 0)))
            else:
                ft = pa.binary(int(t["size"]))
            env[t["name"]] = ft
            if rec_ns:
                env[f"{rec_ns}.{t['name']}"] = ft
            return ft, False
        if typ == "map":
            # Avro map<string, V> → Arrow map type (Parquet 3-level MAP
            # group; keys required, values by V's nullability)
            vt, vnull = _resolve(t["values"], env, ns)
            return pa.map_(pa.string(), pa.field("value", vt, nullable=vnull)), False
    raise ValueError(f"unrecognized Avro schema fragment: {t!r}")


def arrow_schema_from_avro(schema: str | dict) -> pa.Schema:
    """Top-level Avro record schema → Arrow schema."""
    if isinstance(schema, (str, bytes)):
        schema = json.loads(schema)
    env: dict = {}
    top, _ = _resolve(schema, env)
    if not pa.types.is_struct(top):
        raise ValueError("top-level Avro schema must be a record")
    return pa.schema(list(top))


def plan_from_avro_json(schema: str | dict) -> list[ColumnPlan]:
    """Avro JSON schema → leaf column plans (DFS preorder) — the E2
    pipeline entry, with corrected level maxima."""
    return plan_from_schema(arrow_schema_from_avro(schema))
