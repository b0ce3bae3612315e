"""Avro IDL (``.avdl``) and protocol (``.avpr``) ingestion.

The reference ships two non-``.avsc`` schema examples —
``examples/nested.avdl`` (an IDL protocol with five nested
``union { null, RecordN }`` records) and ``examples/adam.avpr`` (which,
despite the extension, is a bare record schema) — but its walker only
ever consumes the JSON form.  This module closes that gap from the
public Avro IDL specification: a tokenizer + recursive-descent parser
that lowers the IDL subset matching-and-exceeding AvroSchemaWalker's
scope (avro-schema-walker.cc:16-152 — records, two-branch null unions,
arrays, primitives, named refs; plus enums → dictionary strings,
fixed → FIXED_LEN_BYTE_ARRAY, and map<V> → Parquet MAP groups, which
the reference's walker rejects) into ordinary Avro JSON schema dicts,
which then flow
through :func:`cpp_parquet_spark.avro_schema.arrow_schema_from_avro`'s
corrected level math unchanged.

Grammar subset (Avro IDL 1.11 spec):

* ``/* ... */`` and ``// ...`` comments (doc comments are comments);
* ``@namespace("ns")`` and other ``@name(...)`` annotations (namespace
  is honored; the rest are parsed and ignored);
* ``protocol Name { <declarations> }``;
* ``record Name { <type> <name> [= <default>]; ... }`` (defaults are
  consumed, not interpreted — they do not affect the column plan);
* types: the Avro primitives, ``array<T>``, ``map<T>``,
  ``union { T1, T2, ... }``, named references, and the IDL logical-type
  keywords ``date`` / ``timestamp_ms``;
* message declarations inside a protocol are skipped.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

from cpp_parquet_spark.avro_schema import _resolve, plan_from_avro_json
from cpp_parquet_spark.schema_plan import ColumnPlan, plan_from_schema

_COMMENT = re.compile(r"/\*.*?\*/|//[^\n]*", re.S)
_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[A-Za-z_][A-Za-z0-9_.]*|-?\d+(?:\.\d+)?|\S')

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}
# IDL keywords that lower to annotated primitives (Avro IDL spec §logical types)
_LOGICAL_KEYWORDS = {
    "date": {"type": "int", "logicalType": "date"},
    "timestamp_ms": {"type": "long", "logicalType": "timestamp-millis"},
}


class _Parser:
    def __init__(self, text: str):
        self.toks = _TOKEN.findall(_COMMENT.sub(" ", text))
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise ValueError("unexpected end of Avro IDL input")
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise ValueError(f"Avro IDL parse error: expected {tok!r}, got {got!r}")

    # -- annotations ---------------------------------------------------
    def annotations(self) -> dict:
        """Consume leading ``@name(args)`` annotations; return those we
        interpret (namespace)."""
        out: dict = {}
        while self.peek() == "@":
            self.next()
            name = self.next()
            self.expect("(")
            args = []
            depth = 1
            while depth:
                tok = self.next()
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                else:
                    args.append(tok)
            if name == "namespace" and args:
                out["namespace"] = json.loads(args[0])
        return out

    # -- types ---------------------------------------------------------
    def type_(self):
        tok = self.next()
        if tok == "union":
            self.expect("{")
            branches = [self.type_()]
            while self.peek() == ",":
                self.next()
                branches.append(self.type_())
            self.expect("}")
            return branches
        if tok == "array":
            self.expect("<")
            items = self.type_()
            self.expect(">")
            return {"type": "array", "items": items}
        if tok == "map":
            self.expect("<")
            values = self.type_()
            self.expect(">")
            return {"type": "map", "values": values}
        if tok in _LOGICAL_KEYWORDS:
            return dict(_LOGICAL_KEYWORDS[tok])
        if tok in _PRIMITIVES or re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", tok or ""):
            return tok  # primitive or named reference
        raise ValueError(f"Avro IDL parse error: unexpected type token {tok!r}")

    def _skip_default(self) -> None:
        """Consume a default value expression up to the field's ``;``
        (defaults never affect the column plan)."""
        depth = 0
        while True:
            tok = self.peek()
            if tok is None:
                raise ValueError("unterminated field default in Avro IDL")
            if tok in "([{":
                depth += 1
            elif tok in ")]}":
                depth -= 1
            elif tok == ";" and depth == 0:
                return
            self.next()

    # -- declarations ---------------------------------------------------
    def record(self, namespace: str | None):
        ann = {}
        kind = self.next()  # 'record' or 'error' (same shape per spec)
        if kind not in ("record", "error"):
            raise ValueError(f"expected record declaration, got {kind!r}")
        name = self.next()
        self.expect("{")
        fields = []
        while self.peek() != "}":
            self.annotations()  # field-level annotations: parsed, ignored
            ftype = self.type_()
            fname = self.next()
            if self.peek() == "=":
                self.next()
                self._skip_default()
            self.expect(";")
            fields.append({"name": fname, "type": ftype})
        self.expect("}")
        rec = {"type": "record", "name": name, "fields": fields}
        if namespace:
            rec["namespace"] = namespace
        return rec

    def enum_(self, namespace: str | None):
        """``enum Name { A, B }`` (an optional ``= DEFAULT;`` tail per
        IDL 1.11 is consumed, not interpreted)."""
        self.expect("enum")
        name = self.next()
        self.expect("{")
        symbols = []
        while self.peek() != "}":
            tok = self.next()
            if tok != ",":
                symbols.append(tok)
        self.expect("}")
        if self.peek() == "=":
            self.next()
            self.next()  # default symbol
        if self.peek() == ";":
            self.next()
        d = {"type": "enum", "name": name, "symbols": symbols}
        if namespace:
            d["namespace"] = namespace
        return d

    def fixed_(self, namespace: str | None):
        """``fixed Name(16);``"""
        self.expect("fixed")
        name = self.next()
        self.expect("(")
        size = int(self.next())
        self.expect(")")
        self.expect(";")
        d = {"type": "fixed", "name": name, "size": size}
        if namespace:
            d["namespace"] = namespace
        return d

    def protocol(self):
        ann = self.annotations()
        namespace = ann.get("namespace")
        self.expect("protocol")
        proto_name = self.next()
        self.expect("{")
        types = []
        while self.peek() != "}":
            inner_ann = self.annotations()
            ns = inner_ann.get("namespace", namespace)
            tok = self.peek()
            if tok in ("record", "error"):
                types.append(self.record(ns))
            elif tok == "enum":
                types.append(self.enum_(ns))
            elif tok == "fixed":
                types.append(self.fixed_(ns))
            elif tok == "import":
                raise ValueError("Avro IDL imports are not supported")
            else:
                # message declaration: <type> <name>(<args>) [throws ...];
                self.type_()
                self.next()  # message name
                self.expect("(")
                depth = 1
                while depth:
                    t = self.next()
                    depth += t == "("
                    depth -= t == ")"
                while self.next() != ";":
                    pass
        self.expect("}")
        return {"protocol": proto_name, "namespace": namespace, "types": types}


def parse_avdl(text: str) -> dict:
    """Avro IDL source → protocol dict (``.avpr``-shaped JSON)."""
    return _Parser(text).protocol()


def arrow_schema_from_protocol(proto: dict, root: str | None = None) -> pa.Schema:
    """Protocol dict (``.avpr`` shape) → Arrow schema of one record.

    Records are resolved in declaration order so later records can
    reference earlier ones by name.  ``root`` selects the record to
    flatten; default is the last declared record — in both the IDL style
    the reference ships (nested.avdl declares Root4..Root0 bottom-up) and
    common .avpr files, the outermost record comes last.
    """
    namespace = proto.get("namespace")
    env: dict = {}
    structs: dict[str, pa.DataType] = {}
    order: list[str] = []
    for t in proto.get("types", []):
        st, _ = _resolve(t, env, namespace)
        structs[t["name"]] = st
        if t.get("type") in ("record", "error"):
            order.append(t["name"])  # enums/fixed are named types, not roots
    if not order:
        raise ValueError("protocol declares no record types")
    root_name = root if root is not None else order[-1]
    if root_name not in structs:
        raise ValueError(f"record {root_name!r} not declared in protocol {proto.get('protocol')!r}")
    top = structs[root_name]
    return pa.schema(list(top))


def plan_from_avro_file(path: str, root: str | None = None) -> list[ColumnPlan]:
    """Schema-file → leaf column plans, dispatching on content/extension:

    * ``.avdl`` → IDL parse → protocol → root record;
    * ``.avpr`` / ``.json`` / ``.avsc`` holding a protocol object
      (has a ``protocol`` key) → root record of the protocol;
    * otherwise → plain Avro JSON record schema (the existing E2 path;
      covers the reference's adam.avpr, which is a bare record).
    """
    with open(path) as f:
        text = f.read()
    if path.endswith(".avdl"):
        return plan_from_schema(arrow_schema_from_protocol(parse_avdl(text), root))
    obj = json.loads(text)
    if isinstance(obj, dict) and "protocol" in obj:
        return plan_from_schema(arrow_schema_from_protocol(obj, root))
    return plan_from_avro_json(obj)
