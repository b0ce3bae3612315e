"""Dremel shred/unshred tests.

Case matrix mirrors the reference's test suite
(parquet-file/parquet-file-test.cc): required scalars, optional
all-present / all-null / alternating (F5), repeated arrays with the
first-element repetition rule (F4), deep nested chains (F6) — plus
empty/null list cases the reference cannot represent, and a hypothesis
round-trip as the general oracle.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cpp_parquet_spark.kernels.levels import shred, unshred
from cpp_parquet_spark.schema_plan import plan_from_schema


def _one(schema_field, data):
    schema = pa.schema([schema_field])
    plan = plan_from_schema(schema)[0]
    arr = pa.array(data, type=schema_field.type)
    return plan, arr, shred(arr, plan)


def _roundtrip(plan, arr, sh):
    back = unshred(plan, sh.def_levels, sh.rep_levels, sh.values, sh.num_entries)
    assert back.equals(arr.cast(back.type)) or back.to_pylist() == arr.to_pylist()


def test_required_scalar():
    plan, arr, sh = _one(pa.field("x", pa.int32(), nullable=False), [1, 2, 3])
    assert sh.def_levels is None and sh.rep_levels is None
    assert sh.values.to_pylist() == [1, 2, 3]
    _roundtrip(plan, arr, sh)


def test_optional_all_present():
    # ref OneColumnOptionalData (:427-456)
    plan, arr, sh = _one(pa.field("x", pa.int32(), nullable=True), [1, 2, 3, 4, 5])
    assert sh.def_levels.tolist() == [1] * 5
    _roundtrip(plan, arr, sh)


def test_optional_all_null():
    # ref OneColumn500Nulls (:459-480)
    plan, arr, sh = _one(pa.field("x", pa.int32(), nullable=True), [None] * 500)
    assert sh.def_levels.tolist() == [0] * 500
    assert len(sh.values) == 0
    _roundtrip(plan, arr, sh)


def test_optional_alternating():
    # ref OneColumn500NullsAndData (:484-512)
    data = [None if i % 2 == 0 else i // 2 for i in range(1000)]
    plan, arr, sh = _one(pa.field("x", pa.int64(), nullable=True), data)
    assert sh.def_levels.tolist() == [0, 1] * 500
    assert sh.values.to_pylist() == list(range(500))
    _roundtrip(plan, arr, sh)


def test_repeated_first_element_rule():
    # ref TwoColumnsOfIntsOneRepeated (:310-343): first element carries the
    # parent rep level (0), the rest carry max_rep (parquet-column.cc:190-212)
    f = pa.field("arr", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False)
    plan, arr, sh = _one(f, [[1, 2, 3, 4], [5], [6, 7]])
    assert sh.rep_levels.tolist() == [0, 1, 1, 1, 0, 0, 1]
    assert sh.def_levels.tolist() == [1] * 7
    assert sh.values.to_pylist() == [1, 2, 3, 4, 5, 6, 7]
    _roundtrip(plan, arr, sh)


def test_repeated_250_two_element():
    # ref OneColumn250Records (:347-377)
    f = pa.field("arr", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False)
    plan, arr, sh = _one(f, [[2 * i, 2 * i + 1] for i in range(250)])
    assert sh.rep_levels.tolist() == [0, 1] * 250
    _roundtrip(plan, arr, sh)


def test_empty_and_null_lists():
    f = pa.field("arr", pa.list_(pa.int32()), nullable=True)
    plan, arr, sh = _one(f, [[1, None], [], None, [4]])
    # max_def=3: opt(list)+rep+opt(elem)
    assert plan.max_def == 3
    assert sh.def_levels.tolist() == [3, 2, 1, 0, 3]
    assert sh.rep_levels.tolist() == [0, 1, 0, 0, 0]
    assert sh.values.to_pylist() == [1, 4]
    _roundtrip(plan, arr, sh)


def test_deep_nested_chain():
    # ref OneColumnNestedData (:515-555): 50-deep required chain
    vals = list(range(500))
    data = vals
    f = pa.field("leaf", pa.int32(), nullable=False)
    for i in range(49, 0, -1):
        f = pa.field(f"s{i}", pa.struct([f]), nullable=False)
        data = [{f.type.field(0).name if False else ("leaf" if i == 49 else f"s{i+1}"): d} for d in data]
    plan = plan_from_schema(pa.schema([f]))[0]
    arr = pa.array(data, type=f.type)
    sh = shred(arr, plan)
    assert sh.def_levels is None and sh.rep_levels is None
    assert sh.values.to_pylist() == vals
    _roundtrip(plan, arr, sh)


def test_deep_nested_optional_leaf():
    # ref OneColumnNestedOptionalData (:559-600): alternating null/value leaf
    f = pa.field("leaf", pa.int32(), nullable=True)
    depth = 10
    for i in range(depth - 1, 0, -1):
        f = pa.field(f"s{i}", pa.struct([f]), nullable=False)
    leaf_vals = [None if i % 2 == 0 else i for i in range(100)]
    data = leaf_vals
    names = [f"s{i}" for i in range(2, depth)] + ["leaf"]
    for name in reversed(names):
        data = [{name: d} for d in data]
    plan = plan_from_schema(pa.schema([f]))[0]
    arr = pa.array(data, type=f.type)
    sh = shred(arr, plan)
    assert sh.def_levels.tolist() == [0, 1] * 50
    _roundtrip(plan, arr, sh)


def test_null_struct_mid_chain():
    f = pa.field(
        "a",
        pa.struct([pa.field("b", pa.struct([pa.field("x", pa.int32(), nullable=True)]), nullable=True)]),
        nullable=True,
    )
    plan, arr, sh = _one(f, [{"b": {"x": 1}}, {"b": None}, None, {"b": {"x": None}}])
    assert plan.max_def == 3
    assert sh.def_levels.tolist() == [3, 1, 0, 2]
    assert sh.values.to_pylist() == [1]
    _roundtrip(plan, arr, sh)


def test_list_of_struct():
    f = pa.field(
        "a",
        pa.list_(pa.field("element", pa.struct([pa.field("x", pa.int64(), nullable=True)]), nullable=False)),
        nullable=False,
    )
    plan, arr, sh = _one(f, [[{"x": 1}, {"x": None}], [], [{"x": 3}]])
    assert plan.dotted == "a.x"
    assert sh.def_levels.tolist() == [2, 1, 0, 2]
    assert sh.rep_levels.tolist() == [0, 1, 0, 0]
    _roundtrip(plan, arr, sh)


def test_list_of_list():
    f = pa.field("a", pa.list_(pa.list_(pa.int32())), nullable=True)
    plan, arr, sh = _one(f, [[[1, 2], []], [], None, [[3], None]])
    _roundtrip(plan, arr, sh)


@st.composite
def nested_values(draw):
    """Random nullable list-of-list-of-optional-int column data."""
    n = draw(st.integers(min_value=0, max_value=25))
    inner = st.lists(st.one_of(st.none(), st.integers(-100, 100)), max_size=4)
    outer = st.one_of(st.none(), st.lists(st.one_of(st.none(), inner), max_size=4))
    return draw(st.lists(outer, min_size=n, max_size=n))


@given(nested_values())
@settings(max_examples=60, deadline=None)
def test_roundtrip_property_nested(data):
    f = pa.field("a", pa.list_(pa.list_(pa.int32())), nullable=True)
    plan = plan_from_schema(pa.schema([f]))[0]
    arr = pa.array(data, type=f.type)
    sh = shred(arr, plan)
    back = unshred(plan, sh.def_levels, sh.rep_levels, sh.values, sh.num_entries)
    assert back.to_pylist() == arr.to_pylist()


@given(st.lists(st.one_of(st.none(), st.text(max_size=8))))
@settings(max_examples=40, deadline=None)
def test_roundtrip_property_strings(data):
    f = pa.field("s", pa.string(), nullable=True)
    plan = plan_from_schema(pa.schema([f]))[0]
    arr = pa.array(data, type=pa.string())
    sh = shred(arr, plan)
    back = unshred(plan, sh.def_levels, sh.rep_levels, sh.values, sh.num_entries)
    assert back.to_pylist() == arr.to_pylist()
