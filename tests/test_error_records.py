"""Exact violation-record parity with the reference's unit tests
(test/jesse_schema_validator_tests.erl:32-187), re-expressed for the
columnar instance model: a one-row table's columns play the object's
properties, so the reference's path ``[<<"foo">>, ...]`` becomes
``["foo", ...]`` and a root-path ``[]`` error on a column value becomes
``["col"]``.

Deliberate, documented representation deltas (not semantic ones):
- the reference records the whole offending ARRAY as the error value
  for wrong_size / no_extra_items_allowed; we record ``{"length": n}``
  because violation rows carrying multi-thousand-token payloads would
  dominate output at corpus scale;
- mixed-type array instances (wrong_type on one element of
  ``[2, "baz", 3]``) cannot exist in a typed Arrow column, so those
  reference cases are structurally unreachable here (Arrow's schema IS
  the type check).
"""

import json

import pyarrow as pa

from jesse_ray import errors as E
from jesse_ray.compiler import compile_spec
from jesse_ray.spec import from_json_schema


def _rows(schema: dict, data: dict) -> list[tuple]:
    spec = from_json_schema(schema, key_column=None)
    tbl = pa.table({k: pa.array([v]) for k, v in data.items()})
    spec = spec.resolve_patterns(tbl.schema.names)
    v = compile_spec(spec).check_batch(tbl)
    return [
        (tuple(p), e, json.loads(x))
        for p, e, x in zip(
            v["path"].to_pylist(), v["error"].to_pylist(), v["value_json"].to_pylist()
        )
    ]


INT = {"type": "integer"}


def test_properties_two_levels_via_items():
    # jesse: [{data_invalid, IntegerSchema, wrong_type, <<"bar">>,
    #          [<<"foo">>, <<"subfoo">>]}] (erl:69-82) — columnar
    # analogue: a nested constraint failing one level down yields a path
    # [column, index]
    schema = {"properties": {"foo": {"items": {"minimum": 10}}}}
    assert _rows(schema, {"foo": [12, 3]}) == [(("foo", "1"), E.NOT_IN_RANGE, 3)]


def test_pattern_properties_level1():
    # jesse: patternProperties ^b → IntegerSchema; instance {bar: "baz"}
    # fails wrong_type at path [<<"bar">>] (erl:85-89)
    schema = {"patternProperties": {"^b": {"type": "integer"}}}
    rows = _rows(schema, {"bar": "baz"})
    assert rows == [(("bar",), E.WRONG_TYPE, "baz")]


def test_items_zero_based_index_path():
    # jesse: items + maxItems 3; [2, <<"baz">>, 3] → wrong_type at [1];
    # [2,3,4,5] → wrong_size at [] (erl:135-148).  The typed-column
    # variant uses a value constraint for the per-element failure.
    schema = {"properties": {"xs": {"items": INT | {"minimum": 0}, "maxItems": 3}}}
    assert _rows(schema, {"xs": [2, -1, 3]}) == [(("xs", "1"), E.NOT_IN_RANGE, -1)]
    assert _rows(schema, {"xs": [2, 3, 4, 5]}) == [(("xs",), E.WRONG_SIZE, {"length": 4})]


def test_positional_items_and_no_extra_items():
    # jesse: items=[S,S,S] + additionalItems false; [2,3,4,5] →
    # no_extra_items_allowed ONCE with root path (erl:151-165)
    schema = {"properties": {"xs": {"items": [INT, INT, {"minimum": 10}], "additionalItems": False}}}
    assert _rows(schema, {"xs": [2, 3, 4]}) == [(("xs", "2"), E.NOT_SCHEMA_VALID, 4)]
    assert _rows(schema, {"xs": [12, 3, 14, 5]}) == [
        (("xs",), E.NO_EXTRA_ITEMS_ALLOWED, {"length": 4})
    ]


def test_dependencies_missing():
    # jesse: {missing_dependency, <<"foo">>} with the instance as value
    # (erl:167-186); columnar: path names the depending column
    schema = {"properties": {"bar": {}, "foo": {}}, "dependencies": {"bar": ["foo"]}}
    rows = _rows(schema, {"bar": 42, "foo": None})
    assert rows == [(("bar",), E.MISSING_DEPENDENCY, 42)]


def test_dots_used_in_keys():
    # erl:191-214: property names containing dots must round-trip
    schema = {"properties": {"3.4.5.6.7": {"type": "string", "minLength": 3}}}
    assert _rows(schema, {"3.4.5.6.7": "Hello world!"}) == []
    assert _rows(schema, {"3.4.5.6.7": "x"}) == [(("3.4.5.6.7",), E.WRONG_LENGTH, "x")]


def test_empty_list_valid_against_positional_items():
    # itemsExtra: "size of items does not imply minItems"
    schema = {"properties": {"xs": {"items": [INT, INT, INT], "additionalItems": False}}}
    assert _rows(schema, {"xs": []}) == []
    assert _rows(schema, {"xs": [1, 2]}) == []
