"""Draft-3/draft-6 keyword deltas, compile-time property machinery, the
external-validator hook and the allowed_errors budget (SURVEY §2.4,
§2.3 patternProperties/min-maxProperties, §2.7-§2.8).

Pure Arrow-batch tests — no Ray session needed except where noted.
"""

import numpy as np
import pyarrow as pa
import pytest

from jesse_ray import errors as E
from jesse_ray.compiler import compile_spec
from jesse_ray.oracle import validate_row
from jesse_ray.spec import (
    ColumnSpec,
    CustomCheck,
    TableSpec,
    from_json_schema,
)


def _spec_one(col, cs, key=None):
    s = TableSpec(key_column=key)
    s.columns[col] = cs
    return s


def _errors(compiled, tbl, **kw):
    v = compiled.check_batch(tbl, **kw)
    return [(tuple(p), e) for p, e in zip(v["path"].to_pylist(), v["error"].to_pylist())]


# ---------------------------------------------------------------------------
# draft-3 deltas


def test_divisible_by_basic():
    # src/jesse_validator_draft3.erl:860-869
    c = compile_spec(_spec_one("n", ColumnSpec(divisible_by=3)))
    assert _errors(c, pa.table({"n": pa.array([6, 7])})) == [(("n",), E.NOT_DIVISIBLE)]


def test_divisible_by_zero_is_data_error():
    # divisor 0 ⇒ DATA error not_divisible for every value, not schema_invalid
    c = compile_spec(_spec_one("n", ColumnSpec(divisible_by=0)))
    assert _errors(c, pa.table({"n": pa.array([1, 2])})) == [(("n",), E.NOT_DIVISIBLE)] * 2


def test_disallow_type():
    # src/jesse_validator_draft3.erl:878-889
    c = compile_spec(_spec_one("n", ColumnSpec(disallow="integer")))
    t = pa.table({"n": pa.array([1, 2], type=pa.int64())})
    assert _errors(c, t) == [(("n",), E.NOT_ALLOWED)] * 2
    c2 = compile_spec(_spec_one("s", ColumnSpec(disallow=["integer", "number"])))
    assert _errors(c2, pa.table({"s": pa.array(["a"])})) == []


def test_disallow_schema_form_union_members():
    # src/jesse_validator_draft3.erl:878-889 with the union semantics of
    # 304-328: a value is not_allowed if it matches ANY member —
    # primitive name OR embedded schema
    spec = from_json_schema(
        {"properties": {"n": {"disallow": ["string", {"minimum": 10}]}}},
        key_column=None, default_schema_ver="draft3",
    )
    c = compile_spec(spec)
    # 5 fails the {minimum:10} member and is not a string → allowed;
    # 11 validates against the schema member → not_allowed
    errs = _errors(c, pa.table({"n": pa.array([5, 11])}))
    assert errs == [(("n",), E.NOT_ALLOWED)]
    # pure-schema union (no primitive member)
    spec2 = from_json_schema(
        {"properties": {"s": {"disallow": [{"pattern": "^bad"}]}}},
        key_column=None, default_schema_ver="draft3",
    )
    c2 = compile_spec(spec2)
    errs2 = _errors(c2, pa.table({"s": pa.array(["bad apple", "good"])}))
    assert errs2 == [(("s",), E.NOT_ALLOWED)]


def test_extends_maps_to_all_of():
    # src/jesse_validator_draft3.erl:902-921
    spec = from_json_schema(
        {"properties": {"n": {"minimum": 0, "extends": {"maximum": 10}}}}
    )
    c = compile_spec(spec)
    errs = _errors(c, pa.table({"n": pa.array([5, 11, -1])}))
    # -1 violates minimum (not_in_range), 11 violates extends→allOf
    assert (("n",), E.NOT_IN_RANGE) in errs
    assert (("n",), E.ALL_SCHEMAS_NOT_VALID) in errs


# ---------------------------------------------------------------------------
# draft-6 contains


def test_contains_some_element_and_empty_fails():
    # src/jesse_validator_draft6.erl:151-156,569-587
    c = compile_spec(_spec_one("xs", ColumnSpec(contains=ColumnSpec(minimum=5))))
    t = pa.table({"xs": pa.array([[1, 6], [1, 2], []], type=pa.list_(pa.int64()))})
    assert _errors(c, t) == [(("xs",), E.DATA_INVALID)] * 2  # [1,2] and []


def test_contains_loader_and_oracle_parity():
    spec = from_json_schema({"properties": {"xs": {"contains": {"minimum": 5}}}}, key_column=None)
    c = compile_spec(spec)
    rows = [{"xs": [1, 6]}, {"xs": [1, 2]}, {"xs": []}]
    tbl = pa.table({"xs": pa.array([r["xs"] for r in rows], type=pa.list_(pa.int64()))})
    got = _errors(c, tbl)
    want = [(p, e) for r in rows for (_d, p, e, _v) in validate_row(spec, r)]
    assert got == want


# ---------------------------------------------------------------------------
# patternProperties / min-maxProperties (compile-time column machinery)


def test_pattern_properties_resolution():
    # src/jesse_validator_draft4.erl:405-426 → driver-side column match
    spec = from_json_schema(
        {"patternProperties": {"^meta_": {"type": "string", "minLength": 2}}}, key_column=None
    )
    resolved = spec.resolve_patterns(["meta_lang", "n_tok"])
    assert "meta_lang" in resolved.columns and "n_tok" not in resolved.columns
    c = compile_spec(resolved)
    t = pa.table({"meta_lang": pa.array(["en", "x"]), "n_tok": pa.array([1, 2])})
    assert _errors(c, t) == [(("meta_lang",), E.WRONG_LENGTH)]


def test_pattern_properties_merge_with_explicit_column():
    spec = from_json_schema(
        {
            "properties": {"meta_lang": {"type": "string"}},
            "patternProperties": {"^meta_": {"minLength": 2}},
        },
        key_column=None,
    )
    resolved = spec.resolve_patterns(["meta_lang"])
    c = compile_spec(resolved)
    # short value now violates the merged pattern constraint via allOf
    errs = _errors(c, pa.table({"meta_lang": pa.array(["x"])}))
    assert (("meta_lang",), E.ALL_SCHEMAS_NOT_VALID) in errs


def test_pattern_properties_relax_additional_columns_gate():
    spec = from_json_schema(
        {
            "properties": {"a": {}},
            "patternProperties": {"^meta_": {}},
            "additionalProperties": False,
        },
        key_column=None,
    )
    c = compile_spec(spec)
    c.check_schema(pa.schema([("a", pa.int64()), ("meta_x", pa.string())]))  # ok
    with pytest.raises(E.SchemaInvalidError):
        c.check_schema(pa.schema([("a", pa.int64()), ("rogue", pa.string())]))


def test_min_max_properties_column_count():
    # src/jesse_validator_draft4.erl:1073-1107 at compile time
    spec = from_json_schema({"minProperties": 2, "maxProperties": 3}, key_column=None)
    c = compile_spec(spec)
    c.check_schema(pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    with pytest.raises(E.SchemaInvalidError) as ei:
        c.check_schema(pa.schema([("a", pa.int64())]))
    assert E.TOO_FEW_PROPERTIES in str(ei.value)
    with pytest.raises(E.SchemaInvalidError) as ei:
        c.check_schema(pa.schema([(n, pa.int64()) for n in "abcd"]))
    assert E.TOO_MANY_PROPERTIES in str(ei.value)


# ---------------------------------------------------------------------------
# external_validator hook


def _even_sum_check(tbl: pa.Table) -> np.ndarray:
    import pyarrow.compute as pc

    col = tbl["xs"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    s = np.bincount(parent, weights=flat, minlength=tbl.num_rows)
    return s % 2 == 0


def test_custom_check_external_validator():
    # src/jesse.erl:71-72 → predicate appended to the compiled chain
    spec = TableSpec(key_column="id")
    spec.custom_checks.append(CustomCheck(name="even_sum", fn=_even_sum_check, column="id"))
    c = compile_spec(spec)
    t = pa.table(
        {"id": pa.array(["a", "b"]), "xs": pa.array([[1, 1], [1, 2]], type=pa.list_(pa.int64()))}
    )
    v = c.check_batch(t)
    assert v["error"].to_pylist() == [E.EXTERNAL]
    assert v["doc_id"].to_pylist() == ["b"]


# ---------------------------------------------------------------------------
# allowed_errors budget (src/jesse_error.erl:71-78)


def _multi_violation_spec():
    spec = TableSpec(key_column=None)
    # a value of -1 violates BOTH minimum and multipleOf(2)
    spec.columns["n"] = ColumnSpec(minimum=0, multiple_of=2)
    return spec


def test_allowed_errors_infinity_collects_all():
    c = compile_spec(_multi_violation_spec())
    t = pa.table({"n": pa.array([-1])})
    assert len(_errors(c, t)) == 2


def test_allowed_errors_zero_stops_at_first():
    # jesse's default: stop at the FIRST error per document
    c = compile_spec(_multi_violation_spec())
    t = pa.table({"n": pa.array([-1, -3])})
    errs = _errors(c, t, allowed_errors=0)
    assert errs == [(("n",), E.NOT_IN_RANGE)] * 2  # range check compiled first


def test_allowed_errors_budget_n():
    # N>0 collects up to N+1 errors per row (budget EXCEEDED throws in jesse)
    spec = TableSpec(key_column=None)
    spec.columns["n"] = ColumnSpec(minimum=0, multiple_of=2, maximum=-5, enum=[2, 4])
    c = compile_spec(spec)
    t = pa.table({"n": pa.array([-1])})
    all_errs = _errors(c, t)
    assert len(all_errs) >= 3
    assert len(_errors(c, t, allowed_errors=1)) == 2


def test_allowed_errors_caps_within_one_emit():
    # per-element items violations hit the same row many times; the cap
    # must apply inside a single emission unit too
    spec = TableSpec(key_column=None)
    spec.columns["xs"] = ColumnSpec(items=ColumnSpec(minimum=0))
    c = compile_spec(spec)
    t = pa.table({"xs": pa.array([[-1, -2, -3]], type=pa.list_(pa.int64()))})
    assert len(_errors(c, t)) == 3
    assert len(_errors(c, t, allowed_errors=0)) == 1
    assert len(_errors(c, t, allowed_errors=1)) == 2


# ---------------------------------------------------------------------------
# oracle parity for the new keywords


def test_oracle_parity_draft3_keywords():
    spec = TableSpec(key_column=None)
    spec.columns["n"] = ColumnSpec(divisible_by=3)
    spec.columns["s"] = ColumnSpec(disallow="string")
    c = compile_spec(spec)
    rows = [{"n": 7, "s": "bad"}, {"n": 9, "s": None}]
    tbl = pa.table(
        {"n": pa.array([r["n"] for r in rows]), "s": pa.array([r["s"] for r in rows])}
    )
    got = sorted(_errors(c, tbl))
    want = sorted((p, e) for r in rows for (_d, p, e, _v) in validate_row(spec, r))
    assert got == want


def test_schema_dialect_id_tag_enforcement():
    # src/jesse_validator_draft4.erl:84-85 / draft6.erl:86-87
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema({"$schema": "http://json-schema.org/draft-04/schema#", "$id": "x", "properties": {}})
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema({"$schema": "http://json-schema.org/draft-06/schema#", "id": "x", "properties": {}})
    from_json_schema({"$schema": "http://json-schema.org/draft-04/schema#", "id": "x", "properties": {}})
    from_json_schema({"$schema": "http://json-schema.org/draft-06/schema#", "$id": "x", "properties": {}})


def test_examples_keyword_must_be_array():
    # draft-6 examples gate (src/jesse_validator_draft6.erl:157-165)
    from_json_schema({"properties": {"x": {"examples": [1, 2]}}})
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema({"properties": {"x": {"examples": "nope"}}})


# ---------------------------------------------------------------------------
# round-2 keyword additions: propertyNames, draft-3 per-property required,
# draft-3 union types with schema members, schema-form dependencies,
# draft-6 leniencies, anyOf shortest-sub-error parity, error_handler hook


def test_property_names_gate():
    # src/jesse_validator_draft6.erl:114-125,424-436 — column names are
    # schema-side in the columnar mapping, so this is a launch gate
    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "propertyNames": {"pattern": "^[a-z_]+$", "maxLength": 8}}
    )
    c = compile_spec(s)
    c.check_schema(pa.schema([("ok_name", pa.int64()), ("also_ok", pa.string())]))
    with pytest.raises(E.SchemaInvalidError):
        c.check_schema(pa.schema([("BadName", pa.int64())]))
    with pytest.raises(E.SchemaInvalidError):
        c.check_schema(pa.schema([("waytoolongname", pa.int64())]))


def test_draft3_per_property_required():
    # src/jesse_validator_draft3.erl:346-383
    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-03/schema#",
         "properties": {"a": {"type": "string", "required": True},
                        "b": {"type": "string", "required": False}}}
    )
    c = compile_spec(s)
    t = pa.table({"a": pa.array(["x", None]), "b": pa.array([None, None], type=pa.string())})
    assert _errors(c, t) == [(("a",), E.MISSING_REQUIRED_PROPERTY)]


def test_draft3_union_type_with_schema():
    # src/jesse_validator_draft3.erl:295-328: value passes if any
    # primitive matches OR any embedded schema validates
    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-03/schema#",
         "properties": {"a": {"type": ["integer", {"type": "string", "pattern": "^ok"}]}}}
    )
    c = compile_spec(s)
    t = pa.table({"a": pa.array(["okay", "nope"])})
    assert _errors(c, t) == [(("a",), E.WRONG_TYPE)]
    t2 = pa.table({"a": pa.array([1, 2], type=pa.int64())})
    assert _errors(c, t2) == []


def test_schema_form_dependencies():
    # src/jesse_validator_draft4.erl:656-668: col present => the row
    # must satisfy the dependent schema; child errors propagate
    s = from_json_schema(
        {"properties": {"a": {"type": "string"}},
         "dependencies": {"a": {"properties": {"b": {"type": "integer", "minimum": 5}},
                                "required": ["b"]}}}
    )
    c = compile_spec(s)
    t = pa.table(
        {"a": pa.array(["p", None, "q", "r"]),
         "b": pa.array([3, None, None, 7], type=pa.int64())}
    )
    errs = sorted(_errors(c, t))
    # row0: b=3 fails minimum; row1: a absent, dep not triggered;
    # row2: b missing; row3: clean
    assert errs == [(("b",), E.MISSING_REQUIRED_PROPERTY), (("b",), E.NOT_IN_RANGE)]
    # invalid_row_mask agrees
    bad = c.invalid_row_mask(t)
    assert bad.tolist() == [True, False, True, False]


def test_draft6_required_empty_allowed():
    # src/jesse_validator_draft6.erl:1019-1023 vs draft-4's non-empty rule
    from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "properties": {"a": {}}, "required": []}
    )
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema({"properties": {"a": {}}, "required": []})


def test_draft6_integer_accepts_float_with_zero_fraction():
    # src/jesse_validator_draft6.erl:344-355; draft-4 still rejects
    d6 = compile_spec(from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "properties": {"a": {"type": "integer"}}}
    ))
    t = pa.table({"a": pa.array([1.0, 1.5])})
    assert _errors(d6, t) == [(("a",), E.WRONG_TYPE)]
    d4 = compile_spec(from_json_schema({"properties": {"a": {"type": "integer"}}}))
    assert _errors(d4, t) == [(("a",), E.WRONG_TYPE)] * 2


def test_anyof_shortest_sub_errors():
    # src/jesse_validator_draft4.erl:1156-1179,1365-1373: the child with
    # the fewest errors is reported next to the atom (ties keep the
    # earlier sub); value_json embeds that child error list
    import json as _json

    s = _spec_one(
        "a",
        ColumnSpec(any_of=[
            ColumnSpec(type="string", pattern="^x", min_length=10),
            ColumnSpec(type="string", pattern="^y"),
        ]),
    )
    c = compile_spec(s)
    v = c.check_batch(pa.table({"a": pa.array(["nope"])}))
    assert v["error"].to_pylist() == [E.ANY_SCHEMAS_NOT_VALID]
    payload = _json.loads(v["value_json"][0].as_py())
    assert payload["value"] == "nope"
    # second sub fails only the pattern (1 error) vs first sub's 2
    assert payload["shortest_errors"] == [E.NO_MATCH]


def _cap_one_handler(viol, allowed):
    """Example error_handler: keep at most one violation per batch."""
    return viol.slice(0, 1)


def test_error_handler_hook():
    # src/jesse.erl:61-66 (default src/jesse_error.erl:67-78): pluggable
    # per-batch violation sink — here capping, like a custom budget
    s = _spec_one("a", ColumnSpec(type="string", pattern="^x", min_length=10))
    c = compile_spec(s)
    t = pa.table({"a": pa.array(["no", "nope"])})
    assert c.check_batch(t).num_rows == 4
    assert c.check_batch(t, error_handler=_cap_one_handler).num_rows == 1

    class Abort(Exception):
        pass

    def raising(viol, allowed):
        if viol.num_rows:
            raise Abort()
        return viol

    with pytest.raises(Abort):
        c.check_batch(t, error_handler=raising)


def test_default_and_meta_schema_ver():
    # default_schema_ver picks the dialect for untagged schemas;
    # meta_schema_ver gates a mismatched dialect (src/jesse.erl:94-102)
    s = from_json_schema(
        {"properties": {"a": {"type": "integer"}}},
        default_schema_ver="draft6",
    )
    assert s.dialect == "draft6"
    c = compile_spec(s)
    assert _errors(c, pa.table({"a": pa.array([2.0])})) == []

    from_json_schema(
        {"$schema": "http://json-schema.org/draft-04/schema#", "properties": {}},
        meta_schema_ver="draft4",
    )
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema(
            {"$schema": "http://json-schema.org/draft-04/schema#", "properties": {}},
            meta_schema_ver="draft6",
        )


def test_new_keywords_engine_oracle_parity():
    """Engine ↔ single-row-oracle parity for the round-2 keywords:
    draft-6 integer leniency, draft-3 union schema members, schema-form
    dependencies."""
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "properties": {
             "a": {"type": "integer"},
             "b": {"type": ["integer", {"type": "string", "pattern": "^ok"}]},
         },
         "dependencies": {"a": {"properties": {"c": {"minimum": 5}}}}},
        key_column="k",
    )
    c = compile_spec(s)
    rows = [
        {"k": "r0", "a": 1.0, "b": "okay", "c": 9},
        {"k": "r1", "a": 1.5, "b": "nope", "c": 3},
        {"k": "r2", "a": None, "b": 7, "c": 1},
        {"k": "r3", "a": 2, "b": 2.5, "c": 5},
    ]
    # column b is mixed-type in python; Arrow forces one type per column,
    # so the typed-table parity check covers k/a/c only (b's union-schema
    # behavior is covered by test_draft3_union_type_with_schema)
    t = pa.table(
        {
            "k": pa.array([r["k"] for r in rows]),
            "a": pa.array([r["a"] for r in rows], type=pa.float64()),
            "c": pa.array([r["c"] for r in rows], type=pa.int64()),
        }
    )
    got = {
        (d, tuple(p), e)
        for d, p, e in zip(
            *(c.check_batch(t)[x].to_pylist() for x in ("doc_id", "path", "error"))
        )
    }
    want = set()
    for r in rows:
        rr = {k: v for k, v in r.items() if k != "b"}
        # Arrow float64 column: ints become floats in the oracle's view
        rr["a"] = None if rr["a"] is None else float(rr["a"])
        for d, p, e, _v in validate_row(s, rr):
            if p[0] != "b":
                want.add((d, p, e))
    assert got == want, (got, want)


def test_property_names_gate_through_validate(ray_session):
    """The propertyNames gate must fire through the normal validate()
    entry point, not only when check_schema is called directly."""
    import ray.data

    from jesse_ray.engine import validate_dataset

    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "propertyNames": {"pattern": "^[a-z_]+$"}},
        key_column=None,
    )
    t = pa.table({"BadName": pa.array([1, 2], type=pa.int64())})
    with pytest.raises(E.SchemaInvalidError):
        validate_dataset(ray.data.from_arrow(t), s)
    ok = pa.table({"fine": pa.array([1], type=pa.int64())})
    res = validate_dataset(ray.data.from_arrow(ok), s)
    assert res.passed


def test_draft4_ignores_draft3_required_and_propertynames():
    """Draft-4 schemas must IGNORE boolean per-property required and
    propertyNames (unknown-keyword rule) — they are draft-3/6 keywords."""
    s = from_json_schema(
        {"properties": {"a": {"type": "string", "required": True}},
         "propertyNames": {"pattern": "^[a-z]+$"}}
    )
    assert not s.columns["a"].required
    assert s.property_names is None


def test_remote_file_ref(tmp_path):
    """Non-local $ref resolves through the schema loader at compile time
    (src/jesse_database.erl:305-336) — file:// works without egress."""
    import json as _json

    remote = tmp_path / "remote.json"
    remote.write_text(_json.dumps(
        {"definitions": {"pos": {"type": "integer", "minimum": 1}},
         "type": "integer", "minimum": 0}
    ))
    # whole-document ref
    s = from_json_schema({"properties": {"a": {"$ref": f"file://{remote}"}}})
    c = compile_spec(s)
    assert _errors(c, pa.table({"a": pa.array([-1, 2])})) == [(("a",), E.NOT_IN_RANGE)]
    # fragment into the remote document
    s2 = from_json_schema({"properties": {"a": {"$ref": f"file://{remote}#/definitions/pos"}}})
    c2 = compile_spec(s2)
    assert _errors(c2, pa.table({"a": pa.array([0, 1])})) == [(("a",), E.NOT_IN_RANGE)]
    with pytest.raises(E.SchemaInvalidError):
        from_json_schema({"properties": {"a": {"$ref": "file:///nonexistent.json"}}})


def test_remote_ref_nested_local_refs(tmp_path):
    """Local $refs nested inside a remotely-loaded schema resolve
    against the REMOTE document, not the including schema's root."""
    import json as _json

    remote = tmp_path / "remote.json"
    remote.write_text(_json.dumps(
        {"defs": {"pos": {"type": "integer", "minimum": 1},
                  "arr": {"items": {"$ref": "#/defs/pos"}}}}
    ))
    # main schema has a SAME-NAMED definition with different semantics:
    # it must NOT be used
    s = from_json_schema(
        {"definitions": {"pos": {"maximum": 0}},
         "properties": {"a": {"$ref": f"file://{remote}#/defs/arr"}}}
    )
    c = compile_spec(s)
    t = pa.table({"a": pa.array([[2, 3], [0, 2]], type=pa.list_(pa.int64()))})
    errs = _errors(c, t)
    # [0,2]: element 0 violates the REMOTE minimum-1 (not_in_range);
    # the main schema's same-named maximum-0 would have flagged
    # element 2 at path ('a','1') instead
    assert errs == [(("a", "0"), E.NOT_IN_RANGE)]


def test_nested_struct_properties():
    """Nested object properties on a STRUCT column: per-property
    keyword descent, required list, absent-field skip
    (src/jesse_validator_draft4.erl:380-400,1044-1058)."""
    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {"lang": {"type": "string", "pattern": "^[a-z]{2}$"},
                           "score": {"minimum": 0}},
            "required": ["lang"],
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    t = pa.table({
        "meta": pa.array(
            [{"lang": "en", "score": 1},
             {"lang": "ENG", "score": -2},
             {"lang": None, "score": 3},
             None],
            type=pa.struct([("lang", pa.string()), ("score", pa.int64())]),
        )
    })
    errs = sorted(_errors(c, t))
    assert errs == sorted([
        (("meta", "lang"), E.NO_MATCH),          # row 1 pattern
        (("meta", "score"), E.NOT_IN_RANGE),     # row 1 minimum
        (("meta", "lang"), E.MISSING_REQUIRED_PROPERTY),  # row 2 lang null
    ])


def test_nested_struct_engine_oracle_parity():
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {"lang": {"pattern": "^[a-z]{2}$"}, "score": {"minimum": 0}},
            "required": ["lang"],
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    rows = [
        {"meta": {"lang": "en", "score": 1}},
        {"meta": {"lang": "ENG", "score": -2}},
        {"meta": {"lang": None, "score": 3}},
        {"meta": None},
    ]
    t = pa.table({
        "meta": pa.array([r["meta"] for r in rows],
                         type=pa.struct([("lang", pa.string()), ("score", pa.int64())]))
    })
    got = sorted(_errors(c, t))
    want = sorted((tuple(p), e) for r in rows for _d, p, e, _v in validate_row(s, r))
    assert got == want


def test_nested_struct_additional_properties():
    """Nested additionalProperties:false — undeclared struct fields are
    no_extra_properties_allowed for every present row
    (src/jesse_validator_draft4.erl:431-507)."""
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {"lang": {"type": "string"}},
            "additionalProperties": False,
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    t = pa.table({
        "meta": pa.array(
            [{"lang": "en", "rogue": 1}, None],
            type=pa.struct([("lang", pa.string()), ("rogue", pa.int64())]),
        )
    })
    errs = _errors(c, t)
    assert errs == [(("meta",), E.NO_EXTRA_PROPERTIES_ALLOWED)]
    # oracle parity
    rows = [{"meta": {"lang": "en", "rogue": 1}}, {"meta": None}]
    want = sorted((tuple(p), e) for r in rows for _d, p, e, _v in validate_row(s, r))
    assert sorted(errs) == want
    # declared-only struct passes
    t2 = pa.table({"meta": pa.array([{"lang": "en"}], type=pa.struct([("lang", pa.string())]))})
    assert _errors(c, t2) == []


def test_nested_struct_pattern_properties():
    """Nested patternProperties: name-matched struct fields validate the
    pattern's sub-schema and count as declared for
    additionalProperties:false (src/jesse_validator_draft4.erl:405-507)."""
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {"lang": {"type": "string"}},
            "patternProperties": {"^x_": {"minimum": 0}},
            "additionalProperties": False,
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    typ = pa.struct([("lang", pa.string()), ("x_score", pa.int64()), ("rogue", pa.int64())])
    t = pa.table({"meta": pa.array(
        [{"lang": "en", "x_score": 3, "rogue": 7},
         {"lang": "en", "x_score": -1, "rogue": None}], type=typ)})
    errs = sorted(_errors(c, t))
    # rogue is undeclared (x_score is pattern-declared): row 0 CARRIES it
    # (non-null) → additionalProperties fails; row 1's rogue is null ≡
    # absent → only the pattern-schema minimum fires
    assert errs == sorted([
        (("meta",), E.NO_EXTRA_PROPERTIES_ALLOWED),
        (("meta", "x_score"), E.NOT_IN_RANGE),
    ])
    # oracle parity (dict rows carry all struct keys, as Arrow rows do)
    rows = [{"meta": {"lang": "en", "x_score": 3, "rogue": 7}},
            {"meta": {"lang": "en", "x_score": -1, "rogue": None}}]
    want = sorted((tuple(p), e) for r in rows for _d, p, e, _v in validate_row(s, r))
    assert errs == want


def test_deeply_nested_struct_and_list_descent():
    """Two-level struct nesting and list items inside nested properties
    get FULL path descent and the right atoms (regression for the
    coarse roll-up that missed depth-2 violations entirely)."""
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {
                "inner": {"type": "object",
                          "properties": {"score": {"minimum": 0}}},
                "tags": {"items": {"minimum": 0}},
            },
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    typ = pa.struct([
        ("inner", pa.struct([("score", pa.int64())])),
        ("tags", pa.list_(pa.int64())),
    ])
    t = pa.table({"meta": pa.array(
        [{"inner": {"score": -5}, "tags": [1, -2]},
         {"inner": {"score": 3}, "tags": []},
         {"inner": None, "tags": None}], type=typ)})
    errs = sorted(_errors(c, t))
    assert errs == sorted([
        (("meta", "inner", "score"), E.NOT_IN_RANGE),
        (("meta", "tags", "1"), E.NOT_IN_RANGE),
    ])
    # invalid_row_mask agrees (depth-2 violations fail the verdict)
    assert c.invalid_row_mask(t).tolist() == [True, False, False]
    # oracle parity
    rows = [{"meta": {"inner": {"score": -5}, "tags": [1, -2]}},
            {"meta": {"inner": {"score": 3}, "tags": []}},
            {"meta": {"inner": None, "tags": None}}]
    want = sorted((tuple(p), e) for r in rows for _d, p, e, _v in validate_row(s, r))
    assert errs == want


def test_nested_dialect_propagates_to_oracle_and_engine():
    """Draft-6 leniency must apply INSIDE nested structs on both sides
    (regression: the oracle's nested descent dropped the dialect)."""
    from jesse_ray.oracle import validate_row

    s = from_json_schema(
        {"$schema": "http://json-schema.org/draft-06/schema#",
         "properties": {"meta": {
             "type": "object",
             "properties": {"score": {"type": "integer"}},
         }}},
        key_column=None,
    )
    c = compile_spec(s)
    t = pa.table({"meta": pa.array(
        [{"score": 1.0}, {"score": 1.5}],
        type=pa.struct([("score", pa.float64())]))})
    errs = _errors(c, t)
    assert errs == [(("meta", "score"), E.WRONG_TYPE)]  # only 1.5
    rows = [{"meta": {"score": 1.0}}, {"meta": {"score": 1.5}}]
    want = [(tuple(p), e) for r in rows for _d, p, e, _v in validate_row(s, r)]
    assert errs == want


def test_nested_extra_props_per_row_record():
    """no_extra_properties_allowed value_json lists only the extras the
    ROW carries (regression: static type-level list)."""
    import json as _json

    s = from_json_schema(
        {"properties": {"meta": {
            "type": "object",
            "properties": {"lang": {}},
            "additionalProperties": False,
        }}},
        key_column=None,
    )
    c = compile_spec(s)
    typ = pa.struct([("lang", pa.string()), ("r1", pa.int64()), ("r2", pa.int64())])
    t = pa.table({"meta": pa.array(
        [{"lang": "en", "r1": 5, "r2": None},
         {"lang": "en", "r1": 1, "r2": 2}], type=typ)})
    v = c.check_batch(t)
    got = sorted(_json.loads(x)["extraProperties"] for x in v["value_json"].to_pylist())
    assert got == [["r1"], ["r1", "r2"]]
