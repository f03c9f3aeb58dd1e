"""Table-level if/then/else (ConditionalRule) — draft-7-STYLE engine
extension beyond the reference's draft-6 ceiling (the reference ignores
unknown keywords, src/jesse_validator_draft4.erl:259-260, so schemas
carrying the keywords still load there, minus the conditional).

Pure Arrow-batch tests — no Ray session needed.
"""

import pyarrow as pa

from jesse_ray import errors as E
from jesse_ray.compiler import compile_spec
from jesse_ray.spec import ColumnSpec, ConditionalRule, TableSpec, from_json_schema


def _spec(rule: ConditionalRule) -> TableSpec:
    s = TableSpec(key_column=None)
    s.conditionals.append(rule)
    return s


def _errors(compiled, tbl):
    v = compiled.check_batch(tbl)
    return [(tuple(p), e) for p, e in zip(v["path"].to_pylist(), v["error"].to_pylist())]


def test_then_branch_applies_only_where_condition_holds():
    rule = ConditionalRule(
        if_={"source": ColumnSpec(enum=["code"])},
        then_={"n_tok": ColumnSpec(maximum=100)},
        else_={"n_tok": ColumnSpec(minimum=10)},
    )
    c = compile_spec(_spec(rule))
    t = pa.table(
        {
            "source": pa.array(["code", "code", "web", "web"]),
            "n_tok": pa.array([50, 200, 5, 500], type=pa.int64()),
        }
    )
    # row1: code & 200 > 100 → then fails; row2: web & 5 < 10 → else fails
    errs = _errors(c, t)
    assert errs == [(("n_tok",), E.CONDITIONAL_NOT_VALID)] * 2
    v = c.check_batch(t)
    assert v.num_rows == 2
    # violating values are reported as the branch-column dict
    vals = sorted(v["value_json"].to_pylist())
    assert vals == ['{"n_tok":200}', '{"n_tok":5}']


def test_null_condition_value_takes_else_branch():
    rule = ConditionalRule(
        if_={"source": ColumnSpec(enum=["code"])},
        then_={},
        else_={"n_tok": ColumnSpec(minimum=10)},
    )
    c = compile_spec(_spec(rule))
    t = pa.table(
        {
            "source": pa.array([None, "code"], type=pa.string()),
            "n_tok": pa.array([5, 5], type=pa.int64()),
        }
    )
    # null source does NOT pass the condition → else branch → fails;
    # code row passes condition → empty then branch → clean
    assert _errors(c, t) == [(("n_tok",), E.CONDITIONAL_NOT_VALID)]


def test_multi_column_condition_is_conjunction():
    rule = ConditionalRule(
        if_={
            "source": ColumnSpec(enum=["code"]),
            "lang": ColumnSpec(enum=["py"]),
        },
        then_={"n_tok": ColumnSpec(maximum=10)},
    )
    c = compile_spec(_spec(rule))
    t = pa.table(
        {
            "source": pa.array(["code", "code", "web"]),
            "lang": pa.array(["py", "go", "py"]),
            "n_tok": pa.array([99, 99, 99], type=pa.int64()),
        }
    )
    # only row0 satisfies BOTH condition columns
    assert _errors(c, t) == [(("n_tok",), E.CONDITIONAL_NOT_VALID)]


def test_branch_column_missing_from_batch_fails_branch_rows():
    rule = ConditionalRule(
        if_={"source": ColumnSpec(enum=["code"])},
        then_={"stars": ColumnSpec(minimum=1)},
    )
    c = compile_spec(_spec(rule))
    t = pa.table({"source": pa.array(["code", "web"])})
    assert _errors(c, t) == [(("stars",), E.CONDITIONAL_NOT_VALID)]


def test_null_branch_value_is_vacuous():
    # presence is the job of `required`; the conditional validates VALUES
    rule = ConditionalRule(
        if_={"source": ColumnSpec(enum=["code"])},
        then_={"n_tok": ColumnSpec(maximum=10)},
    )
    c = compile_spec(_spec(rule))
    t = pa.table(
        {
            "source": pa.array(["code"]),
            "n_tok": pa.array([None], type=pa.int64()),
        }
    )
    assert _errors(c, t) == []


def test_from_json_schema_parses_if_then_else():
    schema = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": "object",
        "properties": {"source": {"type": "string"}, "n_tok": {"type": "integer"}},
        "if": {"properties": {"source": {"enum": ["code"]}}},
        "then": {"properties": {"n_tok": {"maximum": 1024}}},
        "else": {"properties": {"n_tok": {"minimum": 4}}},
    }
    spec = from_json_schema(schema)
    assert len(spec.conditionals) == 1
    r = spec.conditionals[0]
    assert set(r.if_) == {"source"} and r.if_["source"].enum == ["code"]
    assert r.then_["n_tok"].maximum == 1024
    assert r.else_["n_tok"].minimum == 4
    c = compile_spec(spec)
    t = pa.table(
        {
            "source": pa.array(["code", "web"]),
            "n_tok": pa.array([2000, 2], type=pa.int64()),
        }
    )
    errs = _errors(c, t)
    assert errs == [(("n_tok",), E.CONDITIONAL_NOT_VALID)] * 2
    # spec version hash covers the conditional (lineage-stable)
    spec2 = from_json_schema({**schema, "then": {"properties": {"n_tok": {"maximum": 9}}}})
    assert spec.version != spec2.version
