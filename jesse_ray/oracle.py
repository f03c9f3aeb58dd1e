"""Single-row reference oracle — a pure-Python draft-04 walk.

Used ONLY in tests: validates one row dict at a time with the same
keyword semantics, error atoms and path convention as the reference's
recursive validator (src/jesse_validator_draft4.erl), so the vectorized
engine's violation rows can be checked record-for-record against an
independent implementation (SURVEY §5.2 "reference-pass parity").
"""

from __future__ import annotations

import json
import re
from typing import Any

from jesse_ray import errors as E
from jesse_ray.compiler import _canon_key, _json_val
from jesse_ray.spec import ColumnSpec, TableSpec


def _norm_num(v: Any):
    # cross-numeric + structural deep equality (src/jesse_lib.erl:148-261):
    # shared canonicalization with the vectorized engine
    return _canon_key(v)


def _type_of(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "unknown"


def _type_ok(spec_type, v, dialect: str = "draft4") -> bool:
    types = [spec_type] if isinstance(spec_type, str) else list(spec_type)
    t = _type_of(v)
    for want in types:
        if want == "any" or want == t or (want == "number" and t == "integer"):
            return True
        if (
            want == "integer"
            and t == "number"
            and dialect == "draft6"
            and float(v) == int(v)
        ):
            # draft-6: float with zero fraction is a valid integer
            # (src/jesse_validator_draft6.erl:344-355)
            return True
    return False


def _type_keyword_ok(cs: ColumnSpec, v, dialect: str = "draft4") -> bool:
    """`type` including draft-3 union schema members
    (src/jesse_validator_draft3.erl:304-328)."""
    if cs.type is not None and _type_ok(cs.type, v, dialect):
        return True
    if cs.type_schemas:
        return any(_spec_valid(s, v, dialect) for s in cs.type_schemas)
    return cs.type is None and not cs.type_schemas


def _spec_valid(cs: ColumnSpec, v: Any, dialect: str = "draft4") -> bool:
    """All keywords pass for value v (v is present/non-null)."""
    if (cs.type is not None or cs.type_schemas) and not _type_keyword_ok(cs, v, dialect):
        return False
    if cs.enum is not None and _norm_num(v) not in {_norm_num(e) for e in cs.enum}:
        return False
    if cs.has_const and _norm_num(v) != _norm_num(cs.const):
        return False
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if cs.minimum is not None:
            if v < cs.minimum or (cs.exclusive_minimum and v == cs.minimum):
                return False
        if cs.maximum is not None:
            if v > cs.maximum or (cs.exclusive_maximum and v == cs.maximum):
                return False
        if cs.multiple_of is not None:
            q = v / cs.multiple_of
            if (q - int(q)) * cs.multiple_of != 0.0:
                return False
    if isinstance(v, str):
        if cs.pattern is not None and not re.search(cs.pattern, v):
            return False
        if cs.min_length is not None and len(v) < cs.min_length:
            return False
        if cs.max_length is not None and len(v) > cs.max_length:
            return False
    if isinstance(v, (list, tuple)):
        if cs.min_items is not None and len(v) < cs.min_items:
            return False
        if cs.max_items is not None and len(v) > cs.max_items:
            return False
        if cs.unique_items:
            seen = [_norm_num(x) for x in v]
            if len(set(seen)) != len(seen):
                return False
        if cs.items is not None and any(x is not None and not _spec_valid(cs.items, x, dialect) for x in v):
            return False
        if cs.items_positional is not None:
            for i, x in enumerate(v):
                if i < len(cs.items_positional):
                    if x is not None and not _spec_valid(cs.items_positional[i], x, dialect):
                        return False
                elif cs.items_positional is not None:
                    if cs.additional_items is False:
                        return False
                    if hasattr(cs.additional_items, "type") and x is not None and not _spec_valid(cs.additional_items, x, dialect):
                        return False
    if cs.all_of and not all(_spec_valid(s, v, dialect) for s in cs.all_of):
        return False
    if cs.any_of and not any(_spec_valid(s, v, dialect) for s in cs.any_of):
        return False
    if cs.one_of and sum(_spec_valid(s, v, dialect) for s in cs.one_of) != 1:
        return False
    if cs.not_ is not None and _spec_valid(cs.not_, v, dialect):
        return False
    if cs.divisible_by is not None and isinstance(v, (int, float)) and not isinstance(v, bool):
        if cs.divisible_by == 0:
            return False
        q = v / cs.divisible_by
        if (q - int(q)) * cs.divisible_by != 0.0:
            return False
    if cs.disallow is not None and _type_ok(cs.disallow, v):
        return False
    if cs.contains is not None and isinstance(v, (list, tuple)):
        if not any(x is not None and _spec_valid(cs.contains, x, dialect) for x in v):
            return False
    if isinstance(v, dict) and (cs.properties or cs.required_props or cs.pattern_props
                                or not cs.additional_props_allowed):
        for prop, sub in (cs.properties or {}).items():
            pv = v.get(prop)
            if pv is not None and not _spec_valid(sub, pv, dialect):
                return False
        for prop in cs.required_props or []:
            if v.get(prop) is None:
                return False
        for pat, sub in (cs.pattern_props or {}).items():
            rx = re.compile(pat)
            for k, pv in v.items():
                if pv is not None and rx.search(k) and not _spec_valid(sub, pv, dialect):
                    return False
        if not cs.additional_props_allowed:
            pats = [re.compile(p) for p in (cs.pattern_props or {})]
            if any(
                kv is not None
                and k not in (cs.properties or {})
                and not any(rx.search(k) for rx in pats)
                for k, kv in v.items()
            ):
                return False
    return True


def validate_row(spec: TableSpec, row: dict[str, Any]) -> list[tuple]:
    """Returns violation tuples (doc_id, path_tuple, error, value_json)
    in the same convention as the engine's violation rows."""
    out: list[tuple] = []
    key = spec.key_column
    doc = row.get(key) if key else None
    doc = None if doc is None else str(doc)

    def emit(path: list[str], error: str, value: Any):
        out.append((doc, tuple(path), error, _json_val(value)))

    dialect = getattr(spec, "dialect", "draft4")
    for col, cs in spec.columns.items():
        v = row.get(col)
        if v is None:
            if cs.required:
                emit([col], E.MISSING_REQUIRED_PROPERTY, None)
            continue
        if (cs.type is not None or cs.type_schemas) and not _type_keyword_ok(cs, v, dialect):
            emit([col], E.WRONG_TYPE, v)
        if cs.enum is not None and _norm_num(v) not in {_norm_num(e) for e in cs.enum}:
            emit([col], E.NOT_IN_ENUM, v)
        if cs.has_const and _norm_num(v) != _norm_num(cs.const):
            emit([col], E.NOT_IN_ENUM, v)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            if cs.minimum is not None or cs.maximum is not None:
                bad = False
                if cs.minimum is not None and (v < cs.minimum or (cs.exclusive_minimum and v == cs.minimum)):
                    bad = True
                if cs.maximum is not None and (v > cs.maximum or (cs.exclusive_maximum and v == cs.maximum)):
                    bad = True
                if bad:
                    emit([col], E.NOT_IN_RANGE, v)
            if cs.multiple_of is not None:
                q = v / cs.multiple_of
                if (q - int(q)) * cs.multiple_of != 0.0:
                    emit([col], E.NOT_MULTIPLE_OF, v)
        if isinstance(v, str):
            if cs.pattern is not None and not re.search(cs.pattern, v):
                emit([col], E.NO_MATCH, v)
            if (cs.min_length is not None and len(v) < cs.min_length) or (
                cs.max_length is not None and len(v) > cs.max_length
            ):
                emit([col], E.WRONG_LENGTH, v)
        if isinstance(v, (list, tuple)):
            if (cs.min_items is not None and len(v) < cs.min_items) or (
                cs.max_items is not None and len(v) > cs.max_items
            ):
                emit([col], E.WRONG_SIZE, {"length": len(v)})
            if cs.unique_items:
                seen: set = set()
                for x in v:
                    k = _norm_num(x)
                    if k in seen:
                        emit([col], E.NOT_UNIQUE, x)
                        break
                    seen.add(k)
            if cs.items is not None:
                err = (
                    E.NOT_IN_RANGE
                    if (cs.items.minimum is not None or cs.items.maximum is not None)
                    else E.NOT_SCHEMA_VALID
                )
                for i, x in enumerate(v):
                    if x is not None and not _spec_valid(cs.items, x, dialect):
                        emit([col, str(i)], err, x)
            if cs.items_positional is not None:
                emitted_extra = False
                for i, x in enumerate(v):
                    if i < len(cs.items_positional):
                        if x is not None and not _spec_valid(cs.items_positional[i], x, dialect):
                            emit([col, str(i)], E.NOT_SCHEMA_VALID, x)
                    elif cs.additional_items is False:
                        if not emitted_extra:  # one per array, as the reference
                            emit([col], E.NO_EXTRA_ITEMS_ALLOWED, {"length": len(v)})
                            emitted_extra = True
                    elif hasattr(cs.additional_items, "type"):
                        if x is not None and not _spec_valid(cs.additional_items, x, dialect):
                            emit([col, str(i)], E.NOT_SCHEMA_VALID, x)
        if cs.all_of and not all(_spec_valid(s, v, dialect) for s in cs.all_of):
            emit([col], E.ALL_SCHEMAS_NOT_VALID, v)
        if cs.any_of and not any(_spec_valid(s, v, dialect) for s in cs.any_of):
            emit([col], E.ANY_SCHEMAS_NOT_VALID, v)
        if cs.one_of:
            cnt = sum(_spec_valid(s, v, dialect) for s in cs.one_of)
            if cnt == 0:
                emit([col], E.NOT_ONE_SCHEMA_VALID, v)
            elif cnt > 1:
                emit([col], E.MORE_THAN_ONE_SCHEMA_VALID, v)
        if cs.not_ is not None and _spec_valid(cs.not_, v, dialect):
            emit([col], E.NOT_SCHEMA_VALID, v)
        if cs.divisible_by is not None and isinstance(v, (int, float)) and not isinstance(v, bool):
            bad = cs.divisible_by == 0
            if not bad:
                q = v / cs.divisible_by
                bad = (q - int(q)) * cs.divisible_by != 0.0
            if bad:
                emit([col], E.NOT_DIVISIBLE, v)
        if cs.disallow is not None and _type_ok(cs.disallow, v):
            emit([col], E.NOT_ALLOWED, v)
        if cs.contains is not None and isinstance(v, (list, tuple)):
            if not any(x is not None and _spec_valid(cs.contains, x, dialect) for x in v):
                emit([col], E.DATA_INVALID, {"length": len(v)})
        if isinstance(v, dict) and (cs.properties or cs.required_props or cs.pattern_props
                                    or not cs.additional_props_allowed):
            # nested object properties: per-property descent with the
            # same keyword atoms, path gains the property name
            # (src/jesse_validator_draft4.erl:380-400)
            for prop, sub in (cs.properties or {}).items():
                pv = v.get(prop)
                if pv is None:
                    continue
                nested = TableSpec(key_column=None, dialect=dialect)
                nested.columns[prop] = sub
                for _d, p, e, val in validate_row(nested, {prop: pv}):
                    emit([col, *p], e, json.loads(val))
            for prop in cs.required_props or []:
                if v.get(prop) is None:
                    emit([col, prop], E.MISSING_REQUIRED_PROPERTY, None)
            for pat, sub in (cs.pattern_props or {}).items():
                rx = re.compile(pat)
                for k, pv in v.items():
                    if pv is None or not rx.search(k):
                        continue
                    nested = TableSpec(key_column=None, dialect=dialect)
                    nested.columns[k] = sub
                    for _d, p, e, val in validate_row(nested, {k: pv}):
                        emit([col, *p], e, json.loads(val))
            if not cs.additional_props_allowed:
                pats = [re.compile(p) for p in (cs.pattern_props or {})]
                # a None value is an ABSENT property (presence semantics)
                extra = sorted(
                    k for k, kv in v.items()
                    if kv is not None
                    and k not in (cs.properties or {})
                    and not any(rx.search(k) for rx in pats)
                )
                if extra:
                    emit([col], E.NO_EXTRA_PROPERTIES_ALLOWED, {"extraProperties": extra})

    for rule in spec.consistency:
        lv, rv = row.get(rule.left), row.get(rule.right)
        if lv is None or rv is None:
            continue
        ln = len(lv)
        if float(ln) != float(rv):
            emit([rule.left], rule.error_atom, {"len": ln, rule.right: int(rv)})

    for col, needs in spec.dependencies.items():
        v = row.get(col)
        if v is None:
            continue
        for dep in needs:
            if row.get(dep) is None:
                emit([col], E.MISSING_DEPENDENCY, v)
                break

    for col, sub in getattr(spec, "schema_dependencies", {}).items():
        # schema-form dependencies: col present => the row validates the
        # dependent sub-spec; child violations propagate
        # (src/jesse_validator_draft4.erl:656-668)
        if row.get(col) is None:
            continue
        out.extend(validate_row(sub, row))

    for r in spec.referential:
        v = row.get(r.column)
        if v is None:
            continue
        allowed = r.values
        if allowed is not None and v not in allowed:
            out.append((doc, (r.column,), r.error_atom, json.dumps(v, ensure_ascii=False)))

    return out
