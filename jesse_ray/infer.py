"""Spec inference: profile a corpus into the tightest TableSpec it
passes — the "profile → propose → verify" loop data teams run before
wiring a validator into a pipeline (the reference has no analogue; this
feeds its keyword set: inferred constraints are ordinary draft-04
keywords, src/jesse_validator_draft4.erl keyword-for-keyword via
spec.ColumnSpec).

One streaming pass, one small row per (batch, column) to the driver:
null counts, numeric min/max, string codepoint-length bounds, list
length + element bounds, and a CAPPED distinct-string sample (per-batch
Arrow ``unique``; if the union exceeds ``enum_max`` the enum hypothesis
is dropped — never a corpus-wide distinct shuffle).  Uniqueness of the
key column is emitted as a HYPOTHESIS (``unique_keys``) for the
validator to confirm — inference never claims what it did not check.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from jesse_ray.spec import ColumnSpec, TableSpec


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


_ARROW_TYPE_NAMES = (
    (pa.types.is_integer, "integer"),
    (pa.types.is_floating, "number"),
    (pa.types.is_string, "string"),
    (pa.types.is_large_string, "string"),
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_list, "array"),
    (pa.types.is_large_list, "array"),
    (pa.types.is_struct, "object"),
)


def _json_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TYPE_NAMES:
        if pred(t):
            return name
    return "any"


def infer_spec(
    ds: Dataset,
    *,
    key_column: Optional[str] = None,
    enum_max: int = 64,
    batch_size: int = 65536,
) -> tuple[TableSpec, pa.Table]:
    """Returns ``(spec, constraints)``: the inferred TableSpec and a
    flat evidence table ``(column, constraint, value)`` (strings) of
    every constraint that was DERIVED from data — type rows excluded
    (they restate the Arrow schema), uniqueness excluded (a hypothesis,
    not an observation)."""
    schema = ds.schema(fetch_if_missing=True)
    arrow_schema = getattr(schema, "base_schema", None)
    if not isinstance(arrow_schema, pa.Schema):
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=256):
            arrow_schema = b.schema
            break
    cols = list(arrow_schema.names)
    types = {f.name: f.type for f in arrow_schema}

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "nn": [], "mn": [], "mx": [], "lmn": [], "lmx": [],
                "imn": [], "imx": [], "smn": [], "smx": [], "uniq": []}
        for c in cols:
            a = _combine(batch[c])
            rows["col"].append(c)
            rows["nn"].append(a.null_count)
            mn = mx = lmn = lmx = imn = imx = smn = smx = None
            uniq: list = []
            nonnull = a.drop_null()
            if len(nonnull):
                t = a.type
                if pa.types.is_integer(t) or pa.types.is_floating(t):
                    mn = float(pc.min(nonnull).as_py())
                    mx = float(pc.max(nonnull).as_py())
                elif pa.types.is_string(t) or pa.types.is_large_string(t):
                    ln = pc.utf8_length(nonnull)
                    smn = int(pc.min(ln).as_py())
                    smx = int(pc.max(ln).as_py())
                    u = pc.unique(nonnull)
                    # None (null list) = overflow marker; a list (even
                    # empty) = the batch's distinct values, complete
                    uniq = u.to_pylist() if len(u) <= enum_max else None
                elif pa.types.is_list(t) or pa.types.is_large_list(t):
                    ln = pc.list_value_length(nonnull)
                    lmn = int(pc.min(ln).as_py())
                    lmx = int(pc.max(ln).as_py())
                    flat = pc.list_flatten(nonnull).drop_null()
                    if len(flat) and (pa.types.is_integer(flat.type)
                                      or pa.types.is_floating(flat.type)):
                        imn = float(pc.min(flat).as_py())
                        imx = float(pc.max(flat).as_py())
            rows["mn"].append(mn)
            rows["mx"].append(mx)
            rows["lmn"].append(lmn)
            rows["lmx"].append(lmx)
            rows["imn"].append(imn)
            rows["imx"].append(imx)
            rows["smn"].append(smn)
            rows["smx"].append(smx)
            rows["uniq"].append(uniq)
        return pa.table({
            "col": pa.array(rows["col"]),
            "nn": pa.array(rows["nn"], type=pa.int64()),
            "mn": pa.array(rows["mn"], type=pa.float64()),
            "mx": pa.array(rows["mx"], type=pa.float64()),
            "lmn": pa.array(rows["lmn"], type=pa.int64()),
            "lmx": pa.array(rows["lmx"], type=pa.int64()),
            "imn": pa.array(rows["imn"], type=pa.float64()),
            "imx": pa.array(rows["imx"], type=pa.float64()),
            "smn": pa.array(rows["smn"], type=pa.int64()),
            "smx": pa.array(rows["smx"], type=pa.int64()),
            "uniq": pa.array(rows["uniq"], type=pa.list_(pa.string())),
        })

    acc: dict[str, dict] = {c: {"nn": 0, "mn": None, "mx": None, "lmn": None,
                                "lmx": None, "imn": None, "imx": None,
                                "smn": None, "smx": None,
                                "uniq": set(), "enum_ok": True} for c in cols}
    stats = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=batch_size)
    for b in stats.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            s = acc[r["col"]]
            s["nn"] += r["nn"]
            for k, pick in (("mn", min), ("mx", max), ("lmn", min), ("lmx", max),
                            ("imn", min), ("imx", max), ("smn", min), ("smx", max)):
                if r[k] is not None:
                    s[k] = r[k] if s[k] is None else pick(s[k], r[k])
            strtype = (pa.types.is_string(types[r["col"]])
                       or pa.types.is_large_string(types[r["col"]]))
            if s["enum_ok"] and strtype:
                if r["uniq"] is None:  # per-batch overflow marker
                    s["uniq"].clear()
                    s["enum_ok"] = False
                else:
                    s["uniq"].update(r["uniq"])
                    if len(s["uniq"]) > enum_max:
                        s["uniq"].clear()
                        s["enum_ok"] = False

    spec = TableSpec(columns={}, key_column=key_column, name="inferred")
    ev_rows: list[tuple[str, str, str]] = []
    for c in cols:
        s = acc[c]
        t = types[c]
        cs = ColumnSpec(type=_json_type(t))
        if s["nn"] == 0:
            cs.required = True
            ev_rows.append((c, "required", "true"))
        if s["mn"] is not None:
            cs.minimum, cs.maximum = s["mn"], s["mx"]
            as_str = (lambda v: str(int(v))) if pa.types.is_integer(t) else str
            ev_rows.append((c, "minimum", as_str(s["mn"])))
            ev_rows.append((c, "maximum", as_str(s["mx"])))
        if s["smn"] is not None:
            cs.min_length, cs.max_length = s["smn"], s["smx"]
            ev_rows.append((c, "min_length", str(s["smn"])))
            ev_rows.append((c, "max_length", str(s["smx"])))
        if s["enum_ok"] and s["uniq"]:
            cs.enum = sorted(s["uniq"])
            ev_rows.append((c, "enum", ",".join(cs.enum)))
        if s["lmn"] is not None:
            cs.min_items, cs.max_items = s["lmn"], s["lmx"]
            ev_rows.append((c, "min_items", str(s["lmn"])))
            ev_rows.append((c, "max_items", str(s["lmx"])))
            if s["imn"] is not None:
                item_t = types[c].value_type
                item = ColumnSpec(type=_json_type(item_t),
                                  minimum=s["imn"], maximum=s["imx"])
                cs.items = item
                as_str = (lambda v: str(int(v))) if pa.types.is_integer(item_t) else str
                ev_rows.append((c, "item_minimum", as_str(s["imn"])))
                ev_rows.append((c, "item_maximum", as_str(s["imx"])))
        spec.columns[c] = cs
    if key_column is not None and key_column in cols and acc[key_column]["nn"] == 0:
        # HYPOTHESIS for the validator to confirm, never claimed as observed
        spec.unique_keys = [key_column]
    ev_rows.sort()
    constraints = pa.table({
        "column": pa.array([r[0] for r in ev_rows]),
        "constraint": pa.array([r[1] for r in ev_rows]),
        "value": pa.array([r[2] for r in ev_rows]),
    })
    return spec, constraints


def to_json_schema(spec: TableSpec) -> dict:
    """Serialize a TableSpec as the draft-04 object schema the CLI /
    ``spec.from_json_schema`` load (``properties`` = columns; draft-4
    uses ``id``, never ``$id`` — src/jesse_validator_draft4.erl:84-85).
    Inferred specs round-trip: ``from_json_schema(to_json_schema(s))``
    compiles to the same checks."""
    doc: dict = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": f"inferred:{spec.name}",
        "type": "object",
        "properties": {c: cs.to_fragment() for c, cs in spec.columns.items()},
    }
    required = sorted(c for c, cs in spec.columns.items() if cs.required)
    if required:
        doc["required"] = required
    if spec.unique_keys:
        doc["uniqueKeys"] = list(spec.unique_keys)  # engine extension keyword
    return doc
