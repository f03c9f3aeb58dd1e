"""Spec → vectorized batch checker compilation.

The reference validates one document at a time with a recursive keyword
walk (reference: src/jesse_validator_draft4.erl:84-260 ``check_value``).
Here a :class:`~jesse_ray.spec.TableSpec` is compiled ONCE on the driver
into a :class:`CompiledSpec` — a list of vectorized checks, each of which
evaluates a whole Arrow batch with pyarrow.compute / numpy kernels and
returns the indices of violating rows.  ``CompiledSpec.check_batch`` is
the function handed to ``Dataset.map_batches(..., batch_format="pyarrow")``.

Presence semantics: a NULL cell is the columnar analogue of an *absent*
property — keyword checks skip it (reference behavior for absent
properties: src/jesse_validator_draft4.erl:380-400) and only ``required``
turns it into ``missing_required_property``
(src/jesse_validator_draft4.erl:1044-1058).

Violation rows mirror the reference's error 5-tuple
``{data_invalid, Schema, ErrorType, Value, Path}``
(src/jesse_error.erl:85-92): ``(doc_id, path, error, value_json,
schema_fragment)``, with ``path`` = property names + stringified 0-based
array indices, outermost first.
"""

from __future__ import annotations

import decimal
import json
import re
from dataclasses import dataclass, field
from fractions import Fraction
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jesse_ray import errors as E
from jesse_ray.spec import ColumnSpec, ConsistencyRule, TableSpec

VIOLATION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("path", pa.list_(pa.string())),
        ("error", pa.string()),
        ("value_json", pa.string()),
        ("schema_fragment", pa.string()),
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


# ---------------------------------------------------------------------------
# small kernels


def _np_mask(arr, n: int) -> np.ndarray:
    """pyarrow boolean -> numpy bool, nulls -> False."""
    if arr is None:
        return np.zeros(n, dtype=bool)
    if isinstance(arr, np.ndarray):
        return arr
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False).astype(bool, copy=False)


def _combine(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        # single-chunk fast path: combine_chunks() COPIES even when there
        # is one chunk; chunk(0) is zero-copy (measured 0.45 s of a
        # 1.2 s check_batch over 6 row groups before this)
        if col.num_chunks == 1:
            return col.chunk(0)
        return col.combine_chunks()
    return col


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)


def _to_f64(arr: pa.Array) -> np.ndarray:
    return arr.cast(pa.float64()).to_numpy(zero_copy_only=False)


def _canon_key(x: Any):
    """Hashable canonical form for deep equality — the analogue of the
    reference's normalize_and_sort (src/jesse_lib.erl:148-197): numbers
    normalized to their EXACT mathematical value (1.0 == 1 per
    jesse_lib.erl:177-181, and Erlang bignums compare exactly per
    jesse_lib.erl:219-261 — a float64 normalization would collapse
    adjacent bignums), object keys order-insensitive, arrays
    order-preserving.  ``Fraction`` is exact for int / float /
    decimal.Decimal alike and hashes consistently across them."""
    if isinstance(x, bool):
        return ("b", x)
    if isinstance(x, (int, float, decimal.Decimal)):
        try:
            return ("n", Fraction(x))
        except (ValueError, OverflowError):  # nan/inf — not JSON, defensive
            return ("n", float(x))
    if isinstance(x, dict):
        return ("o", tuple(sorted((k, _canon_key(v)) for k, v in x.items())))
    if isinstance(x, (list, tuple)):
        return ("a", tuple(_canon_key(v) for v in x))
    return ("s", x) if isinstance(x, str) else ("x", repr(x))


def _decimal_default(v: Any):
    # containers can nest Decimals; json's default hook cannot emit a
    # raw numeric literal, so nested bignums fall back to int (exact,
    # scale-0 case) — top-level Decimals never reach here (_json_val
    # formats them exactly below)
    if isinstance(v, decimal.Decimal):
        return int(v) if v == v.to_integral_value() else float(v)
    raise TypeError(f"not JSON serializable: {type(v)}")


def _decimal_literal(v: decimal.Decimal) -> str:
    """Exact decimal literal, unbounded precision — the same exact text
    Erlang prints for bignums (src/jesse_lib.erl): scale-0 integrals as
    the integer, scale>0 integrals as N.0 (aligned with the float
    canonical rule: 2.0 prints as 2.0), non-integrals as the exact
    fixed-point string with trailing zeros stripped.  Only exact
    operations are used — int(v), Decimal==int comparison and
    format(v, 'f') ignore context precision, unlike normalize() /
    to_integral_value() which silently ROUND past 28 significant
    digits (the default context) and would corrupt a 41-digit value."""
    iv = int(v)  # exact truncation, no context
    if v == iv:
        txt = str(iv)
        return txt + ".0" if v.as_tuple().exponent < 0 else txt
    s = format(v, "f")  # exact fixed-point, never scientific
    return s.rstrip("0") if "." in s else s


def _json_val(v: Any) -> str:
    if isinstance(v, decimal.Decimal):
        return _decimal_literal(v)
    if isinstance(v, float) and v.is_integer():
        # canonical: 3.0 prints as 3.0 (json default) — keep json default
        return json.dumps(v)
    return json.dumps(v, ensure_ascii=False, separators=(",", ":"),
                      default=_decimal_default)


def _list_layout(col: pa.Array):
    """Return (flat_values, parent_idx, item_idx, counts) for a list array.

    ``parent_idx[i]`` is the row owning flat element i; ``item_idx[i]`` is
    its 0-based position within the row's list (the path-index convention
    of the reference, src/jesse_error.erl:85-92).  NULL lists contribute
    no flat elements; the arithmetic below is robust to them because
    counts come from per-parent bincount of the parent indices.
    """
    flat = pc.list_flatten(col)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    n_rows = len(col)
    cnt = np.bincount(parent, minlength=n_rows) if len(parent) else np.zeros(n_rows, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(cnt)])[:-1]
    item_idx = np.arange(len(parent)) - starts[parent] if len(parent) else parent
    return flat, parent, item_idx, cnt


# ---------------------------------------------------------------------------
# per-keyword valid-mask kernels: (flat_or_col_array) -> np.bool mask,
# True where the value PASSES; positions with NULL values are garbage and
# must be masked by the caller with the presence mask.


_ARROW_TYPE_OK: dict[str, Callable[[pa.DataType], bool]] = {
    # draft-04 primitive membership (src/jesse_validator_draft4.erl:306-318);
    # integer ⊂ number; draft-4 floats are NOT integers even with zero
    # fraction (contrast draft-6, src/jesse_validator_draft6.erl:344-355)
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    # scale-0 decimals are Erlang bignums (arbitrary-precision integers
    # beyond int64, src/jesse_lib.erl:219-261) — they hold ONLY integral
    # values, so they satisfy "integer"; scale>0 decimals are "number"
    "integer": lambda t: pa.types.is_integer(t)
    or (pa.types.is_decimal(t) and t.scale == 0),
    "number": _is_numeric,
    "boolean": pa.types.is_boolean,
    "array": lambda t: pa.types.is_list(t) or pa.types.is_large_list(t)
    or pa.types.is_fixed_size_list(t),
    "object": pa.types.is_struct,
    "null": pa.types.is_null,
    "any": lambda t: True,
}


def _type_ok(spec_type: str | list[str], dtype: pa.DataType) -> bool:
    types = [spec_type] if isinstance(spec_type, str) else spec_type
    return any(_ARROW_TYPE_OK.get(t, lambda _t: False)(dtype) for t in types)


def _enum_mask(arr: pa.Array, values: list[Any]) -> np.ndarray:
    """Membership with the reference's cross-numeric deep equality:
    1.0 == 1 (src/jesse_lib.erl:177-181, normalize numbers to float)."""
    n = len(arr)
    if _is_numeric(arr.type):
        if pa.types.is_decimal(arr.type):
            # bignum column: a float64 cast would collapse adjacent
            # >2^53 values — compare exactly via Fraction canonical keys
            # (the reference compares bignums exactly,
            # src/jesse_lib.erl:219-261; decimals are rare, so the
            # per-distinct python compare is off the hot path)
            keyset = {
                _canon_key(v)
                for v in values
                if isinstance(v, (int, float, decimal.Decimal))
                and not isinstance(v, bool)
            }
            if not keyset:
                return np.zeros(n, dtype=bool)
            return np.fromiter(
                (x is not None and _canon_key(x) in keyset for x in arr.to_pylist()),
                dtype=bool, count=n,
            )
        nums = [float(v) for v in values if isinstance(v, (int, float)) and not isinstance(v, bool)]
        if not nums:
            return np.zeros(n, dtype=bool)
        v = _to_f64(arr)
        return np.isin(v, np.asarray(nums, dtype=np.float64))
    try:
        vs = pa.array([v for v in values if v is not None], type=arr.type)
        return _np_mask(pc.is_in(arr, value_set=vs), n)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        # mixed-type enum vs typed column: fall back per-distinct-value
        pyvals = set()
        for v in values:
            try:
                pyvals.add(v)
            except TypeError:
                pass
        out = np.zeros(n, dtype=bool)
        pl = arr.to_pylist()
        for i, x in enumerate(pl):
            out[i] = x in pyvals
        return out


def _range_mask(arr: pa.Array, lo, lo_ex, hi, hi_ex) -> np.ndarray:
    # Arrow-native comparisons: zero-copy on the typed array (the items
    # check runs this over EVERY flattened token — a float64 round-trip
    # here would allocate 8 bytes/token across the whole corpus).
    # NaN/null compare false -> out of range; caller masks nulls.
    if pa.types.is_decimal(arr.type):
        # bignum column: Arrow can't compare decimals against plain
        # python-int bounds, and a float64 cast would round >2^53
        # values at the bound — compare exactly via Fraction
        # (src/jesse_lib.erl:219-261; decimal columns are off the
        # token hot path, so the per-value compare is acceptable)
        flo = Fraction(lo) if lo is not None else None
        fhi = Fraction(hi) if hi is not None else None
        out = np.zeros(len(arr), dtype=bool)
        for i, x in enumerate(arr.to_pylist()):
            if x is None:
                continue
            fx = Fraction(x)
            ok = True
            if flo is not None:
                ok = fx > flo if lo_ex else fx >= flo
            if ok and fhi is not None:
                ok = fx < fhi if hi_ex else fx <= fhi
            out[i] = ok
        return out
    m = None
    if lo is not None:
        c = pc.greater(arr, lo) if lo_ex else pc.greater_equal(arr, lo)
        m = c
    if hi is not None:
        c = pc.less(arr, hi) if hi_ex else pc.less_equal(arr, hi)
        m = c if m is None else pc.and_kleene(m, c)
    if m is None:
        return np.ones(len(arr), dtype=bool)
    return _np_mask(m, len(arr))


def _multiple_of_mask(arr: pa.Array, m: float) -> np.ndarray:
    # reference formula: (V/M - trunc(V/M)) * M == 0.0
    # (src/jesse_validator_draft4.erl:1019-1025)
    v = _to_f64(arr)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = v / m
        return (q - np.trunc(q)) * m == 0.0


def _pattern_mask(arr: pa.Array, pattern: str) -> np.ndarray:
    """Unanchored regex match (reference: re:run unanchored,
    src/jesse_validator_draft4.erl:888-893).  Arrow's RE2 dialect covers
    the common cases; PCRE-only constructs (backrefs, lookaround) fall
    back to Python ``re`` per present value — documented dialect delta."""
    n = len(arr)
    try:
        return _np_mask(pc.match_substring_regex(arr, pattern), n)
    except pa.ArrowInvalid:
        # PCRE-only construct (backref/lookaround): run python `re` ONCE
        # PER DISTINCT VALUE (dictionary-encode first), then scatter the
        # per-distinct verdicts back with one numpy take — no per-row
        # python loop over the column; the regex cost is bounded by the
        # value domain, not the row count.
        rx = re.compile(pattern)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        enc = arr.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        um = np.fromiter(
            (s is not None and rx.search(s) is not None for s in uniq),
            dtype=bool, count=len(uniq),
        )
        idx = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
        out = np.zeros(n, dtype=bool)
        present = idx >= 0
        out[present] = um[idx[present]]
        return out


def _strlen_mask(arr: pa.Array, lo, hi) -> np.ndarray:
    # unicode codepoint length (src/jesse_validator_draft4.erl:915-943)
    ln = pc.fill_null(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False)
    ok = np.ones(len(ln), dtype=bool)
    if lo is not None:
        ok &= ln >= lo
    if hi is not None:
        ok &= ln <= hi
    return ok


_EMAIL_RX = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"
_IPV4_RX = r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
_DATETIME_RX = (
    r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})?$"
)


def _format_mask(arr: pa.Array, fmt: str) -> np.ndarray:
    """Only the formats the reference actually checks
    (src/jesse_validator_draft4.erl:975-1004): date-time, email,
    ipv4, ipv6; hostname/uri/uri-reference are accept-all no-ops."""
    n = len(arr)
    if fmt == "email":
        return _pattern_mask(arr, _EMAIL_RX)
    if fmt == "ipv4":
        return _pattern_mask(arr, _IPV4_RX)
    if fmt == "date-time":
        ok = _pattern_mask(arr, _DATETIME_RX)
        # refine regex hits with field validation (RFC3339 per the
        # reference's calendar:rfc3339_to_system_time,
        # src/jesse_validator_draft4.erl:1340-1354).  NOT
        # datetime.fromisoformat: Python rejects year 0000, which the
        # reference accepts ("minimal timestamp" extra case).
        idx = np.flatnonzero(ok)
        if len(idx):
            vals = arr.take(pa.array(idx)).to_pylist()
            for j, s in zip(idx, vals):
                if not _rfc3339_fields_ok(s):
                    ok[j] = False
        return ok
    if fmt == "ipv6":
        import ipaddress

        out = np.zeros(n, dtype=bool)
        for i, s in enumerate(arr.to_pylist()):
            if s is None:
                continue
            try:
                ipaddress.IPv6Address(s)
                out[i] = True
            except ValueError:
                pass
        return out
    return np.ones(n, dtype=bool)  # hostname / uri / unknown: no-op


def _rfc3339_fields_ok(s: str) -> bool:
    """Field-range validation for a string already matching the RFC3339
    shape regex: proleptic Gregorian (year 0000 allowed), leap-year day
    rule, leap second 60 allowed per the RFC grammar."""
    try:
        y, mo, d = int(s[0:4]), int(s[5:7]), int(s[8:10])
        hh, mi, ss = int(s[11:13]), int(s[14:16]), int(s[17:19])
    except ValueError:
        return False
    if not 1 <= mo <= 12:
        return False
    leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
    days = (31, 29 if leap else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    if not 1 <= d <= days[mo - 1]:
        return False
    if hh > 23 or mi > 59 or ss > 60:
        return False
    off = s[-6:]
    if (off[0] in "+-") and off[3] == ":":
        if int(off[1:3]) > 23 or int(off[4:6]) > 59:
            return False
    return True


def _unique_items_dups(col: pa.Array):
    """Rows whose list has duplicate elements.

    Vectorized set-cardinality analogue of the reference's fast path
    (src/jesse_validator_draft4.erl:837-859): lexsort flattened
    (parent, value) pairs, adjacent-equal within a parent = duplicate.
    Cross-numeric 1.0 == 1 equality is honored by casting numeric
    element types to float64 (src/jesse_lib.erl:177-181).
    Returns (dup_row_idx, first_dup_value_per_row).
    """
    flat, parent, _item_idx, _cnt = _list_layout(col)
    if len(parent) == 0:
        return np.array([], dtype=np.int64), []
    # decimal128 elements (bignums beyond int64) take the generic
    # _canon_key path below — a float64 cast would collapse adjacent
    # bignums (reference compares them exactly, jesse_lib.erl:219-261)
    if _is_numeric(flat.type) and not pa.types.is_decimal(flat.type):
        # vectorized detection: lexsort flattened (parent, value) pairs,
        # adjacent-equal within a parent ⇒ that row has a duplicate
        nulls = ~_np_mask(pc.is_valid(flat), len(flat))
        if pa.types.is_integer(flat.type):
            # exact int compare — a float64 cast would equate int64
            # values that differ only past 2^53
            v = pc.fill_null(flat, 0).cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            v = _to_f64(flat)
        order = np.lexsort((v, nulls, parent))
        pv, vv, nn = parent[order], v[order], nulls[order]
        # a fill_null(0) int must not pair with a real 0: require both
        # adjacent elements non-null (float nulls are NaN ⇒ never equal,
        # the guard is still correct)
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1]) & ~nn[1:] & ~nn[:-1]
        flagged = np.unique(pv[1:][dup]).astype(np.int64)
        # null == null in the reference's deep equality
        # (src/jesse_lib.erl:219-261): flag any row with ≥2 nulls too
        if nulls.any():
            null_cnt = np.bincount(parent[nulls], minlength=len(col))
            flagged = np.union1d(flagged, np.flatnonzero(null_cnt >= 2)).astype(np.int64)
        # value reporting: jesse emits the FIRST value (in list order)
        # whose second occurrence appears — scan only the flagged rows
        # (duplicates are rare), using the original (typed) values
        vals = []
        for r in flagged:
            lst = col[int(r)].as_py()
            seen: set = set()
            found = lst[0] if lst else None
            for x in lst:
                k = _canon_key(x)
                if k in seen:
                    found = x
                    break
                seen.add(k)
            vals.append(found)
        return flagged, vals
    # generic (strings/structs/nested lists): per-row python sets over
    # canonical keys (_canon_key handles unhashable dict/list elements
    # with key-order-insensitive equality) — still batch-local
    rows, vals = [], []
    for i, lst in enumerate(col.to_pylist()):
        if not lst:
            continue
        seen = set()
        for x in lst:
            k = _canon_key(x)
            if k in seen:
                rows.append(i)
                vals.append(x)
                break
            seen.add(k)
    return np.asarray(rows, dtype=np.int64), vals


# ---------------------------------------------------------------------------
# compiled check objects


@dataclass
class _Emit:
    """One emission unit: evaluates a batch, returns violating rows."""

    name: str
    error: str
    path: list[str]
    fragment: str
    #: (tbl) -> (row_idx ndarray, value_json list[str], path_override list|None)
    fn: Callable[[pa.Table], tuple[np.ndarray, list[str], Optional[list[list[str]]]]]


class CompiledSpec:
    """Driver-compiled, worker-executed batch validator."""

    def __init__(self, spec: TableSpec):
        self.spec = spec
        self.version = spec.version
        self.dialect = getattr(spec, "dialect", "draft4")
        self._emits: list[_Emit] = []
        #: schema-form dependencies: (trigger column, compiled sub-spec)
        self._schema_deps: list[tuple[str, "CompiledSpec"]] = [
            (col, CompiledSpec(sub)) for col, sub in spec.schema_dependencies.items()
        ]
        self._build()

    def __getstate__(self):
        # never ship the per-batch memo (it pins an Arrow batch)
        d = self.__dict__.copy()
        d.pop("_ctx_cache", None)
        return d

    def _type_valid_mask(self, cs: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """Value-level ``type`` mask: static primitive membership, the
        draft-6 ``integer`` leniency (floats with zero fraction pass,
        src/jesse_validator_draft6.erl:344-355), and draft-3 union
        schema members (src/jesse_validator_draft3.erl:304-328)."""
        n = len(arr)
        prim_ok = _type_ok(cs.type, arr.type) if cs.type is not None else False
        ok = np.full(n, prim_ok, dtype=bool)
        if (
            not prim_ok
            and self.dialect == "draft6"
            and cs.type is not None
            and ("integer" in ([cs.type] if isinstance(cs.type, str) else cs.type))
            and pa.types.is_floating(arr.type)
        ):
            v = _to_f64(arr)
            with np.errstate(invalid="ignore"):
                ok |= v == np.trunc(v)
        if cs.type_schemas:
            for sub in cs.type_schemas:
                ok |= self._spec_valid_mask(sub, arr)
        return ok

    def _disallow_match_mask(self, cs: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """True where the value MATCHES the disallow union — primitive
        type members (static per Arrow dtype) OR any embedded schema
        member validating (draft-3 union semantics,
        src/jesse_validator_draft3.erl:878-889 + 304-328)."""
        n = len(arr)
        bad = (np.full(n, _type_ok(cs.disallow, arr.type), dtype=bool)
               if cs.disallow is not None else np.zeros(n, dtype=bool))
        for sub in cs.disallow_schemas or []:
            bad |= self._spec_valid_mask(sub, arr)
        return bad

    # -- mask evaluation for one ColumnSpec on one (possibly flat) array --
    def _spec_valid_mask(self, cs: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """True where the value passes ALL keywords of ``cs`` (presence
        handled by caller).  Used for combinator sub-schemas."""
        n = len(arr)
        ok = np.ones(n, dtype=bool)
        if cs.type is not None or cs.type_schemas is not None:
            ok &= self._type_valid_mask(cs, arr)
            if not ok.any():
                return ok
        is_num = _is_numeric(arr.type)
        is_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
        is_list = pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
        if cs.enum is not None:
            ok &= _enum_mask(arr, cs.enum)
        if cs.has_const:
            ok &= _enum_mask(arr, [cs.const])
        if (cs.minimum is not None or cs.maximum is not None) and is_num:
            ok &= _range_mask(arr, cs.minimum, cs.exclusive_minimum, cs.maximum, cs.exclusive_maximum)
        if cs.multiple_of is not None and is_num:
            ok &= _multiple_of_mask(arr, cs.multiple_of)
        if cs.pattern is not None and is_str:
            ok &= _pattern_mask(arr, cs.pattern)
        if (cs.min_length is not None or cs.max_length is not None) and is_str:
            ok &= _strlen_mask(arr, cs.min_length, cs.max_length)
        if cs.format is not None and is_str:
            ok &= _format_mask(arr, cs.format)
        if is_list and (cs.min_items is not None or cs.max_items is not None):
            ln = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
            if cs.min_items is not None:
                ok &= ln >= cs.min_items
            if cs.max_items is not None:
                ok &= ln <= cs.max_items
        if is_list and cs.unique_items:
            dup_rows, _ = _unique_items_dups(arr)
            ok[dup_rows] = False
        if is_list and cs.items is not None:
            flat, parent, _ii, _cnt = _list_layout(arr)
            if len(parent):
                item_ok = self._spec_valid_mask(cs.items, flat)
                item_ok |= ~_np_mask(pc.is_valid(flat), len(flat))  # null elements vacuous
                bad_rows = np.unique(parent[~item_ok])
                ok[bad_rows] = False
        if is_list and cs.items_positional is not None:
            bad_rows, _details, _flat = self._positional_bad_rows(cs, arr)
            ok[bad_rows] = False
        if cs.all_of:
            for sub in cs.all_of:
                ok &= self._spec_valid_mask(sub, arr)
        if cs.any_of:
            anyok = np.zeros(n, dtype=bool)
            for sub in cs.any_of:
                anyok |= self._spec_valid_mask(sub, arr)
            ok &= anyok
        if cs.one_of:
            cnt = np.zeros(n, dtype=np.int32)
            for sub in cs.one_of:
                cnt += self._spec_valid_mask(sub, arr).astype(np.int32)
            ok &= cnt == 1
        if cs.not_ is not None:
            ok &= ~self._spec_valid_mask(cs.not_, arr)
        if cs.divisible_by is not None and is_num:
            if cs.divisible_by == 0:
                ok &= False  # divisor 0: every value not_divisible (draft-3)
            else:
                ok &= _multiple_of_mask(arr, cs.divisible_by)
        if cs.disallow is not None or cs.disallow_schemas:
            ok &= ~self._disallow_match_mask(cs, arr)
        if is_list and cs.contains is not None:
            ok &= self._contains_mask(cs.contains, arr)
        if pa.types.is_struct(arr.type) and (
            cs.properties or cs.required_props or cs.pattern_props
            or not cs.additional_props_allowed
        ):
            ok &= self._struct_props_mask(cs, arr)
        return ok

    def _struct_field(self, arr: pa.Array, name: str):
        """(field array, presence mask) for one struct field; a field
        absent from the TYPE is all-absent (the columnar reading of
        jesse's absent-property skip, src/jesse_validator_draft4.erl:380-400).
        A null parent struct makes every field absent too."""
        n = len(arr)
        if arr.type.get_field_index(name) < 0:
            return None, np.zeros(n, dtype=bool)
        f = pc.struct_field(arr, name)
        present = _np_mask(pc.is_valid(f), n) & _np_mask(pc.is_valid(arr), n)
        return f, present

    def _struct_props_mask(self, cs: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """True where a struct value satisfies its nested ``properties``
        sub-schemas and ``required`` list."""
        n = len(arr)
        ok = np.ones(n, dtype=bool)
        for prop, sub in (cs.properties or {}).items():
            f, present = self._struct_field(arr, prop)
            if f is None or not present.any():
                continue
            sub_ok = self._spec_valid_mask(sub, f)
            ok &= ~present | sub_ok
        for prop in cs.required_props or []:
            _f, present = self._struct_field(arr, prop)
            ok &= present | ~_np_mask(pc.is_valid(arr), n)
        for pat, sub in (cs.pattern_props or {}).items():
            rx = re.compile(pat)
            for f in arr.type:
                if not rx.search(f.name):
                    continue
                fa, present = self._struct_field(arr, f.name)
                if fa is None or not present.any():
                    continue
                ok &= ~present | self._spec_valid_mask(sub, fa)
        if not cs.additional_props_allowed:
            ok &= ~self._struct_extra_props_mask(cs, arr)
        return ok

    def _walk_struct(self, arr: pa.Array, gate: np.ndarray, cs: ColumnSpec,
                     base_path: list[str], out) -> None:
        """Recursive nested-object violation emission: appends
        (idx_array, value_json, path, atom) entries to ``out`` for every
        violation under a struct value array.  ``gate`` marks rows whose
        value (and every ancestor) is present."""
        targets: list[tuple[str, ColumnSpec]] = list((cs.properties or {}).items())
        for pat, sub in (cs.pattern_props or {}).items():
            rx = re.compile(pat)
            targets.extend((f.name, sub) for f in arr.type if rx.search(f.name))
        for name, sub in targets:
            fa, fpresent = self._struct_field(arr, name)
            if fa is None:
                continue
            g = gate & fpresent
            if g.any():
                self._emit_value_violations(fa, g, sub, base_path + [name], out)
        for prop in cs.required_props or []:
            _fa, fpresent = self._struct_field(arr, prop)
            idx = np.flatnonzero(gate & ~fpresent)
            if len(idx):
                out[0].append(idx)
                out[1].extend(["null"] * len(idx))
                out[2].extend([base_path + [prop]] * len(idx))
                out[3].extend([E.MISSING_REQUIRED_PROPERTY] * len(idx))
        if not cs.additional_props_allowed:
            declared = set((cs.properties or {}).keys())
            pats = [re.compile(p) for p in (cs.pattern_props or {})]
            extra_fields = [
                f.name for f in arr.type
                if f.name not in declared and not any(rx.search(f.name) for rx in pats)
            ]
            if extra_fields:
                masks = {
                    name: self._struct_field(arr, name)[1] for name in extra_fields
                }
                bad = gate & self._struct_extra_props_mask(cs, arr)
                idx = np.flatnonzero(bad)
                if len(idx):
                    out[0].append(idx)
                    # per-row: only the extras the row actually CARRIES
                    out[1].extend(
                        _json_val({"extraProperties": sorted(
                            name for name in extra_fields if masks[name][i]
                        )})
                        for i in idx
                    )
                    out[2].extend([base_path] * len(idx))
                    out[3].extend([E.NO_EXTRA_PROPERTIES_ALLOWED] * len(idx))

    def _emit_value_violations(self, arr: pa.Array, gate: np.ndarray, cs: ColumnSpec,
                               path: list[str], out) -> None:
        """Violations of one (gated) value array against ``cs``, with
        per-element descent into object-form items and recursion into
        nested structs — items / struct-props are excluded from the
        coarse fail-atom roll-up and handled here with full paths."""
        for atom, mask in self._spec_fail_atoms(cs, arr, skip_items=True, skip_struct=True):
            idx = np.flatnonzero(gate & mask)
            if len(idx):
                out[0].append(idx)
                out[1].extend(self._values_json(arr, idx))
                out[2].extend([path] * len(idx))
                out[3].extend([atom] * len(idx))
        is_list = pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
        if is_list and cs.items is not None:
            flat, parent, item_idx, _cnt = _list_layout(arr)
            if len(parent):
                item_ok = self._spec_valid_mask(cs.items, flat)
                item_ok |= ~_np_mask(pc.is_valid(flat), len(flat))
                bad = np.flatnonzero(~item_ok)
                bad = bad[gate[parent[bad]]]
                if len(bad):
                    atom = (
                        E.NOT_IN_RANGE
                        if (cs.items.minimum is not None or cs.items.maximum is not None)
                        else E.NOT_SCHEMA_VALID
                    )
                    vals = flat.take(pa.array(bad, type=pa.int64())).to_pylist()
                    out[0].append(parent[bad].astype(np.int64))
                    out[1].extend([_json_val(v) for v in vals])
                    out[2].extend([path + [str(int(item_idx[b]))] for b in bad])
                    out[3].extend([atom] * len(bad))
        if pa.types.is_struct(arr.type) and (
            cs.properties or cs.required_props or cs.pattern_props
            or not cs.additional_props_allowed
        ):
            self._walk_struct(arr, gate, cs, path, out)

    def _struct_extra_props_mask(self, cs: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """True where a struct row CARRIES (non-null — null ≡ absent, the
        engine's presence convention) a field not declared by properties
        or matched by a patternProperties regex."""
        n = len(arr)
        declared = set((cs.properties or {}).keys())
        pats = [re.compile(p) for p in (cs.pattern_props or {})]
        parent = _np_mask(pc.is_valid(arr), n)
        bad = np.zeros(n, dtype=bool)
        for f in arr.type:
            if f.name in declared or any(rx.search(f.name) for rx in pats):
                continue
            _fa, fpresent = self._struct_field(arr, f.name)
            bad |= parent & fpresent
        return bad

    def _spec_fail_atoms(
        self,
        cs: ColumnSpec,
        arr: pa.Array,
        *,
        skip_items: bool = False,
        skip_struct: bool = False,
    ) -> list[tuple[str, np.ndarray]]:
        """Per-keyword (error_atom, fail_mask) pairs for one sub-schema —
        the vectorized analogue of the child error lists jesse collects
        per anyOf attempt (src/jesse_validator_draft4.erl:1156-1179).
        Keyword order mirrors _spec_valid_mask; combinator children are
        reported as their single combinator atom.  ``skip_items`` /
        ``skip_struct`` let the nested-struct walker handle those two
        keyword families itself with full per-element / per-property
        path descent instead of a coarse roll-up atom."""
        n = len(arr)
        out: list[tuple[str, np.ndarray]] = []

        def add(atom: str, ok: np.ndarray) -> None:
            fail = ~ok
            if fail.any():
                out.append((atom, fail))

        if cs.type is not None or cs.type_schemas is not None:
            add(E.WRONG_TYPE, self._type_valid_mask(cs, arr))
        is_num = _is_numeric(arr.type)
        is_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
        is_list = pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
        if cs.enum is not None:
            add(E.NOT_IN_ENUM, _enum_mask(arr, cs.enum))
        if cs.has_const:
            add(E.NOT_IN_ENUM, _enum_mask(arr, [cs.const]))
        if (cs.minimum is not None or cs.maximum is not None) and is_num:
            add(E.NOT_IN_RANGE, _range_mask(arr, cs.minimum, cs.exclusive_minimum, cs.maximum, cs.exclusive_maximum))
        if cs.multiple_of is not None and is_num:
            add(E.NOT_MULTIPLE_OF, _multiple_of_mask(arr, cs.multiple_of))
        if cs.pattern is not None and is_str:
            add(E.NO_MATCH, _pattern_mask(arr, cs.pattern))
        if (cs.min_length is not None or cs.max_length is not None) and is_str:
            add(E.WRONG_LENGTH, _strlen_mask(arr, cs.min_length, cs.max_length))
        if cs.format is not None and is_str:
            add(E.WRONG_FORMAT, _format_mask(arr, cs.format))
        if is_list and (cs.min_items is not None or cs.max_items is not None):
            ln = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
            ok = np.ones(n, dtype=bool)
            if cs.min_items is not None:
                ok &= ln >= cs.min_items
            if cs.max_items is not None:
                ok &= ln <= cs.max_items
            add(E.WRONG_SIZE, ok)
        if is_list and cs.unique_items:
            ok = np.ones(n, dtype=bool)
            dup_rows, _ = _unique_items_dups(arr)
            ok[dup_rows] = False
            add(E.NOT_UNIQUE, ok)
        if is_list and cs.items is not None and not skip_items:
            flat, parent, _ii, _cnt = _list_layout(arr)
            ok = np.ones(n, dtype=bool)
            if len(parent):
                item_ok = self._spec_valid_mask(cs.items, flat)
                item_ok |= ~_np_mask(pc.is_valid(flat), len(flat))
                ok[np.unique(parent[~item_ok])] = False
            add(E.NOT_SCHEMA_VALID, ok)
        if is_list and cs.items_positional is not None:
            bad_rows, details, _flat = self._positional_bad_rows(cs, arr)
            ok = np.ones(n, dtype=bool)
            ok[bad_rows] = False
            # report the dominant atom: no_extra_items_allowed rows keep
            # their atom, the rest are not_schema_valid
            extra_rows = {d[1] for d in details if d[3] == E.NO_EXTRA_ITEMS_ALLOWED}
            if extra_rows:
                ok_extra = np.ones(n, dtype=bool)
                ok_extra[sorted(extra_rows)] = False
                add(E.NO_EXTRA_ITEMS_ALLOWED, ok_extra)
                ok2 = np.ones(n, dtype=bool)
                ok2[[r for r in bad_rows if r not in extra_rows]] = False
                add(E.NOT_SCHEMA_VALID, ok2)
            else:
                add(E.NOT_SCHEMA_VALID, ok)
        if cs.all_of:
            ok = np.ones(n, dtype=bool)
            for sub in cs.all_of:
                ok &= self._spec_valid_mask(sub, arr)
            add(E.ALL_SCHEMAS_NOT_VALID, ok)
        if cs.any_of:
            ok = np.zeros(n, dtype=bool)
            for sub in cs.any_of:
                ok |= self._spec_valid_mask(sub, arr)
            add(E.ANY_SCHEMAS_NOT_VALID, ok)
        if cs.one_of:
            cnt = np.zeros(n, dtype=np.int32)
            for sub in cs.one_of:
                cnt += self._spec_valid_mask(sub, arr).astype(np.int32)
            add(E.NOT_ONE_SCHEMA_VALID, cnt >= 1)
            add(E.MORE_THAN_ONE_SCHEMA_VALID, cnt <= 1)
        if cs.not_ is not None:
            add(E.NOT_SCHEMA_VALID, ~self._spec_valid_mask(cs.not_, arr))
        if cs.divisible_by is not None and is_num:
            ok = np.zeros(n, dtype=bool) if cs.divisible_by == 0 else _multiple_of_mask(arr, cs.divisible_by)
            add(E.NOT_DIVISIBLE, ok)
        if cs.disallow is not None or cs.disallow_schemas:
            add(E.NOT_ALLOWED, ~self._disallow_match_mask(cs, arr))
        if is_list and cs.contains is not None:
            add(E.DATA_INVALID, self._contains_mask(cs.contains, arr))
        if (
            not skip_struct
            and pa.types.is_struct(arr.type)
            and (cs.properties or cs.required_props or cs.pattern_props
                 or not cs.additional_props_allowed)
        ):
            add(E.NOT_SCHEMA_VALID, self._struct_props_mask(cs, arr))
        return out

    def _positional_bad_rows(self, cs: ColumnSpec, arr: pa.Array):
        """Positional-items evaluation (src/jesse_validator_draft4.erl:558-603).

        Returns (bad_row_idx, details, flat) where details holds
        (flat_i, row, item_idx, error_atom) tuples for violation
        emission and flat is the flattened element array for value
        extraction.
        """
        flat, parent, item_idx, _cnt = _list_layout(arr)
        n_pos = len(cs.items_positional)
        bad_rows: list[int] = []
        details: list[tuple[int, int, int, str]] = []  # (flat_i, row, item, atom)
        if len(parent) == 0:
            return np.array([], dtype=np.int64), details, flat
        elem_present = _np_mask(pc.is_valid(flat), len(flat))
        for j, sub in enumerate(cs.items_positional):
            sel = np.flatnonzero((item_idx == j) & elem_present)
            if len(sel) == 0:
                continue
            sub_ok = self._spec_valid_mask(sub, flat.take(pa.array(sel, type=pa.int64())))
            for k in np.flatnonzero(~sub_ok):
                fi = int(sel[k])
                details.append((fi, int(parent[fi]), j, E.NOT_SCHEMA_VALID))
                bad_rows.append(int(parent[fi]))
        extra = np.flatnonzero(item_idx >= n_pos)
        if len(extra):
            if cs.additional_items is False:
                # ONE no_extra_items_allowed per offending array, as the
                # reference emits (src/jesse_validator_draft4.erl:598-603);
                # item_idx -1 signals "whole array" to the emit fn
                for r in np.unique(parent[extra]):
                    details.append((int(extra[parent[extra] == r][0]), int(r), -1, E.NO_EXTRA_ITEMS_ALLOWED))
                    bad_rows.append(int(r))
            elif isinstance(cs.additional_items, ColumnSpec):
                sel = extra[elem_present[extra]]
                if len(sel):
                    sub_ok = self._spec_valid_mask(
                        cs.additional_items, flat.take(pa.array(sel, type=pa.int64()))
                    )
                    for k in np.flatnonzero(~sub_ok):
                        fi = int(sel[k])
                        details.append((fi, int(parent[fi]), int(item_idx[fi]), E.NOT_SCHEMA_VALID))
                        bad_rows.append(int(parent[fi]))
        return np.asarray(sorted(set(bad_rows)), dtype=np.int64), details, flat

    def _contains_mask(self, sub: ColumnSpec, arr: pa.Array) -> np.ndarray:
        """True where ≥1 list element validates ``sub``; empty lists fail
        (src/jesse_validator_draft6.erl:569-587)."""
        n = len(arr)
        flat, parent, _ii, _cnt = _list_layout(arr)
        ok = np.zeros(n, dtype=bool)
        if len(parent):
            elem_ok = self._spec_valid_mask(sub, flat)
            elem_ok &= _np_mask(pc.is_valid(flat), len(flat))
            good_rows = np.unique(parent[elem_ok])
            ok[good_rows] = True
        return ok

    # -- build emission units --
    def _build(self) -> None:
        for col, cs in self.spec.columns.items():
            self._build_column(col, cs)
        for rule in self.spec.consistency:
            self._build_consistency(rule)
        for rule in self.spec.conditionals:
            self._build_conditional(rule)
        for col, needs in self.spec.dependencies.items():
            self._build_dependency(col, needs)
        for cc in self.spec.custom_checks:
            self._build_custom(cc)

    def _build_custom(self, cc) -> None:
        """external_validator analogue: user predicate appended AFTER all
        keyword checks (src/jesse_validator_draft4.erl:1356-1362)."""
        col = cc.column or self.spec.key_column

        def fn(tbl, cc=cc, col=col):
            ok = np.asarray(cc.fn(tbl), dtype=bool)
            idx = np.flatnonzero(~ok)
            if len(idx) == 0:
                return idx, [], None
            if col and col in tbl.column_names:
                vals = self._values_json(_combine(tbl[col]), idx)
            else:
                vals = ["null"] * len(idx)
            return idx, vals, None

        self._add(
            f"custom:{cc.name}",
            cc.error_atom,
            [col] if col else [],
            {"external": cc.name},
            fn,
        )

    def _col_ctx(self, tbl: pa.Table, col: str):
        # per-batch memo: every emission unit asks for its column(s), so
        # the same column would otherwise be re-combined and re-masked
        # once per keyword.  Keyed on the table identity; one batch is
        # in flight per worker at a time.
        cache = getattr(self, "_ctx_cache", None)
        if cache is None or cache[0] is not tbl:
            cache = (tbl, {})
            self._ctx_cache = cache
        if col in cache[1]:
            return cache[1][col]
        if col not in tbl.column_names:
            out = (None, None)
        else:
            arr = _combine(tbl[col])
            out = (arr, _np_mask(pc.is_valid(arr), len(arr)))
        cache[1][col] = out
        return out

    def _add(self, name, error, path, fragment_obj, fn):
        self._emits.append(
            _Emit(
                name=name,
                error=error,
                path=path,
                fragment=json.dumps(fragment_obj, sort_keys=True, separators=(",", ":")),
                fn=fn,
            )
        )

    def _add_multi(self, name, path, fragment_obj, fn):
        """Emission unit whose fn returns a 4th element: a per-violation
        error-atom list (used by nested struct properties, where one
        field evaluation yields several keyword atoms)."""
        self._add(name, "__multi__", path, fragment_obj, fn)

    def _values_json(self, arr: pa.Array, idx: np.ndarray) -> list[str]:
        if len(idx) == 0:
            return []
        vals = arr.take(pa.array(idx, type=pa.int64())).to_pylist()
        return [_json_val(v) for v in vals]

    def _build_column(self, col: str, cs: ColumnSpec) -> None:
        frag = cs.to_fragment()

        if cs.required:
            # missing_required_property (src/jesse_validator_draft4.erl:1044-1058);
            # Value in the reference is the enclosing object — we record JSON null.
            def req_fn(tbl, col=col):
                n = tbl.num_rows
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    idx = np.arange(n, dtype=np.int64)
                else:
                    idx = np.flatnonzero(~present)
                return idx, ["null"] * len(idx), None

            self._add(f"required:{col}", E.MISSING_REQUIRED_PROPERTY, [col], {"required": [col]}, req_fn)

        def simple(name, error, frag_obj, mask_fn, col=col):
            def fn(tbl, col=col, mask_fn=mask_fn):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                ok = mask_fn(arr)
                idx = np.flatnonzero(present & ~ok)
                return idx, self._values_json(arr, idx), None

            self._add(f"{name}:{col}", error, [col], frag_obj, fn)

        if cs.type is not None or cs.type_schemas is not None:
            # wrong_type (src/jesse_validator_draft4.erl:288-318).  For a
            # pure-primitive draft-4 type the column's Arrow dtype is
            # static (all-pass or all-fail); draft-6 integer leniency and
            # draft-3 union schema members are value-level (_type_valid_mask).
            type_frag = {"type": cs.type} if cs.type_schemas is None else {
                "type": ([cs.type] if isinstance(cs.type, str) else (cs.type or []))
                + [s.to_fragment() for s in cs.type_schemas]
            }
            simple("type", E.WRONG_TYPE, type_frag, lambda a, c=cs: self._type_valid_mask(c, a))

        if cs.enum is not None:
            simple("enum", E.NOT_IN_ENUM, {"enum": cs.enum}, lambda a, v=cs.enum: _enum_mask(a, v))
        if cs.has_const:
            simple("const", E.NOT_IN_ENUM, {"const": cs.const}, lambda a, v=cs.const: _enum_mask(a, [v]))

        if cs.minimum is not None or cs.maximum is not None:
            rng_frag = {
                k: v
                for k, v in (
                    ("minimum", cs.minimum),
                    ("exclusiveMinimum", cs.exclusive_minimum or None),
                    ("maximum", cs.maximum),
                    ("exclusiveMaximum", cs.exclusive_maximum or None),
                )
                if v is not None
            }
            simple(
                "range",
                E.NOT_IN_RANGE,
                rng_frag,
                lambda a, lo=cs.minimum, le=cs.exclusive_minimum, hi=cs.maximum, he=cs.exclusive_maximum: _range_mask(a, lo, le, hi, he)
                if _is_numeric(a.type)
                else np.ones(len(a), dtype=bool),
            )

        if cs.multiple_of is not None:
            simple(
                "multipleOf",
                E.NOT_MULTIPLE_OF,
                {"multipleOf": cs.multiple_of},
                lambda a, m=cs.multiple_of: _multiple_of_mask(a, m) if _is_numeric(a.type) else np.ones(len(a), dtype=bool),
            )

        if cs.pattern is not None:
            simple(
                "pattern",
                E.NO_MATCH,
                {"pattern": cs.pattern},
                lambda a, p=cs.pattern: _pattern_mask(a, p)
                if pa.types.is_string(a.type) or pa.types.is_large_string(a.type)
                else np.ones(len(a), dtype=bool),
            )

        if cs.min_length is not None or cs.max_length is not None:
            ln_frag = {
                k: v for k, v in (("minLength", cs.min_length), ("maxLength", cs.max_length)) if v is not None
            }
            simple(
                "length",
                E.WRONG_LENGTH,
                ln_frag,
                lambda a, lo=cs.min_length, hi=cs.max_length: _strlen_mask(a, lo, hi)
                if pa.types.is_string(a.type) or pa.types.is_large_string(a.type)
                else np.ones(len(a), dtype=bool),
            )

        if cs.format is not None:
            simple(
                "format",
                E.WRONG_FORMAT,
                {"format": cs.format},
                lambda a, f=cs.format: _format_mask(a, f)
                if pa.types.is_string(a.type) or pa.types.is_large_string(a.type)
                else np.ones(len(a), dtype=bool),
            )

        if cs.min_items is not None or cs.max_items is not None:
            it_frag = {
                k: v for k, v in (("minItems", cs.min_items), ("maxItems", cs.max_items)) if v is not None
            }

            def items_len_mask(a, lo=cs.min_items, hi=cs.max_items):
                if not (pa.types.is_list(a.type) or pa.types.is_large_list(a.type)):
                    return np.ones(len(a), dtype=bool)
                ln = pc.fill_null(pc.list_value_length(a), 0).to_numpy(zero_copy_only=False)
                ok = np.ones(len(a), dtype=bool)
                if lo is not None:
                    ok &= ln >= lo
                if hi is not None:
                    ok &= ln <= hi
                return ok

            def items_len_fn(tbl, col=col, mask_fn=items_len_mask):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                ok = mask_fn(arr)
                idx = np.flatnonzero(present & ~ok)
                if len(idx) == 0:
                    return idx, [], None
                # Value = the offending array length context; the full token
                # array can be huge — record its length, not the payload.
                ln = pc.list_value_length(arr).take(pa.array(idx, type=pa.int64())).to_pylist()
                return idx, [_json_val({"length": int(x)}) for x in ln], None

            self._add(f"items_len:{col}", E.WRONG_SIZE, [col], it_frag, items_len_fn)

        if cs.unique_items:
            def uniq_fn(tbl, col=col):
                arr, present = self._col_ctx(tbl, col)
                if arr is None or not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
                    return np.array([], dtype=np.int64), [], None
                rows, vals = _unique_items_dups(arr)
                rows = rows[present[rows]] if len(rows) else rows
                return rows, [_json_val(v) for v in vals[: len(rows)]], None

            self._add(f"uniqueItems:{col}", E.NOT_UNIQUE, [col], {"uniqueItems": True}, uniq_fn)

        if cs.items is not None:
            # per-element validation: path gains the 0-based index
            # (src/jesse_validator_draft4.erl:542-557; path convention
            # src/jesse_error.erl:85-92)
            sub = cs.items
            sub_frag = sub.to_fragment()

            def items_fn(tbl, col=col, sub=sub):
                arr, present = self._col_ctx(tbl, col)
                if arr is None or not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
                    return np.array([], dtype=np.int64), [], None
                flat = pc.list_flatten(arr)
                if len(flat) == 0:
                    return np.array([], dtype=np.int64), [], None
                # hot path: evaluate the element mask over the flattened
                # values; positional bookkeeping (parent row, item index)
                # is derived ONLY for violating elements — computing it
                # eagerly costs ~1.4 s per 100M tokens for nothing when
                # the corpus is clean
                ok = self._spec_valid_mask(sub, flat)
                ok |= ~_np_mask(pc.is_valid(flat), len(flat))  # null elements vacuous
                bad = np.flatnonzero(~ok)
                if len(bad) == 0:
                    return np.array([], dtype=np.int64), [], None
                parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
                cnt = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
                starts = np.concatenate([[0], np.cumsum(cnt)])[:-1]
                bad = bad[present[parent[bad]]]
                if len(bad) == 0:
                    return np.array([], dtype=np.int64), [], None
                rows = parent[bad]
                vals = flat.take(pa.array(bad, type=pa.int64())).to_pylist()
                paths = [[col, str(int(b - starts[parent[b]]))] for b in bad]
                return rows.astype(np.int64), [_json_val(v) for v in vals], paths

            self._add(f"items:{col}", E.NOT_IN_RANGE if (sub.minimum is not None or sub.maximum is not None) else E.NOT_SCHEMA_VALID, [col], {"items": sub_frag}, items_fn)

        if cs.items_positional is not None:
            # array-form items + additionalItems
            # (src/jesse_validator_draft4.erl:558-603)
            frag_pi = {
                "items": [s.to_fragment() for s in cs.items_positional],
            }
            if cs.additional_items is not None:
                frag_pi["additionalItems"] = (
                    cs.additional_items.to_fragment()
                    if isinstance(cs.additional_items, ColumnSpec)
                    else cs.additional_items
                )

            # two atoms can come out of one evaluation; split into two
            # emission units sharing the evaluator
            def pos_split(atom):
                def fn(tbl, col=col, cs=cs, atom=atom):
                    arr, present = self._col_ctx(tbl, col)
                    if arr is None or not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
                        return np.array([], dtype=np.int64), [], None
                    _rows, details, flat = self._positional_bad_rows(cs, arr)
                    details = [d for d in details if present[d[1]] and d[3] == atom]
                    if not details:
                        return np.array([], dtype=np.int64), [], None
                    rows = np.asarray([d[1] for d in details], dtype=np.int64)
                    ln = pc.list_value_length(arr)
                    vals = [
                        _json_val({"length": ln[d[1]].as_py()}) if d[2] < 0 else _json_val(flat[d[0]].as_py())
                        for d in details
                    ]
                    # item_idx -1 = whole-array error: path is the column
                    # itself (the reference's [] at instance root)
                    paths = [[col] if d[2] < 0 else [col, str(d[2])] for d in details]
                    return rows, vals, paths

                return fn

            self._add(f"posItems:{col}", E.NOT_SCHEMA_VALID, [col], frag_pi, pos_split(E.NOT_SCHEMA_VALID))
            if cs.additional_items is False:
                self._add(
                    f"addItems:{col}", E.NO_EXTRA_ITEMS_ALLOWED, [col], frag_pi, pos_split(E.NO_EXTRA_ITEMS_ALLOWED)
                )

        # combinators over the column value
        if cs.all_of:
            def allof_fn(tbl, col=col, subs=cs.all_of):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                ok = np.ones(len(arr), dtype=bool)
                for s in subs:
                    ok &= self._spec_valid_mask(s, arr)
                idx = np.flatnonzero(present & ~ok)
                return idx, self._values_json(arr, idx), None

            self._add(f"allOf:{col}", E.ALL_SCHEMAS_NOT_VALID, [col], {"allOf": [s.to_fragment() for s in cs.all_of]}, allof_fn)

        if cs.any_of:
            def anyof_fn(tbl, col=col, subs=cs.any_of):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                ok = np.zeros(len(arr), dtype=bool)
                for s in subs:
                    ok |= self._spec_valid_mask(s, arr)
                idx = np.flatnonzero(present & ~ok)
                if len(idx) == 0:
                    return idx, [], None
                # the reference reports the failing CHILD with the fewest
                # errors alongside the atom ({any_schemas_not_valid,
                # ShortestErrors}, src/jesse_validator_draft4.erl:1162-1179,
                # ties keep the earlier sub 1365-1373); value_json embeds
                # that child error list per row.  Evaluated over ONLY the
                # failing rows (arr.take) — violations are rare, so
                # re-running every sub-keyword over the whole batch would
                # double the anyOf column's cost for nothing.
                taken = arr.take(pa.array(idx, type=pa.int64()))
                sub_fails = [self._spec_fail_atoms(s, taken) for s in subs]
                raw = taken.to_pylist()
                vals = []
                for pos in range(len(idx)):
                    best: Optional[list[str]] = None
                    for fails in sub_fails:
                        atoms = [atom for atom, mask in fails if mask[pos]]
                        if best is None or len(atoms) < len(best):
                            best = atoms
                    vals.append(
                        json.dumps(
                            {"value": raw[pos], "shortest_errors": best or []},
                            ensure_ascii=False,
                            separators=(",", ":"),
                        )
                    )
                return idx, vals, None

            self._add(f"anyOf:{col}", E.ANY_SCHEMAS_NOT_VALID, [col], {"anyOf": [s.to_fragment() for s in cs.any_of]}, anyof_fn)

        if cs.one_of:
            def oneof_fn(tbl, col=col, subs=cs.one_of, error=None):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                cnt = np.zeros(len(arr), dtype=np.int32)
                for s in subs:
                    cnt += self._spec_valid_mask(s, arr).astype(np.int32)
                idx = np.flatnonzero(present & (cnt != 1) if error is None else present & (cnt > 1))
                return idx, self._values_json(arr, idx), None

            # two atoms: 0 valid -> not_one_schema_valid; >1 -> more_than_one
            # (src/jesse_validator_draft4.erl:1197-1223)
            def oneof_zero(tbl, col=col, subs=cs.one_of):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                cnt = np.zeros(len(arr), dtype=np.int32)
                for s in subs:
                    cnt += self._spec_valid_mask(s, arr).astype(np.int32)
                idx = np.flatnonzero(present & (cnt == 0))
                return idx, self._values_json(arr, idx), None

            def oneof_many(tbl, col=col, subs=cs.one_of):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                cnt = np.zeros(len(arr), dtype=np.int32)
                for s in subs:
                    cnt += self._spec_valid_mask(s, arr).astype(np.int32)
                idx = np.flatnonzero(present & (cnt > 1))
                return idx, self._values_json(arr, idx), None

            frag_obj = {"oneOf": [s.to_fragment() for s in cs.one_of]}
            self._add(f"oneOf0:{col}", E.NOT_ONE_SCHEMA_VALID, [col], frag_obj, oneof_zero)
            self._add(f"oneOfN:{col}", E.MORE_THAN_ONE_SCHEMA_VALID, [col], frag_obj, oneof_many)

        if cs.divisible_by is not None:
            # draft-3 divisibleBy; divisor 0 ⇒ every present value fails
            # with not_divisible (src/jesse_validator_draft3.erl:860-869)
            simple(
                "divisibleBy",
                E.NOT_DIVISIBLE,
                {"divisibleBy": cs.divisible_by},
                lambda a, m=cs.divisible_by: (
                    np.zeros(len(a), dtype=bool) if m == 0 else _multiple_of_mask(a, m)
                )
                if _is_numeric(a.type)
                else np.ones(len(a), dtype=bool),
            )

        if cs.disallow is not None or cs.disallow_schemas:
            # draft-3 disallow ⇒ not_allowed (src/jesse_validator_draft3.erl:878-889);
            # union members may embed schemas (draft3.erl:304-328)
            simple(
                "disallow",
                E.NOT_ALLOWED,
                {"disallow": cs.to_fragment().get("disallow")},
                lambda a, c=cs: ~self._disallow_match_mask(c, a),
            )

        if cs.contains is not None:
            # draft-6 contains; empty array fails; atom data_invalid
            # (src/jesse_validator_draft6.erl:151-156,569-587)
            def contains_fn(tbl, col=col, sub=cs.contains):
                arr, present = self._col_ctx(tbl, col)
                if arr is None or not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
                    return np.array([], dtype=np.int64), [], None
                ok = self._contains_mask(sub, arr)
                idx = np.flatnonzero(present & ~ok)
                if len(idx) == 0:
                    return idx, [], None
                ln = pc.list_value_length(arr).take(pa.array(idx, type=pa.int64())).to_pylist()
                return idx, [_json_val({"length": int(x)}) for x in ln], None

            self._add(f"contains:{col}", E.DATA_INVALID, [col], {"contains": cs.contains.to_fragment()}, contains_fn)

        if cs.not_ is not None:
            def not_fn(tbl, col=col, sub=cs.not_):
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    return np.array([], dtype=np.int64), [], None
                ok = ~self._spec_valid_mask(sub, arr)
                idx = np.flatnonzero(present & ~ok)
                return idx, self._values_json(arr, idx), None

            self._add(f"not:{col}", E.NOT_SCHEMA_VALID, [col], {"not": cs.not_.to_fragment()}, not_fn)

        if cs.properties or cs.required_props or cs.pattern_props or not cs.additional_props_allowed:
            # nested object properties on a STRUCT column: ONE recursive
            # emission unit per column — the walker descends into nested
            # structs and list items with full path extension, mirroring
            # the reference's per-property recursion
            # (src/jesse_validator_draft4.erl:380-400, path convention
            # src/jesse_error.erl:266-271)
            def nested_fn(tbl, col=col, cs=cs):
                arr, present = self._col_ctx(tbl, col)
                if arr is None or not pa.types.is_struct(arr.type):
                    return np.array([], dtype=np.int64), [], None
                out = ([], [], [], [])
                self._walk_struct(arr, present, cs, [col], out)
                if not out[0]:
                    return np.array([], dtype=np.int64), [], None
                return np.concatenate(out[0]), out[1], out[2], out[3]

            self._add_multi(f"nested:{col}", [col], frag, nested_fn)

    def _build_consistency(self, rule: ConsistencyRule) -> None:
        name = rule.name or f"{rule.kind}:{rule.left}~{rule.right}"
        frag_obj = {"consistency": {"kind": rule.kind, "left": rule.left, "right": rule.right}}

        def fn(tbl, rule=rule):
            left, lp = self._col_ctx(tbl, rule.left)
            right, rp = self._col_ctx(tbl, rule.right)
            if left is None or right is None:
                return np.array([], dtype=np.int64), [], None
            if rule.kind == "list_len_eq":
                if not (pa.types.is_list(left.type) or pa.types.is_large_list(left.type)):
                    return np.array([], dtype=np.int64), [], None
                ln = pc.fill_null(pc.list_value_length(left), -1).to_numpy(zero_copy_only=False)
            elif rule.kind == "str_len_eq":
                ln = pc.fill_null(pc.utf8_length(left), -1).to_numpy(zero_copy_only=False)
            else:
                raise E.SchemaInvalidError(E.SCHEMA_INVALID, f"unknown consistency kind {rule.kind}")
            rv = _to_f64(right)
            with np.errstate(invalid="ignore"):
                bad = lp & rp & (ln.astype(np.float64) != rv)
            idx = np.flatnonzero(bad)
            if len(idx) == 0:
                return idx, [], None
            vals = [
                _json_val({"len": int(ln[i]), rule.right: int(rv[i])}) for i in idx
            ]
            return idx, vals, None

        self._add(name, rule.error_atom, [rule.left], frag_obj, fn)

    def _build_conditional(self, rule) -> None:
        """Draft-7-style table-level if/then/else (engine extension —
        the reference's keyword set stops at draft-6 and ignores the
        unknown keywords, src/jesse_validator_draft4.erl:259-260).

        Fully vectorized: the condition mask is the AND of per-column
        ``_spec_valid_mask`` calls (NULL condition values do NOT pass),
        and each branch's sub-specs are evaluated once per batch and
        gated by the branch mask — no per-row dispatch."""
        frag_obj = {
            "if": {"properties": {c: s.to_fragment() for c, s in rule.if_.items()}},
            "then": {"properties": {c: s.to_fragment() for c, s in rule.then_.items()}},
            "else": {"properties": {c: s.to_fragment() for c, s in rule.else_.items()}},
        }
        branch_cols = sorted(set(rule.then_) | set(rule.else_))

        def fn(tbl, rule=rule, branch_cols=branch_cols):
            n = tbl.num_rows
            cond = np.ones(n, dtype=bool)
            for col, sub in rule.if_.items():
                arr, present = self._col_ctx(tbl, col)
                if arr is None:
                    cond &= False
                    break
                cond &= present & self._spec_valid_mask(sub, arr)
            bad = np.zeros(n, dtype=bool)
            for branch_mask, branch in ((cond, rule.then_), (~cond, rule.else_)):
                if not branch or not branch_mask.any():
                    continue
                for col, sub in branch.items():
                    arr, present = self._col_ctx(tbl, col)
                    if arr is None:
                        # branch demands a column the batch lacks:
                        # every row in the branch fails
                        bad |= branch_mask
                        continue
                    bad |= branch_mask & present & ~self._spec_valid_mask(sub, arr)
            idx = np.flatnonzero(bad)
            if len(idx) == 0:
                return idx, [], None
            # value_json: the branch columns of each offending row
            cols = {}
            for col in branch_cols:
                arr, _p = self._col_ctx(tbl, col)
                if arr is not None:
                    cols[col] = arr.take(pa.array(idx, type=pa.int64())).to_pylist()
            vals = [
                _json_val({c: v[i] for c, v in cols.items()})
                for i in range(len(idx))
            ]
            return idx, vals, None

        self._add(
            f"conditional:{rule.name}",
            E.CONDITIONAL_NOT_VALID,
            branch_cols,
            frag_obj,
            fn,
        )

    def _build_dependency(self, col: str, needs: list[str]) -> None:
        # property dependencies, array form: col present ⇒ needs present
        # (src/jesse_validator_draft4.erl:637-694)
        def fn(tbl, col=col, needs=needs):
            arr, present = self._col_ctx(tbl, col)
            if arr is None:
                return np.array([], dtype=np.int64), [], None
            bad = np.zeros(tbl.num_rows, dtype=bool)
            for dep in needs:
                darr, dpresent = self._col_ctx(tbl, dep)
                miss = ~dpresent if darr is not None else np.ones(tbl.num_rows, dtype=bool)
                bad |= present & miss
            idx = np.flatnonzero(bad)
            return idx, self._values_json(arr, idx), None

        self._add(
            f"dependencies:{col}",
            E.MISSING_DEPENDENCY,
            [col],
            {"dependencies": {col: needs}},
            fn,
        )

    # -- public API --

    def check_schema(self, schema: pa.Schema) -> None:
        """Launch-time schema gate: the additionalProperties:false
        analogue — unexpected columns abort before the data plane starts
        (SURVEY §2.3 mapping of src/jesse_validator_draft4.erl:431-507)."""
        if not self.spec.additional_columns_allowed:
            extra = set(schema.names) - set(self.spec.columns)
            if self.spec.column_patterns:
                pats = [re.compile(p) for p in self.spec.column_patterns]
                extra = {c for c in extra if not any(rx.search(c) for rx in pats)}
            if extra:
                raise E.SchemaInvalidError(
                    E.NO_EXTRA_PROPERTIES_ALLOWED, f"unexpected columns {sorted(extra)}"
                )
        # propertyNames (draft-6): every column NAME must validate the
        # sub-spec (src/jesse_validator_draft6.erl:114-125,424-436) —
        # like additionalProperties, names are schema-side in the
        # columnar mapping, so this is a launch gate, not a data error.
        if self.spec.property_names is not None:
            names = pa.array(list(schema.names), type=pa.string())
            ok = self._spec_valid_mask(self.spec.property_names, names)
            if not ok.all():
                bad = [schema.names[i] for i in np.flatnonzero(~ok)]
                raise E.SchemaInvalidError(
                    E.NOT_SCHEMA_VALID, f"propertyNames: invalid column names {sorted(bad)}"
                )
        # min/maxProperties → column-count bounds at launch
        # (src/jesse_validator_draft4.erl:1073-1107, compile-time per SURVEY §2.3)
        n_cols = len(schema.names)
        if self.spec.max_columns is not None and n_cols > self.spec.max_columns:
            raise E.SchemaInvalidError(E.TOO_MANY_PROPERTIES, f"{n_cols} columns > {self.spec.max_columns}")
        if self.spec.min_columns is not None and n_cols < self.spec.min_columns:
            raise E.SchemaInvalidError(E.TOO_FEW_PROPERTIES, f"{n_cols} columns < {self.spec.min_columns}")

    def check_batch(
        self,
        tbl: pa.Table,
        *,
        allowed_errors: Optional[int] = None,
        error_handler: Optional[Callable[[pa.Table, Optional[int]], pa.Table]] = None,
    ) -> pa.Table:
        """All row-level checks over one Arrow batch → violations table.

        ``allowed_errors`` reproduces jesse's per-document error budget
        (src/jesse_error.erl:71-78; default wiring src/jesse_state.erl:138-141):
        ``None`` ≡ 'infinity' (collect everything, our default);
        ``0`` ≡ jesse's default stop-at-first (one violation per row);
        ``N>0`` ≡ collect up to N+1 violations per row (jesse appends
        until the budget is EXCEEDED, then throws carrying the list).
        Emission order is the spec's keyword order, so "first" is
        deterministic.

        ``error_handler`` is the pluggable violation-sink hook — the
        batch analogue of jesse's per-error ``error_handler(Error,
        ErrorList, AllowedErrors)`` option (src/jesse.erl:61-66,
        default src/jesse_error.erl:67-78): it receives this batch's
        violations table plus the allowed_errors budget and returns the
        (possibly transformed/filtered) table to emit, or raises to
        abort the run.  Must be a picklable top-level callable — it
        ships to workers inside the fused validator state.
        """
        key = self.spec.key_column
        key_arr = _combine(tbl[key]) if key and key in tbl.column_names else None
        cap = None if allowed_errors is None else (1 if allowed_errors == 0 else allowed_errors + 1)
        row_counts = np.zeros(tbl.num_rows, dtype=np.int32) if cap is not None else None
        out_doc, out_path, out_err, out_val, out_frag = [], [], [], [], []
        for em in self._emits:
            result = em.fn(tbl)
            idx, vals, paths = result[0], result[1], result[2]
            atoms = result[3] if len(result) > 3 else None
            if len(idx) == 0:
                continue
            if cap is not None:
                idx = np.asarray(idx, dtype=np.int64)
                keep = np.flatnonzero(row_counts[idx] < cap)
                if len(keep) == 0:
                    continue
                # within one emit, several violations can hit the same row
                # (per-element items checks): honor the cap inside the emit
                # by counting occurrences in order
                sel = []
                for k in keep:
                    r = idx[k]
                    if row_counts[r] < cap:
                        row_counts[r] += 1
                        sel.append(int(k))
                idx = idx[sel]
                vals = [vals[k] for k in sel]
                if paths is not None:
                    paths = [paths[k] for k in sel]
                if atoms is not None:
                    atoms = [atoms[k] for k in sel]
                if len(idx) == 0:
                    continue
            if key_arr is not None:
                docs = key_arr.take(pa.array(idx, type=pa.int64())).to_pylist()
                docs = [d if d is None else str(d) for d in docs]
            else:
                docs = [None] * len(idx)
            out_doc.extend(docs)
            out_path.extend(paths if paths is not None else [em.path] * len(idx))
            out_err.extend(atoms if atoms is not None else [em.error] * len(idx))
            out_val.extend(vals)
            out_frag.extend([em.fragment] * len(idx))
        if not out_err:
            result = empty_violations()
        else:
            result = pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "path": pa.array(out_path, type=pa.list_(pa.string())),
                    "error": pa.array(out_err, type=pa.string()),
                    "value_json": pa.array(out_val, type=pa.string()),
                    "schema_fragment": pa.array(out_frag, type=pa.string()),
                },
                schema=VIOLATION_SCHEMA,
            )
        # schema-form dependencies: rows where the trigger column is
        # present are validated against the dependent sub-spec, and the
        # CHILD's violations propagate as-is — mirroring the reference's
        # recursive check of the enclosing object against the dependency
        # schema (src/jesse_validator_draft4.erl:656-668).  Runs outside
        # the allowed_errors budget (documented delta: the budget caps
        # keyword emissions per row; dependency children are appended).
        if self._schema_deps:
            parts = [result] if result.num_rows else []
            for col, sub in self._schema_deps:
                arr, present = self._col_ctx(tbl, col)
                if arr is None or not present.any():
                    continue
                filtered = tbl.filter(pa.array(present))
                child = sub.check_batch(filtered, allowed_errors=allowed_errors)
                if child.num_rows:
                    parts.append(child)
            if parts:
                result = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        if error_handler is not None:
            result = error_handler(result, allowed_errors)
        return result

    def invalid_row_mask(self, tbl: pa.Table) -> np.ndarray:
        """Per-row boolean: True where the row has ≥1 row-level violation.
        The vectorized analogue of jesse's default ``allowed_errors=0``
        early-exit verdict (src/jesse_error.erl:71-78): we don't need the
        error list, just pass/fail."""
        bad = np.zeros(tbl.num_rows, dtype=bool)
        for em in self._emits:
            idx = em.fn(tbl)[0]
            if len(idx):
                bad[np.asarray(idx, dtype=np.int64)] = True
        for col, sub in self._schema_deps:
            arr, present = self._col_ctx(tbl, col)
            if arr is None or not present.any():
                continue
            rows = np.flatnonzero(present)
            child_bad = sub.invalid_row_mask(tbl.filter(pa.array(present)))
            bad[rows[child_bad]] = True
        return bad


def compile_spec(spec: TableSpec) -> CompiledSpec:
    return CompiledSpec(spec)
