"""Arbitrary-precision (Erlang bignum) parity beyond int64.

The reference compares bignums exactly (src/jesse_lib.erl:219-261);
its own test data goes to 30 digits.  Here the engine is exercised at
40-76 digits: decimal128(38,0) and decimal256(76,0) columns through
uniqueItems, enum, type:integer and range keywords — all without Ray
(pure compiler paths)."""

import decimal

import pyarrow as pa

from jesse_ray import errors as E
from jesse_ray.compiler import compile_spec
from jesse_ray.spec import from_json_schema

BIG40 = 10**40 + 7          # 41 digits
BIG70 = 10**70 + 123        # 71 digits


def _col(values, digits):
    typ = pa.decimal128(38, 0) if digits <= 38 else pa.decimal256(76, 0)
    return pa.array([[decimal.Decimal(v) for v in row] for row in values],
                    type=pa.list_(typ))


def _scalar_col(values, digits):
    typ = pa.decimal128(38, 0) if digits <= 38 else pa.decimal256(76, 0)
    return pa.array([decimal.Decimal(v) for v in values], type=typ)


def _compiled(schema):
    return compile_spec(from_json_schema({"properties": {"v": schema}}, key_column=None))


def test_unique_items_bignum_adjacent_not_collapsed():
    # adjacent 71-digit values differ in the last digit — a float64
    # normalization would call them duplicates; the engine must not
    c = _compiled({"type": "array", "uniqueItems": True})
    tbl = pa.table({"v": _col([[BIG70, BIG70 + 1]], 71)})
    assert c.check_batch(tbl).num_rows == 0


def test_unique_items_bignum_true_duplicate_flagged():
    c = _compiled({"type": "array", "uniqueItems": True})
    tbl = pa.table({"v": _col([[BIG70, BIG70], [BIG40, BIG40 + 1]], 71)})
    v = c.check_batch(tbl)
    assert v.num_rows == 1
    assert v["error"].to_pylist() == [E.NOT_UNIQUE]


def test_unique_items_decimal128_38_digits():
    x = 10**37 + 5
    c = _compiled({"type": "array", "uniqueItems": True})
    assert c.check_batch(pa.table({"v": _col([[x, x + 1]], 38)})).num_rows == 0
    assert c.check_batch(pa.table({"v": _col([[x, x]], 38)})).num_rows == 1


def test_enum_bignum_exact_membership():
    c = _compiled({"enum": [BIG70, 3]})
    tbl = pa.table({"v": _scalar_col([BIG70, BIG70 + 1], 71)})
    v = c.check_batch(tbl)
    # BIG70 is in the enum; BIG70+1 (adjacent — float64 would collapse)
    # is not
    assert v.num_rows == 1
    assert v["error"].to_pylist() == [E.NOT_IN_ENUM]


def test_enum_cross_numeric_decimal_vs_float():
    # 1.0 == 1 deep equality carries over to decimal columns
    # (src/jesse_lib.erl:177-181)
    c = _compiled({"enum": [1.0]})
    tbl = pa.table({"v": _scalar_col([1], 38)})
    assert c.check_batch(tbl).num_rows == 0


def test_type_integer_accepts_scale0_decimal():
    c = _compiled({"type": "integer"})
    assert c.check_batch(pa.table({"v": _scalar_col([BIG70], 71)})).num_rows == 0
    assert c.check_batch(pa.table({"v": _scalar_col([BIG40], 41)})).num_rows == 0


def test_type_integer_rejects_scaled_decimal():
    # scale>0 decimals are numbers, not integers (draft-4: zero-fraction
    # floats are still not integers, src/jesse_validator_draft4.erl:306-318)
    c = _compiled({"type": "integer"})
    col = pa.array([decimal.Decimal("1.5")], type=pa.decimal128(10, 2))
    v = c.check_batch(pa.table({"v": col}))
    assert v.num_rows == 1
    assert v["error"].to_pylist() == [E.WRONG_TYPE]


def test_range_bounds_on_bignum_column():
    c = _compiled({"type": "integer", "minimum": 0, "maximum": BIG70})
    tbl = pa.table({"v": _scalar_col([BIG70, BIG70 + 1], 71)})
    v = c.check_batch(tbl)
    assert v.num_rows == 1
    assert v["error"].to_pylist() == [E.NOT_IN_RANGE]


def test_pcre_fallback_lookaround_vectorized_100k():
    # lookahead is RE2-rejected → python `re` fallback; 100k rows with a
    # bounded value domain exercise the dictionary-encoded scatter path
    import time

    from jesse_ray.compiler import _pattern_mask
    import numpy as np

    vals = ["password1", "nope", None, "abc9", "zzz"] * 20_000
    arr = pa.array(vals, type=pa.string())
    t0 = time.time()
    got = _pattern_mask(arr, r"^(?=.*\d).*$")  # lookahead: has a digit
    wall = time.time() - t0
    expect = np.array([v is not None and any(ch.isdigit() for ch in v) for v in vals])
    assert (got == expect).all()
    assert wall < 1.0  # 5 distinct values -> 5 regex runs + one scatter


def test_pcre_fallback_high_cardinality_matches_loop():
    from jesse_ray.compiler import _pattern_mask
    import numpy as np
    import re as _re

    vals = [f"x{i}y{i % 7}" if i % 11 else None for i in range(5_000)]
    arr = pa.array(vals, type=pa.string())
    got = _pattern_mask(arr, r"(?<=x)1.*y")  # lookbehind
    rx = _re.compile(r"(?<=x)1.*y")
    expect = np.array([v is not None and rx.search(v) is not None for v in vals])
    assert (got == expect).all()


def test_decimal_literal_exact_beyond_context_precision():
    """Violation-message serialization of Decimals is EXACT at any
    precision (ADVICE r4: float(v) rounded past ~17 significant digits;
    normalize()/to_integral_value() round past the 28-digit context)."""
    from jesse_ray.compiler import _json_val

    d41 = decimal.Decimal("12345678901234567890123456789012345678901.5")
    assert _json_val(d41) == "12345678901234567890123456789012345678901.5"
    assert _json_val(decimal.Decimal("2.00")) == "2.0"  # float canonical rule
    assert _json_val(decimal.Decimal("2")) == "2"
    assert _json_val(decimal.Decimal("-3.14000")) == "-3.14"
    assert _json_val(decimal.Decimal("1E-9")) == "0.000000001"
