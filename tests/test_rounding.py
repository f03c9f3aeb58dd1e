"""round_half_away must reproduce DuckDB's round(DOUBLE, d) bit-for-bit.

DuckDB rounds half-AWAY-from-zero via std::round(x * 10^d) / 10^d
(RoundOperatorPrecision); Python/numpy/pandas/pyarrow default to
half-to-EVEN, which splits the engines at exact dyadic ties
(e.g. 157/160 = 0.98125 -> 0.9812 vs 0.9813 at 4 digits — the
doc_ngram_jaccard failure class from the round-4 sf0.1 sweep).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jesse_ray.rounding import round_half_away


def test_known_ties():
    assert round_half_away(2.5) == 3.0
    assert round_half_away(-2.5) == -3.0
    assert round_half_away(0.5) == 1.0
    assert round_half_away(-0.5) == -1.0
    assert round_half_away(0.98125, 4) == 0.9813  # the observed failure value
    assert round_half_away(0.125, 2) == 0.13
    assert round_half_away(-0.125, 2) == -0.13


def test_one_ulp_off_tie_is_not_a_tie():
    # 1 ulp below 0.5: nearest integer is 0, NOT a tie — the naive
    # v - floor(v) == 0.5 test misfires here via cancellation
    assert round_half_away(0.49999999999999994) == 0.0
    assert round_half_away(-0.49999999999999994) == 0.0


def test_non_ties_match_numpy():
    rng = np.random.default_rng(7)
    v = rng.normal(0, 100, 10000)
    for d in (0, 2, 4):
        got = round_half_away(v, d)
        ref = np.round(v * 10.0**d) / 10.0**d
        tie = (2 * np.rint(v * 10.0**d * 2) % 2) != 0  # crude: ignore ties
        mask = got != ref
        # any disagreement with numpy must be at a true tie of the scaled value
        for x in v[mask]:
            tv = x * 10.0**d * 2
            assert tv == np.floor(tv) and np.fmod(tv, 2.0) != 0.0


def test_bit_exact_vs_duckdb():
    rng = np.random.default_rng(0)
    vals = list(rng.normal(0, 1000, 5000))
    for d in range(0, 6):
        step = 10.0 ** (-d)
        ks = rng.integers(-10**6, 10**6, 500)
        vals += list((ks + 0.5) * step)
        vals += list(np.nextafter((ks + 0.5) * step, 0))
        vals += list(np.nextafter((ks + 0.5) * step, np.inf))
    num = rng.integers(-1000, 1000, 5000)
    den = rng.integers(1, 1000, 5000)
    vals += list(num / den)
    vals += [0.0, -0.0, np.nan, np.inf, -np.inf, 2.5, -2.5, 0.98125,
             4503599627370495.5, 1e300]
    v = np.array(vals, dtype=np.float64)
    con = duckdb.connect()
    con.register("t", pa.table({"x": v}))
    for d in (0, 1, 2, 4, 5, 6):
        want = con.execute(f"SELECT round(x, {d}) AS r FROM t").fetchnumpy()["r"]
        got = round_half_away(v, d)
        gb = np.where(got == 0.0, 0.0, got)
        wb = np.where(want == 0.0, 0.0, want)
        ok = (gb == wb) | (np.isnan(gb) & np.isnan(wb))
        assert ok.all(), f"d={d}: {np.flatnonzero(~ok)[:5]}"


def test_series_keeps_index_and_name():
    s = pd.Series([1.25, 2.35], index=[10, 20], name="x")
    r = round_half_away(s, 1)
    assert isinstance(r, pd.Series)
    assert list(r.index) == [10, 20]
    assert r.name == "x"


def test_chunked_array_input():
    ca = pa.chunked_array([[0.125, 2.5], [None, 0.98125]])
    r = round_half_away(ca, 2)
    assert isinstance(r, np.ndarray)
    assert r[0] == 0.13 and r[1] == 2.5 and np.isnan(r[2]) and r[3] == 0.98


def test_scalar_returns_float():
    out = round_half_away(3.14159, 2)
    assert isinstance(out, float) and out == 3.14
