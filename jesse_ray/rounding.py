"""DuckDB-exact float rounding.

Python ``round``, ``numpy.round``, ``pandas.Series.round`` and pyarrow's
default ``pc.round`` all round half-to-EVEN; DuckDB's ``round(DOUBLE, d)``
rounds half-AWAY-from-zero (``std::round(x * 10^d) / 10^d`` — see duckdb
``RoundOperatorPrecision``).  On almost all data the scaled value is not an
exact dyadic tie and the engines agree bit-for-bit, but ratios of small
integers (e.g. 157/160 = 0.98125 at 4 digits) sit exactly on the tie and
split the engines — the failure mode that hit ``doc_ngram_jaccard`` /
``doc_prefix_jaccard`` at sf0.1 (BASELINE.md round-4 sweep notes).

``round_half_away`` reproduces DuckDB's computation exactly: same scale
multiply, same half-away tie rule, same divide, same inf/nan passthrough.
Every float column the catalog emits rounds through here (or through
``pc.round(..., round_mode="half_towards_infinity")``, verified equivalent
in tests/test_rounding.py) so a Ray result and its DuckDB oracle twin are
bit-identical even at dyadic ties.
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x, ndigits: int = 0):
    """DuckDB-compatible round: ``std::round(x * 10^d) / 10^d``.

    Accepts a scalar, numpy array, pandas Series or pyarrow array-like
    (anything ``np.asarray`` handles); returns float64 ndarray (or a
    Python float for scalar input).  NaN/inf pass through like DuckDB.
    """
    scalar = np.isscalar(x) or (hasattr(x, "ndim") and getattr(x, "ndim", 1) == 0)
    index = name = None
    if hasattr(x, "iloc") and hasattr(x, "index"):  # pandas Series: keep index
        index, name = x.index, getattr(x, "name", None)
    arr = np.asarray(x, dtype=np.float64)
    p = np.float64(10.0) ** ndigits
    v = arr * p
    # np.rint is the correctly-rounded nearest integer (half-to-even) —
    # right everywhere except exact ties.  A double v is a true tie iff
    # 2v is an odd integer (2v is exact: power-of-two multiply), which
    # avoids the cancellation trap of testing v - floor(v) == 0.5 (that
    # comparison also fires for v one ulp OFF the tie, e.g.
    # -0.49999999999999994, and would misround it).
    with np.errstate(invalid="ignore"):
        tv = v * 2.0
        tie = (tv == np.floor(tv)) & (np.fmod(tv, 2.0) != 0.0)
        # at a tie v = +-(k + 0.5), away-from-zero is v + copysign(0.5, v),
        # exact because k + 1 is representable whenever k + 0.5 is
        r = np.where(tie, np.where(v > 0.0, v + 0.5, v - 0.5), np.rint(v))
        out = r / p
        # duckdb returns the input unchanged when the scaled value is inf/nan
        out = np.where(np.isfinite(v), out, arr)
    if scalar:
        return float(out)
    if index is not None:
        import pandas as pd

        return pd.Series(out, index=index, name=name)
    return out
