"""Wave-27 unit tests: MMD moment identity and interval-coverage
islands."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def test_mmd_moment_identity():
    """||Sa/na - Sb/nb||_F^2 equals the V-statistic
    mean_aa'(a.a')^2 + mean_bb'(b.b')^2 - 2 mean_ab(a.b)^2."""
    rng = np.random.default_rng(0)
    a = rng.integers(-5, 6, (7, 4)).astype(np.float64)
    b = rng.integers(-5, 6, (9, 4)).astype(np.float64)
    sa, sb = a.T @ a, b.T @ b
    closed = ((sa / len(a) - sb / len(b)) ** 2).sum()
    kaa = ((a @ a.T) ** 2).mean()
    kbb = ((b @ b.T) ** 2).mean()
    kab = ((a @ b.T) ** 2).mean()
    assert abs(closed - (kaa + kbb - 2 * kab)) < 1e-9


def test_mmd_zero_for_identical_groups(ray_session):
    from jesse_ray.pipelines.queries27 import q_emb_mmd_quadratic

    out = q_emb_mmd_quadratic("/root/testdata/sf0.001")
    # different label groups: statistic strictly positive
    assert float(out["mmd_stat"].iloc[0]) > 0
    assert int(out["n_a"].iloc[0]) > 0 and int(out["n_b"].iloc[0]) > 0


def test_interval_coverage_hand_example(ray_session):
    from jesse_ray.pipelines.queries27 import COV_WIN_S, q_events_interval_coverage  # noqa: F401

    # hand check of the island algebra on a tiny series (win = 300 s):
    # [0, 300) U [100, 400) U [1000, 1300) -> coverage 400 + 300, 2 islands
    ts = np.array([0, 100_000_000, 1_000_000_000], dtype=np.int64)
    win = np.int64(300 * 1_000_000)
    end = ts + win
    cm = np.maximum.accumulate(end)
    prev = np.concatenate([[ts[0] - 1], cm[:-1]])
    starts = np.flatnonzero(ts > prev)
    lens = np.diff(np.append(starts, len(ts)))
    cov = cm[starts + lens - 1] - ts[starts]
    assert cov.tolist() == [400_000_000, 300_000_000]
    assert len(starts) == 2


def test_interval_coverage_bounds(ray_session):
    from jesse_ray.pipelines.queries27 import COV_WIN_S, q_events_interval_coverage

    out = q_events_interval_coverage("/root/testdata/sf0.001")
    # each island covers at least one window; coverage >= islands * win
    assert (out["covered_us"] >= out["n_islands"] * COV_WIN_S * 1_000_000).all()
