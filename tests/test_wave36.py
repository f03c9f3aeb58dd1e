"""Wave-36 unit tests: W1 identity and conformal rank rule."""

import numpy as np


def test_w1_integer_form_matches_scipy_style():
    """The integer numerator / (na*nb) equals the classic ECDF-integral
    Wasserstein-1 on a hand distribution."""
    a_vals = np.array([1, 2, 2, 5])
    b_vals = np.array([2, 3, 5, 5, 7])
    vals = np.unique(np.concatenate([a_vals, b_vals]))
    a = np.array([(a_vals == v).sum() for v in vals])
    b = np.array([(b_vals == v).sum() for v in vals])
    na, nb = a.sum(), b.sum()
    ca, cb = np.cumsum(a), np.cumsum(b)
    gaps = np.diff(vals)
    num = sum(abs(int(x) * nb - int(y) * na) * int(g)
              for x, y, g in zip(ca[:-1], cb[:-1], gaps))
    # reference: integral |F_a - F_b| dv over the real line
    ref = 0.0
    for v0, v1 in zip(vals[:-1], vals[1:]):
        fa = (a_vals <= v0).mean()
        fb = (b_vals <= v0).mean()
        ref += abs(fa - fb) * (v1 - v0)
    assert abs(num / (na * nb) - ref) < 1e-12


def test_conformal_rank_rule():
    # n=9, alpha=0.1 -> rank = ceil(10 * 0.9) = 9
    n = 9
    rank = min(n, -(-((n + 1) * 9) // 10))
    assert rank == 9
    # n=19 -> ceil(20*0.9) = 18
    n = 19
    assert min(n, -(-((n + 1) * 9) // 10)) == 18


def test_conformal_coverage_bounds(ray_session):
    from jesse_ray.pipelines.queries36 import q_doc_conformal_coverage

    out = q_doc_conformal_coverage("/root/testdata/sf0.001")
    r = out.iloc[0]
    assert 0 < r["n_calib"] and 0 < r["n_eval"]
    assert 0 <= r["n_covered"] <= r["n_eval"]
    # finite-sample guarantee holds comfortably on iid-ish data
    assert r["n_covered"] / r["n_eval"] > 0.75
