"""Wave-37 unit tests: interleave lockstep property and stump argmin."""

import numpy as np


def test_interleave_positions_lockstep(ray_session):
    from jesse_ray.pipelines.queries37 import q_seq_interleave_plan

    out = q_seq_interleave_plan("/root/testdata/sf0.001")
    # positions are a prefix 0..K-1 with no gaps, and consecutive
    # positions rotate through sources (round robin)
    assert out["pos"].tolist() == list(range(len(out)))
    srcs = out["source"].tolist()
    n_src = len(set(srcs))
    for i in range(len(srcs) - n_src):
        assert srcs[i] == srcs[i + n_src]  # same source every n_src steps


def test_stump_best_minimizes_gini(ray_session):
    from jesse_ray.pipelines.queries37 import q_lineitem_stump_grid

    out = q_lineitem_stump_grid("/root/testdata/sf0.001")
    best = out[out["is_best"]]
    assert len(best) == 1
    assert np.isclose(best["gini"].iloc[0], out["gini"].min())
    # split counts conserve totals
    tot = out["pos_left"] + out["pos_right"]
    assert tot.nunique() == 1
