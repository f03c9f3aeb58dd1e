"""Wave-25 unit tests: k-center geometry, RBO closed form, weighted
Jaccard exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def test_kcenter_picks_farthest_points(ray_session):
    """On 3 well-separated clusters the greedy coreset must visit all
    three clusters before revisiting any (farthest-point-first)."""
    from jesse_ray.functions.similarity import kcenter_select

    rng = np.random.default_rng(3)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    rows = []
    for cid in range(3):
        for i in range(20):
            rows.append((cid * 20 + i, centers[cid] + rng.normal(0, 0.05, 3)))
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              type=pa.list_(pa.float64())),
    })
    out = kcenter_select(ray.data.from_arrow(tbl), k=3, seed_id=0)
    clusters = {int(v) // 20 for v in out["vec_id"]}
    assert clusters == {0, 1, 2}


def test_rbo_identical_rankings_is_one():
    """RBO_min of a ranking with itself at full depth ~= 1 - p^D
    (the truncated mass); per-depth intersections are d."""
    p, D = 0.9, 20
    inter = list(range(1, D + 1))
    rbo = 0.0
    for d in range(1, D + 1):
        rbo += (p ** (d - 1)) * inter[d - 1] / d
    rbo *= (1.0 - p)
    # identical prefix: (1-p) * sum p^(d-1) = 1 - p^D
    assert abs(rbo - (1 - p ** D)) < 1e-12


def test_weighted_jaccard_hand_example(ray_session):
    from jesse_ray.pipelines.queries25 import q_doc_weighted_jaccard  # noqa: F401
    # inline check of the min/max identity on a hand pair
    a = {"x": 3, "y": 1}
    b = {"x": 1, "y": 2, "z": 1}
    words = set(a) | set(b)
    inter = sum(min(a.get(w, 0), b.get(w, 0)) for w in words)
    union = sum(max(a.get(w, 0), b.get(w, 0)) for w in words)
    assert (inter, union) == (2, 6)
    # union == tot_a + tot_b - inter (the twin's formulation)
    assert union == sum(a.values()) + sum(b.values()) - inter


def test_weighted_jaccard_pairs_symmetric_and_thresholded(ray_session):
    """End-to-end on the test corpus: every emitted pair satisfies the
    1/3 threshold in exact integer form and is canonically ordered."""
    from jesse_ray.pipelines.queries25 import WJ_MIN_DEN, WJ_MIN_NUM, q_doc_weighted_jaccard

    out = q_doc_weighted_jaccard("/root/testdata/sf0.001")
    assert (out["left"] < out["right"]).all()
    assert (WJ_MIN_DEN * out["inter_w"] >= WJ_MIN_NUM * out["union_w"]).all()
    assert (out["inter_w"] <= out["union_w"]).all()
