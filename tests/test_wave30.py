"""Wave-30 unit tests: nearest-join tie/tolerance rules and PPS
selection algebra."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def test_nearest_join_tie_prefers_earlier(ray_session, tmp_path):
    import pyarrow.parquet as pq_

    from jesse_ray.pipelines.queries30 import q_events_nearest_join

    # user 1: error at t=100s, purchases at 40s and 160s -> equal 60s
    # gaps, must pick the EARLIER purchase (id 10)
    # user 2: error at 0, nearest purchase 2h away -> outside tolerance
    rows = [
        (1, 1, 40_000_000, "purchase"),
        (10, 1, 40_000_000, "purchase"),
        (2, 1, 100_000_000, "error"),
        (11, 1, 160_000_000, "purchase"),
        (3, 2, 0, "error"),
        (12, 2, 7_200_000_000, "purchase"),
    ]
    # drop the duplicate purchase id 1 (keep 10 and 11 as candidates)
    rows = [r for r in rows if r[0] != 1]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], dtype="datetime64[us]")),
        "event_type": pa.array([r[3] for r in rows]),
    })
    p = tmp_path / "events.parquet"
    pq_.write_table(tbl, p)
    out = q_events_nearest_join(str(tmp_path))
    assert out["event_id"].tolist() == [2]
    assert out["purchase_id"].tolist() == [10]  # earlier on equal gap
    assert out["gap_us"].tolist() == [60_000_000]


def test_pps_selection_covers_big_weights(ray_session):
    """Systematic PPS must include every order whose weight exceeds one
    step (w > W/n ⇒ selected with certainty)."""
    from jesse_ray.pipelines.queries30 import PPS_N, q_orders_pps_sample

    out = q_orders_pps_sample("/root/testdata/sf0.001")
    n_sel = int(out["n_selected"].iloc[0])
    assert 0 < n_sel <= PPS_N
    # HT count estimate should be in the right ballpark of the truth
    est = float(out["ht_count_estimate"].iloc[0])
    true = int(out["true_count"].iloc[0])
    assert 0.5 * true < est < 2.0 * true
