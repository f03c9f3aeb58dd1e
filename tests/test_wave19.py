"""Wave-19: power-law fit, stutter rate, factorial grid."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_powerlaw_alpha_known(tmp_path):
    from jesse_ray.pipelines.queries19 import q_events_powerlaw_activity

    # users with counts 1,1,2,4: alpha = 1 + 4/(0+0+ln2+ln4)
    users = [1, 2, 3, 3, 4, 4, 4, 4]
    t = pa.table({
        "event_id": pa.array(np.arange(8, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 8)).cast(pa.timestamp("us")),
        "user_id": pa.array(users, type=pa.int64()),
        "event_type": pa.array(["x"] * 8),
        "value": pa.array(np.ones(8)),
        "props": pa.array(["{}"] * 8),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_powerlaw_activity(str(tmp_path))
    want = 1.0 + 4 / (np.log(2) + np.log(4))
    assert abs(got["alpha"].iloc[0] - round(float(want), 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_stutter_rate_hand_case(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries19 as q19

    # rows: [1,1,2] → pairs (1,1),(1,2) → 1 rep of 2;
    #       [3,4]   → pair (3,4) → 0 rep of 1; no cross-row pair
    rows = [[1, 1, 2], [3, 4]]
    t = pa.table({"doc_id": pa.array(["doc-00000000", "doc-00000001"]),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([3, 2], type=pa.int32()),
                  "source": pa.array(["web"] * 2)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q19, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q19.q_seq_stutter_rate(str(tmp_path))
    assert int(got["n_pairs"].iloc[0]) == 3
    assert int(got["n_rep"].iloc[0]) == 1


@pytest.mark.usefixtures("ray_session")
def test_factorial_cells(tmp_path):
    from jesse_ray.pipelines.queries19 import q_lineitem_factorial_means

    t = pa.table({"l_discount": pa.array([0.0, 0.1, 0.0, 0.1]),
                  "l_tax": pa.array([0.0, 0.0, 0.08, 0.08]),
                  "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0])})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = q_lineitem_factorial_means(str(tmp_path)).set_index(["hd", "ht"])
    assert got.loc[(0, 0), "mean_price"] == 10.0
    assert got.loc[(1, 1), "mean_price"] == 40.0
