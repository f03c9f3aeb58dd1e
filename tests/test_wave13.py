"""Wave-13 operators: dup-cluster histogram, per-user entropy, Wilson
intervals (DuckDB parity covered by tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_dup_cluster_hist_planted(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries13 as q13

    # 4 unique rows + one triple + one pair → hist {1: 4, 2: 1, 3: 1}
    rows = [[1, 2], [3, 4], [5, 6], [7, 8],
            [9, 9], [9, 9], [9, 9],
            [5, 5], [5, 5]]
    t = pa.table({"doc_id": pa.array([f"doc-{i:08d}" for i in range(len(rows))]),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([2] * len(rows), type=pa.int32()),
                  "source": pa.array(["web"] * len(rows))})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q13, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q13.q_seq_dup_cluster_hist(str(tmp_path)).set_index("cluster_size")
    assert got["n_clusters"].to_dict() == {1: 4, 2: 1, 3: 1}


@pytest.mark.usefixtures("ray_session")
def test_user_entropy_extremes(tmp_path):
    from jesse_ray.pipelines.queries13 import q_events_user_entropy

    # user 1: single type → entropy 0; user 2: uniform over 2 → ln 2
    et = ["a", "a", "a", "a"] + ["a", "b"]
    users = [1, 1, 1, 1, 2, 2]
    t = pa.table({
        "event_id": pa.array(np.arange(6, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 6)).cast(pa.timestamp("us")),
        "user_id": pa.array(users, type=pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array(np.ones(6)),
        "props": pa.array(["{}"] * 6),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_user_entropy(str(tmp_path))
    assert got["n_users"].iloc[0] == 2
    assert got["min_entropy"].iloc[0] == 0.0
    assert abs(got["max_entropy"].iloc[0] - round(np.log(2), 5)) < 1e-12
    assert abs(got["mean_entropy"].iloc[0] - round(np.log(2) / 2, 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_wilson_interval_contains_share(tmp_path):
    from jesse_ray.pipelines.queries13 import q_events_type_share_wilson

    et = ["a"] * 80 + ["b"] * 20
    t = pa.table({
        "event_id": pa.array(np.arange(100, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 100)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(100, dtype=np.int64)),
        "event_type": pa.array(et),
        "value": pa.array(np.ones(100)),
        "props": pa.array(["{}"] * 100),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_type_share_wilson(str(tmp_path)).set_index("event_type")
    assert got.loc["a", "ci_lo"] < 0.8 < got.loc["a", "ci_hi"]
    assert got.loc["b", "ci_lo"] < 0.2 < got.loc["b", "ci_hi"]
    # Wilson never escapes [0, 1]
    assert (got["ci_lo"] >= 0).all() and (got["ci_hi"] <= 1).all()
