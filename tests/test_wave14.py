"""Wave-14 operators: type co-occurrence, new-customer trend,
bimodality (DuckDB parity covered by tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_type_cooc_bitmask_hand_case(tmp_path):
    from jesse_ray.pipelines.queries14 import q_events_type_cooc

    # entities: (u1,d1)={a,b}, (u1,d2)={a}, (u2,d1)={b}
    # a-audience 2, b-audience 2, both 1 → jaccard 1/3
    ts = ["2024-01-01", "2024-01-01", "2024-01-02", "2024-01-01"]
    users = [1, 1, 1, 2]
    et = ["a", "b", "a", "b"]
    t = pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us")),
        "user_id": pa.array(users, type=pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array(np.ones(4)),
        "props": pa.array(["{}"] * 4),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_type_cooc(str(tmp_path))
    assert len(got) == 1
    assert int(got["n_both"].iloc[0]) == 1
    assert abs(got["jaccard"].iloc[0] - round(1 / 3, 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_newcust_trend_all_new_then_none(tmp_path):
    from jesse_ray.pipelines.queries14 import q_orders_newcust_trend

    # month 1: customers 1,2 (all new, share 1); month 2: same
    # customers return (share 0) → perfectly declining trend, corr -1
    ts = ["1995-01-05", "1995-01-06", "1995-02-05", "1995-02-06"]
    cust = [1, 2, 1, 2]
    t = pa.table({"o_custkey": pa.array(cust, type=pa.int64()),
                  "o_orderdate": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "orders.parquet")
    got = q_orders_newcust_trend(str(tmp_path))
    assert int(got["n_months"].iloc[0]) == 2
    assert got["trend_corr"].iloc[0] == -1.0


@pytest.mark.usefixtures("ray_session")
def test_bimodality_two_spikes(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries14 as q14

    # a half-and-half two-point mixture has kurtosis at its minimum →
    # bimodality coefficient near its maximum (≈1 for large n)
    ntok = np.array([10] * 200 + [1000] * 200, dtype=np.int32)
    t = pa.table({"doc_id": pa.array([f"doc-{i:08d}" for i in range(400)]),
                  "tokens": pa.array([[1]] * 400, type=pa.list_(pa.int32())),
                  "n_tok": pa.array(ntok, type=pa.int32()),
                  "source": pa.array(["web"] * 400)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q14, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q14.q_seq_ntok_bimodality(str(tmp_path))
    assert got["bimodality"].iloc[0] > 0.9  # >> 5/9 bimodal threshold
