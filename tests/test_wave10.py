"""Wave-10 operators: TWAP, trimmed mean, seasonality strength, peak
detection (DuckDB parity covered by tools/check_oracles.py; these pin
the kernels on crafted corpora)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type=None, value=None):
    n = len(ts)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(event_type if event_type is not None else ["x"] * n),
        "value": pa.array(np.asarray(value if value is not None else np.ones(n),
                                     dtype=np.float64)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_twap_weights_by_holding_time(tmp_path):
    from jesse_ray.pipelines.queries10 import q_events_twap

    # holding times: v=10 for 1s, v=20 for 3s, v=99 for 5s; the last
    # observation carries no weight → TWAP = (10·1 + 20·3 + 99·5) / 9
    ts = ["2024-01-01T00:00:00", "2024-01-01T00:00:01",
          "2024-01-01T00:00:04", "2024-01-01T00:00:09"]
    _write_events(tmp_path, ts, value=[10.0, 20.0, 99.0, 7.0])
    got = q_events_twap(str(tmp_path))
    assert int(got["n_gaps"].iloc[0]) == 3
    assert abs(got["twap"].iloc[0] - round((10 * 1 + 20 * 3 + 99 * 5) / 9, 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_drops_tails(tmp_path):
    from jesse_ray.pipelines.queries10 import q_lineitem_trimmed_mean

    # 10 values 1..10, 10% trim drops 1 from each end → mean(2..9) = 5.5
    t = pa.table({
        "l_returnflag": pa.array(["A"] * 10),
        "l_quantity": pa.array([float(i) for i in range(1, 11)]),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = q_lineitem_trimmed_mean(str(tmp_path))
    assert int(got["n_kept"].iloc[0]) == 8
    assert abs(got["trimmed_mean"].iloc[0] - 5.5) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_grid_vs_rows():
    # grid-walk trimming must equal the row-based definition under ties
    rng = np.random.default_rng(8)
    vals = rng.integers(1, 8, 200).astype(np.float64)
    n = len(vals)
    k = int(np.floor(0.1 * n))
    want = round(float(np.sort(vals)[k:n - k].mean()), 5)
    # reuse the production kernel on a single flag
    import ray
    import pyarrow.parquet as pq2
    import tempfile, os

    from jesse_ray.pipelines.queries10 import q_lineitem_trimmed_mean

    with tempfile.TemporaryDirectory() as td:
        t = pa.table({"l_returnflag": pa.array(["R"] * n), "l_quantity": pa.array(vals)})
        pq2.write_table(t, os.path.join(td, "lineitem.parquet"))
        got = q_lineitem_trimmed_mean(td)
    assert abs(got["trimmed_mean"].iloc[0] - want) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_seasonality_strength_pure_seasonal(tmp_path):
    from jesse_ray.pipelines.queries10 import q_orders_seasonality_strength

    # order volume EXACTLY determined by month → residual var 0 → strength 1
    ts = []
    for m, cnt in [(1, 2), (2, 5), (3, 9)]:
        for d in (1, 15):
            ts += [f"1995-{m:02d}-{d:02d}"] * cnt
    t = pa.table({"o_orderdate": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "orders.parquet")
    got = q_orders_seasonality_strength(str(tmp_path))
    assert abs(got["strength"].iloc[0] - 1.0) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_peaks_detects_burst(tmp_path):
    from jesse_ray.pipelines.queries10 import q_events_peaks

    # daily counts 3,3,9,3,3 → day 3 is a strict local max above 1.05×median(3)
    ts = (["2024-01-01"] * 3 + ["2024-01-02"] * 3 + ["2024-01-03"] * 9
          + ["2024-01-04"] * 3 + ["2024-01-05"] * 3)
    _write_events(tmp_path, ts)
    got = q_events_peaks(str(tmp_path))
    day3 = int(pd.Timestamp("2024-01-03").value // 1000 // 86400000000)
    assert got["day"].tolist() == [day3]
    assert got["n"].tolist() == [9]
