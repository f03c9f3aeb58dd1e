"""Wave-15 operators: id-order autocorrelation (key-shift join), DOW
uniformity chi-square (DuckDB parity via tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_order_autocorr_alternating(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries15 as q15

    # lengths alternate 10, 20, 10, 20... → adjacent pairs perfectly
    # anti-correlated → acf1 = -1
    n = 40
    ntok = np.where(np.arange(n) % 2 == 0, 10, 20).astype(np.int32)
    t = pa.table({"doc_id": pa.array([f"doc-{i:08d}" for i in range(n)]),
                  "tokens": pa.array([[1]] * n, type=pa.list_(pa.int32())),
                  "n_tok": pa.array(ntok, type=pa.int32()),
                  "source": pa.array(["web"] * n)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q15, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q15.q_seq_length_order_autocorr(str(tmp_path))
    assert int(got["n_pairs"].iloc[0]) == n - 1
    assert got["acf1"].iloc[0] == -1.0


@pytest.mark.usefixtures("ray_session")
def test_dow_uniformity_flat_is_zero(tmp_path):
    from jesse_ray.pipelines.queries15 import q_orders_dow_uniformity

    # exactly 3 orders on each of 7 consecutive days → chi2 = 0
    ts = [f"1995-01-{d:02d}" for d in range(2, 9) for _ in range(3)]
    t = pa.table({"o_orderdate": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "orders.parquet")
    got = q_orders_dow_uniformity(str(tmp_path))
    assert int(got["k"].iloc[0]) == 7
    assert got["chi2"].iloc[0] == 0.0
