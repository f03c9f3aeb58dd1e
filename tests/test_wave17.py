"""Wave-17 operators: supplier histogram, revenue Lorenz deciles
(DuckDB parity via tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_supplier_hist_counts_distinct(tmp_path):
    from jesse_ray.pipelines.queries17 import q_part_supplier_hist

    # part 1: suppliers {5, 5, 6} → 2 distinct; part 2: {7} → 1
    t = pa.table({"l_partkey": pa.array([1, 1, 1, 2], type=pa.int64()),
                  "l_suppkey": pa.array([5, 5, 6, 7], type=pa.int64())})
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = q_part_supplier_hist(str(tmp_path)).set_index("n_suppliers")
    assert got["n_parts"].to_dict() == {1: 1, 2: 1}


@pytest.mark.usefixtures("ray_session")
def test_lorenz_deciles_sum_to_one(tmp_path):
    from jesse_ray.pipelines.queries17 import q_orders_revenue_lorenz

    rng = np.random.default_rng(3)
    cust = np.repeat(np.arange(100, dtype=np.int64), 3)
    t = pa.table({"o_custkey": pa.array(cust),
                  "o_totalprice": pa.array(rng.exponential(1000, 300))})
    pq.write_table(t, tmp_path / "orders.parquet")
    got = q_orders_revenue_lorenz(str(tmp_path))
    assert got["n"].sum() == 100 and len(got) == 10
    assert abs(got["rev_share"].sum() - 1.0) < 1e-3
    # deciles ordered ascending by revenue → shares non-decreasing
    assert (np.diff(got["rev_share"].to_numpy()) >= -1e-12).all()
