"""Wave-8 catalog operators: FK orphan matrix, cross-correlation,
binary segmentation, Kaplan–Meier, runs test, silhouette, Cramér's V,
lognormal fit (DuckDB parity is covered by tools/check_oracles.py;
these pin the kernels on crafted corpora with hand-computable
structure)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, user_id=None, event_type=None, value=None):
    n = len(ts)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.asarray(user_id if user_id is not None else np.zeros(n),
                                       dtype=np.int64)),
        "event_type": pa.array(event_type if event_type is not None else ["x"] * n),
        "value": pa.array(np.asarray(value if value is not None else np.ones(n),
                                     dtype=np.float64)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_fk_orphans_planted(tmp_path):
    from jesse_ray.pipelines.queries8 import q_fk_orphan_matrix

    pq.write_table(pa.table({"r_regionkey": pa.array([0, 1], type=pa.int32())}),
                   tmp_path / "region.parquet")
    pq.write_table(pa.table({"n_nationkey": pa.array([0, 1], type=pa.int32()),
                             "n_regionkey": pa.array([0, 7], type=pa.int32())}),
                   tmp_path / "nation.parquet")  # one orphan region ref
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2], type=pa.int64()),
                             "c_nationkey": pa.array([0, 1], type=pa.int32())}),
                   tmp_path / "customer.parquet")
    pq.write_table(pa.table({"s_suppkey": pa.array([5], type=pa.int64()),
                             "s_nationkey": pa.array([0], type=pa.int32())}),
                   tmp_path / "supplier.parquet")
    pq.write_table(pa.table({"p_partkey": pa.array([9], type=pa.int64())}),
                   tmp_path / "part.parquet")
    pq.write_table(pa.table({"o_orderkey": pa.array([10, 11], type=pa.int64()),
                             "o_custkey": pa.array([1, 99], type=pa.int64())}),
                   tmp_path / "orders.parquet")  # one orphan customer ref
    pq.write_table(pa.table({"l_orderkey": pa.array([10, 10, 42], type=pa.int64()),
                             "l_partkey": pa.array([9, 9, 9], type=pa.int64()),
                             "l_suppkey": pa.array([5, 5, 5], type=pa.int64())}),
                   tmp_path / "lineitem.parquet")  # one orphan order ref
    got = q_fk_orphan_matrix(str(tmp_path)).set_index("fk")
    assert got.loc["nation.n_regionkey->region", "n_orphans"] == 1
    assert got.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert got.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert got.loc["lineitem.l_partkey->part", "n_orphans"] == 0
    assert got.loc["customer.c_nationkey->nation", "n_orphans"] == 0
    assert got["n_child"].to_dict() == {
        "customer.c_nationkey->nation": 2, "lineitem.l_orderkey->orders": 3,
        "lineitem.l_partkey->part": 3, "lineitem.l_suppkey->supplier": 3,
        "nation.n_regionkey->region": 2, "orders.o_custkey->customer": 2,
        "supplier.s_nationkey->nation": 1}


@pytest.mark.usefixtures("ray_session")
def test_crosscorr_perfect_at_lag1(tmp_path):
    from jesse_ray.pipelines.queries8 import q_events_crosscorr

    # clicks (1,2,3) on days 1..3; purchases (1,2,3) on days 2..4 →
    # perfect correlation at lag +1
    ts, et = [], []
    for d, n in [(1, 1), (2, 2), (3, 3)]:
        ts += [f"2024-01-0{d}"] * n
        et += ["click"] * n
    for d, n in [(2, 1), (3, 2), (4, 3)]:
        ts += [f"2024-01-0{d}"] * n
        et += ["purchase"] * n
    _write_events(tmp_path, ts, event_type=et)
    got = q_events_crosscorr(str(tmp_path)).set_index("lag")
    assert got.loc[1, "n"] == 3 and abs(got.loc[1, "xcorr"] - 1.0) < 1e-12
    assert got.loc[0, "n"] == 2  # overlap days 2,3


@pytest.mark.usefixtures("ray_session")
def test_binseg_finds_level_shift(tmp_path):
    from jesse_ray.pipelines.queries8 import q_events_binseg

    # daily means: 1,1,1 then 5,5 → optimal split after day 3, SSE 0
    ts = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"]
    vals = [1.0, 1.0, 1.0, 5.0, 5.0]
    _write_events(tmp_path, ts, value=vals)
    got = q_events_binseg(str(tmp_path))
    day3 = int(pd.Timestamp("2024-01-03").value // 1000 // 86400000000)
    assert int(got["split_day"].iloc[0]) == day3
    assert abs(got["sse"].iloc[0]) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_km_hand_curve(tmp_path):
    from jesse_ray.pipelines.queries8 import q_events_survival_km

    # u1: day0 + day2 (gap 2); u2: day0 only (censored at 5);
    # u3: day3 + day4 (gap 1); corpus max day = day 5 via u4's event
    ts = ["2024-01-01", "2024-01-03",        # u1
          "2024-01-01",                       # u2 (censored, tt=5)
          "2024-01-04", "2024-01-05",        # u3
          "2024-01-06"]                       # u4 single event day5 → tt=0? censored tt=0
    users = [1, 1, 2, 3, 3, 4]
    _write_events(tmp_path, ts, user_id=users)
    got = q_events_survival_km(str(tmp_path)).set_index("t_day")
    # event times: 1 (u3), 2 (u1); u2 censored tt=5, u4 censored tt=0
    # at_risk(1) = {u1(2), u2(5), u3(1)} = 3 → S(1) = 2/3
    # at_risk(2) = {u1, u2} = 2 → S(2) = (2/3)(1/2) = 1/3
    assert got.loc[1, "at_risk"] == 3 and got.loc[1, "n_events"] == 1
    assert abs(got.loc[1, "survival"] - round(2 / 3, 5)) < 1e-12
    assert got.loc[2, "at_risk"] == 2
    assert abs(got.loc[2, "survival"] - round(1 / 3, 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_runs_test_hand_case(tmp_path):
    from jesse_ray.pipelines.queries8 import q_orders_runs_test

    # daily counts (1,2,9,8,3): median (disc rule) = 3, dropped; sides
    # (0,0,1,1) → runs 2, n1=2, n0=2 → z = (2-3)/sqrt(2/3)
    ts = (["1995-01-01"] * 1 + ["1995-01-02"] * 2 + ["1995-01-03"] * 9
          + ["1995-01-04"] * 8 + ["1995-01-05"] * 3)
    t = pa.table({"o_orderdate": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us"))})
    pq.write_table(t, tmp_path / "orders.parquet")
    got = q_orders_runs_test(str(tmp_path))
    assert int(got["runs"].iloc[0]) == 2
    assert int(got["n_above"].iloc[0]) == 2 and int(got["n_below"].iloc[0]) == 2
    assert abs(got["z"].iloc[0] - round((2 - 3.0) / np.sqrt(2 / 3), 4)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_silhouette_separated_clusters(tmp_path):
    from jesse_ray.pipelines.queries8 import q_emb_silhouette

    # two point-mass clusters → a = 0, b > 0 → silhouette exactly 1
    emb = [[0.0, 0.0]] * 5 + [[10.0, 10.0]] * 5
    t = pa.table({
        "vec_id": pa.array(np.arange(10, dtype=np.int64)),
        "embedding": pa.array(emb, type=pa.list_(pa.float32())),
        "label": pa.array([0] * 5 + [1] * 5, type=pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = q_emb_silhouette(str(tmp_path)).set_index("label")
    assert abs(got.loc[0, "silhouette"] - 1.0) < 1e-12
    assert abs(got.loc[1, "silhouette"] - 1.0) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_cramers_v_perfect_association(tmp_path):
    from jesse_ray.pipelines.queries8 import q_customer_cramers_v

    t = pa.table({
        "c_mktsegment": pa.array(["A"] * 5 + ["B"] * 5),
        "c_nationkey": pa.array([1] * 5 + [2] * 5, type=pa.int32()),
    })
    pq.write_table(t, tmp_path / "customer.parquet")
    got = q_customer_cramers_v(str(tmp_path))
    assert abs(got["cramers_v"].iloc[0] - 1.0) < 1e-12
    assert abs(got["chi2"].iloc[0] - 10.0) < 1e-12  # chi2 = n for 2x2 perfect


@pytest.mark.usefixtures("ray_session")
def test_lognormal_fit_matches_numpy(tmp_path):
    from jesse_ray.pipelines.queries8 import q_doc_lognormal_fit

    rng = np.random.default_rng(3)
    nch = np.exp(rng.normal(5.5, 0.8, 400)).astype(np.int64) + 1
    t = pa.table({"source": pa.array(["web"] * 400),
                  "n_chars": pa.array(nch, type=pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    got = q_doc_lognormal_fit(str(tmp_path))
    lx = np.log(nch)
    assert abs(got["mu"].iloc[0] - round(float(lx.mean()), 5)) < 1e-9
    assert abs(got["sigma"].iloc[0] - round(float(lx.std(ddof=1)), 5)) < 1e-9
