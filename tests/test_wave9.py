"""Wave-9 operators: token-set exact prefix-filter Jaccard join,
forward as-of join, interpolated per-group percentiles (DuckDB parity
covered by tools/check_oracles.py; these pin the kernels)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


@pytest.mark.usefixtures("ray_session")
def test_token_prefix_join_equals_brute_force():
    from jesse_ray.functions.dedup import token_prefix_jaccard_join

    rng = np.random.default_rng(4)
    rows = []
    for i in range(150):
        toks = rng.integers(0, 300, size=int(rng.integers(10, 60))).tolist()
        rows.append(toks)
        if i % 9 == 0:
            rows.append(toks[: max(3, int(len(toks) * 0.8))])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        "tokens": pa.array(rows, type=pa.list_(pa.int32()))}))
    out = token_prefix_jaccard_join(ds, threshold_num=1, threshold_den=2,
                                    emit_counts=True).to_pandas() \
        .sort_values(["left", "right"]).reset_index(drop=True)
    sets = [np.unique(np.asarray(t, dtype=np.uint64)) for t in rows]
    want = {}
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            uni = len(sets[i]) + len(sets[j]) - inter
            if inter / max(uni, 1) >= 0.5:
                want[(i, j)] = (inter, uni)
    got = {(int(l), int(r)): (int(i), int(u))
           for l, r, i, u in zip(out["left"], out["right"], out["inter"], out["union_sz"])}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_asof_forward_picks_next():
    from jesse_ray.pipelines.relational import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([10, 20, 15], type=pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([12, 25, 14], type=pa.int64()),
        "v": pa.array(["a", "b", "c"])}))
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="ts",
                    right_cols=["v"], direction="forward").to_pandas() \
        .sort_values(["k", "ts"]).reset_index(drop=True)
    # k=1,ts=10 → next right at 12 ('a'); k=1,ts=20 → 25 ('b');
    # k=2,ts=15 → none (right at 14 is in the past)
    assert out["v"].tolist() == ["a", "b", None]


@pytest.mark.usefixtures("ray_session")
def test_asof_forward_inclusive_and_backward_unchanged():
    from jesse_ray.pipelines.relational import asof_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()), "ts": pa.array([12], type=pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([12, 30], type=pa.int64()),
        "v": pa.array(["x", "y"])}))
    fwd = asof_join(left, right, by="k", left_ts="ts", right_ts="ts",
                    right_cols=["v"], direction="forward").to_pandas()
    bwd = asof_join(left, right, by="k", left_ts="ts", right_ts="ts",
                    right_cols=["v"]).to_pandas()
    assert fwd["v"].tolist() == ["x"]  # inclusive
    assert bwd["v"].tolist() == ["x"]


@pytest.mark.usefixtures("ray_session")
def test_pctl_cont_matches_numpy(tmp_path):
    import pyarrow.parquet as pq

    from jesse_ray.pipelines.queries9 import q_events_value_pctl_cont

    rng = np.random.default_rng(2)
    vals = rng.normal(50, 12, 500)
    t = pa.table({
        "event_id": pa.array(np.arange(500, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 500)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(500, dtype=np.int64)),
        "event_type": pa.array(["a"] * 250 + ["b"] * 250),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 500),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_value_pctl_cont(str(tmp_path)).set_index(["event_type", "q"])
    for et, sel in (("a", vals[:250]), ("b", vals[250:])):
        for q in (0.5, 0.9, 0.99):
            assert abs(got.loc[(et, q), "pctl"] - round(float(np.quantile(sel, q)), 5)) < 1e-12
