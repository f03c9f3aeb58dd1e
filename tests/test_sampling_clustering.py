"""Stratified sampling, HyperLogLog distinct, and k-means tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from jesse_ray.functions.clustering import kmeans, kmeans_assign, kmeans_fit
from jesse_ray.functions.split import stratified_hash_sample
from jesse_ray.sketches import HyperLogLog
from jesse_ray.stages.distinct import hll_distinct


def _tbl(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(batches) if batches else pa.table({})


# ---------------------------------------------------------------------------
# stratified sampling


def _strat_ds(n=4000):
    rng = np.random.default_rng(7)
    src = rng.choice(["a", "b", "keepall", "dropall", "other"], size=n)
    return ray.data.from_arrow(
        pa.table({"doc_id": [f"d-{i:05d}" for i in range(n)], "source": src})
    ), src


def test_stratified_sample_rates_and_determinism(ray_session):
    ds, src = _strat_ds()
    rates = {"a": 0.5, "b": 0.1, "keepall": 1.0, "dropall": 0.0}
    t1 = _tbl(stratified_hash_sample(ds, "doc_id", rates)).sort_by("doc_id")
    t2 = _tbl(stratified_hash_sample(ds, "doc_id", rates)).sort_by("doc_id")
    assert t1.equals(t2)  # deterministic
    got = dict(
        zip(*np.unique(t1["source"].to_numpy(zero_copy_only=False).astype(str), return_counts=True))
    )
    n_keep = int((src == "keepall").sum())
    assert got.get("keepall") == n_keep  # rate 1.0 keeps everything
    assert "dropall" not in got  # rate 0.0 drops everything
    assert "other" not in got  # absent stratum -> default_rate 0.0
    # rates approximately honored (binomial, ~800 rows per stratum)
    assert abs(got["a"] / (src == "a").sum() - 0.5) < 0.06
    assert abs(got["b"] / (src == "b").sum() - 0.1) < 0.05


def test_stratified_sample_default_rate_and_salt(ray_session):
    ds, src = _strat_ds(2000)
    t_def = _tbl(stratified_hash_sample(ds, "doc_id", {"a": 0.3}, default_rate=1.0))
    # non-"a" strata all kept under default_rate=1.0
    non_a = int((src != "a").sum())
    kept_non_a = int(
        (t_def["source"].to_numpy(zero_copy_only=False).astype(str) != "a").sum()
    )
    assert kept_non_a == non_a
    # a different salt draws an (almost surely) different subset
    r = {"a": 0.5, "b": 0.5, "keepall": 0.5, "dropall": 0.5, "other": 0.5}
    s1 = set(_tbl(stratified_hash_sample(ds, "doc_id", r, salt="s1"))["doc_id"].to_pylist())
    s2 = set(_tbl(stratified_hash_sample(ds, "doc_id", r, salt="s2"))["doc_id"].to_pylist())
    assert s1 != s2


def test_stratified_sample_rejects_bad_rate(ray_session):
    ds, _ = _strat_ds(10)
    with pytest.raises(ValueError):
        stratified_hash_sample(ds, "doc_id", {"a": 1.5})


# ---------------------------------------------------------------------------
# HyperLogLog


def test_hll_merge_equals_single_pass():
    from jesse_ray.hashutil import fmix64

    h_all = HyperLogLog(12)
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    a = fmix64(np.arange(0, 30000, dtype=np.uint64))
    b = fmix64(np.arange(20000, 50000, dtype=np.uint64))
    h_all.add_hashes(np.concatenate([a, b]))
    h1.add_hashes(a)
    h2.add_hashes(b)
    h1.merge(h2)
    assert np.array_equal(h1.registers, h_all.registers)
    assert abs(h1.estimate() / 50000 - 1) < 0.05
    # serialization round-trip
    assert HyperLogLog.from_bytes(h1.to_bytes()).estimate() == h1.estimate()


def test_hll_rejects_bad_precision_and_mixed_merge():
    with pytest.raises(ValueError):
        HyperLogLog(5)
    with pytest.raises(ValueError):
        HyperLogLog(12).merge(HyperLogLog(13))


def test_hll_distinct_int_list_column(ray_session):
    rng = np.random.default_rng(3)
    true_distinct = 8000
    vals = rng.integers(0, true_distinct, size=(3000, 20), dtype=np.int64)
    # ensure every value 0..7999 appears
    vals[:true_distinct // 20, :] = np.arange(true_distinct).reshape(-1, 20)
    ds = ray.data.from_arrow(
        pa.table({"tokens": pa.array(vals.tolist(), type=pa.list_(pa.int32()))})
    )
    est = hll_distinct(ds, "tokens", flatten=True, p=14)
    assert abs(est / true_distinct - 1) < 0.03


def test_hll_distinct_string_column(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": [f"key-{i % 1000}" for i in range(10000)]})
    )
    est = hll_distinct(ds, "k", p=14)
    assert abs(est / 1000 - 1) < 0.05


# ---------------------------------------------------------------------------
# k-means


def _blob_ds(k=4, per=100, dim=8, spread=0.05):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(k, dim)) * 10
    X = np.concatenate([centers[i] + rng.normal(scale=spread, size=(per, dim)) for i in range(k)])
    ids = np.arange(len(X))
    perm = rng.permutation(len(X))
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids[perm], type=pa.int64()),
                    "embedding": pa.array(X[perm].tolist(), type=pa.list_(pa.float32())),
                }
            )
        ),
        X,
        per,
    )


def test_kmeans_recovers_planted_blobs(ray_session):
    ds, X, per = _blob_ds()
    # seed one centroid near each blob (one data point per blob, so the
    # Lloyd update math — not init luck — is what's under test)
    init = X[[0, per, 2 * per, 3 * per]].astype(np.float64)
    cents = kmeans_fit(ds, 4, n_iters=6, batch_size=64, init=init)
    t = _tbl(kmeans_assign(ds, cents, batch_size=64)).sort_by("vec_id")
    labels = t["cluster"].to_numpy(zero_copy_only=False)
    # each planted blob maps to exactly one k-means cluster
    for b in range(4):
        blob_labels = labels[b * per : (b + 1) * per]
        assert len(set(blob_labels.tolist())) == 1
    # distinct blobs -> distinct clusters, sizes exact
    assert sorted(np.bincount(labels, minlength=4).tolist()) == [per] * 4
    # converged centroids are the blob means
    for b in range(4):
        c = cents[labels[b * per]]
        np.testing.assert_allclose(c, X[b * per : (b + 1) * per].mean(axis=0), atol=1e-9)


def test_kmeans_assignment_is_argmin(ray_session):
    ds, X, _ = _blob_ds(k=3, per=50)
    cents = kmeans_fit(ds, 3, n_iters=4, batch_size=32)
    t = _tbl(kmeans_assign(ds, cents, batch_size=32)).sort_by("vec_id")
    labels = t["cluster"].to_numpy(zero_copy_only=False)
    # the dataset stores float32 embeddings — compare against the same values
    x32 = X.astype(np.float32).astype(np.float64)
    d = ((x32[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert np.array_equal(labels, d.argmin(axis=1))
    # sqdist column matches the true squared distance (engine uses the
    # expanded |x|^2 - 2xc + |c|^2 form: allow cancellation noise)
    sq = t["sqdist"].to_numpy(zero_copy_only=False)
    np.testing.assert_allclose(sq, d.min(axis=1), rtol=1e-6, atol=1e-6)


def test_kmeans_deterministic(ray_session):
    ds, _, _ = _blob_ds(k=3, per=40)
    c1 = kmeans_fit(ds, 3, n_iters=3, batch_size=32)
    c2 = kmeans_fit(ds, 3, n_iters=3, batch_size=32)
    np.testing.assert_allclose(c1, c2, rtol=0, atol=1e-12)


def test_kmeans_too_few_rows(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"vec_id": [0], "embedding": pa.array([[1.0, 2.0]], type=pa.list_(pa.float32()))})
    )
    with pytest.raises(ValueError):
        kmeans_fit(ds, 3, n_iters=1)


# ---------------------------------------------------------------------------
# centroid_outliers


def test_centroid_outliers_matches_numpy(ray_session):
    rng = np.random.default_rng(21)
    n, dim = 300, 8
    x = rng.normal(size=(n, dim)).astype(np.float32)
    lab = rng.integers(0, 5, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
                "label": pa.array(lab),
            }
        )
    )
    from jesse_ray.functions.clustering import centroid_outliers

    k = 4
    got = centroid_outliers(ds, vec_col="embedding", label_col="label",
                            id_col="vec_id", k=k, batch_size=64)
    # numpy oracle: exact centroid per label, top-k by d2 desc, id asc
    xd = x.astype(np.float64)
    rows = []
    for l in np.unique(lab):
        m = lab == l
        c = xd[m].mean(axis=0)
        d2 = ((xd[m] - c) ** 2).sum(axis=1)
        ids = np.arange(n)[m]
        order = np.lexsort((ids, -d2))[:k]
        for r, i in enumerate(order, 1):
            rows.append((int(l), r, int(ids[i])))
    want = sorted(rows)
    g = list(
        zip(
            got["label"].to_pylist(),
            got["rnk"].to_pylist(),
            got["vec_id"].to_pylist(),
        )
    )
    assert sorted(g) == want


def test_centroid_outliers_fewer_than_k(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1], type=pa.int64()),
                "embedding": pa.array([[0.0, 0.0], [1.0, 1.0]], type=pa.list_(pa.float32())),
                "label": pa.array([7, 7], type=pa.int64()),
            }
        )
    )
    from jesse_ray.functions.clustering import centroid_outliers

    got = centroid_outliers(ds, k=5)
    assert len(got) == 2
    assert got["rnk"].to_pylist() == [1, 2]


# ---------------------------------------------------------------------------
# product quantization


def test_pq_fit_assign_optimal_codes(ray_session):
    rng = np.random.default_rng(31)
    n, dim, m, k = 240, 16, 4, 4
    x = rng.normal(size=(n, dim)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            }
        )
    )
    from jesse_ray.functions.similarity import pq_assign, pq_fit

    books = pq_fit(ds, m=m, k=k, n_iters=3, batch_size=64)
    assert books.shape == (m, k, dim // m)
    t = pa.concat_tables(list(pq_assign(ds, books, batch_size=64).iter_batches(batch_format="pyarrow")))
    assert len(t) == n * m
    # every code is argmin of the true subspace distance
    sub = dim // m
    xd = x.astype(np.float64)
    codes = {(v, j): c for v, j, c in zip(t["vec_id"].to_pylist(), t["j"].to_pylist(), t["code"].to_pylist())}
    for v in range(0, n, 37):
        for j in range(m):
            d = ((xd[v, j * sub:(j + 1) * sub] - books[j]) ** 2).sum(axis=1)
            assert codes[(v, j)] == int(d.argmin())


def test_pq_fit_deterministic(ray_session):
    rng = np.random.default_rng(32)
    x = rng.normal(size=(100, 8)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(100, dtype=np.int64)),
                "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            }
        )
    )
    from jesse_ray.functions.similarity import pq_fit

    b1 = pq_fit(ds, m=2, k=4, n_iters=2, batch_size=32)
    b2 = pq_fit(ds, m=2, k=4, n_iters=2, batch_size=32)
    np.testing.assert_allclose(b1, b2, rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# PCA


def test_pca_fit_matches_numpy(ray_session):
    rng = np.random.default_rng(41)
    n, dim, od = 300, 12, 3
    x = (rng.normal(size=(n, dim)) @ np.diag(np.linspace(5, 0.1, dim))).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
            }
        )
    )
    from jesse_ray.functions.similarity import pca_fit, pca_transform

    mu, W = pca_fit(ds, od, batch_size=64)
    xd = x.astype(np.float64)
    np.testing.assert_allclose(mu, xd.mean(axis=0), rtol=1e-9, atol=1e-9)
    cov = (xd.T @ xd) / n - np.outer(mu, mu)
    w_ref, v_ref = np.linalg.eigh(cov)
    ref = v_ref[:, ::-1][:, :od]
    # component spans must agree up to sign
    for j in range(od):
        c = abs(float(ref[:, j] @ W[:, j]))
        assert c > 1 - 1e-6
    # projection variance per component == eigenvalue (descending)
    t = pa.concat_tables(list(
        pca_transform(ds, mu, W, batch_size=64).iter_batches(batch_format="pyarrow")
    ))
    import pyarrow.compute as _pc
    p = _pc.list_flatten(t["pca"].combine_chunks()).to_numpy(zero_copy_only=False).reshape(n, od)
    np.testing.assert_allclose(p.var(axis=0), w_ref[::-1][:od], rtol=1e-6)


def test_logreg_fit_learns_separable(ray_session):
    rng = np.random.default_rng(42)
    n = 400
    a = rng.normal(size=n)
    y = (a > 0).astype(np.float64)
    tbl = pa.table({"a": pa.array(a), "y": pa.array(y)})
    ds = ray.data.from_arrow(tbl)
    from jesse_ray.functions.linear import logreg_fit

    def feats(b: pa.Table) -> np.ndarray:
        v = b["a"].to_numpy(zero_copy_only=False)
        return np.column_stack([np.ones(len(v)), v])

    def lab(b: pa.Table) -> np.ndarray:
        return b["y"].to_numpy(zero_copy_only=False)

    w = logreg_fit(ds, feats, lab, n_features=2, lr=1.0, n_steps=30, batch_size=64)
    # slope strongly positive, accuracy high
    assert w[1] > 1.0
    z = w[0] + w[1] * a
    assert ((z > 0) == (y > 0.5)).mean() > 0.9
    # deterministic across runs
    w2 = logreg_fit(ds, feats, lab, n_features=2, lr=1.0, n_steps=30, batch_size=64)
    np.testing.assert_array_equal(w, w2)


def test_knn_graph_exact_small(ray_session):
    import numpy as np
    import pyarrow as pa
    from jesse_ray.functions.similarity import knn_graph

    rng = np.random.default_rng(3)
    n, d = 40, 8
    M = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n), type=pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in M],
                                        type=pa.list_(pa.float32()))})
    got = knn_graph(ray.data.from_arrow(t), k=3, batch_size=7).to_pandas()
    got = got.sort_values(["vec_id", "rank"]).reset_index(drop=True)

    Mf = M.astype(np.float64)
    Mf /= np.linalg.norm(Mf, axis=1, keepdims=True)
    sims = Mf @ Mf.T
    np.fill_diagonal(sims, -np.inf)
    for i in range(n):
        order = np.lexsort((np.arange(n), -sims[i]))[:3]
        sub = got[got["vec_id"] == i]
        assert sub["neighbor_id"].tolist() == list(order)
        assert sub["rank"].tolist() == [1, 2, 3]
