"""Distributed k-means over an embedding column (Lloyd's algorithm).

The scale-path clustering primitive for semantic dedup / corpus
bucketing (public recipe: k-means over document embeddings, e.g.
SemDeDup, Abbas et al. 2023 — only the algorithm, Lloyd 1982, is used
here).  Ray-Data-first design:

- centroids are broadcast via ``ray.put`` once per iteration (k × dim
  doubles — small); every task resolves the ref once;
- each batch computes assignments with one dense matmul
  (``|x|^2 - 2 X C^T + |c|^2``, argmin over k) and emits k partial rows
  (cluster, vector sum, count) — a combiner, so the per-iteration
  traffic is k×dim per BATCH, never the corpus;
- partials funnel through one coalescing merge level (the drift-sketch
  tree pattern, stages/drift.py:63) before the driver reduces at most
  ``fan_in`` × k rows.  No groupby, no sort, no all-to-all.

Initialization is deterministic: the k vectors with the smallest keys
(per-batch local min-k, then a driver merge of k-row partials) — stable
across runs and repartitionings, so results are oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans"]


def _mat(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix (fixed dim)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    dim = len(flat) // n
    return flat.reshape(n, dim)


def _assign_ids(x: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster ids, squared distances) per row — one matmul."""
    x2 = (x * x).sum(axis=1, keepdims=True)
    c2 = (cents * cents).sum(axis=1)
    d = x2 - 2.0 * (x @ cents.T) + c2[None, :]
    ids = d.argmin(axis=1)
    return ids, np.maximum(d[np.arange(len(x)), ids], 0.0)


def _init_centroids(ds: Dataset, k: int, vec_col: str, key_col: str) -> np.ndarray:
    """Deterministic pseudo-random seeding: the k vectors whose
    fmix64-hashed keys are smallest — uniform over the corpus (naive
    smallest-KEY picks correlated rows, e.g. one blob's ids), stable
    across runs/repartitionings, and still shuffle-free: per-batch local
    min-k by hash, k-row partials merged on the driver."""
    import pyarrow.compute as pc

    from jesse_ray.hashutil import fmix64, hash64_strings

    def local_mink(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if not (pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)):
            keys = pc.cast(keys, pa.string())
        h = fmix64(hash64_strings(pc.fill_null(keys, "")))
        t = pa.table({"__h": pa.array(h), vec_col: batch[vec_col]})
        order = pa.compute.sort_indices(t["__h"])
        return t.take(order[: min(k, batch.num_rows)])

    parts = ds.map_batches(local_mink, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(parts.iter_batches(batch_format="pyarrow"))
    tbl = tbl.take(pa.compute.sort_indices(tbl["__h"])[:k])
    cents = _mat(tbl[vec_col])
    if len(cents) < k:
        raise ValueError(f"need >= {k} rows to initialize k-means, got {len(cents)}")
    return cents


_PARTIAL_SCHEMA = pa.schema(
    [
        pa.field("cluster", pa.int32()),
        pa.field("vsum", pa.large_binary()),  # float64 vector bytes
        pa.field("cnt", pa.int64()),
    ]
)


def _partials_table(sums: np.ndarray, counts: np.ndarray) -> pa.Table:
    nz = np.flatnonzero(counts)
    return pa.table(
        {
            "cluster": pa.array(nz.astype(np.int32)),
            "vsum": pa.array([sums[j].tobytes() for j in nz], type=pa.large_binary()),
            "cnt": pa.array(counts[nz].astype(np.int64)),
        },
        schema=_PARTIAL_SCHEMA,
    )


def _merge_partials(batch: pa.Table, k: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    sums = np.zeros((k, dim), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    cl = batch["cluster"].to_numpy(zero_copy_only=False)
    cn = batch["cnt"].to_numpy(zero_copy_only=False)
    raws = batch["vsum"]
    for i in range(batch.num_rows):
        j = int(cl[i])
        sums[j] += np.frombuffer(raws[i].as_py(), dtype=np.float64)
        counts[j] += int(cn[i])
    return sums, counts


def kmeans_fit(
    ds: Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_iters: int = 5,
    fan_in: int = 64,
    batch_size: int = 4096,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Run ``n_iters`` Lloyd iterations; returns (k, dim) centroids.
    Empty clusters keep their previous centroid (deterministic).  Pass
    ``init`` (k, dim) to seed explicitly (e.g. from a driver-side
    k-means++ over a corpus sample); default is hash-min-k seeding."""
    cents = np.asarray(init, dtype=np.float64) if init is not None \
        else _init_centroids(ds, k, vec_col, key_col)
    if cents.shape[0] != k:
        raise ValueError(f"init has {cents.shape[0]} rows, expected k={k}")
    dim = cents.shape[1]
    vecs = ds.select_columns([vec_col])

    for _ in range(n_iters):
        ref = ray.put(cents) if ray.is_initialized() else cents

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            x = _mat(batch[vec_col])
            if x.shape[0] == 0:
                return _partials_table(np.zeros((k, dim)), np.zeros(k, dtype=np.int64))
            ids, _d = _assign_ids(x, c)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, ids, x)
            counts = np.bincount(ids, minlength=k).astype(np.int64)
            return _partials_table(sums, counts)

        parts = vecs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)

        def coalesce(batch: pa.Table) -> pa.Table:
            s, c = _merge_partials(batch, k, dim)
            return _partials_table(s, c)

        parts = parts.map_batches(coalesce, batch_format="pyarrow", zero_copy_batch=True, batch_size=fan_in * k)
        total_s = np.zeros((k, dim), dtype=np.float64)
        total_c = np.zeros(k, dtype=np.int64)
        for b in parts.iter_batches(batch_format="pyarrow"):
            s, c = _merge_partials(b, k, dim)
            total_s += s
            total_c += c
        nz = total_c > 0
        cents = cents.copy()
        cents[nz] = total_s[nz] / total_c[nz, None]
    return cents


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    batch_size: int = 4096,
) -> Dataset:
    """Append ``cluster`` (int32 argmin centroid) and ``sqdist``
    (squared L2 to it)."""
    ref = ray.put(centroids) if ray.is_initialized() else centroids

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        x = _mat(batch[vec_col])
        if x.shape[0] == 0:
            ids = np.empty(0, dtype=np.int64)
            d = np.empty(0, dtype=np.float64)
        else:
            ids, d = _assign_ids(x, c)
        return batch.append_column("cluster", pa.array(ids.astype(np.int32))).append_column(
            "sqdist", pa.array(d)
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def kmeans(
    ds: Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_iters: int = 5,
    batch_size: int = 4096,
) -> tuple[np.ndarray, Dataset]:
    """Fit + assign; returns (centroids, dataset-with-cluster-column)."""
    cents = kmeans_fit(
        ds, k, vec_col=vec_col, key_col=key_col, n_iters=n_iters, batch_size=batch_size
    )
    return cents, kmeans_assign(ds, cents, vec_col=vec_col, batch_size=batch_size)


def label_centroids(ds: Dataset, *, vec_col: str = "embedding",
                    label_col: str = "label") -> tuple[np.ndarray, np.ndarray]:
    """Exact per-label mean vectors: per-batch (label, count, sum-vec)
    combiner partials, merged on the driver (bounded by
    n_labels x n_blocks x dim doubles — label spaces are small; the
    driver never sees corpus rows).  Returns (labels_sorted, centroids)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _mat(batch[vec_col])
        lab = batch[label_col]
        if isinstance(lab, pa.ChunkedArray):
            lab = lab.combine_chunks()
        lab = lab.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), x.shape[1] if x.size else 0), dtype=np.float64)
        np.add.at(sums, inv, x)
        cnt = np.bincount(inv, minlength=len(ul)).astype(np.int64)
        return pa.table({
            "label": pa.array(ul),
            "n": pa.array(cnt),
            "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
        })

    blocks = list(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    )
    t = pa.concat_tables([pa.table(b) for b in blocks])
    lab = t["label"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    sums = _mat(t["sum"])
    ul, inv = np.unique(lab, return_inverse=True)
    tot = np.zeros((len(ul), sums.shape[1]), dtype=np.float64)
    np.add.at(tot, inv, sums)
    cnt = np.zeros(len(ul), dtype=np.int64)
    np.add.at(cnt, inv, n)
    return ul.astype(np.int64), tot / cnt[:, None]


def centroid_outliers(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    k: int = 5,
    batch_size: int = 4096,
) -> pa.Table:
    """Embedding quality control: the k vectors FURTHEST from their own
    label's centroid, per label (mislabeled / noisy-embedding
    candidates — the cheap geometric screen run before any manual
    audit).  Distance ties break on the smaller id — deterministic.

    Two streaming passes: exact centroids via :func:`label_centroids`
    (combiner partials), then broadcast-once centroids and a per-batch
    partial top-k per label, so the driver merges at most
    n_blocks x n_labels x k candidate rows — never the corpus."""
    labels, cents = label_centroids(ds, vec_col=vec_col, label_col=label_col)
    ref = ray.put((labels, cents)) if ray.is_initialized() else (labels, cents)

    def _topk_rows(lab, ids, d2, kk):
        order = np.lexsort((ids, -d2, lab))
        ls = lab[order]
        new = np.empty(len(ls), dtype=bool)
        if len(ls):
            new[0] = True
            new[1:] = ls[1:] != ls[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(ls)))
        pos = np.arange(len(ls)) - np.repeat(starts, sizes)
        keep = order[pos < kk]
        return lab[keep], ids[keep], d2[keep]

    class TopDist:
        # task-mode lazily-resolved broadcast state (the
        # engine.fused_violations pattern) — no per-run actor pool
        def __init__(self, r):
            self._ref = r
            self.labels = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.labels is None:
                p = self._ref
                self.labels, self.cents = ray.get(p) if isinstance(p, ray.ObjectRef) else p
            x = _mat(batch[vec_col])
            lab = batch[label_col]
            if isinstance(lab, pa.ChunkedArray):
                lab = lab.combine_chunks()
            lab = lab.cast(pa.int64()).to_numpy(zero_copy_only=False)
            ids = batch[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            ids = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
            li = np.searchsorted(self.labels, lab)
            diff = x - self.cents[li]
            d2 = np.einsum("ij,ij->i", diff, diff)
            lab, ids, d2 = _topk_rows(lab, ids, d2, k)
            return pa.table({
                "label": pa.array(lab), id_col: pa.array(ids), "d2": pa.array(d2),
            })

    fn = TopDist(ref)
    cand = list(
        ds.map_batches(fn.__call__, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=batch_size)
        .iter_batches(batch_format="pyarrow")
    )
    t = pa.concat_tables([pa.table(b) for b in cand])
    lab = t["label"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    d2 = t["d2"].to_numpy(zero_copy_only=False)
    lab, ids, d2 = _topk_rows(lab, ids, d2, k)
    order = np.lexsort((ids, -d2, lab))
    ls = lab[order]
    new = np.empty(len(ls), dtype=bool)
    if len(ls):
        new[0] = True
        new[1:] = ls[1:] != ls[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(ls)))
    rnk = np.arange(len(ls)) - np.repeat(starts, sizes) + 1
    return pa.table({
        "label": pa.array(ls),
        "rnk": pa.array(rnk.astype(np.int64)),
        id_col: pa.array(ids[order]),
    })
