"""Distributed linear-model training (full-batch gradient descent).

The fasttext-style quality-classifier step of a training-data pipeline
(score every document with a tiny linear model) expressed Ray-Data
native: each GD step is ONE streaming pass that reduces per-batch
gradient partials (d doubles per block — the same combiner-partials
shape as clustering.kmeans_fit), merged on the driver, which holds only
the d-dim weight vector.  Deterministic given the corpus: partial rows are
lexicographically sorted before the float64 reduction (Ray's streaming
executor does not guarantee block arrival order), learning rate and
step count are fixed, no randomness anywhere.

Scoring broadcasts the weights once and applies them per batch with
EXPLICIT sequential adds (w0 + w1*f1 + ...), mirroring a SQL
re-derivation term-for-term so the twin is IEEE-identical.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically stable split form
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_fit(
    ds: Dataset,
    features_fn: Callable[[pa.Table], np.ndarray],
    label_fn: Callable[[pa.Table], np.ndarray],
    *,
    n_features: int,
    lr: float = 0.5,
    n_steps: int = 25,
    batch_size: int = 65536,
) -> np.ndarray:
    """Full-batch logistic-regression GD.  ``features_fn`` maps a batch
    to an (n, d) float64 design matrix (include the intercept column
    yourself); ``label_fn`` to an (n,) 0/1 float64 vector.  Each step
    streams one gradient pass: per-batch partial ``Xᵀ(σ(Xw) − y)`` and
    count — the driver merges (n_blocks × d) doubles and updates w.
    Gradient is mean-normalized so ``lr`` is corpus-size free."""
    w = np.zeros(n_features, dtype=np.float64)

    for _ in range(n_steps):
        ref = ray.put(w) if ray.is_initialized() else w

        def grad_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            wk = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            x = features_fn(batch)
            y = label_fn(batch)
            if x.shape[0]:
                g = x.T @ (_sigmoid(x @ wk) - y)
            else:
                g = np.zeros(n_features)
            return pa.table({
                "g": pa.array([g.tolist()], type=pa.list_(pa.float64())),
                "n": pa.array([x.shape[0]], type=pa.int64()),
            })

        parts = ds.map_batches(grad_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=batch_size)
        t = pa.concat_tables(list(parts.iter_batches(batch_format="pyarrow")))
        import pyarrow.compute as pc

        gm = pc.list_flatten(t["g"].combine_chunks()).to_numpy(
            zero_copy_only=False).reshape(-1, n_features)
        n = int(pc.sum(t["n"]).as_py() or 0)
        if n == 0:
            raise ValueError("cannot fit on an empty dataset")
        # arrival order is not deterministic; sort partial rows before
        # the order-sensitive float reduction
        gm = gm[np.lexsort(gm.T[::-1])]
        w = w - lr * gm.sum(axis=0) / n
    return w
