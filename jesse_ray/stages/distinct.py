"""Approximate distinct counting over a Dataset: per-batch HyperLogLog
partials + the same shuffle-free coalescing tree as the drift sketches
(stages/drift.py:63-78) — no groupby, no sort; each partial is ~4 KB at
p=12, so even a 16M-block corpus funnels through three near-no-op merge
levels before the driver touches at most ``fan_in`` sketches."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from jesse_ray.hashutil import fmix64, hash64_strings
from jesse_ray.sketches import HyperLogLog

_HLL_SCHEMA = pa.schema([pa.field("hll", pa.large_binary())])


def _one_row(h: HyperLogLog) -> pa.Table:
    return pa.table({"hll": pa.array([h.to_bytes()], type=pa.large_binary())}, schema=_HLL_SCHEMA)


def _merge_batch(batch: pa.Table) -> pa.Table:
    merged: HyperLogLog | None = None
    for raw in batch["hll"]:
        h = HyperLogLog.from_bytes(raw.as_py())
        merged = h if merged is None else merged.merge(h)
    if merged is None:
        return pa.table({"hll": pa.array([], type=pa.large_binary())}, schema=_HLL_SCHEMA)
    return _one_row(merged)


def _merge_rows(sk: Dataset, p: int, *, fan_in: int = 64, levels: int = 3) -> HyperLogLog:
    for _ in range(levels):
        sk = sk.map_batches(_merge_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=fan_in)
    merged: HyperLogLog | None = None
    for b in sk.iter_batches(batch_format="pyarrow"):
        for raw in b["hll"]:
            h = HyperLogLog.from_bytes(raw.as_py())
            merged = h if merged is None else merged.merge(h)
    return merged if merged is not None else HyperLogLog(p)


def _column_hashes(col, flatten: bool) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if flatten:
        col = pc.list_flatten(col)
    col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return fmix64(hash64_strings(col))
    vals = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    return fmix64(vals)


def hll_distinct(
    ds: Dataset,
    column: str,
    *,
    flatten: bool = False,
    p: int = 12,
    fan_in: int = 64,
    levels: int = 3,
    batch_size: int = 65536,
) -> float:
    """Approximate COUNT(DISTINCT column) (or of the flattened list
    elements with ``flatten=True``).  Relative error ~1.04/sqrt(2^p)."""

    def build(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_hashes(_column_hashes(batch[column], flatten))
        return _one_row(h)

    sk = ds.select_columns([column]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    return _merge_rows(sk, p, fan_in=fan_in, levels=levels).estimate()
