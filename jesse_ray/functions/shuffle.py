"""Deterministic global shuffle: a reproducible training-data order.

``ray.data.Dataset.random_shuffle`` is seed-dependent on partition
layout and scheduling; a training pipeline wants an order that is a
pure function of the data (and a salt), so any re-run — different
cluster size, resumed job, another framework — reproduces byte-identical
epochs.  The standard recipe: order by ``fmix64(hash(key) ^ salt)``
(an avalanche-finalized hash is indistinguishable from random but
deterministic), which Ray Data executes as one range-partitioned sort —
the same single inherent all-to-all as packing (functions/pack.py).

Global ranks come from the same distributed prefix-sum machinery as
``pack_offsets`` (per-block counts only on the driver, never rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from jesse_ray.hashutil import fmix64, hash64_strings


def _salt64(salt: str) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for b in salt.encode("utf-8"):
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
    return h


def deterministic_shuffle(
    ds: Dataset,
    key_col: str = "doc_id",
    *,
    salt: str = "",
    out_col: str = "shuffle_hash",
    batch_size: int = 16384,
    sort: bool = True,
) -> Dataset:
    """Append ``out_col = fmix64(hash64(key) ^ salt)`` and sort by it
    (``sort=False`` leaves the hash column for a caller that sorts
    itself — e.g. shuffle_with_ranks, whose prefix sum already pays the
    one range-partitioned sort).

    Same salt + same data ⇒ same global order on any cluster shape.
    Different salts give independent epoch orders (the fmix64 finalizer
    decorrelates them)."""
    s = _salt64(salt)

    def h(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            raw = hash64_strings(pc.fill_null(col, ""))
        else:
            raw = col.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        hv = fmix64(raw ^ s)
        return batch.append_column(out_col, pa.array(hv, type=pa.uint64()))

    hashed = ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    return hashed.sort(out_col) if sort else hashed


def shuffle_with_ranks(
    ds: Dataset,
    key_col: str = "doc_id",
    *,
    salt: str = "",
    batch_size: int = 16384,
) -> Dataset:
    """Deterministic shuffle + global ``rank`` column (0-based position
    in the shuffled order) via the pack_offsets prefix sum with a unit
    length per row.  A 64-bit hash collision straddling a block boundary
    raises loudly (pack_offsets' duplicate-key guard) rather than
    silently double-assigning ranks; within-block collisions tie-break
    by block order, which is itself deterministic after the sort."""
    from jesse_ray.functions.pack import pack_offsets

    hashed = deterministic_shuffle(ds, key_col, salt=salt, batch_size=batch_size, sort=False)

    def unit(batch: pa.Table) -> pa.Table:
        return batch.append_column("__one", pa.array(np.ones(batch.num_rows, dtype=np.int32)))

    ranked = pack_offsets(
        hashed.map_batches(unit, batch_format="pyarrow", zero_copy_batch=True),
        key_col="shuffle_hash",
        len_col="__one",
        chunk_len=1 << 30,
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.drop_columns(["__one", "first_chunk", "last_chunk"])
        idx = t.schema.get_field_index("offset")
        return t.set_column(idx, "rank", t["offset"])

    return ranked.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of x so bit i lands at bit 2i (the classic
    public-domain "interleave with magic numbers" sequence — Stanford
    bit-twiddling hacks)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton / Z-order key of two 16-bit dimensions: interleave the low
    16 bits of ``a`` (even bit positions) and ``b`` (odd positions) into
    one uint32-range int64.  Sorting by this key co-locates rows that
    are close in BOTH dimensions — the standard data-layout trick
    (Delta/Iceberg OPTIMIZE ZORDER) that makes min/max file stats prune
    multi-column range predicates instead of just the leading sort
    column."""
    return (_spread16(a) | (_spread16(b) << np.uint64(1))).astype(np.int64)


def zorder_bottomk(
    ds: Dataset,
    *,
    a_col: str,
    b_col: str,
    id_col: str,
    k: int = 50,
    a_mask: int = 0xFFFF,
    b_mask: int = 0xFFFF,
    batch_size: int = 65536,
) -> pa.Table:
    """First ``k`` rows of the Z-order layout (the head of the curve) —
    evidence the interleave is bit-exact without sorting the corpus on
    the driver: per-batch vectorized keys + partial bottom-k, then a
    k × n_blocks driver merge.  The full layout rewrite is
    ``ds.sort("__z")`` (one range-partitioned all-to-all, same cost
    envelope as deterministic_shuffle) followed by the partitioned
    sink."""

    def partial(batch: pa.Table) -> pa.Table:
        a = batch[a_col]
        b = batch[b_col]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        av = a.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64) & np.uint64(a_mask)
        bv = b.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64) & np.uint64(b_mask)
        z = zorder_key(av, bv)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        iv = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((iv, z))[:k]
        return pa.table({
            id_col: pa.array(iv[order], type=pa.int64()),
            "z": pa.array(z[order], type=pa.int64()),
        })

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)
    merged = pa.concat_tables(list(cand.iter_batches(batch_format="pyarrow")))
    return merged.sort_by([("z", "ascending"), (id_col, "ascending")]).slice(0, k)
