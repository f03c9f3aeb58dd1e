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
