"""Distribution-drift stage: per-batch sketches + tree-merge aggregation.

Each input block contributes one serialized :class:`SketchBundle`
(t-digest over ``n_tok``, token-frequency vector, count-min).  Sketches
are merged in two levels — a bucketed ``groupby`` (map-side tree level,
so at 100 TB the driver never sees one sketch per block) followed by a
driver merge of the ≤``n_buckets`` survivors.  Merging is associative
and commutative, so bucket assignment only affects the merge tree shape,
never the result.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from jesse_ray.sketches import SketchBundle, drift_report


def _build_sketch_fn(n_tok_col: str, tokens_col: str, vocab: int, n_buckets: int):
    def build(batch: pa.Table) -> pa.Table:
        b = SketchBundle.empty(vocab)
        n_tok = batch[n_tok_col].cast(pa.float64()).to_numpy(zero_copy_only=False)
        n_tok = n_tok[~np.isnan(n_tok)]
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        b.add_batch(n_tok, flat)
        raw = b.to_bytes()
        bucket = int.from_bytes(hashlib.blake2b(raw, digest_size=4).digest(), "big") % n_buckets
        return pa.table({"bucket": pa.array([bucket], type=pa.int32()),
                         "sketch": pa.array([raw], type=pa.binary())})

    return build


def _merge_group(df: pd.DataFrame) -> pd.DataFrame:
    merged = None
    for raw in df["sketch"]:
        b = SketchBundle.from_bytes(bytes(raw))
        merged = b if merged is None else merged.merge(b)
    return pd.DataFrame({"bucket": [int(df["bucket"].iloc[0])], "sketch": [merged.to_bytes()]})


def sketch_dataset(
    ds: Dataset,
    *,
    n_tok_col: str = "n_tok",
    tokens_col: str = "tokens",
    vocab: int = 50_000,
    n_buckets: int = 32,
    batch_size: int = 16384,
) -> SketchBundle:
    """Build one merged SketchBundle for a whole Dataset."""
    sk = ds.select_columns([n_tok_col, tokens_col]).map_batches(
        _build_sketch_fn(n_tok_col, tokens_col, vocab, n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    level1 = sk.groupby("bucket").map_groups(_merge_group, batch_format="pandas")
    merged = None
    for b in level1.iter_batches(batch_format="pyarrow"):
        for raw in b["sketch"].to_pylist():
            sb = SketchBundle.from_bytes(bytes(raw))
            merged = sb if merged is None else merged.merge(sb)
    return merged if merged is not None else SketchBundle.empty(vocab)


def drift_check(
    ref_ds: Dataset,
    new_ds: Dataset,
    *,
    vocab: int = 50_000,
    topk: int = 100,
    ks_alpha: float = 0.01,
    chi2_alpha: float = 0.01,
    **kw,
) -> dict:
    """KS (n_tok digests) + chi-square (top-k token frequencies) drift
    report between a reference corpus and a new corpus."""
    ref = sketch_dataset(ref_ds, vocab=vocab, **kw)
    new = sketch_dataset(new_ds, vocab=vocab, **kw)
    return drift_report(ref, new, topk=topk, ks_alpha=ks_alpha, chi2_alpha=chi2_alpha)
