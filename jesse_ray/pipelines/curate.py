"""Flagship training-data curation pipeline: validate → exact-dedup →
curated corpus + stats, end-to-end over the sequences table.

This is the composite a user of the reference validator actually runs
before training: drop every row with a validation violation
(filter_valid — jesse's pass verdict per document), then keep ONE row
per distinct token payload (exact dedup on a vectorized 128-bit
positional content hash), streaming the survivors to partitioned
parquet.  Two full-width passes total (the filter fuses with the read;
the dedup shuffle moves 16-byte hashes + keys, never payloads).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from jesse_ray.compiler import CompiledSpec, compile_spec
from jesse_ray.engine import filter_valid, prepare_compiled
from jesse_ray.functions.dedup import add_token_hash
from jesse_ray.spec import TableSpec


def curate_sequences(
    ds: Dataset,
    spec: TableSpec | CompiledSpec,
    *,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    batch_size: int = 8192,
) -> Dataset:
    """Rows passing every row-level check, first-per-distinct-token-payload.

    Keep-first is by smallest key within each content-hash group — the
    dedup shuffle carries (hash, key) pairs only; survivors are
    re-joined... no: the hash rides the row through the shuffle, so the
    grouped keep-first emits full curated rows directly (payload moves
    once, which a write-out needs anyway).
    """
    compiled = spec if isinstance(spec, CompiledSpec) else compile_spec(spec)
    compiled = prepare_compiled(compiled, ds)
    clean = filter_valid(ds, compiled, batch_size=batch_size)
    hashed = add_token_hash(clean, tokens_col)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["content_hash"], index=False).to_numpy(dtype=np.uint64)
        df = df.copy()
        df["__part"] = (h & np.uint64(63)).astype(np.int32)
        return df

    def first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(key_col, kind="mergesort").drop_duplicates(
            subset=["content_hash"], keep="first"
        )
        return out.drop(columns=["__part", "content_hash"])

    return (
        hashed.map_batches(part, batch_format="pandas", batch_size=batch_size)
        .groupby("__part")
        .map_groups(first, batch_format="pandas")
    )


def curation_stats(ds: Dataset, curated: Dataset) -> dict:
    """(input_rows, curated_rows) — the headline numbers of a curation run."""
    return {"input_rows": ds.count(), "curated_rows": curated.count()}
