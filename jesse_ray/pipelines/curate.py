"""Flagship training-data curation pipeline: validate → exact-dedup →
curated corpus, end-to-end over the sequences table.

This is the composite a user of the reference validator actually runs
before training: drop every row with a validation violation
(filter_valid — jesse's pass verdict per document), then keep ONE row
per distinct token payload (exact dedup on a vectorized 128-bit
positional content hash), streaming the survivors to partitioned
parquet.  Two full-width passes total: the filter fuses with the read,
and the dedup shuffle moves each surviving row once — which a curated
write-out needs anyway — keyed by a ≤64-value coarse hash partition.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset

from jesse_ray.compiler import CompiledSpec, compile_spec
from jesse_ray.engine import filter_valid, prepare_compiled
from jesse_ray.functions.dedup import add_token_hash
from jesse_ray.hashutil import hash_partition_pandas
from jesse_ray.spec import TableSpec


def curate_sequences(
    ds: Dataset,
    spec: TableSpec | CompiledSpec,
    *,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    n_parts: int = 64,
    batch_size: int = 8192,
    include_referential: bool = True,
) -> Dataset:
    """Rows passing EVERY check (row-level keywords AND the referential
    dimension rules — jesse's full pass verdict), deduplicated to the
    first row per distinct token payload (smallest ``key_col`` within
    each content-hash group)."""
    compiled = spec if isinstance(spec, CompiledSpec) else compile_spec(spec)
    compiled = prepare_compiled(compiled, ds)
    clean = filter_valid(
        ds, compiled, batch_size=batch_size, include_referential=include_referential
    )
    hashed = add_token_hash(clean, tokens_col)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return hash_partition_pandas(df, ["content_hash"], n_parts)

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
