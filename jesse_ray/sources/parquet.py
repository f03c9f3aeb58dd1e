"""Parquet source/sink helpers.

The reference's I/O surface is a CLI file reader + JSON parse hook
(src/jesse_cli.erl:90-106, src/jesse.erl:79).  Here the analogue is
``ray.data.read_parquet`` with explicit column pruning — a validation
run that only touches (doc_id, n_tok, source) must not lift the wide
``tokens`` lists off storage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import ray.data
from ray.data import Dataset

SEQUENCE_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def read_sequences(
    path: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
    **kw,
) -> Dataset:
    """Read a sequences corpus with column pruning.

    ``columns=None`` reads the canonical 4-column shape (never side
    columns like the fixtures' ``expected_error`` golden answers).
    """
    return ray.data.read_parquet(
        path,
        columns=columns if columns is not None else SEQUENCE_COLUMNS,
        override_num_blocks=override_num_blocks,
        **kw,
    )


def write_violations(ds: Dataset, out_dir: str, **kw) -> None:
    """Violations sink: a directory of part files (never one giant file),
    so output is resumable/parallel — SURVEY §2.2 sink mapping."""
    ds.write_parquet(out_dir, **kw)
