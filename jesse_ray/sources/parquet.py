"""Parquet source/sink helpers.

The reference's I/O surface is a CLI file reader + JSON parse hook
(src/jesse_cli.erl:90-106, src/jesse.erl:79).  Here the analogue is
``ray.data.read_parquet`` with explicit column pruning — a validation
run that only touches (doc_id, n_tok, source) must not lift the wide
``tokens`` lists off storage.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow as pa

import ray.data
from ray.data import Dataset

SEQUENCE_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def _row_group_blocks(path: str | Sequence[str]) -> Optional[int]:
    """Block count aligned to the input's parquet row groups.

    Left to its own defaults, Ray Data splits a big single-file read
    into extra blocks AFTER the read task (``ReadParquet->SplitBlocks``),
    which blocks read→map operator fusion and round-trips the full
    decompressed corpus through the object store (measured: 2-3x wall
    time on the identity pipeline).  One block per row group keeps the
    read fused with the first map stage — each task reads its row
    groups and checks them without materializing raw data to plasma.
    """
    import pyarrow.parquet as pq

    paths = [path] if isinstance(path, (str, os.PathLike)) else list(path)
    total = 0
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            # sharded corpus directory: sum row groups across shards so
            # the read still gets one fused block per row group (losing
            # the override here re-enables SplitBlocks, which breaks
            # read→check fusion and round-trips the corpus via plasma)
            files = [os.path.join(p, f) for f in sorted(os.listdir(p))
                     if f.endswith(".parquet")]
            if not files:
                return None
            sub = _row_group_blocks(files)
            if sub is None:
                return None
            total += sub
            continue
        if not os.path.isfile(p):
            return None  # remote globs: let Ray decide
        try:
            total += pq.ParquetFile(p).num_row_groups
        except (OSError, ValueError):
            return None
    # clamp to ~4 tasks per CPU: row-group granularity preserves
    # read→map fusion, but hundreds of tiny fused tasks put the DRIVER
    # on the critical path (measured: 448 tasks over a 6M-row corpus at
    # num_cpus=4 → 44% CPU utilization from per-task scheduling; 8 fat
    # tasks → ~95%).  4×CPUs keeps pipelining + skew slack without
    # drowning the scheduler; a real cluster raises the clamp with its
    # CPU count.
    # pre-init fallback is the HOST's CPU count, not a hardcoded 8 — a
    # read planned before ray.init on a big node must not be
    # under-parallelized (ADVICE r3)
    fallback = os.cpu_count() or 8
    try:
        import ray as _ray

        ncpu = (int(_ray.cluster_resources().get("CPU", fallback))
                if _ray.is_initialized() else fallback)
    except Exception:
        ncpu = fallback
    return max(1, min(total, max(4 * ncpu, 16), 1024))


def read_sequences(
    path: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
    predicate=None,
    **kw,
) -> Dataset:
    """Read a sequences corpus with column pruning.

    ``columns=None`` reads the canonical 4-column shape (never side
    columns like the fixtures' ``expected_error`` golden answers).
    Blocks default to one per parquet row group (see _row_group_blocks).
    ``predicate`` (a ``pyarrow.dataset`` expression) is pushed INTO the
    read — row groups whose column statistics exclude the predicate are
    never fetched, and surviving fragments are filtered during the scan
    (prune at the read, not after it).
    """
    if override_num_blocks is None:
        override_num_blocks = _row_group_blocks(path)
    if predicate is not None:
        kw["filter"] = predicate
    return ray.data.read_parquet(
        path,
        columns=columns if columns is not None else SEQUENCE_COLUMNS,
        override_num_blocks=override_num_blocks,
        **kw,
    )


def read_table(
    path: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
    **kw,
) -> Dataset:
    """Generic pruned parquet read with row-group-aligned blocks — the
    same SplitBlocks-fusion fix as :func:`read_sequences` for the side
    tables (documents/events/embeddings/TPC-H).  An unfused
    ``ReadParquet->SplitBlocks(64)`` read of a small table measured
    5.4 s where the fused read takes ~0.1 s (it serializes the read into
    one task and round-trips every downstream stage through 64 tiny
    plasma blocks)."""
    if override_num_blocks is None:
        override_num_blocks = _row_group_blocks(path)
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks, **kw
    )


def read_corpus(
    path: str | Sequence[str],
    *,
    format: str = "parquet",
    columns: Optional[list[str]] = None,
    **kw,
) -> Dataset:
    """Format-dispatching corpus reader — the analogue of the reference
    CLI's instance-file reader + parser_fun decode hook
    (src/jesse_cli.erl:90-106, src/jesse.erl:79): ``parquet`` (columnar,
    pruned at the read) or ``jsonl`` (one JSON document per line, the
    reference's native instance format; Arrow's JSON reader decodes in
    C, and pruning happens right after decode)."""
    if format == "parquet":
        return read_sequences(path, columns=columns, **kw)
    if format in ("jsonl", "json"):
        ds = ray.data.read_json(path, **kw)
        if columns is not None:
            ds = ds.select_columns(columns)
        return ds
    if format == "csv":
        ds = ray.data.read_csv(path, **kw)
        if columns is not None:
            ds = ds.select_columns(columns)
        return ds
    if format == "orc":
        return read_orc(path, columns=columns)
    if format in ("feather", "ipc", "arrow"):
        return read_feather(path, columns=columns)
    raise ValueError(
        f"unknown corpus format {format!r} (parquet|jsonl|csv|orc|feather)")


def write_violations(ds: Dataset, out_dir: str, **kw) -> None:
    """Violations sink: a directory of part files (never one giant file),
    so output is resumable/parallel — SURVEY §2.2 sink mapping."""
    ds.write_parquet(out_dir, **kw)


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    by: str,
    stats_col: Optional[str] = None,
    batch_size: int = 65536,
) -> dict:
    """Partitioned parquet sink with a stats manifest — the resumable
    output layout the 100-TB plan requires (one DIRECTORY per partition
    value, many files inside, never one giant file).

    Streaming, shuffle-free: each map task splits its batches by the
    partition column and appends one file per (batch, value) under
    ``out_dir/<by>=<value>/`` (hive-style), emitting a one-row-per-file
    stats record.  The driver only ever sees those stats rows and writes
    ``_manifest.json`` LAST (per-partition file lists, row counts and
    min/max of ``stats_col`` for scan pruning) — a crashed run leaves no
    manifest, so a rerun is detected by its absence and simply rewrites;
    a completed manifest makes the write idempotent (rerun = no-op,
    returns the recorded manifest).  Readers can prune partitions on the
    manifest min/max without touching a single row group.

    The partition column should be bounded-cardinality (source, date,
    bucket id) — per-batch splits are vectorized Arrow filters, and file
    counts grow with n_blocks × n_values."""
    import json
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest_path = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch[by]).to_pylist()
        recs = {"partition": [], "file": [], "n_rows": [], "lo": [], "hi": []}
        for v in vals:
            part = batch.filter(pc.equal(batch[by], v) if v is not None
                                else pc.is_null(batch[by]))
            key = "__HIVE_DEFAULT_PARTITION__" if v is None else str(v)
            d = os.path.join(out_dir, f"{by}={key}")
            os.makedirs(d, exist_ok=True)
            fn = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(part, fn)
            recs["partition"].append(key)
            recs["file"].append(fn)
            recs["n_rows"].append(len(part))
            if stats_col is not None and len(part):
                recs["lo"].append(pc.min(part[stats_col]).as_py())
                recs["hi"].append(pc.max(part[stats_col]).as_py())
            else:
                recs["lo"].append(None)
                recs["hi"].append(None)
        return pa.table({k: pa.array(v) for k, v in recs.items()})

    stats = ds.map_batches(write_batch, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    rows = []
    for b in stats.iter_batches(batch_format="pyarrow"):
        rows.extend(b.to_pylist())
    parts: dict = {}
    for r in rows:
        p = parts.setdefault(r["partition"], {"files": [], "n_rows": 0,
                                              "lo": None, "hi": None})
        p["files"].append(r["file"])
        p["n_rows"] += r["n_rows"]
        for k, pick in (("lo", min), ("hi", max)):
            if r[k] is not None:
                p[k] = r[k] if p[k] is None else pick(p[k], r[k])
    manifest = {"by": by, "stats_col": stats_col, "partitions": parts,
                "n_rows": sum(p["n_rows"] for p in parts.values())}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path)
    return manifest


def read_orc(
    path: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
) -> Dataset:
    """ORC reader (Ray Data has no native one): parallelism unit is the
    ORC STRIPE — the driver lists (file, stripe) pairs from footer
    metadata only (no data read), and each Ray task opens its stripe
    with ``pyarrow.orc`` and column pruning.  Mirrors the row-group
    alignment of :func:`read_sequences`: one task per stripe, fused
    straight into downstream map stages."""
    import pyarrow.orc as orc

    paths = [path] if isinstance(path, str) else list(path)
    items = []
    for p in paths:
        f = orc.ORCFile(p)
        items.extend({"path": p, "stripe": s} for s in range(f.nstripes))

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc_mod

        tables = []
        for prow, srow in zip(batch["path"].to_pylist(), batch["stripe"].to_pylist()):
            t = orc_mod.ORCFile(prow).read_stripe(srow, columns=columns)
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
        load, batch_format="pyarrow", batch_size=1)


def read_feather(
    path: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
    batches_per_block: int = 4,
) -> Dataset:
    """Arrow IPC / Feather-v2 reader: parallelism unit is a RANGE of
    record batches — the driver reads only the footer (batch count per
    file), each task memory-maps its file and materializes just its
    assigned batches (IPC is zero-copy off the map)."""
    import pyarrow.ipc as ipc

    paths = [path] if isinstance(path, str) else list(path)
    items = []
    for p in paths:
        with pa.memory_map(p) as src:
            n = ipc.RecordBatchFileReader(src).num_record_batches
        for lo in range(0, n, batches_per_block):
            items.append({"path": p, "lo": lo, "hi": min(lo + batches_per_block, n)})

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc_mod

        tables = []
        for prow, lo, hi in zip(batch["path"].to_pylist(), batch["lo"].to_pylist(),
                                batch["hi"].to_pylist()):
            with pa.memory_map(prow) as src:
                rd = ipc_mod.RecordBatchFileReader(src)
                t = pa.Table.from_batches([rd.get_batch(i) for i in range(lo, hi)])
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        return pa.concat_tables(tables)

    return ray.data.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
        load, batch_format="pyarrow", batch_size=1)
