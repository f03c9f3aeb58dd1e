"""Checkpointed, resumable validation runs.

The reference has no checkpoint/resume (single-document engine,
SURVEY §4.1); this is the corpus-scale design the north star requires:
input files are grouped into deterministic partitions; each partition's
validation writes its violations to its own output directory and appends
one manifest record with lineage ``(partition_id, fragments,
spec_version, stats digest, verdict, metrics)``.  A rerun skips
partitions whose manifest record is complete and whose spec_version
matches — so a failed 100 TB run resumes instead of restarting.

Manifest writes are atomic (write temp + rename) and idempotent: a
partition re-validated after a crash overwrites its own output directory
and re-appends; the reader keeps the LAST record per partition id.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional, Sequence

import pyarrow as pa

from jesse_ray.compiler import CompiledSpec, compile_spec, empty_violations
from jesse_ray.engine import ValidationEngine
from jesse_ray.spec import TableSpec


def partition_id(fragments: Sequence[str]) -> str:
    """Deterministic partition id from the input fragment paths — the
    idempotence key for retries (SURVEY §4.2 'idempotent writes')."""
    h = hashlib.sha256("\n".join(sorted(fragments)).encode()).hexdigest()[:12]
    return f"part-{h}"


@dataclass
class ManifestRecord:
    partition_id: str
    fragments: list[str]
    spec_version: str
    verdict: str  # "pass" | "fail"
    metrics: dict[str, Any] = field(default_factory=dict)
    output_dir: Optional[str] = None
    completed_at: float = 0.0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def from_json(cls, line: str) -> "ManifestRecord":
        return cls(**json.loads(line))


class Manifest:
    """Append-only JSONL manifest; last record per partition wins."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def load(self) -> dict[str, ManifestRecord]:
        out: dict[str, ManifestRecord] = {}
        if not self.path.exists():
            return out
        for line in self.path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                rec = ManifestRecord.from_json(line)
            except (json.JSONDecodeError, TypeError):
                continue  # torn write from a crash — ignored, partition reruns
            out[rec.partition_id] = rec
        return out

    def append(self, rec: ManifestRecord) -> None:
        rec.completed_at = time.time()
        tmp = self.path.with_suffix(".tmp")
        existing = self.path.read_text() if self.path.exists() else ""
        if existing and not existing.endswith("\n"):
            # a torn final line from a crash mid-write must not swallow
            # the next record: terminate it so the new record starts on
            # its own line (the torn fragment is then skipped by load())
            existing += "\n"
        tmp.write_text(existing + rec.to_json() + "\n")
        os.replace(tmp, self.path)


def plan_partitions(input_paths: Sequence[str], files_per_partition: int = 8) -> list[list[str]]:
    """Group input files into deterministic partitions (sorted, chunked).
    One partition = one resumable unit of work."""
    files = sorted(str(p) for p in input_paths)
    return [files[i : i + files_per_partition] for i in range(0, len(files), files_per_partition)]


def run_validation(
    input_paths: Sequence[str],
    spec: TableSpec | CompiledSpec,
    out_dir: str | Path,
    *,
    files_per_partition: int = 8,
    resume: bool = True,
    columns: Optional[list[str]] = None,
    sketch: bool = False,
    engine: Optional[ValidationEngine] = None,
    allowed_errors: Optional[int] = None,
    drift_reference: Optional[str] = None,
    fail_on_drift: bool = False,
    input_format: str = "parquet",
) -> dict[str, Any]:
    """Validate a corpus partition-by-partition with checkpointing.

    Each partition is one Ray Data pipeline (read → checks → write);
    partitions run sequentially on the driver but each is internally
    block-parallel across the cluster, and the unit of resume is the
    partition.  Returns the overall summary (exit-code semantics mirror
    the reference CLI: nonzero/fail if any partition fails,
    src/jesse_cli.erl:80-87 — but we process ALL partitions instead of
    halting at the first failure, recording each verdict).

    Key uniqueness is CORPUS-scoped: one column-pruned
    ``duplicate_keys_hashed`` pass over ALL input files runs after the
    partition loop (a per-partition check would miss keys duplicated
    across partitions).  It reruns on every invocation — including
    resumes — because it reads only the key column.

    With ``sketch``/``drift_reference`` the drift sketch is accumulated
    INSIDE the fused validation pass (SketchingFusedValidator), so each
    partition reads the wide ``tokens`` column exactly once.
    ``fail_on_drift=True`` makes a drifted partition's verdict "fail";
    the default records drift per-partition and in the summary without
    affecting the verdict (advisory gate).
    """
    import ray.data

    from jesse_ray.engine import (
        VIOLATION_SCHEMA,
        fused_sketch_violations,
        uniqueness_violations,
    )

    compiled = spec if isinstance(spec, CompiledSpec) else compile_spec(spec)
    eng = engine or ValidationEngine()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest = Manifest(out / "manifest.jsonl")
    done = manifest.load() if resume else {}

    ref_bundle = None
    if drift_reference:
        ref_bundle = _load_reference_bundle(drift_reference)

    parts = plan_partitions(input_paths, files_per_partition)
    summary = {"partitions": len(parts), "skipped": 0, "failed": 0, "violations": 0,
               "drifted_partitions": 0}

    for frag in parts:
        pid = partition_id(frag)
        prev = done.get(pid)
        if prev is not None and prev.spec_version == compiled.version:
            summary["skipped"] += 1
            summary["violations"] += prev.metrics.get("violations", 0)
            prev_drifted = bool(prev.metrics.get("drifted", False))
            summary["drifted_partitions"] += int(prev_drifted)
            # the manifest verdict may have been written under a
            # different fail_on_drift: re-derive it SYMMETRICALLY from
            # the recorded metrics (violations + drifted), so resuming
            # with a different flag matches what a fresh run would say
            if prev.metrics.get("violations", 0) > 0 or (fail_on_drift and prev_drifted):
                summary["failed"] += 1
            continue

        ds = _read(frag, input_format, columns)
        part_out = out / pid
        want_sketch = sketch or drift_reference
        if want_sketch:
            # same launch-time preparation as engine.validate (pattern
            # resolution + schema gates) before the single fused pass:
            # violations + in-band per-batch sketch rows
            from jesse_ray.engine import prepare_compiled

            combined = fused_sketch_violations(
                ds, prepare_compiled(compiled, ds), allowed_errors=allowed_errors
            ).materialize()

            import pyarrow.compute as pc

            def _viol_only(t: pa.Table) -> pa.Table:
                return t.filter(pc.is_null(t["__sketch"])).drop_columns(["__sketch"])

            def _sketch_only(t: pa.Table) -> pa.Table:
                keep = t.filter(pc.is_valid(t["__sketch"]))
                return pa.table({"sketch": keep["__sketch"].cast(pa.large_binary())})

            viol_ds = combined.map_batches(_viol_only, batch_format="pyarrow")
            from jesse_ray.stages.drift import merge_sketch_rows

            bundle = merge_sketch_rows(
                combined.map_batches(_sketch_only, batch_format="pyarrow")
            )
            (part_out / "violations").mkdir(parents=True, exist_ok=True)
            viol_ds = viol_ds.materialize()
            viol_ds.write_parquet(str(part_out / "violations"))
            n_viol = viol_ds.count()
            by_error = {}
            for b in viol_ds.groupby("error").count().iter_batches(batch_format="pyarrow"):
                for e, c in zip(b["error"].to_pylist(), b["count()"].to_pylist()):
                    by_error[e] = by_error.get(e, 0) + int(c)
        else:
            res = eng.validate(ds, compiled, check_unique=False, allowed_errors=allowed_errors)
            res.materialize()
            res.write_violations(part_out / "violations")
            n_viol = res.violations.count()
            by_error = res.counts_by_error()
            bundle = None

        metrics = {
            "rows": ds.count(),
            "violations": int(n_viol),
            "by_error": by_error,
        }
        drifted = False
        if want_sketch and bundle is not None:
            digest_path = part_out / "sketch.bin"
            digest_path.write_bytes(bundle.to_bytes())
            metrics["stats_digest"] = hashlib.sha256(bundle.to_bytes()).hexdigest()[:16]
            if ref_bundle is not None:
                # per-partition distribution-drift gate: KS on the n_tok
                # digests + chi-square on top-k token frequencies vs a
                # reference digest loaded ONCE per run (north-star drift
                # detection at partition granularity)
                from jesse_ray.sketches import drift_report

                rep = drift_report(ref_bundle, bundle)
                metrics["drift"] = {
                    k: rep[k]
                    for k in ("ks_stat", "ks_pvalue", "ks_drifted", "chi2_stat", "chi2_pvalue", "chi2_drifted")
                }
                drifted = bool(rep["ks_drifted"] or rep["chi2_drifted"])
                metrics["drifted"] = drifted
                summary["drifted_partitions"] += int(drifted)

        verdict = "fail" if n_viol > 0 or (fail_on_drift and drifted) else "pass"
        manifest.append(
            ManifestRecord(
                partition_id=pid,
                fragments=list(frag),
                spec_version=compiled.version,
                verdict=verdict,
                metrics=metrics,
                output_dir=str(part_out),
            )
        )
        summary["violations"] += metrics["violations"]
        if verdict == "fail":
            summary["failed"] += 1

    # corpus-wide key uniqueness (column-pruned read over ALL files)
    uk = compiled.spec.unique_keys
    n_unique_viol = 0
    if uk:
        import pyarrow.parquet as pq

        all_files = sorted(str(p) for p in input_paths)
        uniq_parts = []
        for key in uk:
            uv = uniqueness_violations(_read(all_files, input_format, [key]), key)
            if uv.num_rows:
                uniq_parts.append(uv)
        uniq_tbl = (
            pa.concat_tables(uniq_parts) if uniq_parts else empty_violations()
        )
        n_unique_viol = uniq_tbl.num_rows
        pq.write_table(uniq_tbl, out / "unique_violations.parquet")
    summary["unique_violations"] = int(n_unique_viol)
    summary["violations"] += int(n_unique_viol)

    summary["passed"] = summary["failed"] == 0 and n_unique_viol == 0
    return summary


def _read(paths, input_format: str, columns):
    """Format-dispatching partition read (one place for the
    parquet/jsonl branch; run.py's --input-format routes here)."""
    import ray.data

    if input_format == "parquet":
        return ray.data.read_parquet(paths, columns=columns)
    from jesse_ray.sources import read_corpus

    return read_corpus(paths, format=input_format, columns=columns)


def _load_reference_bundle(path: str):
    """Reference drift digest — loaded once per run_validation call (no
    cross-call cache: a digest rebuilt at the same path must be re-read)."""
    from jesse_ray.sketches import SketchBundle

    return SketchBundle.from_bytes(Path(path).read_bytes())


def build_reference_digest(input_paths, out_path: str, *, columns=("n_tok", "tokens")) -> str:
    """Build and save the corpus-level reference SketchBundle that
    per-partition drift gates compare against."""
    import ray.data

    from jesse_ray.stages import sketch_dataset

    bundle = sketch_dataset(ray.data.read_parquet(list(input_paths), columns=list(columns)))
    Path(out_path).write_bytes(bundle.to_bytes())
    return out_path


def _count_by_error(vtbl: pa.Table) -> dict[str, int]:
    if vtbl.num_rows == 0:
        return {}
    g = vtbl.group_by("error").aggregate([([], "count_all")])
    return dict(zip(g["error"].to_pylist(), g["count_all"].to_pylist()))
