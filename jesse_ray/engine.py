"""The Ray Data validation engine.

Pipeline shape (SURVEY §3.4): ``read_parquet`` → ONE fused
``map_batches`` pass (zero-copy Arrow) running every row-level keyword
check plus the referential broadcast-dimension checks (task mode with
lazily-resolved ``ray.put`` state — broadcast-once per worker) →
hash-bucket shuffle for corpus-level key uniqueness → violations
``Dataset`` + per-run metrics.

This replaces the reference's per-document recursive walk
(reference: src/jesse_schema_validator.erl:82-98) with a streaming,
block-parallel execution; the reference's single-threaded design has
nothing to parallelize (SURVEY §4.1), so the distribution strategy here
is original: hash-shuffles only where semantics demand (uniqueness),
broadcast instead of shuffle for small dimensions, partial aggregation
before every groupby.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from jesse_ray import errors as E
from jesse_ray.compiler import (
    VIOLATION_SCHEMA,
    CompiledSpec,
    compile_spec,
    empty_violations,
    _combine,
    _np_mask,
)
from jesse_ray.spec import ReferentialRule, TableSpec


# ---------------------------------------------------------------------------
# row-level checks (stateless map_batches)


def row_violations(
    ds: Dataset,
    compiled: CompiledSpec,
    *,
    batch_size: Optional[int] = None,
    allowed_errors: Optional[int] = None,
    error_handler=None,
) -> Dataset:
    """All per-row keyword checks as one stateless vectorized stage.

    One pass emits violations for every compiled check (the reference
    walks keywords sequentially per document,
    src/jesse_validator_draft4.erl:84-260; we walk documents in bulk per
    keyword).  ``batch_size=None`` (whole blocks) is the default: an
    explicit batch size forces Ray Data to re-slice blocks into exact
    batches, which BLOCKS ReadParquet→map operator fusion and
    round-trips the full decoded corpus through the object store
    (measured: 2.2× wall at num_cpus=4 on a 6M-row corpus).

    ``allowed_errors``: per-row error budget (None ≡ 'infinity';
    0 ≡ jesse's stop-at-first default — see CompiledSpec.check_batch).
    """

    def check(batch: pa.Table) -> pa.Table:
        return compiled.check_batch(
            batch, allowed_errors=allowed_errors, error_handler=error_handler
        )

    return ds.map_batches(
        check, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def filter_valid(
    ds: Dataset,
    compiled: CompiledSpec,
    *,
    batch_size: Optional[int] = None,
    include_referential: bool = False,
) -> Dataset:
    """Keep only rows with zero row-level violations — the vectorized
    analogue of jesse's pass verdict under ``allowed_errors=0``
    (src/jesse_error.erl:71-78).  ``include_referential=True`` also
    drops rows failing the spec's broadcast-dimension membership rules
    (jesse's verdict covers every check; the flag is opt-in because the
    plain row filter needs no dimension load)."""
    rules_ref = None
    if include_referential and compiled.spec.referential:
        rules = [
            (r.column, _load_allowed_values(r), r.error_atom)
            for r in compiled.spec.referential
        ]
        rules_ref = ray.put(rules) if ray.is_initialized() else rules

    class _Keep:
        """Closure state: ONLY the compiled spec + the tiny rules ref
        ride the serialized callable; the dimension values are fetched
        from plasma once per worker and precompiled to Arrow value
        sets (the ReferentialChecker discipline)."""

        def __init__(self, compiled, rules_ref):
            self._compiled = compiled
            self._rules_ref = rules_ref
            self._sets = None  # resolved lazily per worker

        def __call__(self, batch: pa.Table) -> pa.Table:
            bad = self._compiled.invalid_row_mask(batch)
            if self._rules_ref is not None:
                if self._sets is None:
                    resolved = (
                        ray.get(self._rules_ref)
                        if isinstance(self._rules_ref, ray.ObjectRef)
                        else self._rules_ref
                    )
                    self._sets = [
                        (column, _rule_value_set(values))
                        for column, values, _atom in resolved
                    ]
                for column, value_set in self._sets:
                    ref_bad = _membership_bad_mask(batch, column, value_set)
                    if ref_bad is not None:
                        bad |= ref_bad
            return batch.filter(pa.array(~bad))

    return ds.map_batches(
        _Keep(compiled, rules_ref),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
    )


MIGRATION_STATUSES = ["broke_in_new", "clean_both", "dirty_both", "fixed_in_new"]


def migration_report(
    ds: Dataset,
    old_compiled: CompiledSpec,
    new_compiled: CompiledSpec,
    *,
    batch_size: Optional[int] = None,
) -> "pa.Table":
    """Schema-migration impact audit (engine extension — jesse validates
    one schema at a time; evolving a production spec needs the DELTA):
    classify every row against BOTH compiled specs in ONE pass over the
    corpus and return the 4-way contingency table

        clean_both | broke_in_new | fixed_in_new | dirty_both

    Scale shape: each batch reduces to ≤4 partial-count rows (map-side
    combiner), so the "shuffle" moves a handful of ints per block —
    the corpus is read once and never rematerialized."""

    def classify(batch: pa.Table) -> pa.Table:
        bad_old = old_compiled.invalid_row_mask(batch)
        bad_new = new_compiled.invalid_row_mask(batch)
        counts = [
            int((~bad_old & bad_new).sum()),   # broke_in_new
            int((~bad_old & ~bad_new).sum()),  # clean_both
            int((bad_old & bad_new).sum()),    # dirty_both
            int((bad_old & ~bad_new).sum()),   # fixed_in_new
        ]
        return pa.table(
            {
                "status": pa.array(MIGRATION_STATUSES, type=pa.string()),
                "partial_n": pa.array(counts, type=pa.int64()),
            }
        )

    parts = ds.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    merged: dict[str, int] = {s: 0 for s in MIGRATION_STATUSES}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s, n in zip(b["status"].to_pylist(), b["partial_n"].to_pylist()):
            merged[s] += n
    return pa.table(
        {
            "status": pa.array(MIGRATION_STATUSES, type=pa.string()),
            "n": pa.array([merged[s] for s in MIGRATION_STATUSES], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# corpus-level uniqueness (two-phase count: batch-local combiner before the
# shuffle, defusing duplicate-heavy hot keys — SURVEY §7.3)


def duplicate_keys(ds: Dataset, key: str, *, batch_size: Optional[int] = None) -> Dataset:
    """Distinct key values appearing more than once, with counts.

    Phase 1 (map-side combiner): per-batch ``group_by(key).count`` —
    collapses hot keys (100+ copies of one doc_id) to one partial row per
    batch, so the shuffle moves per-batch distincts, not raw rows.
    Phase 2: hash groupby over the partials, sum, filter > 1.
    """

    def partial(batch: pa.Table) -> pa.Table:
        # NULL keys are excluded: absence is missing_required_property
        # territory, not uniqueness (presence semantics, SURVEY §2.3)
        t = batch.select([key]).filter(pc.is_valid(batch[key]))
        g = t.group_by(key).aggregate([([], "count_all")])
        return g.rename_columns([key, "partial_cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    counts = partials.groupby(key).aggregate(Sum("partial_cnt", alias_name="cnt"))

    def only_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["cnt"], 1))

    return counts.map_batches(only_dups, batch_format="pyarrow")


def duplicate_keys_hashed(
    ds: Dataset, key: str, *, batch_size: Optional[int] = None, n_buckets: int = 64
) -> pa.Table:
    """Exact duplicate keys via a HASH-weight bucket shuffle (fast path).

    The plain groupby sort-merges the raw key strings through Ray's
    row-oriented Aggregate (~76k rows/s measured — the bottleneck of the
    whole validation run).  Here:

    1. map side: per-batch partial counts keyed by a 64-bit hash of the
       key, bucketed by ``hash % n_buckets`` — the all-to-all moves
       ~16-byte int rows and the shuffle sort touches ONLY the tiny
       ``part`` column (n_buckets distinct int32s), never the keys;
    2. reduce side: ``groupby(part).map_groups`` merges each bucket with
       one vectorized ``np.unique`` + ``bincount`` — no per-row Python;
    3. confirm: the (rare) duplicated hashes are broadcast back into one
       narrow filtered pass that fetches the actual key strings and
       re-counts them exactly, so hash collisions drop out — the result
       is exact, not approximate.

    ~10x faster than the string groupby at sf0.1 (1.5 s vs 14.3 s merge
    phase at num_cpus=32) and strictly lighter at 10^12-key scale.
    ``n_buckets`` bounds reduce-side parallelism; hot duplicate keys are
    already collapsed to one row per batch by the map-side combiner.
    Returns an Arrow table (key, cnt) — small, because duplicate sets
    are tiny by assumption.
    """
    import pandas as pd

    P = n_buckets

    def partial(batch: pa.Table) -> pa.Table:
        arr = _combine(batch[key]).drop_null()
        if len(arr) == 0:
            return pa.table(
                {
                    "part": pa.array([], type=pa.int32()),
                    "h": pa.array([], type=pa.uint64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        h = _hash64(arr)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "part": pa.array((uniq & np.uint64(P - 1)).astype(np.int32)),
                "h": pa.array(uniq, type=pa.uint64()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(dtype=np.uint64)
        c = g["cnt"].to_numpy()
        uniq, inv = np.unique(h, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        dup = tot > 1
        return pd.DataFrame({"h": uniq[dup], "cnt": tot[dup]})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    dups = partials.groupby("part").map_groups(merge, batch_format="pandas")
    dup_pdf = dups.to_pandas()
    if len(dup_pdf) == 0:
        return pa.table({key: pa.array([], type=pa.string()), "cnt": pa.array([], type=pa.int64())})

    hset = np.sort(dup_pdf["h"].to_numpy(dtype=np.uint64))

    def confirm(batch: pa.Table) -> pa.Table:
        arr = _combine(batch[key]).drop_null()
        h = _hash64(arr)
        hit = np.isin(h, hset)
        t = pa.table({key: arr.filter(pa.array(hit))})
        g = t.group_by(key).aggregate([([], "count_all")])
        return g.rename_columns([key, "partial_cnt"])

    confirmed = ds.map_batches(confirm, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    tbl = pa.concat_tables(list(confirmed.iter_batches(batch_format="pyarrow")))
    if tbl.num_rows == 0:
        return pa.table({key: pa.array([], type=pa.string()), "cnt": pa.array([], type=pa.int64())})
    g = tbl.group_by(key).aggregate([("partial_cnt", "sum")])
    g = g.rename_columns([key, "cnt"])
    return g.filter(pc.greater(g["cnt"], 1)).sort_by(key)


def _hash64(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit FNV-1a over the utf8 bytes of a string array
    (shared implementation, jesse_ray/hashutil.py)."""
    from jesse_ray.hashutil import hash64_strings

    return hash64_strings(arr)


def uniqueness_violations(ds: Dataset, key: str) -> pa.Table:
    """Corpus-level `not_unique` violations — one row per duplicated key.

    Corpus analogue of ``uniqueItems`` (src/jesse_validator_draft4.erl:831-873)
    lifted from within-array to across-table, using the hash-bucket
    shuffle (see duplicate_keys_hashed).  The duplicate set is assumed
    small relative to the corpus (violations are rare); it is
    materialized as a table, not the corpus.
    """
    tbl = duplicate_keys_hashed(ds, key)
    n = tbl.num_rows
    if n == 0:
        return empty_violations()
    keys = tbl[key].to_pylist()
    cnts = tbl["cnt"].to_pylist()
    frag = json.dumps({"uniqueKeys": [key]}, separators=(",", ":"))
    return pa.table(
        {
            "doc_id": pa.array([str(k) for k in keys], type=pa.string()),
            "path": pa.array([[key]] * n, type=pa.list_(pa.string())),
            "error": pa.array([E.NOT_UNIQUE] * n, type=pa.string()),
            "value_json": pa.array(
                [json.dumps({"value": k, "count": int(c)}, separators=(",", ":")) for k, c in zip(keys, cnts)],
                type=pa.string(),
            ),
            "schema_fragment": pa.array([frag] * n, type=pa.string()),
        },
        schema=VIOLATION_SCHEMA,
    )


# ---------------------------------------------------------------------------
# referential checks (broadcast dimension → stateful actor pool)


def _load_allowed_values(rule: ReferentialRule) -> frozenset:
    if rule.values is not None:
        return frozenset(rule.values)
    if rule.dim_path is None:
        raise E.SchemaInvalidError(E.SCHEMA_INVALID, f"referential rule for {rule.column} has no source")
    import pyarrow.parquet as pq

    cols = [rule.dim_column] + ([rule.dim_filter_column] if rule.dim_filter_column else [])
    dim = pq.read_table(rule.dim_path, columns=cols)
    if rule.dim_filter_column:
        dim = dim.filter(pc.equal(dim[rule.dim_filter_column], True))
    return frozenset(dim[rule.dim_column].to_pylist())


def _rule_value_set(values) -> pa.Array:
    """Compile an allowed-values set into the Arrow value_set used by
    every referential membership check (fused validator, filter_valid).
    Type is INFERRED so integer dimension keys stay integers; mixed or
    unhashable sets fall back to their string forms."""
    try:
        return pa.array(sorted(values))
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        return pa.array(sorted(str(v) for v in values), type=pa.string())


def _membership_bad_mask(batch: pa.Table, column: str, value_set: pa.Array) -> Optional[np.ndarray]:
    """True where a PRESENT value is outside the dimension (anti-join
    semantics); None when the column is absent from the batch."""
    if column not in batch.column_names:
        return None
    arr = _combine(batch[column])
    present = _np_mask(pc.is_valid(arr), len(arr))
    ok = _np_mask(pc.is_in(arr, value_set=value_set), len(arr))
    return present & ~ok


class ReferentialChecker:
    """Actor-pool stage: membership of a column against a broadcast
    allowed-values dimension (semi/anti-join semantics; anti-join rows
    become violations).

    The dimension is put in the object store ONCE on the driver
    (``ray.put``) and fetched ONCE per actor in ``__init__`` — never
    re-shipped per batch.  This is the reference's ``enum``
    (src/jesse_validator_draft4.erl:960-970) against an external
    dimension, per the north star.
    """

    def __init__(self, rules_ref, key_column: str):
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        self.key_column = key_column
        # (column, pa.Array value_set, error_atom, fragment_json)
        self.compiled_rules = []
        for column, values, error_atom in rules:
            vs = _rule_value_set(values)
            frag = json.dumps({"enum": sorted(values)}, separators=(",", ":"), default=str)
            self.compiled_rules.append((column, vs, error_atom, frag))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_path, out_err, out_val, out_frag = [], [], [], [], []
        key_arr = _combine(batch[self.key_column]) if self.key_column in batch.column_names else None
        for column, value_set, error_atom, frag in self.compiled_rules:
            bad = _membership_bad_mask(batch, column, value_set)
            if bad is None:
                continue
            arr = _combine(batch[column])
            idx = np.flatnonzero(bad)
            if len(idx) == 0:
                continue
            vals = arr.take(pa.array(idx, type=pa.int64())).to_pylist()
            if key_arr is not None:
                docs = key_arr.take(pa.array(idx, type=pa.int64())).to_pylist()
            else:
                docs = [None] * len(idx)
            out_doc.extend([None if d is None else str(d) for d in docs])
            out_path.extend([[column]] * len(idx))
            out_err.extend([error_atom] * len(idx))
            out_val.extend([json.dumps(v, ensure_ascii=False) for v in vals])
            out_frag.extend([frag] * len(idx))
        if not out_err:
            return empty_violations()
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.string()),
                "path": pa.array(out_path, type=pa.list_(pa.string())),
                "error": pa.array(out_err, type=pa.string()),
                "value_json": pa.array(out_val, type=pa.string()),
                "schema_fragment": pa.array(out_frag, type=pa.string()),
            },
            schema=VIOLATION_SCHEMA,
        )


def referential_violations(
    ds: Dataset,
    spec: TableSpec,
    *,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: Optional[int] = None,
) -> Optional[Dataset]:
    """Run all referential rules as ONE actor-pool stage."""
    if not spec.referential:
        return None
    rules = [(r.column, _load_allowed_values(r), r.error_atom) for r in spec.referential]
    rules_ref = ray.put(rules)
    cols = [c for c in {spec.key_column, *(r.column for r in spec.referential)} if c]
    return ds.select_columns(cols).map_batches(
        ReferentialChecker,
        fn_constructor_args=(rules_ref, spec.key_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FusedValidator:
    """Actor-pool stage fusing ALL row-level keyword checks with the
    referential (broadcast-dimension) checks in ONE pass over the data.

    At corpus scale the input read dominates: running row checks and
    referential checks as separate branches reads every block twice and
    unions two heavy streams.  This stage reads once.  State (the
    compiled spec + the broadcast allowed-value sets) is fetched from
    the object store once per actor in ``__init__`` — never re-shipped
    per batch (SURVEY §7.2).
    """

    def __init__(self, compiled_ref, rules_ref, key_column: Optional[str], allowed_errors=None,
                 error_handler=None):
        self._compiled_ref = compiled_ref
        self._rules_ref = rules_ref
        self._key_column = key_column
        self.allowed_errors = allowed_errors
        self.error_handler = error_handler
        self._resolved = False
        self.compiled: Optional[CompiledSpec] = None
        self._ref: Optional[ReferentialChecker] = None

    def _resolve(self) -> None:
        # Lazy broadcast fetch: the ObjectRefs ride the (tiny) serialized
        # closure/constructor args; the actual state is fetched from the
        # local plasma store ONCE per worker process on first call —
        # Ray's per-worker function/actor cache keeps it resident, so
        # task mode and actor mode both get broadcast-once semantics.
        compiled_ref, rules_ref = self._compiled_ref, self._rules_ref
        self.compiled = ray.get(compiled_ref) if isinstance(compiled_ref, ray.ObjectRef) else compiled_ref
        rules = ray.get(rules_ref) if isinstance(rules_ref, ray.ObjectRef) else rules_ref
        self._ref = ReferentialChecker(rules, self._key_column) if rules else None
        self._resolved = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._resolved:
            self._resolve()
        row = self.compiled.check_batch(
            batch, allowed_errors=self.allowed_errors, error_handler=self.error_handler
        )
        if self._ref is None:
            return row
        ref = self._ref(batch)
        if ref.num_rows == 0:
            return row
        if row.num_rows == 0:
            return ref
        return pa.concat_tables([row, ref])


def fused_violations(
    ds: Dataset,
    compiled: CompiledSpec,
    *,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: Optional[int] = None,
    allowed_errors: Optional[int] = None,
    error_handler=None,
    actor_pool: bool = False,
) -> Dataset:
    """Single-pass row + referential violations (see FusedValidator).

    Default is TASK mode: the validator state (compiled spec + broadcast
    allowed-value sets) is ``ray.put`` once, the tiny ObjectRefs ride the
    serialized closure, and each worker fetches + caches the state on its
    first batch (Ray's per-worker function cache) — broadcast-once
    semantics without per-run actor-pool startup.  Measured at sf0.1 /
    32 CPUs, task mode is both faster and far more stable (8.3/5.7/6.9 s
    across reps) than a fresh 16-actor pool per run (43.9/20.2/5.4 s):
    a short job pays actor startup every run, and on a long-lived
    cluster tasks reuse warm workers just the same.

    ``actor_pool=True`` opts into an explicit actor pool — use it for
    stages whose state must be MUTABLE or pinned (e.g. models too big
    for the plasma-cache pattern).
    """
    spec = compiled.spec
    rules = (
        [(r.column, _load_allowed_values(r), r.error_atom) for r in spec.referential]
        if spec.referential
        else None
    )
    if not actor_pool:
        # refs (not values) ride the closure; workers resolve lazily
        big = ray.is_initialized()
        fv = FusedValidator(
            ray.put(compiled) if big else compiled,
            ray.put(rules) if big else rules,
            spec.key_column,
            allowed_errors,
            error_handler,
        )
        return ds.map_batches(
            fv.__call__,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return ds.map_batches(
        FusedValidator,
        fn_constructor_args=(ray.put(compiled), ray.put(rules), spec.key_column, allowed_errors,
                             error_handler),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


#: violations schema + an in-band sketch column (see SketchingFusedValidator)
VIOLATION_SKETCH_SCHEMA = VIOLATION_SCHEMA.append(pa.field("__sketch", pa.large_binary()))


def fused_sketch_violations(
    ds: Dataset,
    compiled: CompiledSpec,
    *,
    batch_size: Optional[int] = None,
    allowed_errors: Optional[int] = None,
    error_handler=None,
    vocab: int = 50_000,
) -> Dataset:
    """One-pass violations + in-band sketch rows (VIOLATION_SKETCH_SCHEMA)."""
    spec = compiled.spec
    rules = (
        [(r.column, _load_allowed_values(r), r.error_atom) for r in spec.referential]
        if spec.referential
        else None
    )
    big = ray.is_initialized()
    fv = SketchingFusedValidator(
        ray.put(compiled) if big else compiled,
        ray.put(rules) if big else rules,
        spec.key_column,
        allowed_errors,
        error_handler,
        vocab=vocab,
    )
    return ds.map_batches(
        fv.__call__, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


class SketchingFusedValidator(FusedValidator):
    """FusedValidator that ALSO accumulates the drift sketch per batch —
    so a checkpointed run with drift gating reads the wide ``tokens``
    column ONCE instead of a second sketch-only pass.

    Output schema is the violations schema plus ``__sketch``: violation
    rows carry a null sketch; each batch appends ONE row whose other
    columns are null and whose ``__sketch`` holds the serialized
    :class:`SketchBundle`.  The caller splits the two streams and
    tree-merges the sketch rows (jesse_ray.stages.merge_sketch_rows).
    """

    def __init__(self, compiled_ref, rules_ref, key_column, allowed_errors=None,
                 error_handler=None, *, n_tok_col: str = "n_tok",
                 tokens_col: str = "tokens", vocab: int = 50_000):
        super().__init__(compiled_ref, rules_ref, key_column, allowed_errors, error_handler)
        self.n_tok_col = n_tok_col
        self.tokens_col = tokens_col
        self.vocab = vocab

    def __call__(self, batch: pa.Table) -> pa.Table:
        from jesse_ray.sketches import SketchBundle

        viol = super().__call__(batch)
        b = SketchBundle.empty(self.vocab)
        n_tok = np.empty(0, dtype=np.float64)
        flat = np.empty(0, dtype=np.int64)
        if self.n_tok_col in batch.column_names:
            n_tok = _combine(batch[self.n_tok_col]).cast(pa.float64()).to_numpy(zero_copy_only=False)
            n_tok = n_tok[~np.isnan(n_tok)]
        if self.tokens_col in batch.column_names:
            flat = pc.list_flatten(_combine(batch[self.tokens_col])).to_numpy(zero_copy_only=False)
        b.add_batch(n_tok, flat)
        viol = viol.append_column(
            "__sketch", pa.array([None] * viol.num_rows, type=pa.large_binary())
        )
        sk_row = pa.table(
            {
                "doc_id": pa.array([None], type=pa.string()),
                "path": pa.array([None], type=pa.list_(pa.string())),
                "error": pa.array([None], type=pa.string()),
                "value_json": pa.array([None], type=pa.string()),
                "schema_fragment": pa.array([None], type=pa.string()),
                "__sketch": pa.array([b.to_bytes()], type=pa.large_binary()),
            },
            schema=VIOLATION_SKETCH_SCHEMA,
        )
        return pa.concat_tables([viol.cast(VIOLATION_SKETCH_SCHEMA), sk_row])


# ---------------------------------------------------------------------------
# column stats (partial per batch → small groupby merge)


def column_stats(
    ds: Dataset,
    value_column: str,
    group_column: Optional[str] = None,
    *,
    batch_size: Optional[int] = None,
) -> pa.Table:
    """count / nulls / min / max / mean (and sum) of ``value_column``,
    optionally per ``group_column``.

    Partial aggregation inside ``map_batches`` (one row per group per
    batch) before the groupby — the shuffle moves O(groups × batches)
    rows, not the corpus.  Mirrors the reference's KVC collection
    operators @count/@min/@max/@avg/@sum (src/jesse_json_path.erl:173-209)
    lifted to distributed execution.
    """

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native map-side combiner: one group_by per batch, no
        # Python per-group loop (same pattern as relational.grouped_agg)
        v = _combine(batch[value_column]).cast(pa.float64())
        if group_column is None:
            grp = pa.array([""] * batch.num_rows, type=pa.string())
        else:
            grp = pc.fill_null(pc.cast(_combine(batch[group_column]), pa.string()), "")
        nulls = pc.cast(pc.is_null(v), pa.int64())
        t = pa.table({"group": grp, "v": v, "nulls": nulls})
        g = t.group_by("group").aggregate(
            [("v", "count"), ("nulls", "sum"), ("v", "min"), ("v", "max"), ("v", "sum")]
        )
        out = pa.table(
            {
                "group": g["group"],
                "p_cnt": pc.add(g["v_count"].cast(pa.int64()), g["nulls_sum"].cast(pa.int64())),
                "p_null": g["nulls_sum"].cast(pa.int64()),
                "p_min": pc.fill_null(g["v_min"], float("inf")),
                "p_max": pc.fill_null(g["v_max"], float("-inf")),
                "p_sum": pc.fill_null(g["v_sum"], 0.0),
            }
        )
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    merged = partials.groupby("group").aggregate(
        Sum("p_cnt", alias_name="cnt"),
        Sum("p_null", alias_name="n_null"),
        Min("p_min", alias_name="vmin"),
        Max("p_max", alias_name="vmax"),
        Sum("p_sum", alias_name="vsum"),
    )
    tbl = pa.concat_tables(list(merged.iter_batches(batch_format="pyarrow")))
    nn = pc.subtract(tbl["cnt"], tbl["n_null"])
    mean = pc.divide(tbl["vsum"], pc.cast(pc.max_element_wise(nn, pa.scalar(1)), pa.float64()))
    return tbl.append_column("vmean", mean)


# ---------------------------------------------------------------------------
# top-level orchestration


@dataclass
class ValidationResult:
    """Violations + metrics for one validation run.

    ``unique_violations`` may be computed on a background driver thread
    (overlapping the uniqueness shuffle with the fused row/referential
    pass — two independent Ray Data executions pipeline against each
    other); the property joins the thread on first access.
    """

    violations: Dataset
    spec_version: str
    metrics: dict[str, Any] = field(default_factory=dict)
    _cached: Optional[pa.Table] = None
    _uniq: Optional[pa.Table] = None
    _uniq_future: Any = None

    @property
    def unique_violations(self) -> pa.Table:
        if self._uniq is None:
            if self._uniq_future is not None:
                self._uniq = self._uniq_future.result()
                self._uniq_future = None
            else:
                self._uniq = empty_violations()
        return self._uniq

    def materialize(self) -> "ValidationResult":
        """Execute the violations pipeline ONCE and pin the (small)
        result blocks in the object store — NOT on the driver — so that
        subsequent writes/aggregations don't re-run the full validation.
        The corpus itself is never materialized; only violations are,
        and violations are rare by assumption."""
        self.violations = self.violations.materialize()
        return self

    def write_violations(self, out_dir: str) -> None:
        """Stream violation rows to a directory of parquet part files
        (never one giant file; never via the driver) — the scale-correct
        sink.  ``unique_violations`` (already a small driver table) is
        appended as one extra file."""
        import pyarrow.parquet as pq

        from pathlib import Path

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.violations.write_parquet(str(out))
        extra = self.unique_violations if self.unique_violations.num_rows else empty_violations()
        pq.write_table(extra, out / "unique_violations.parquet")

    def all_violations_table(self) -> pa.Table:
        # one execution of the violations pipeline; cached because the
        # violation set is small relative to the corpus by assumption
        if self._cached is None:
            parts = [b for b in self.violations.iter_batches(batch_format="pyarrow")]
            parts.append(self.unique_violations)
            self._cached = pa.concat_tables(
                [p for p in parts if p.num_rows] or [empty_violations()]
            )
        return self._cached

    def counts_by_error(self) -> dict[str, int]:
        if self._cached is None and isinstance(
            self.violations, getattr(ray.data.dataset, "MaterializedDataset", ())
        ):
            # distributed aggregate over the materialized violation blocks
            # — the driver sees only (error, count) pairs, never the rows
            out: dict[str, int] = {}
            for b in self.violations.groupby("error").count().iter_batches(batch_format="pyarrow"):
                for e, c in zip(b["error"].to_pylist(), b["count()"].to_pylist()):
                    out[e] = out.get(e, 0) + int(c)
            if self.unique_violations.num_rows:
                g = self.unique_violations.group_by("error").aggregate([([], "count_all")])
                for e, c in zip(g["error"].to_pylist(), g["count_all"].to_pylist()):
                    out[e] = out.get(e, 0) + int(c)
            return out
        tbl = self.all_violations_table()
        if tbl.num_rows == 0:
            return {}
        g = tbl.group_by("error").aggregate([([], "count_all")])
        return dict(zip(g["error"].to_pylist(), g["count_all"].to_pylist()))

    @property
    def passed(self) -> bool:
        # per-run verdict: jesse's {ok, Value} iff the error list is empty
        # (src/jesse_schema_validator.erl:70-77)
        if self.unique_violations.num_rows:
            return False
        return self.all_violations_table().num_rows == 0


def prepare_compiled(compiled: CompiledSpec, ds: Dataset) -> CompiledSpec:
    """Launch-time spec preparation shared by every validation entry
    point (engine.validate AND the checkpoint runner): resolve
    patternProperties against the actual column names (SURVEY §2.3) and
    run the schema gates (additionalProperties / min-maxProperties /
    propertyNames) when the spec has any."""
    spec = compiled.spec
    if spec.column_patterns:
        compiled = compile_spec(spec.resolve_patterns(ds.schema().names))
        spec = compiled.spec
    needs_gate = (
        not spec.additional_columns_allowed
        or spec.min_columns is not None
        or spec.max_columns is not None
        or spec.property_names is not None
    )
    if needs_gate:
        sch = ds.schema()
        arrow_schema = getattr(sch, "base_schema", None)
        if arrow_schema is None:
            arrow_schema = pa.schema([pa.field(n, t) for n, t in zip(sch.names, sch.types)])
        compiled.check_schema(arrow_schema)
    return compiled


def default_schema_loader(name: str):
    """Default schema_loader_fun: ``file://`` URIs and existing ``.json``
    paths load from disk; ``http(s)://`` is fetched with urllib (works
    on clusters with egress; this sandbox has none).  Returns None on a
    miss — jesse's ?not_found (src/jesse_database.erl:316-336)."""
    import os

    path = None
    if name.startswith("file://"):
        path = name[len("file://"):]
    elif name.startswith(("http://", "https://")):
        try:
            from urllib.request import urlopen

            with urlopen(name, timeout=10) as r:  # pragma: no cover (no network in sandbox)
                return json.loads(r.read().decode())
        except Exception:
            return None
    elif name.endswith(".json"):
        path = name
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


class ValidationEngine:
    """Compile once on the driver; validate many Datasets.

    The driver-side spec registry replaces jesse's ETS schema store
    (src/jesse_database.erl:165-220): specs are immutable per run, so a
    plain dict + closure capture is the idiomatic Ray equivalent.
    """

    def __init__(self, schema_loader_fun=None):
        """``schema_loader_fun`` — jesse's pluggable schema resolver
        (src/jesse.erl:89-92, used from src/jesse_database.erl:316-336):
        called with the unknown spec name/URI on a registry miss and may
        return a TableSpec, a JSON-Schema dict, or None (miss).  The
        default loader resolves ``file://`` URIs and plain ``*.json``
        paths; ``http(s)://`` fetches use urllib when the cluster has
        network access (this sandbox does not — documented)."""
        self._specs: dict[str, CompiledSpec] = {}
        #: name -> (source path, mtime at load) for mtime-refresh
        #: (src/jesse_database.erl:276-283 ETS row shape)
        self._sources: dict[str, tuple[str, float]] = {}
        self._loader = schema_loader_fun if schema_loader_fun is not None else default_schema_loader

    # jesse:add_schema/2 analogue (src/jesse.erl:116-130)
    def add_spec(self, name: str, spec: TableSpec) -> CompiledSpec:
        compiled = compile_spec(spec)
        self._specs[name] = compiled
        return compiled

    def del_spec(self, name: str) -> None:
        self._specs.pop(name, None)

    def load_specs(self, dir_path: str) -> list[str]:
        """Bulk-load every ``*.json`` draft-04 spec file in a directory
        (the file stem becomes the spec name) — jesse:load_schemas
        analogue (src/jesse.erl:153-182).  Each entry records its source
        file's mtime, the reference's ETS cache shape
        (src/jesse_database.erl:276-283 stores {SourceKey, Key, Mtime,
        Schema}); :meth:`refresh_specs` then re-reads only outdated
        files, the jesse_database:list_outdated/1 contract
        (src/jesse_database.erl:251-283)."""
        import glob as _glob
        import os as _os

        from jesse_ray.spec import from_json_schema

        loaded = []
        for p in sorted(_glob.glob(_os.path.join(str(dir_path), "*.json"))):
            name = _os.path.splitext(_os.path.basename(p))[0]
            with open(p) as f:
                schema = json.load(f)
            self.add_spec(name, from_json_schema(schema, name=name))
            self._sources[name] = (p, _os.stat(p).st_mtime)
            loaded.append(name)
        return loaded

    def list_outdated(self, dir_path: str) -> list[str]:
        """Spec files in ``dir_path`` that are new or newer than their
        cached entry — jesse_database:list_outdated/1
        (src/jesse_database.erl:251-283): a file with no cache entry is
        outdated; a cached one is outdated when CurrentMtime > Mtime."""
        import glob as _glob
        import os as _os

        out = []
        for p in sorted(_glob.glob(_os.path.join(str(dir_path), "*.json"))):
            name = _os.path.splitext(_os.path.basename(p))[0]
            src = self._sources.get(name)
            if src is None or _os.stat(p).st_mtime > src[1]:
                out.append(p)
        return out

    def refresh_specs(self, dir_path: str) -> list[str]:
        """Recompile ONLY the outdated spec files (the incremental
        update jesse_database:add_path/2 performs on every store touch,
        src/jesse_database.erl:117-133 + 251-283).  Unchanged specs keep
        their compiled form — on a long-lived validation service this is
        the live-reload path; batch runs never need it."""
        import os as _os

        from jesse_ray.spec import from_json_schema

        refreshed = []
        for p in self.list_outdated(dir_path):
            name = _os.path.splitext(_os.path.basename(p))[0]
            with open(p) as f:
                schema = json.load(f)
            self.add_spec(name, from_json_schema(schema, name=name))
            self._sources[name] = (p, _os.stat(p).st_mtime)
            refreshed.append(name)
        return refreshed

    def get(self, name: str) -> CompiledSpec:
        if name not in self._specs:
            loaded = self._loader(name) if self._loader is not None else None
            if loaded is None:
                raise KeyError(f"{E.SCHEMA_INVALID}: no spec named {name!r}")
            if isinstance(loaded, dict):
                from jesse_ray.spec import from_json_schema

                loaded = from_json_schema(loaded, name=name)
            self.add_spec(name, loaded)
        return self._specs[name]

    # jesse:validate/2 analogue (src/jesse.erl:185-216)
    def validate(
        self,
        ds: Dataset,
        spec_or_name: TableSpec | CompiledSpec | str,
        *,
        check_unique: bool = True,
        referential_concurrency: int | tuple[int, int] = (1, 4),
        batch_size: Optional[int] = None,
        allowed_errors: Optional[int] = None,
        error_handler=None,
        key_ds: Optional[Dataset] = None,
        fused: bool = True,
        actor_pool: bool = False,
    ) -> ValidationResult:
        if isinstance(spec_or_name, str):
            compiled = self.get(spec_or_name)
        elif isinstance(spec_or_name, CompiledSpec):
            compiled = spec_or_name
        else:
            compiled = compile_spec(spec_or_name)
        spec = compiled.spec

        compiled = prepare_compiled(compiled, ds)
        spec = compiled.spec

        if fused:
            # ONE pass over the full-width data for row + referential
            # checks — at 100 TB the read dominates, so the two-branch
            # union (two full reads) is strictly worse.  Task mode by
            # default (see fused_violations); when a caller opts into an
            # actor pool, its size is capped at cluster_CPUs - 1 so the
            # min-1 pool can never reserve every CPU and starve the
            # upstream read (a 1-CPU slice would deadlock otherwise).
            cpus = int(ray.cluster_resources().get("CPU", 2)) if ray.is_initialized() else 2
            conc = referential_concurrency if spec.referential else (1, 8)
            if isinstance(conc, tuple):
                conc = (min(conc[0], max(1, cpus - 1)), min(conc[1], max(1, cpus - 1)))
            else:
                conc = min(conc, max(1, cpus - 1))
            violations = fused_violations(
                ds,
                compiled,
                concurrency=conc,
                batch_size=batch_size,
                allowed_errors=allowed_errors,
                error_handler=error_handler,
                actor_pool=actor_pool and cpus >= 2,
            )
        else:
            parts: list[Dataset] = [
                row_violations(
                    ds, compiled, batch_size=batch_size, allowed_errors=allowed_errors,
                    error_handler=error_handler,
                )
            ]
            ref_ds = referential_violations(ds, spec, concurrency=referential_concurrency)
            if ref_ds is not None:
                parts.append(ref_ds)
            violations = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

        uniq_future = None
        if check_unique and spec.unique_keys:
            # narrow pass: callers reading parquet should pass ``key_ds``
            # as a column-pruned read so only the key column's pages move.
            # Runs on a driver thread so the shuffle overlaps the fused
            # pass (consumed later by the caller) instead of serializing.
            import concurrent.futures

            uds = key_ds if key_ds is not None else ds
            keys = list(spec.unique_keys)

            def _run_uniq() -> pa.Table:
                uniq = empty_violations()
                for key in keys:
                    uv = uniqueness_violations(uds, key)
                    if uv.num_rows:
                        uniq = pa.concat_tables([uniq, uv]) if uniq.num_rows else uv
                return uniq

            pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
            uniq_future = pool.submit(_run_uniq)
            pool.shutdown(wait=False)

        return ValidationResult(
            violations=violations,
            spec_version=compiled.version,
            _uniq_future=uniq_future,
        )


def validate_dataset(ds: Dataset, spec: TableSpec | CompiledSpec, **kw) -> ValidationResult:
    """One-shot convenience — jesse:validate_with_schema/2 analogue
    (src/jesse.erl:220-248)."""
    return ValidationEngine().validate(ds, spec, **kw)


def violations_to_json(tbl: pa.Table) -> str:
    """Render violation rows in the reference CLI's ``--json`` report
    shape — ``{"reasons": [{"invalid": "data", "schema": ..., "error":
    ..., "data": ..., "path": [...]}, ...]}`` per
    src/jesse_error.erl:107-138 (reason_to_jsx / to_json).  Path index
    elements become integers, as in the reference's mixed
    name/0-based-index paths."""
    reasons = []
    for i in range(tbl.num_rows):
        path = [int(p) if p.isdigit() else p for p in tbl["path"][i].as_py()]
        reasons.append(
            {
                "invalid": "data",
                "schema": json.loads(tbl["schema_fragment"][i].as_py()),
                "error": tbl["error"][i].as_py(),
                "data": json.loads(tbl["value_json"][i].as_py()),
                "path": path,
                "doc_id": tbl["doc_id"][i].as_py(),
            }
        )
    return json.dumps({"reasons": reasons}, ensure_ascii=False)
