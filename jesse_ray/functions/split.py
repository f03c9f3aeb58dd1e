"""Deterministic hash-based dataset splitting (train/val/test).

The canonical training-data operation the reference has no analogue
for: each row is assigned to exactly one named split by thresholding a
64-bit hash of its key — deterministic across runs, machines and
re-partitionings (unlike ``Dataset.random_shuffle``-based splits, a row
keeps its split when the corpus is re-read or appended to), fully
vectorized, and shuffle-free (one map stage)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from jesse_ray.compiler import _combine
from jesse_ray.hashutil import fmix64, hash64_strings


def _key_hash(batch: pa.Table, key: str, salt: str) -> np.ndarray:
    """fmix64-finalized hash of the (salted) string key column — the
    shared uniform-fraction generator for splits and sampling.  FNV-1a's
    high bits avalanche poorly on short sequential keys (measured 84.75%
    in a nominal 80% split of 20k "d-NNNNN" ids); fmix64 restores
    uniformity."""
    arr = _combine(batch[key])
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    arr = pc.fill_null(arr, "")
    if salt:
        arr = pc.binary_join_element_wise(pa.array([salt] * len(arr)), arr, "")
    return fmix64(hash64_strings(arr))


def add_hash_split(
    ds: Dataset,
    key: str,
    fractions: dict[str, float],
    *,
    out_col: str = "split",
    salt: str = "",
    batch_size: Optional[int] = None,
) -> Dataset:
    """Append a ``split`` column: name drawn from ``fractions`` (which
    must sum to 1) by thresholding hash64(salt + key) / 2^64.  Rows with
    a NULL key go to the FIRST split (deterministic fallback).  Change
    ``salt`` to derive an independent assignment from the same keys."""
    total = sum(fractions.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names])
    thresholds = (bounds * float(2**64)).astype(np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt).astype(np.float64)
        idx = np.searchsorted(thresholds, h, side="right")
        idx = np.clip(idx, 0, len(names) - 1)
        split = pa.array(np.asarray(names, dtype=object)[idx], type=pa.string())
        return batch.append_column(out_col, split)

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def stratified_hash_sample(
    ds: Dataset,
    key: str,
    rates: dict[str, float],
    *,
    strata_col: str = "source",
    default_rate: float = 0.0,
    salt: str = "sample",
    batch_size: Optional[int] = None,
) -> Dataset:
    """Deterministic per-stratum downsampling: keep a row iff
    hash(salt+key)/2^64 < rate(stratum).  The standard corpus-mixing
    move (up-/down-weight sources into a training mix) as one
    shuffle-free vectorized filter; deterministic across runs and
    repartitionings, and a row's fate is independent of the stratum of
    OTHER rows (append-safe).  Strata absent from ``rates`` use
    ``default_rate``; change ``salt`` for an independent draw (and note
    ``salt="sample"`` differs from the split stage's default ``""``, so
    sampling is independent of split assignment by default)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    names = sorted(rates)
    thresholds = np.array(
        [rates[n] * float(2**64) for n in names] + [default_rate * float(2**64)],
        dtype=np.float64,
    )
    names_arr = pa.array(names, type=pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt).astype(np.float64)
        strata = _combine(batch[strata_col])
        if not (pa.types.is_string(strata.type) or pa.types.is_large_string(strata.type)):
            strata = pc.cast(strata, pa.string())
        idx = pc.fill_null(pc.index_in(strata, value_set=names_arr), len(names))
        idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(h < thresholds[idx]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def fixed_size_sample(
    ds: Dataset,
    key: str,
    k: int,
    *,
    strata_col: str = "source",
    salt: str = "fixed",
    hash_col: str | None = None,
    batch_size: Optional[int] = None,
) -> Dataset:
    """Deterministic FIXED-COUNT per-stratum sample: keep the ``k`` rows
    with the smallest ``fmix64(hash64(salt + key))`` in each stratum —
    the bottom-k-by-hash trick (a deterministic reservoir: the selected
    set is a uniform k-subset, stable across runs and repartitionings,
    and appending new rows only ever swaps members at the hash boundary,
    never reshuffles survivors wholesale).

    One map stage computes the hash; the per-group bottom-k is
    :func:`~jesse_ray.pipelines.relational.grouped_topn` ascending —
    map-side local bottom-k per batch, so the shuffle carries at most
    k × strata × blocks rows.  Pass ``hash_col`` to keep the hash in the
    output (e.g. for an audit sidecar); ties on the hash break by key.
    """
    from jesse_ray.pipelines.relational import grouped_topn

    col = hash_col or "__fs_hash"

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, key, salt)
        # shift into int64 order-preservingly (Arrow sort on uint64 is
        # fine too, but int64 keeps the sidecar parquet DuckDB-friendly)
        signed = (h - np.uint64(1 << 63)).view(np.int64)
        return batch.append_column(col, pa.array(signed, type=pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    out = grouped_topn(hashed, [strata_col], col, k, descending=False, tiebreak=key)
    if hash_col is None:
        def drop(batch: pa.Table) -> pa.Table:
            return batch.drop_columns([col])
        out = out.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
    return out


def temperature_rates(
    counts: dict[str, int], *, temperature: float = 2.0, budget_frac: float = 0.5
) -> dict[str, float]:
    """Per-stratum keep rates for TEMPERATURE-scaled corpus mixing (the
    multilingual-training recipe, e.g. mT5 / Arivazhagan et al. 2019:
    sample stratum s with probability ∝ p_s^(1/T), flattening the size
    distribution so low-resource strata are upweighted).  Given the
    stratum row counts and a total budget of ``budget_frac * N`` rows,
    rate_s = min(1, B * q_s / n_s) with q ∝ (n/N)^(1/T).

    Driver-side pure float64 math over ~#strata values (strata are
    sources/languages — small by nature).  Rates capped at 1.0 mean the
    realized total can undershoot the budget (standard single-pass
    behavior; iterate with a higher budget_frac if exactness matters)."""
    names = sorted(counts)
    n = np.array([counts[s] for s in names], dtype=np.float64)
    total = n.sum()
    if total == 0:
        return {s: 0.0 for s in names}
    q = (n / total) ** (1.0 / temperature)
    q /= q.sum()
    budget = budget_frac * total
    rates = np.minimum(1.0, budget * q / np.maximum(n, 1.0))
    return dict(zip(names, rates.tolist()))


def mixture_sample(
    ds: Dataset,
    key: str,
    *,
    strata_col: str = "source",
    temperature: float = 2.0,
    budget_frac: float = 0.5,
    salt: str = "sample",
    batch_size: Optional[int] = None,
) -> tuple[Dataset, dict[str, float]]:
    """Temperature-mixed deterministic downsample: one tiny grouped
    count (combiner partials, ≤#strata rows shuffled), driver-side rate
    derivation, then the shuffle-free hash-threshold filter.  Returns
    (sampled dataset, the rates used)."""
    from jesse_ray.pipelines.relational import grouped_agg

    cnt = grouped_agg(ds.select_columns([strata_col]), [strata_col])
    counts = {}
    for b in cnt.iter_batches(batch_format="pyarrow"):
        for s, c in zip(b[strata_col].to_pylist(), b["cnt"].to_pylist()):
            if s is None:
                continue  # null stratum: no rate -> default_rate 0.0 (dropped)
            counts[s] = counts.get(s, 0) + int(c)
    rates = temperature_rates(counts, temperature=temperature, budget_frac=budget_frac)
    return (
        stratified_hash_sample(ds, key, rates, strata_col=strata_col,
                               salt=salt, batch_size=batch_size),
        rates,
    )


def epoch_upsample(
    ds: Dataset,
    key: str,
    weights: dict[str, float],
    *,
    strata_col: str = "source",
    default_weight: float = 1.0,
    salt: str = "epoch",
    copy_col: str = "copy_idx",
    u01_col: str | None = None,
    batch_size: Optional[int] = None,
) -> Dataset:
    """Deterministic NON-INTEGER-epoch upsampling — the mixing move for
    high-quality sources trained for >1 epoch (e.g. wiki × 2.5): each
    row is emitted ``floor(w)`` times plus one more iff
    ``hash(salt+key)/2^64 < frac(w)``, with ``copy_col`` numbering the
    copies 0..c-1 (the training loader's dedup/epoch tag).

    Shuffle-free and append-safe like :func:`stratified_hash_sample`
    (a row's copy count depends only on its own key), expansion is the
    1→many ``take``-by-repeat surgery (bounded by max weight), and the
    fate hash uses the shared fmix64 generator, so an up-weighted
    source's extra-copy subset is exactly a stratified_hash_sample of
    it.  Set ``u01_col`` to also emit the uniform draw (audit sidecars:
    a twin can re-derive every copy count from it exactly)."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError("default_weight must be >= 0")
    names = sorted(weights)
    warr = np.array([weights[n] for n in names] + [default_weight], dtype=np.float64)
    names_arr = pa.array(names, type=pa.string())

    def expand(batch: pa.Table) -> pa.Table:
        u = _key_hash(batch, key, salt).astype(np.float64) / float(2**64)
        strata = _combine(batch[strata_col])
        if not (pa.types.is_string(strata.type) or pa.types.is_large_string(strata.type)):
            strata = pc.cast(strata, pa.string())
        idx = pc.fill_null(pc.index_in(strata, value_set=names_arr), len(names))
        w = warr[idx.to_numpy(zero_copy_only=False).astype(np.int64)]
        base = np.floor(w).astype(np.int64)
        copies = base + (u < (w - base))
        total = int(copies.sum())
        rows = np.repeat(np.arange(len(copies), dtype=np.int64), copies)
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]])
        copy_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        out = batch
        if u01_col is not None:
            out = out.append_column(u01_col, pa.array(u, type=pa.float64()))
        out = out.take(pa.array(rows))
        return out.append_column(copy_col, pa.array(copy_idx, type=pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def weighted_sample_k(
    ds: Dataset,
    key: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "es",
    u01_col: str | None = None,
    es_col: str | None = None,
    batch_size: Optional[int] = None,
) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, "Weighted random sampling with a reservoir" —
    method only): each row gets the key ``u^(1/w)`` with ``u`` the
    row's fmix64 uniform draw and ``w`` its weight; the k LARGEST keys
    are exactly a weighted k-sample without replacement.  Replacing the
    RNG with the shared hash-u01 makes the sample deterministic across
    runs, repartitionings and appends — the corpus-mixing property all
    the sampling ops here share.

    One vectorized key pass + the map-side local top-k merge
    (grouped_topn), so the shuffle carries ≤ k × blocks rows.  Rows
    with null or non-positive weight are excluded (ES requires w > 0).
    Set ``u01_col`` / ``es_col`` to keep the draw / key in the output
    for audit sidecars (a SQL twin re-derives the selection exactly)."""
    from jesse_ray.pipelines.relational import grouped_topn

    if k <= 0:
        raise ValueError("k must be > 0")
    ucol = u01_col or "__es_u"
    ecol = es_col or "__es_key"

    def add_key(batch: pa.Table) -> pa.Table:
        w = _combine(batch[weight_col]).cast(pa.float64()).to_numpy(zero_copy_only=False)
        keep = np.isfinite(w) & (w > 0)
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return (
                t.append_column(ucol, pa.array([], type=pa.float64()))
                .append_column(ecol, pa.array([], type=pa.float64()))
                .append_column("__all", pa.array([], type=pa.int8()))
            )
        u = _key_hash(t, key, salt).astype(np.float64) / float(2**64)
        es = u ** (1.0 / w[keep])
        return (
            t.append_column(ucol, pa.array(u, type=pa.float64()))
            .append_column(ecol, pa.array(es, type=pa.float64()))
            .append_column("__all", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=batch_size)
    out = grouped_topn(keyed, ["__all"], ecol, k, descending=True, tiebreak=key)

    drops = ["__all"] + ([] if u01_col else [ucol]) + ([] if es_col else [ecol])

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(drops)

    return out.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
