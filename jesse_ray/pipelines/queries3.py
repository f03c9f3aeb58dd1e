"""Catalog wave 3: scale-structure operators — distributed skyline
(Pareto frontier), CUBE grouping sets, KMV distinct sketch with a
hash-identical SQL twin, and exact interpolated per-group percentiles.
Same driver contract as :mod:`.queries` (column names match the DuckDB
twin exactly; doubles rounded identically on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from jesse_ray.hashutil import fmix64
from jesse_ray.sources import read_sequences, read_table

# shared helpers / constants from wave 1 (lazy wiring in .queries keeps
# this import acyclic at module-load time, same as queries2)
from jesse_ray.pipelines.queries import SEQ_SQL, _collect, _seq_path

QUERIES3: dict = {}
ORACLES3: dict = {}


# ---------------------------------------------------------------------------
# part_skyline — distributed 2-D Pareto frontier (min price, max size)


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D skyline (minimize price, maximize size)
    over DISTINCT (price, size) points via one sorted sweep: sort price
    asc / size desc, keep points whose size strictly exceeds the running
    max of everything cheaper-or-equal seen before them."""
    order = np.lexsort((-size, price))
    runmax = np.maximum.accumulate(size[order])
    prevmax = np.empty_like(runmax)
    prevmax[0] = np.iinfo(np.int64).min
    prevmax[1:] = runmax[:-1]
    keep = np.zeros(len(price), dtype=bool)
    keep[order] = size[order] > prevmax
    return keep


def q_part_skyline(sf_dir: str) -> pd.DataFrame:
    """Distributed skyline query (Börzsönyi et al., ICDE 2001): parts
    not dominated on (p_retailprice minimize, p_size maximize).  Scale
    shape: each block computes its LOCAL skyline with a vectorized
    sorted sweep (any globally non-dominated point is locally
    non-dominated, so the union of local skylines is a superset of the
    answer); only those few candidate rows reach the driver for the
    final sweep.  The driver never sees more than blocks x |local
    skyline| rows — O(log n) expected per block on anti-correlated-free
    data — while the full table streams once."""
    ds = read_table(f"{sf_dir}/part.parquet",
                    columns=["p_partkey", "p_size", "p_retailprice"])

    def local(b: pa.Table) -> pa.Table:
        price = b["p_retailprice"].to_numpy(zero_copy_only=False)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (price, size) points, then sweep; keep every row whose
        # point is on the local frontier (ties share the frontier)
        pts = np.stack([price, size.astype(np.float64)], axis=1)
        uniq, inv = np.unique(pts, axis=0, return_inverse=True)
        mask = _skyline_mask(uniq[:, 0], uniq[:, 1].astype(np.int64))[inv]
        return b.filter(pa.array(mask))

    cand = _collect(ds.map_batches(local, batch_format="pyarrow",
                                   zero_copy_batch=True)).to_pandas()
    price = cand["p_retailprice"].to_numpy()
    size = cand["p_size"].to_numpy().astype(np.int64)
    pts = np.stack([price, size.astype(np.float64)], axis=1)
    uniq, inv = np.unique(pts, axis=0, return_inverse=True)
    final = _skyline_mask(uniq[:, 0], uniq[:, 1].astype(np.int64))[inv]
    out = cand[final].copy()
    out["p_size"] = out["p_size"].astype("int64")
    out["price"] = out["p_retailprice"].round(2)
    out = out[["p_partkey", "p_size", "price"]]
    return out.sort_values("p_partkey").reset_index(drop=True)


SQL_PART_SKYLINE = """
SELECT p.p_partkey, CAST(p.p_size AS BIGINT) AS p_size,
       round(p.p_retailprice, 2) AS price
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_partkey
"""

QUERIES3["part_skyline"] = q_part_skyline
ORACLES3["part_skyline"] = SQL_PART_SKYLINE


# ---------------------------------------------------------------------------
# lineitem_cube — GROUP BY CUBE (all four grouping sets)


def q_lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE parity over (l_returnflag, l_linestatus): the four
    grouping sets — leaf, per-flag, per-status, grand total — each a
    combiner-shuffled `grouped_agg` pass (map-side Arrow partials, tiny
    merge), unioned with NULL markers.  Extends the ROLLUP twin
    (`queries.py q_lineitem_rollup`) with the transposed (status-only)
    set that ROLLUP cannot express."""
    from jesse_ray.pipelines.relational import grouped_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "l_linestatus": b["l_linestatus"],
                         "l_quantity": b["l_quantity"],
                         "rev": rev})

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def level(keys: list[str]) -> pd.DataFrame:
        if keys:
            return grouped_agg(ds, keys, sums=["l_quantity", "rev"]).to_pandas()
        t = grouped_agg(ds.map_batches(
            lambda b: b.append_column("__all", pa.array(np.zeros(b.num_rows, dtype=np.int8))),
            batch_format="pyarrow", zero_copy_batch=True,
        ), ["__all"], sums=["l_quantity", "rev"]).to_pandas()
        return t.drop(columns="__all")

    leaf = level(["l_returnflag", "l_linestatus"])
    by_flag = level(["l_returnflag"])
    by_status = level(["l_linestatus"])
    top = level([])
    by_flag["l_linestatus"] = None
    by_status["l_returnflag"] = None
    top["l_returnflag"] = None
    top["l_linestatus"] = None
    out = pd.concat([leaf, by_flag, by_status, top], ignore_index=True)
    out["n"] = out["cnt"].astype("int64")
    out["sum_qty"] = out["sum_l_quantity"].astype("int64")
    out["revenue"] = out["sum_rev"].round(2)
    out = out[["l_returnflag", "l_linestatus", "n", "sum_qty", "revenue"]]
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           na_position="last").reset_index(drop=True)


SQL_LINEITEM_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
"""

QUERIES3["lineitem_cube"] = q_lineitem_cube
ORACLES3["lineitem_cube"] = SQL_LINEITEM_CUBE


# ---------------------------------------------------------------------------
# seq_kmv_distinct — KMV (k-minimum-values) distinct-token sketch

KMV_K = 512

# fmix64 (MurmurHash3 finalizer) replicated in DuckDB: xor/shift on
# UBIGINT, wraparound multiplies via HUGEINT split (same technique as
# queries2._bootstrap_sql).
_M64 = 1 << 64
_C1, _C2 = 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53


def _sql_mul(e: str, c: int) -> str:
    c_hi, c_lo = c >> 32, c & 0xFFFFFFFF
    return (f"CAST(((CAST({e} AS HUGEINT) * {c_lo})"
            f" + ((CAST({e} AS HUGEINT) * {c_hi}) % 4294967296) * 4294967296)"
            f" % {_M64} AS UBIGINT)")


def _sql_xsh(e: str) -> str:
    return f"xor({e}, {e} >> 33)"


def q_seq_kmv_distinct(sf_dir: str) -> pd.DataFrame:
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002) over the
    corpus token vocabulary: hash every distinct token value with
    fmix64 (a 64-bit bijection, so token-level distinctness carries
    through), keep the K smallest hashes, estimate
    ``D = (K-1) * 2^64 / h_(K)``.  Scale shape: each block contributes
    its own bottom-K of its batch-local distinct tokens (a few KB), the
    driver merges blocks x K values — constant-size partials, one
    streaming pass, no shuffle.  The SQL twin re-derives the identical
    fmix64 chain, so the K-th hash and the estimate are bit-identical."""
    ds = read_sequences(_seq_path(sf_dir), columns=["tokens"])

    def partial(b: pa.Table) -> pa.Table:
        toks = b["tokens"]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.table({"h": pa.array([], type=pa.uint64())})
        # int32 token -> two's-complement uint64 == value mod 2^64,
        # matching the SQL twin's (t % 2^64 + 2^64) % 2^64
        u = np.unique(flat.astype(np.int64)).astype(np.uint64)
        h = np.sort(fmix64(u))[:KMV_K]
        return pa.table({"h": pa.array(h, type=pa.uint64())})

    parts = _collect(ds.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True))
    merged = np.unique(parts["h"].to_numpy(zero_copy_only=False))
    k = min(KMV_K, len(merged))
    hk = float(merged[k - 1])
    est = (k - 1) * float(_M64) / hk
    return pd.DataFrame({"k": pd.array([k], dtype="int64"),
                         "est_distinct": [round(est, 4)]})


def _kmv_sql() -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT unnest(tokens) AS t FROM {SEQ_SQL}
),
h0 AS (
  SELECT CAST(((CAST(t AS HUGEINT) % {_M64}) + {_M64}) % {_M64} AS UBIGINT) AS h
  FROM tok
),
h1 AS (SELECT {_sql_mul(_sql_xsh('h'), _C1)} AS h FROM h0),
h2 AS (SELECT {_sql_mul(_sql_xsh('h'), _C2)} AS h FROM h1),
h3 AS (SELECT {_sql_xsh('h')} AS h FROM h2),
bk AS (SELECT h FROM h3 ORDER BY h LIMIT {KMV_K}),
a AS (SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS hk FROM bk)
SELECT k,
       round((k - 1) * 18446744073709551616.0 / CAST(hk AS DOUBLE), 4)
         AS est_distinct
FROM a
"""


QUERIES3["seq_kmv_distinct"] = q_seq_kmv_distinct
ORACLES3["seq_kmv_distinct"] = _kmv_sql()


# ---------------------------------------------------------------------------
# events_quantile_cont — exact interpolated (type-7) per-group percentiles

QC_QS = (0.25, 0.5, 0.75, 0.9)


def q_events_quantile_cont(sf_dir: str) -> pd.DataFrame:
    """Exact linearly-interpolated percentiles of event value per
    event_type — the continuous (type-7) twin of the discrete grouped
    quantiles in `relational.grouped_quantiles`.  Both engines evaluate
    the SAME formula ``x[i] + g*(x[i+1]-x[i])`` with ``i+g = q*(n-1)``
    (numpy's _lerp branches differ in the last bit, so the lerp is done
    explicitly), making results bit-identical before rounding.  Scale
    note: exact interpolation needs the two order statistics around the
    target rank, computed here per group inside map_groups (group fits
    a worker); the unbounded-group scale path is the t-digest sketch
    (`sketches.py`) already in the catalog."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b["value"])),
        batch_format="pyarrow", zero_copy_batch=True)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(g["value"].to_numpy(dtype=np.float64))
        n = len(x)
        rows = []
        for q in QC_QS:
            pos = q * (n - 1)
            i = int(np.floor(pos))
            gfrac = pos - i
            hi = x[i + 1] if i + 1 < n else x[i]
            val = x[i] + gfrac * (hi - x[i])
            rows.append((g["event_type"].iloc[0], q, round(float(val), 6)))
        return pd.DataFrame(rows, columns=["event_type", "q", "val"])

    out = ds.groupby("event_type").map_groups(per_group, batch_format="pandas")
    return out.to_pandas().sort_values(["event_type", "q"]).reset_index(drop=True)


SQL_EVENTS_QUANTILE_CONT = f"""
WITH v AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
qs AS (SELECT unnest(ARRAY[{", ".join(str(q) for q in QC_QS)}]) AS q),
t AS (
  SELECT v.event_type, qs.q, v.n,
         CAST(floor(qs.q * (v.n - 1)) AS BIGINT) AS i,
         qs.q * (v.n - 1) - floor(qs.q * (v.n - 1)) AS g
  FROM (SELECT DISTINCT event_type, n FROM v) v CROSS JOIN qs
),
lo AS (
  SELECT t.event_type, t.q, t.g, v.value AS xlo
  FROM t JOIN v ON v.event_type = t.event_type AND v.rn = t.i + 1
),
hi AS (
  SELECT t.event_type, t.q, COALESCE(v.value, NULL) AS xhi
  FROM t LEFT JOIN v ON v.event_type = t.event_type AND v.rn = t.i + 2
)
SELECT lo.event_type, lo.q,
       round(lo.xlo + lo.g * (COALESCE(hi.xhi, lo.xlo) - lo.xlo), 6) AS val
FROM lo JOIN hi ON hi.event_type = lo.event_type AND hi.q = lo.q
ORDER BY lo.event_type, lo.q
"""

QUERIES3["events_quantile_cont"] = q_events_quantile_cont
ORACLES3["events_quantile_cont"] = SQL_EVENTS_QUANTILE_CONT
