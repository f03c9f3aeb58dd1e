"""engine.migration_report — one-pass schema-migration impact audit
(engine extension; jesse validates one schema per run, so a rollout
delta needs two reference runs + a diff — here it is a single corpus
pass emitting ≤4 partial rows per batch)."""

import pyarrow as pa
import ray

from jesse_ray.compiler import compile_spec
from jesse_ray.engine import migration_report
from jesse_ray.spec import ColumnSpec, TableSpec


def _spec(min_n, max_n):
    s = TableSpec(key_column="doc_id")
    s.columns["n"] = ColumnSpec(minimum=min_n, maximum=max_n)
    return s


def test_migration_report_contingency(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)]),
            # old [1,10] / new [3,20]:
            #  0 → dirty_both; 2 → broke_in_new; 5 → clean_both;
            #  15 → fixed_in_new; 25 → dirty_both; 10 → clean_both
            "n": pa.array([0, 2, 5, 15, 25, 10], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)
    rep = migration_report(ds, compile_spec(_spec(1, 10)), compile_spec(_spec(3, 20)))
    got = dict(zip(rep["status"].to_pylist(), rep["n"].to_pylist()))
    assert got == {
        "clean_both": 2,
        "broke_in_new": 1,
        "fixed_in_new": 1,
        "dirty_both": 2,
    }
