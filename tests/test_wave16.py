"""Wave-16 operators: k-NN label purity, per-source duplicate mass
(DuckDB parity via tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_knn_purity_separable_clusters(tmp_path):
    from jesse_ray.pipelines.queries16 import q_emb_knn_purity

    # two tight, well-separated clusters of 6 → every vector's 5
    # nearest neighbors share its label → purity exactly 1
    rng = np.random.default_rng(7)
    a = rng.normal([10, 0, 0, 0], 0.01, size=(6, 4))
    b = rng.normal([0, 10, 0, 0], 0.01, size=(6, 4))
    emb = np.vstack([a, b]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(12, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, e)) for e in emb],
                                        type=pa.list_(pa.float32())),
                  "label": pa.array([0] * 6 + [1] * 6, type=pa.int32())})
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = q_emb_knn_purity(str(tmp_path)).set_index("label")
    assert got.loc[0, "purity"] == 1.0 and got.loc[1, "purity"] == 1.0
    assert got.loc[0, "n"] == 6 and got.loc[1, "n"] == 6


@pytest.mark.usefixtures("ray_session")
def test_dup_mass_by_source_planted(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries16 as q16

    # source A: 2 copies of one row + 1 unique → dup 2/3; source B: all
    # unique → 0; a cross-source copy must NOT count as a dup
    rows = [[1, 2], [1, 2], [3, 4],          # A
            [5, 6], [7, 8], [1, 2]]          # B (shares content with A)
    src = ["A", "A", "A", "B", "B", "B"]
    t = pa.table({"doc_id": pa.array([f"doc-{i:08d}" for i in range(6)]),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([2] * 6, type=pa.int32()),
                  "source": pa.array(src)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q16, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q16.q_seq_dup_mass_by_source(str(tmp_path)).set_index("source")
    assert got.loc["A", "dup_rows"] == 2 and abs(got.loc["A", "dup_share"] - round(2/3, 5)) < 1e-12
    assert got.loc["B", "dup_rows"] == 0
