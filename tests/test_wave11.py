"""Wave-11 operators: burstiness, positional entropy, token dispersion
(DuckDB parity covered by tools/check_oracles.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_burstiness_constant_series(tmp_path):
    from jesse_ray.pipelines.queries11 import q_events_burstiness

    # exactly 4 events every day → var 0 → fano 0, B = (0-4)/(0+4) = -1
    ts = [f"2024-01-{d:02d}" for d in range(1, 11) for _ in range(4)]
    t = pa.table({
        "event_id": pa.array(np.arange(40, dtype=np.int64)),
        "ts": pa.array(pd.to_datetime(ts)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(40, dtype=np.int64)),
        "event_type": pa.array(["x"] * 40),
        "value": pa.array(np.ones(40)),
        "props": pa.array(["{}"] * 40),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = q_events_burstiness(str(tmp_path))
    assert got["fano"].iloc[0] == 0.0
    assert got["burstiness"].iloc[0] == -1.0


@pytest.mark.usefixtures("ray_session")
def test_position_entropy_constant_prefix(ray_session, monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries11 as q11

    # every sequence starts with token 7 → entropy 0 at pos 0; pos 1
    # uniform over {1,2} → ln 2
    rows = [[7, 1, 5], [7, 2, 6], [7, 1, 9], [7, 2, 3]]
    t = pa.table({"doc_id": pa.array([f"doc-{i:08d}" for i in range(4)]),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([3] * 4, type=pa.int32()),
                  "source": pa.array(["web"] * 4)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q11, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q11.q_seq_position_entropy(str(tmp_path)).set_index("pos")
    assert got.loc[0, "entropy"] == 0.0
    assert abs(got.loc[1, "entropy"] - round(np.log(2), 5)) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_token_dispersion_counts_docs_once(monkeypatch, tmp_path):
    import jesse_ray.pipelines.queries11 as q11

    # token 5 appears 3x in doc 0 and 1x in doc 1 → cf 4, df 2, cpd 2
    rows = [[5, 5, 5], [5, 1, 2]]
    t = pa.table({"doc_id": pa.array(["doc-00000000", "doc-00000001"]),
                  "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                  "n_tok": pa.array([3, 3], type=pa.int32()),
                  "source": pa.array(["web"] * 2)})
    pq.write_table(t, tmp_path / "sequences.parquet")
    monkeypatch.setattr(q11, "_seq_path", lambda sf: str(tmp_path / "sequences.parquet"))
    got = q11.q_seq_token_dispersion(str(tmp_path)).set_index("tok")
    assert got.loc[5, "cf"] == 4 and got.loc[5, "df"] == 2
    assert abs(got.loc[5, "cpd"] - 2.0) < 1e-12
