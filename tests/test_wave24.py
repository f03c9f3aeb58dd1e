"""Wave-24 unit tests: group-aware fold leakage, AMS certification,
butterfly closed form."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def test_groupaware_folds_zero_leakage(ray_session):
    """The defining invariant: identical-text docs NEVER straddle folds
    (checked directly on the sidecar, not just via the oracle gate)."""
    from jesse_ray.pipelines.queries24 import q_doc_groupaware_folds

    out = q_doc_groupaware_folds("/root/testdata/sf0.001")
    assert int(out["n_docs"].sum()) > 0
    side = pq.read_table("/tmp/jesse_ray_data/groupfolds_sigs_sf0.001.parquet").to_pandas()
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    j = side.merge(docs, on="doc_id")
    leaks = (j.groupby(j["text"].fillna(""))["fold"].nunique() > 1).sum()
    assert leaks == 0


def test_ams_f2_exact_matches_numpy(ray_session):
    from jesse_ray.pipelines.queries24 import q_events_ams_f2

    out = q_events_ams_f2("/root/testdata/sf0.001")
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id"]).to_pandas()
    c = ev["user_id"].value_counts().to_numpy()
    assert int(out["f2"].iloc[0]) == int((c.astype(np.int64) ** 2).sum())
    assert int(out["n_users"].iloc[0]) == len(c)


def test_butterflies_closed_form(ray_session):
    from jesse_ray.pipelines.queries24 import q_events_butterflies

    out = q_events_butterflies("/root/testdata/sf0.001")
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    ut = ev.drop_duplicates()
    m = ut.merge(ut, on="user_id")
    m = m[m["event_type_x"] < m["event_type_y"]]
    co = m.groupby(["event_type_x", "event_type_y"]).size().to_numpy()
    want = int((co * (co - 1) // 2).sum())
    assert int(out["butterflies"].iloc[0]) == want
