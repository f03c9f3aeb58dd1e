"""Recall gate for the PRUNED IVF-PQ configuration (r4 verdict item 3).

The catalog's oracle twin (emb_ivf_pq_topk) runs IVF-PQ in EXHAUSTIVE
configuration — probe all cells, refine >= corpus — so it verifies
plumbing, not pruning quality.  This test gates the quality knob: on
the deterministic clustered 100k x 64-d corpus (tools/bench_ann.py
generator, seeded), searching only probe=16 of 256 cells with
refine=16 must keep recall@10 >= 0.9 against the exact cosine
baseline.  A regression in residual encoding, the per-cell ADC LUT
math, or candidate truncation drops recall far below the bar (plain
non-residual PQ measured 0.39 at 1M rows) and fails CI here instead of
only surfacing in BASELINE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_pruned_ivf_pq_recall_floor(ray_session):
    from tools.bench_ann import run

    out = run(100_000, 200, k=10, centroids=256, probe=16, refine=16)
    # measured 0.97 on this corpus; 0.9 is the regression floor
    assert out["recall_at_10"] >= 0.9, out
    # the pruned search must actually prune: probe covers 16/256 cells
    assert out["n_probe"] == 16 and out["n_centroids"] == 256
