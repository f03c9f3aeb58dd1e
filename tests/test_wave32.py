"""Wave-32 unit tests: Bloom positional algebra and l-diversity rule."""

import numpy as np


def test_bloom_positions_deterministic_and_in_range():
    from jesse_ray.pipelines.queries32 import BLOOM_K, BLOOM_M, _bloom_positions

    h = np.array([1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64)
    p1 = _bloom_positions(h)
    p2 = _bloom_positions(h)
    assert np.array_equal(p1, p2)
    assert p1.shape == (BLOOM_K, len(h))
    assert (p1 < BLOOM_M).all()


def test_bloom_no_false_negatives_small():
    from jesse_ray.pipelines.queries32 import BLOOM_M, _bloom_positions

    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, 5000).astype(np.uint64)
    bm = np.zeros(BLOOM_M // 64, dtype=np.uint64)
    pos = _bloom_positions(keys).ravel()
    np.bitwise_or.at(bm, (pos // np.uint64(64)).astype(np.int64),
                     np.uint64(1) << (pos % np.uint64(64)))
    # every inserted key probes positive
    pos2 = _bloom_positions(keys)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(pos2.shape[0]):
        p = pos2[i]
        hit &= (bm[(p // np.uint64(64)).astype(np.int64)]
                >> (p % np.uint64(64))) & np.uint64(1) > 0
    assert hit.all()


def test_ldiversity_flag(ray_session):
    from jesse_ray.pipelines.queries32 import LDIV_L, q_events_ldiversity

    out = q_events_ldiversity("/root/testdata/sf0.001")
    assert ((out["l_div"] < LDIV_L) == out["below_l"]).all()
    assert (out["l_div"] > 0).all()
