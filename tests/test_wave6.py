"""Wave-6 unit tests: the prefix-filter exact-Jaccard join's recall
guarantee (brute-force oracle fuzz), its integer length filter, and the
drop-counter contract (skew drops are reported, never swallowed)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_prefix_jaccard_join_equals_brute_force_fuzz():
    import pyarrow as pa
    import ray.data

    from jesse_ray.functions.dedup import _shingle_hashes, prefix_jaccard_join

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    docs = [" ".join(rng.choice(words, rng.integers(8, 40))) for _ in range(60)]
    # planted near-dups at several containment levels
    docs[9] = docs[2]
    docs[17] = docs[5] + " omega"
    docs[23] = docs[5][: int(len(docs[5]) * 0.7)]
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                    "text": pa.array(docs)})
    out = prefix_jaccard_join(ray.data.from_arrow(tbl),
                              threshold_num=2, threshold_den=5).to_pandas()
    got = {(int(l), int(r)): float(j)
           for l, r, j in zip(out["left"], out["right"], out["jaccard"])}
    sets = [np.unique(_shingle_hashes(t, 5)) for t in docs]
    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            jac = inter / max(len(sets[i]) + len(sets[j]) - inter, 1)
            if jac >= 0.4:
                want[(i, j)] = jac
    assert set(got) == set(want)  # recall AND precision exactly 1.0
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_prefix_jaccard_length_filter_is_prune_only():
    # min*den >= max*num at the exact boundary must NOT be pruned:
    # |A|=2, |B|=5, t=2/5 → min*5 == max*2 — the pair must still be
    # generated and verified (its true Jaccard decides).
    import pyarrow as pa
    import ray.data

    from jesse_ray.functions.dedup import _shingle_hashes, prefix_jaccard_join

    a = "abcdef"            # 2 unique 5-gram shingles
    b = "abcdefghi"         # 5 unique 5-gram shingles, contains all of a's
    assert len(np.unique(_shingle_hashes(a, 5))) == 2
    assert len(np.unique(_shingle_hashes(b, 5))) == 5
    tbl = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": pa.array([a, b])})
    out = prefix_jaccard_join(ray.data.from_arrow(tbl),
                              threshold_num=2, threshold_den=5).to_pandas()
    # jaccard = 2/5 = exactly t → kept
    assert set(zip(out["left"], out["right"])) == {(1, 2)}
    assert abs(float(out["jaccard"].iloc[0]) - 0.4) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_prefix_jaccard_bucket_cap_drops_are_reported():
    import pyarrow as pa
    import ray
    import ray.data

    from jesse_ray.functions.dedup import DropCounter, prefix_jaccard_join

    # 30 identical docs → every prefix shingle bucket holds 30 members,
    # far above cap=4 → all pairs dropped, counter must fire
    docs = ["identical text content for every single row here"] * 30
    tbl = pa.table({"doc_id": pa.array(range(30), type=pa.int64()),
                    "text": pa.array(docs)})
    ctr = DropCounter.remote()
    out = prefix_jaccard_join(ray.data.from_arrow(tbl), threshold_num=2,
                              threshold_den=5, bucket_cap=4,
                              drop_counter=ctr).to_pandas()
    assert out.empty
    stats = ray.get(ctr.get.remote())
    assert stats["dropped_buckets"] > 0 and stats["dropped_rows"] > 0
