"""Wave-3 catalog operators: skyline sweep, CUBE grouping sets, KMV
sketch, interpolated percentiles (the catalog-level DuckDB parity is
covered by tools/check_oracles.py; these pin the kernels)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jesse_ray.hashutil import fmix64
from jesse_ray.pipelines.queries3 import _skyline_mask


def test_skyline_mask_basic():
    # minimize price, maximize size
    price = np.array([1.0, 2.0, 3.0, 2.5, 1.0])
    size = np.array([5, 7, 9, 9, 4], dtype=np.int64)
    # (1,5): nothing cheaper -> frontier. (2,7): only (1,5) cheaper, 7>5 ✓
    # (3,9): dominated by (2.5,9) (cheaper, same size) ✗
    # (2.5,9): frontier ✓. (1,4): dominated by (1,5) ✗
    mask = _skyline_mask(price, size)
    assert mask.tolist() == [True, True, False, True, False]


def test_skyline_mask_single_and_monotone():
    assert _skyline_mask(np.array([3.0]), np.array([1], dtype=np.int64)).tolist() == [True]
    # strictly better in both dims: only the best survives
    price = np.array([1.0, 2.0, 3.0])
    size = np.array([9, 8, 7], dtype=np.int64)
    assert _skyline_mask(price, size).tolist() == [True, False, False]


def test_skyline_local_superset_property():
    # union of per-block skylines contains the global skyline
    rng = np.random.default_rng(7)
    price = rng.uniform(0, 100, size=400)
    size = rng.integers(1, 50, size=400).astype(np.int64)
    glob = _skyline_mask(price, size)
    half = 200
    m1 = _skyline_mask(price[:half], size[:half])
    m2 = _skyline_mask(price[half:], size[half:])
    union = np.concatenate([m1, m2])
    assert np.all(union[glob])


def test_kmv_estimate_accuracy():
    # KMV over D known-distinct values: estimate within ~3/sqrt(K) rel err
    k = 512
    d = 50_000
    vals = np.arange(d, dtype=np.int64).astype(np.uint64)
    h = np.sort(fmix64(vals))[:k]
    est = (k - 1) * float(1 << 64) / float(h[-1])
    assert abs(est - d) / d < 3 / np.sqrt(k)


def test_kmv_merge_equals_global():
    # bottom-k of merged per-block bottom-k == global bottom-k
    k = 64
    vals = np.arange(10_000, dtype=np.uint64)
    h = fmix64(vals)
    parts = [np.sort(h[i::7])[:k] for i in range(7)]
    merged = np.unique(np.concatenate(parts))[:k]
    assert np.array_equal(merged, np.sort(h)[:k])


def test_quantile_cont_formula_matches_numpy_linear():
    x = np.sort(np.random.default_rng(3).uniform(0, 10, size=101))
    for q in (0.25, 0.5, 0.75, 0.9):
        pos = q * (len(x) - 1)
        i = int(np.floor(pos))
        g = pos - i
        hi = x[i + 1] if i + 1 < len(x) else x[i]
        val = x[i] + g * (hi - x[i])
        assert val == pytest.approx(float(np.quantile(x, q)), abs=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_cube_grouping_sets_consistency():
    from jesse_ray.pipelines.queries3 import q_lineitem_cube

    out = q_lineitem_cube("/root/testdata/sf0.001")
    leaf = out[out["l_returnflag"].notna() & out["l_linestatus"].notna()]
    total = out[out["l_returnflag"].isna() & out["l_linestatus"].isna()]
    by_flag = out[out["l_returnflag"].notna() & out["l_linestatus"].isna()]
    by_status = out[out["l_returnflag"].isna() & out["l_linestatus"].notna()]
    assert len(total) == 1
    assert leaf["n"].sum() == total["n"].iloc[0]
    assert by_flag["n"].sum() == total["n"].iloc[0]
    assert by_status["n"].sum() == total["n"].iloc[0]
    assert leaf["sum_qty"].sum() == total["sum_qty"].iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_part_skyline_no_dominated_rows():
    from jesse_ray.pipelines.queries3 import q_part_skyline

    out = q_part_skyline("/root/testdata/sf0.001")
    pr = out["price"].to_numpy()
    sz = out["p_size"].to_numpy()
    # pairwise: no row dominates another (frontier rows are mutually
    # non-dominated), checked exactly on the small result
    for i in range(len(out)):
        dom = (pr <= pr[i]) & (sz >= sz[i]) & ((pr < pr[i]) | (sz > sz[i]))
        assert not dom.any()


def test_levenshtein_pairs_known_cases():
    from jesse_ray.functions.editdist import levenshtein_pairs

    a = ["kitten", "flaw", "", "abc", "same", "ab"]
    b = ["sitting", "lawn", "xyz", "", "same", "ba"]
    assert levenshtein_pairs(a, b).tolist() == [3, 2, 3, 3, 0, 2]


def test_levenshtein_pairs_matches_reference_dp():
    from jesse_ray.functions.editdist import levenshtein_pairs

    def ref(s, t):
        m, n = len(s), len(t)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (s[i - 1] != t[j - 1]))
                prev = cur
        return dp[n]

    rng = np.random.default_rng(11)
    alpha = "abcde"
    pairs = [("".join(rng.choice(list(alpha), rng.integers(0, 12))),
              "".join(rng.choice(list(alpha), rng.integers(0, 12))))
             for _ in range(60)]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_pairs(a, b)
    want = [ref(x, y) for x, y in pairs]
    assert got.tolist() == want


def test_theta_intersect_estimate_property():
    # planted overlap: |A|=3000, |B|=3000, |A∩B|=1000 -> estimate within 35%
    from jesse_ray.hashutil import fmix64 as fm

    a_ids = np.arange(0, 3000, dtype=np.uint64)
    b_ids = np.arange(2000, 5000, dtype=np.uint64)
    k = 64
    ha = np.sort(fm(a_ids))[:k]
    hb = np.sort(fm(b_ids))[:k]
    theta = min(float(ha[-1]), float(hb[-1]))
    common = np.intersect1d(ha, hb)
    common = common[common.astype(np.float64) <= theta]
    est = len(common) * float(1 << 64) / theta
    assert abs(est - 1000) / 1000 < 0.35


@pytest.mark.usefixtures("ray_session")
def test_zonemap_plan_counts():
    from jesse_ray.pipelines.queries3 import q_seq_zonemap_plan, ZM_ZONE

    out = q_seq_zonemap_plan("/root/testdata/sf0.001")
    assert out["zones_total"].iloc[0] >= 1
    assert 0 <= out["zones_pruned"].iloc[0] <= out["zones_total"].iloc[0]
    # matched rows live in non-pruned zones only, so at least one zone
    # must survive whenever any row matches
    if out["rows_matched"].iloc[0] > 0:
        assert out["zones_pruned"].iloc[0] < out["zones_total"].iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_dup_gram_coverage_planted():
    import ray.data
    from jesse_ray.functions.dedup import token_dup_gram_coverage

    # doc A and B share one 8-gram (tokens 100..107); doc C is unique;
    # doc D duplicates doc A exactly (multiplicity path)
    shared = list(range(100, 108))
    a = shared + [1, 2, 3, 4]          # 12 tokens, 8 covered
    b = [9, 9] + shared + [7]          # 11 tokens, 8 covered
    c = list(range(200, 220))          # 20 tokens, 0 covered
    d = list(a)                        # 12 tokens, 8 covered (same content as A)
    import pyarrow as pa
    tbl = pa.table({"tokens": pa.array([a, b, c, d], type=pa.list_(pa.int32()))})
    ds = ray.data.from_arrow(tbl)
    total, covered = token_dup_gram_coverage(ds, k=8)
    assert total == 12 + 11 + 20 + 12
    # A==D duplicates make EVERY 8-gram of A duplicated (all 12 tokens
    # covered in both), and B shares the planted gram only
    assert covered == 12 + 8 + 0 + 12


@pytest.mark.usefixtures("ray_session")
def test_dup_gram_coverage_overlapping_spans():
    import ray.data
    import pyarrow as pa
    from jesse_ray.functions.dedup import token_dup_gram_coverage

    # two docs share a 10-token run -> two overlapping dup 8-grams in
    # each; interval union must count 10 tokens, not 16
    run = list(range(50, 60))
    a = run + [1, 2]
    b = [3] + run
    tbl = pa.table({"tokens": pa.array([a, b], type=pa.list_(pa.int32()))})
    ds = ray.data.from_arrow(tbl)
    total, covered = token_dup_gram_coverage(ds, k=8)
    assert total == 12 + 11
    assert covered == 10 + 10


@pytest.mark.usefixtures("ray_session")
def test_overlap_dups_catches_containment_jaccard_misses():
    import ray.data
    import pyarrow as pa
    from jesse_ray.functions.dedup import overlap_coeff_dups

    small = "the quick brown fox jumps over the lazy dog"
    big = ("completely different opening material here and more of it "
           + small +
           " and a very long unrelated tail that keeps going with noise "
           "tokens and filler phrases repeated again and again until the "
           "jaccard similarity of the pair is far below any lsh threshold")
    other = "nothing in common with either document at all whatsoever xyz"
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array([small, big, other])})
    ds = ray.data.from_arrow(tbl)
    out = overlap_coeff_dups(ds, threshold_num=4, threshold_den=5).to_pandas()
    pairs = set(zip(out["left"], out["right"]))
    assert (1, 2) in pairs  # containment found
    assert all(p in {(1, 2)} for p in pairs)
    row = out[(out["left"] == 1) & (out["right"] == 2)].iloc[0]
    assert row["overlap"] >= 0.8


@pytest.mark.usefixtures("ray_session")
def test_overlap_dups_prefix_guarantee_fuzz():
    # brute-force oracle over random word-salad docs
    import ray.data
    import pyarrow as pa
    from jesse_ray.functions.dedup import _shingle_hashes, overlap_coeff_dups

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = [" ".join(rng.choice(words, rng.integers(6, 30))) for _ in range(40)]
    # plant one containment pair
    docs[7] = docs[3] + " " + " ".join(rng.choice(words, 40))
    tbl = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                    "text": pa.array(docs)})
    out = overlap_coeff_dups(ray.data.from_arrow(tbl),
                             threshold_num=4, threshold_den=5).to_pandas()
    got = set(zip(out["left"], out["right"]))
    want = set()
    sets = [np.unique(_shingle_hashes(t, 5)) for t in docs]
    for i in range(40):
        for j in range(i + 1, 40):
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            if inter / max(min(len(sets[i]), len(sets[j])), 1) >= 0.8:
                want.add((i, j))
    assert got == want


def test_bmp_codec_roundtrip_and_traps():
    from jesse_ray.functions.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(9)
    # widths straddling the 4-byte stride boundary
    for w, h in [(4, 4), (5, 2), (6, 3), (7, 5), (1, 7)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    # corrupt magic rejected
    blob = bytearray(encode_bmp(rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)))
    blob[0] = ord("X")
    with pytest.raises(ValueError):
        decode_bmp(bytes(blob))
    # channel order really is BGR on disk: a pure-red image stores B=0 first
    red = np.zeros((2, 4, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    raw = encode_bmp(red)
    assert raw[54] == 0 and raw[55] == 0 and raw[56] == 255


@pytest.mark.usefixtures("ray_session")
def test_overlap_verify_shuffle_matches_broadcast():
    import ray.data
    import pyarrow as pa
    from jesse_ray.functions.dedup import verify_jaccard_pairs

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "prefix words then the quick brown fox jumps over the lazy dog plus a long tail of extra noise words",
            "entirely unrelated content here",
        ]),
    })
    pairs = ray.data.from_arrow(pa.table({
        "left": pa.array([1, 1], type=pa.int64()),
        "right": pa.array([2, 3], type=pa.int64()),
    }))
    ds = ray.data.from_arrow(docs)
    b = verify_jaccard_pairs(ds, pairs, threshold=0.8, metric="overlap",
                             mode="broadcast").to_pandas()
    s = verify_jaccard_pairs(ds, ray.data.from_arrow(pa.table({
        "left": pa.array([1, 1], type=pa.int64()),
        "right": pa.array([2, 3], type=pa.int64()),
    })), threshold=0.8, metric="overlap", mode="shuffle").to_pandas()
    bset = sorted(zip(b["left"], b["right"], b["jaccard"].round(6)))
    sset = sorted(zip(s["left"], s["right"], s["jaccard"].round(6)))
    assert bset == sset
    assert len(bset) == 1 and bset[0][:2] == (1, 2)


@pytest.mark.usefixtures("ray_session")
def test_transition_conformance_protocol():
    from jesse_ray.pipelines.queries3 import (
        ALLOWED_TRANSITIONS,
        q_events_transition_conformance,
    )

    out = q_events_transition_conformance("/root/testdata/sf0.001")
    allowed = set(ALLOWED_TRANSITIONS)
    for _, r in out.iterrows():
        assert (r["from_type"], r["to_type"]) not in allowed
        assert r["n"] > 0


def test_truncation_cos_formula():
    rng = np.random.default_rng(2)
    v = rng.normal(size=64)
    t16 = np.concatenate([v[:16], np.zeros(48)])
    want = float(np.dot(v, t16) / (np.linalg.norm(v) * np.linalg.norm(t16)))
    got = float(np.sqrt((v[:16] ** 2).sum() / (v ** 2).sum()))
    assert got == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# wave-4 audits: expectation suite, Benford, freshness, fertility, unpivot


def test_expectation_suite_flags_planted_violations(ray_session):
    from jesse_ray.pipelines.queries3 import q_seq_expectations

    out = q_seq_expectations("/root/testdata/sf0.001")
    assert list(out.columns) == ["expectation", "observed", "passed"]
    by = dict(zip(out["expectation"], out["passed"]))
    obs = dict(zip(out["expectation"], out["observed"]))
    # the generator plants null doc_ids and a disallowed 'crawl-x' source
    assert by["doc_id_null_count_is_0"] == 0 and obs["doc_id_null_count_is_0"] > 0
    assert by["source_all_in_allowed"] == 0 and obs["source_all_in_allowed"] > 0
    assert by["row_count_at_least_1"] == 1
    assert by["n_tok_mean_between_1_4096"] == 1


def test_benford_digit_extraction_exact(ray_session):
    from jesse_ray.pipelines.queries3 import q_orders_benford

    out = q_orders_benford("/root/testdata/sf0.001")
    assert out["digit"].tolist() == list(range(1, 10))
    assert out["n"].sum() > 0
    # shares sum to 1 within fp tolerance, every Benford p matches its literal
    assert abs(out["share"].sum() - 1.0) < 1e-4
    assert abs(out["benford_p"].sum() - 1.0) < 1e-3


def test_first_digit_formula_matches_string_path():
    # floor(x*100+0.5) first-digit == first significant digit of the amount
    vals = np.array([1234.56, 9.99, 100.0, 55.01, 7000.49, 0.07])
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    first = [int(str(abs(c))[0]) for c in cents]
    assert first == [1, 9, 1, 5, 7, 7]


def test_freshness_audit_lag_zero_for_hwm_type(ray_session):
    from jesse_ray.pipelines.queries3 import q_events_freshness

    out = q_events_freshness("/root/testdata/sf0.001")
    # exactly the high-water-mark type(s) have zero lag; lags non-negative
    assert (out["lag_s"] >= 0).all()
    assert (out["lag_s"] == 0).sum() >= 1
    assert ((out["lag_s"] > 7 * 24 * 3600) == (out["stale"] == 1)).all()


def test_fertility_counts_are_consistent(ray_session):
    from jesse_ray.pipelines.queries3 import q_doc_token_fertility

    out = q_doc_token_fertility("/root/testdata/sf0.001")
    assert (out["n_subtok"] >= 0).all() and (out["n_words"] > 0).all()
    got = dict(zip(out["lang"], out["fertility"]))
    for v in got.values():
        assert 0.1 < v < 20.0


def test_unpivot_round_trips_wide_aggregate(ray_session):
    from jesse_ray.pipelines.queries3 import q_events_unpivot

    out = q_events_unpivot("/root/testdata/sf0.001")
    # every event_type has exactly the 3 metrics; pivoting back loses nothing
    per = out.groupby("event_type")["metric"].apply(lambda s: sorted(s))
    for metrics in per:
        assert metrics == ["max_cents", "n_events", "sum_cents"]
    wide = out.pivot(index="event_type", columns="metric", values="value")
    assert (wide["n_events"] > 0).all()
    assert (wide["max_cents"] * wide["n_events"] >= wide["sum_cents"]).all()


def test_val_exemplars_bounded_and_ranked(ray_session):
    from jesse_ray.pipelines.queries3 import EXEMPLARS_K, q_seq_val_exemplars

    out = q_seq_val_exemplars("/root/testdata/sf0.001")
    assert set(out.columns) == {"error", "rnk", "doc_key"}
    per = out.groupby("error")
    for err, grp in per:
        assert list(grp["rnk"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= EXEMPLARS_K
        assert grp["doc_key"].is_monotonic_increasing
    # planted violation classes surface with concrete exemplars
    assert "not_in_enum" in set(out["error"])
    assert "missing_required_property" in set(out["error"])
    # null doc_id exemplars coalesce to '' (total order in both engines)
    mrp = out[out["error"] == "missing_required_property"]
    assert (mrp["doc_key"] == "").all()


def test_expectations_by_source_scoping(ray_session):
    from jesse_ray.pipelines.queries3 import q_seq_expectations_by_source

    out = q_seq_expectations_by_source("/root/testdata/sf0.001")
    # every source gets the full 3-expectation contract
    per = out.groupby("source")["expectation"].apply(sorted)
    for exps in per:
        assert exps == ["doc_id_null_count_is_0", "n_tok_mean_between_1_4096",
                        "row_count_at_least_1"]
    # the disallowed planted source appears too — scoping is by observed
    # group, and each group's verdict is independent
    assert (out[out["expectation"] == "row_count_at_least_1"]["passed"] == 1).all()


def test_ref_integrity_audit_edges_and_planted_orphan(ray_session, tmp_path):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jesse_ray.pipelines.queries3 import FK_EDGES, q_ref_integrity_audit

    out = q_ref_integrity_audit("/root/testdata/sf0.001")
    assert len(out) == len(FK_EDGES)
    assert (out["orphan_rows"] >= 0).all()
    assert ((out["orphan_rows"] == 0) == (out["ok"] == 1)).all()

    # plant an orphan: copy the sf dir, drop one nation row
    src = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    nat = pq.read_table(tmp_path / "nation.parquet")
    pq.write_table(nat.slice(1), tmp_path / "nation.parquet")
    dropped_key = nat["n_nationkey"][0].as_py()
    out2 = q_ref_integrity_audit(str(tmp_path))
    bad = out2[out2["edge"].str.contains("nationkey->nation")]
    # customers/suppliers of the dropped nation are now orphans
    assert (bad["ok"] == 0).any()
    cust = pq.read_table(f"{src}/customer.parquet")
    import pyarrow.compute as pc2
    expect = pc2.sum(pc2.equal(cust["c_nationkey"], dropped_key)).as_py()
    got = int(out2[out2["edge"] == "customer.c_nationkey->nation.n_nationkey"]
              ["orphan_rows"].iloc[0])
    assert got == expect


def test_budget_scan_core_matches_bruteforce_under_ties():
    from jesse_ray.pipelines.relational import (
        _budget_block_keep,
        _budget_block_summary,
        _budget_plan,
    )

    def brute(g, h, w, budget):
        out = np.zeros(len(g), dtype=bool)
        for i in range(len(g)):
            s = w[(g == g[i]) & (h <= h[i])].sum()
            out[i] = s <= budget
        return out

    rng = np.random.default_rng(42)
    for _ in range(120):
        n = int(rng.integers(1, 60))
        g = np.array(rng.choice(["a", "b", "c"], size=n), dtype=object)
        h = rng.integers(0, 6, size=n).astype(np.uint64)  # heavy tie pressure
        w = rng.integers(1, 5, size=n).astype(np.int64)
        order = np.lexsort((h, g))
        g, h, w = g[order], h[order], w[order]
        budget = int(rng.integers(1, int(w.sum()) + 2))
        k = int(rng.integers(1, 6))
        cuts = (np.sort(rng.choice(np.arange(1, n), size=min(k, n - 1),
                                   replace=False)) if n > 1 else np.array([], int))
        blocks = np.split(np.arange(n), cuts)
        sums = [_budget_block_summary(g[ix], h[ix], w[ix]) for ix in blocks if len(ix)]
        plan = _budget_plan(sums)
        keep = np.zeros(n, dtype=bool)
        for ix in blocks:
            if not len(ix):
                continue
            gg, hh, ww = g[ix], h[ix], w[ix]
            key = (gg[0], int(hh[0]), gg[-1], int(hh[-1]), len(gg))
            keep[ix] = _budget_block_keep(gg, hh, ww, plan[key], gg[0],
                                          int(hh[0]), gg[-1], int(hh[-1]), budget)
        assert np.array_equal(keep, brute(g, h, w, budget))


def test_token_budget_sample_caps_every_source(ray_session):
    from jesse_ray.pipelines.queries3 import TOKEN_BUDGET, q_seq_token_budget_sample

    out = q_seq_token_budget_sample("/root/testdata/sf0.001")
    # kept tokens never exceed the budget (RANGE ties can only stop early,
    # never overshoot, because the verdict uses the tie-inclusive total)
    assert (out["kept_tokens"] <= TOKEN_BUDGET).all()
    assert (out["kept_rows"] <= out["total_rows"]).all()
    # sources with more tokens than the budget are actually capped
    binding = out[out["total_tokens"] > TOKEN_BUDGET]
    assert len(binding) >= 1
    assert (binding["kept_rows"] < binding["total_rows"]).all()
    # and at least one row is kept everywhere (budget >> max single seq)
    assert (out["kept_rows"] >= 1).all()


def test_val_regression_dirty_vs_clean(ray_session):
    from jesse_ray.pipelines.queries3 import q_seq_val_regression

    out = q_seq_val_regression("/root/testdata/sf0.001")
    # the clean snapshot has zero violations, so every planted class is 'new'
    assert (out["baseline_cnt"] == 0).all()
    assert (out["status"] == "new").all()
    assert (out["delta"] == out["current_cnt"]).all()
    assert "not_in_enum" in set(out["error"])


def test_band_filter_trims_tails(ray_session):
    from jesse_ray.pipelines.queries3 import q_seq_band_filter

    out = q_seq_band_filter("/root/testdata/sf0.001")
    assert (out["kept"] <= out["n"]).all()
    assert (out["lo"] <= out["hi"]).all()
    # a p10..p90 band keeps at least ~80% and strictly fewer than all
    # rows for any source with spread
    frac = out["kept"] / out["n"]
    assert (frac >= 0.5).all()
    assert (out[out["n"] > 20]["kept"] < out[out["n"] > 20]["n"]).all()


def test_val_errors_by_source_attribution(ray_session):
    from jesse_ray.pipelines.queries3 import q_seq_val_errors_by_source

    out = q_seq_val_errors_by_source("/root/testdata/sf0.001")
    assert set(out.columns) == {"source", "error", "cnt"}
    assert (out["cnt"] > 0).all()
    # the planted disallowed source attributes its own enum violations
    bad = out[out["error"] == "not_in_enum"]
    assert set(bad["source"]) == {"crawl-x"}
    # unattributable (NULL doc_id) classes are excluded by contract
    assert "missing_required_property" not in set(out["error"])


def test_label_balance_audit(ray_session):
    from jesse_ray.pipelines.queries3 import q_emb_label_balance

    out = q_emb_label_balance("/root/testdata/sf0.001")
    assert abs(out["share"].sum() - 1.0) < 1e-4
    assert (out["majority_ratio"] <= 1.0).all()
    assert (out["majority_ratio"] == 1.0).sum() >= 1
    # integer cross-multiplication verdict matches the float share
    k = len(out)
    assert ((out["ok"] == 1) == (4 * k * out["n"] >= out["n"].sum())).all()
