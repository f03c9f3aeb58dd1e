"""Wave-40 unit tests: Hodges-Lehmann via convolution equals brute force."""

import numpy as np


def test_hl_convolution_matches_brute_force():
    rng = np.random.default_rng(0)
    x = rng.integers(1, 30, 200)
    # brute force: median of Walsh sums, i <= j, lower median rank
    sums = np.sort(np.array([x[i] + x[j] for i in range(len(x))
                             for j in range(i, len(x))]))
    T = len(sums)
    k = (T + 1) // 2
    want = int(sums[k - 1])
    # convolution form
    vals, cnt = np.unique(x, return_counts=True)
    lo, hi = int(vals.min()), int(vals.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[vals - lo] = cnt
    conv = np.convolve(dense, dense)
    diag = np.zeros(len(conv), dtype=np.int64)
    diag[2 * (vals - lo)] = cnt
    unordered = (conv + diag) // 2
    cum = np.cumsum(unordered)
    got = int(np.searchsorted(cum, k, side="left")) + 2 * lo
    assert got == want


def test_hl_robust_to_outliers():
    x = np.array([10] * 99 + [10_000])
    vals, cnt = np.unique(x, return_counts=True)
    lo, hi = int(vals.min()), int(vals.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[vals - lo] = cnt
    conv = np.convolve(dense, dense)
    diag = np.zeros(len(conv), dtype=np.int64)
    diag[2 * (vals - lo)] = cnt
    unordered = (conv + diag) // 2
    T = len(x) * (len(x) + 1) // 2
    cum = np.cumsum(unordered)
    hl = (int(np.searchsorted(cum, (T + 1) // 2, side="left")) + 2 * lo) / 2
    assert hl == 10.0  # the outlier cannot drag the pseudomedian
