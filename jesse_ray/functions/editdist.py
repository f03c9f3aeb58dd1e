"""Vectorized Levenshtein over PAIR ARRAYS (no per-pair Python loop).

The Wagner-Fischer DP runs once with the pair axis vectorized: for P
candidate pairs of strings up to L chars, cost is O(L^2) numpy ops over
length-P vectors — the right shape for dedup verify stages where
blocking already bounded P and L is a short normalized key.

Reference semantics: classic unit-cost edit distance, identical to
DuckDB's `levenshtein()` (used by the SQL oracle twins).
"""

from __future__ import annotations

import numpy as np


def _pad_codes(strs: list[str], width: int) -> tuple[np.ndarray, np.ndarray]:
    """(P, width) uint32 codepoint matrix + (P,) true lengths.
    Codepoints (not utf8 bytes) so multi-byte chars count as one edit,
    matching DuckDB's codepoint-level levenshtein."""
    n = len(strs)
    out = np.zeros((n, width), dtype=np.uint32)
    lens = np.zeros(n, dtype=np.int64)
    for i, s in enumerate(strs):
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[:width]
        out[i, : len(cp)] = cp
        lens[i] = len(cp)
    return out, lens


def levenshtein_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Exact edit distance for each (a[i], b[i]) pair, vectorized over
    the pair axis.  Returns int64 of len(a)."""
    if len(a) != len(b):
        raise ValueError("pair arrays must align")
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la_max = max((len(s) for s in a), default=0)
    lb_max = max((len(s) for s in b), default=0)
    A, alen = _pad_codes(a, max(la_max, 1))
    B, blen = _pad_codes(b, max(lb_max, 1))
    La, Lb = A.shape[1], B.shape[1]
    rows = np.arange(P)
    # dp[p, j] = distance(a[p][:i], b[p][:j]) for the current i
    dp = np.tile(np.arange(Lb + 1, dtype=np.int64), (P, 1))
    ans = blen.copy()  # rows with alen == 0
    for i in range(1, La + 1):
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = i
        ai = A[:, i - 1][:, None]  # (P, 1)
        sub = prev[:, :-1] + (ai != B).astype(np.int64)  # (P, Lb)
        ins = prev[:, 1:] + 1
        np.minimum(sub, ins, out=sub)
        # deletion needs the running dp row: sequential over j, vector over P
        for j in range(1, Lb + 1):
            dp[:, j] = np.minimum(sub[:, j - 1], dp[:, j - 1] + 1)
        done = alen == i
        if done.any():
            ans[done] = dp[done, blen[done]]
    return ans
