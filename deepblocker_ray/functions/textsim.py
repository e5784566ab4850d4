"""String-similarity scalar functions for the pairwise scorer.

The reference has no string similarity (its scalar surface is join/fill/cast/
tokenize/cosine, SURVEY.md §2.8); Jaro-Winkler and Levenshtein on per-turn
text are required by BASELINE.json's north_star for the candidate-pair scorer.
Pure numpy/python, no external deps.
"""

from __future__ import annotations

import numpy as np


def levenshtein(s1: str, s2: str, cap: int | None = None) -> int:
    """Edit distance; O(len1·len2) with a numpy row DP. ``cap`` truncates both
    inputs first (the scorer caps turn text to bound the quadratic cost)."""
    if cap is not None:
        s1, s2 = s1[:cap], s2[:cap]
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) < len(s2):  # iterate over the longer string, keep row short
        s1, s2 = s2, s1
    b = np.frombuffer(s2.encode("utf-32-le"), np.uint32)
    rng = np.arange(len(b) + 1, dtype=np.int64)
    prev = rng.copy()
    cur = np.empty_like(prev)
    for i, ch in enumerate(s1):
        cur[0] = i + 1
        cost = np.where(b == ord(ch), 0, 1)
        np.minimum(prev[:-1] + cost, prev[1:] + 1, out=cur[1:])
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1) is a prefix-min
        # scan of (cur - j): min over j' ≤ j of cur[j'] + (j - j')
        cur -= rng
        np.minimum.accumulate(cur, out=cur)
        cur += rng
        prev, cur = cur, prev
    return int(prev[-1])


def levenshtein_ratio(s1: str, s2: str, cap: int | None = None) -> float:
    """1 − dist/max_len, in [0,1]; 1.0 for two empty strings."""
    if cap is not None:
        s1, s2 = s1[:cap], s2[:cap]
    m = max(len(s1), len(s2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(s1, s2) / m


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    a = np.frombuffer(s1.encode("utf-32-le"), np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), np.uint32)
    b_taken = np.zeros(len2, bool)
    m1 = []
    m2_idx = []
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and b[j] == a[i]:
                b_taken[j] = True
                m1.append(a[i])
                m2_idx.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    m2 = b[np.sort(np.asarray(m2_idx))]
    transpositions = int(np.count_nonzero(np.asarray(m1, np.uint32) != m2)) // 2
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def cosine(u: np.ndarray, v: np.ndarray) -> float:
    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    if nu == 0.0 or nv == 0.0:
        return 0.0
    return float(np.dot(u, v) / (nu * nv))
