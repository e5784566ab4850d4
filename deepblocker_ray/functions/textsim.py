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
    free = np.ones(len2, bool)
    m1 = []
    m2_idx = []
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        cand = np.nonzero((b[lo:hi] == a[i]) & free[lo:hi])[0]
        if cand.size:
            j = lo + int(cand[0])
            free[j] = False
            m1.append(a[i])
            m2_idx.append(j)
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


def jaro_winkler_batch(
    pairs_a: list[str], pairs_b: list[str], prefix_weight: float = 0.1
) -> np.ndarray:
    """Vectorized Jaro-Winkler for many pairs: the greedy window matching
    runs across all pairs simultaneously (numpy ops on (n, max_len)
    matrices); only the O(m) transposition count stays per-pair."""
    n = len(pairs_a)
    if n == 0:
        return np.zeros(0, np.float64)
    len_a = np.asarray([len(s) for s in pairs_a], np.int64)
    len_b = np.asarray([len(s) for s in pairs_b], np.int64)
    out = np.zeros(n, np.float64)
    equal = np.asarray([a == b for a, b in zip(pairs_a, pairs_b)], bool)
    out[equal] = 1.0
    todo = ~equal & (len_a > 0) & (len_b > 0)
    # size-partition by the B side only (the A side never needs a bitmask —
    # matched_a stays a boolean column write): ≤64 chars → one-word masks,
    # ≤128 → two-word, longer → matrix fallback. Partitioned per pair so one
    # long outlier can't drag the whole batch onto the slow path.
    for group in (
        todo & (len_b <= 64),
        todo & (len_b > 64) & (len_b <= 128),
        todo & (len_b > 128),
    ):
        if group.any():
            _jw_group(pairs_a, pairs_b, group, len_a, len_b, out, prefix_weight)
    return out


def _jw_group(pairs_a, pairs_b, group, len_a, len_b, out, prefix_weight):
    tidx = np.nonzero(group)[0]
    # descending iteration-length sort → the active row set is a shrinking
    # prefix (same bandwidth trick as levenshtein_ratio_batch)
    order = np.argsort(-len_a[tidx], kind="stable")
    idx = tidx[order]
    la = len_a[idx]
    lb = len_b[idx]
    max_a = int(la[0])
    max_b = int(lb.max())
    A = np.full((len(idx), max_a), np.uint32(0xFFFFFFFE))
    B = np.full((len(idx), max_b), np.uint32(0xFFFFFFFF))
    for r, p in enumerate(idx):
        A[r, : la[r]] = np.frombuffer(pairs_a[p].encode("utf-32-le"), np.uint32)
        B[r, : lb[r]] = np.frombuffer(pairs_b[p].encode("utf-32-le"), np.uint32)
    # pure-Latin-1 batches run the match loop on uint8 (sentinels 254/255
    # stay distinct from every real char and from each other)
    if np.all((A < 254) | (A == 0xFFFFFFFE)) and np.all(
        (B < 254) | (B == 0xFFFFFFFF)
    ):
        A = np.where(A == 0xFFFFFFFE, 254, A).astype(np.uint8)
        B = np.where(B == 0xFFFFFFFF, 255, B).astype(np.uint8)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    active = np.searchsorted(-la, -np.arange(1, max_a + 1), side="right")
    if A.dtype == np.uint8 and max_b <= 128:
        # bit-parallel greedy matching: free set, search window and equal
        # positions are uint64 masks per pair (1 or 2 words), so each step
        # is O(n) vector ops instead of O(n × max_b) boolean matrices
        W = 1 if max_b <= 64 else 2
        matched_a, mb_words = _jaro_match_bits(A, B, la, lb, window, active, W)
        shifts = np.arange(64, dtype=np.uint64)
        bb = np.concatenate(
            [
                ((mb_words[w][:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                    bool
                )
                for w in range(W)
            ],
            axis=1,
        )[:, :max_b]
        matched_b = bb
    else:
        free = np.ones_like(B, bool)
        matched_a = np.zeros((len(idx), max_a), bool)
        matched_b = np.zeros_like(free)
        cols = np.arange(max_b)
        for i in range(max_a):
            m = int(active[i])
            if m == 0:
                break
            lo = np.maximum(i - window[:m], 0)
            hi = np.minimum(i + window[:m] + 1, lb[:m])
            win = (cols >= lo[:, None]) & (cols < hi[:, None])
            eq = (B[:m] == A[:m, i : i + 1]) & free[:m] & win
            has = eq.any(axis=1)
            j = eq.argmax(axis=1)
            rows = np.nonzero(has)[0]
            free[rows, j[rows]] = False
            matched_a[rows, i] = True
            matched_b[rows, j[rows]] = True
    m = matched_a.sum(axis=1)
    jaro_v = np.zeros(len(idx))
    nz = np.nonzero(m > 0)[0]
    # transpositions, vectorized across rows: np.nonzero is row-major with
    # ascending columns, so the t-th matched char per row lines up between
    # the a-order and b-order flattenings; per-row mismatch count via bincount
    rows_a, cols_a = np.nonzero(matched_a)
    rows_b, cols_b = np.nonzero(matched_b)
    mismatch = A[rows_a, cols_a] != B[rows_b, cols_b]
    trans = np.bincount(rows_a, weights=mismatch, minlength=len(idx)).astype(
        np.int64
    ) // 2
    jaro_v[nz] = (
        m[nz] / la[nz] + m[nz] / lb[nz] + (m[nz] - trans[nz]) / m[nz]
    ) / 3.0
    # Winkler prefix boost (common prefix ≤ 4) where jaro > 0.7
    pref_len = np.minimum(np.minimum(la, lb), 4)
    maxp = min(4, max_a, max_b)
    prefix = np.zeros(len(idx), np.int64)
    if maxp > 0:
        eqp = A[:, :maxp] == B[:, :maxp]
        still = np.ones(len(idx), bool)
        for i in range(maxp):
            still &= eqp[:, i] & (i < pref_len)
            prefix += still
    boost = jaro_v > 0.7
    jaro_v[boost] += prefix[boost] * prefix_weight * (1.0 - jaro_v[boost])
    out[idx] = jaro_v


_ONES64 = np.uint64(0xFFFFFFFFFFFFFFFF)
# _BELOW[k] = mask of bits [0, k); table gather beats per-row shift math in
# the hot loops (no astype/where churn)
_BELOW = np.zeros(65, np.uint64)
_BELOW[1:] = _ONES64 >> (np.uint64(64) - np.arange(1, 65, dtype=np.uint64))


def _below_mask(k: np.ndarray) -> np.ndarray:
    """Per-row mask of bits [0, k) for k in 0..64 (uint64)."""
    one = np.uint64(1)
    return np.where(
        k > 0, _ONES64 >> (np.uint64(64) - np.maximum(k, one)), np.uint64(0)
    )


def _build_peq(B, lens, W: int):
    """Per-pair pattern-equality bitmask table over a COMPACT alphabet: one
    (nt, k+1, W) uint64 table where k is the number of distinct byte codes
    observed in B's valid positions (+1 all-zero sentinel column for absent
    chars) and W is the number of 64-bit words per pattern. Returns
    (Peq, lut) with lut mapping byte code → column (absent → k). Shared by
    the Jaro matcher and both Myers variants — DRAM traffic, not FLOPs,
    bounds these kernels, so the table must stay small."""
    nt = B.shape[0]
    one = np.uint64(1)
    total = int(lens.sum())
    if not total:
        return np.zeros((nt, 1, W), np.uint64), np.full(256, 0, np.int64)
    r_idx = np.repeat(np.arange(nt), lens)
    c_pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    codes = B[r_idx, c_pos]
    used = np.unique(codes)
    k = len(used)
    lut = np.full(256, k, np.int64)
    lut[used] = np.arange(k)
    Peq = np.zeros((nt, k + 1, W), np.uint64)
    np.bitwise_or.at(
        Peq,
        (r_idx, lut[codes], c_pos >> 6),
        one << (c_pos & 63).astype(np.uint64),
    )
    return Peq, lut


def _jaro_match_bits(A, B, la, lb, window, active, W: int):
    """Greedy Jaro matching with W uint64 mask words per pair (B side ≤ 64·W
    chars; the A side only drives the loop length). Returns
    (matched_a bool matrix, [matched_b word arrays]). Same greedy order as
    the matrix fallback: a-positions ascending, first free in-window equal
    b-position wins (lowest set bit, word 0 first)."""
    nt, max_a = A.shape
    one = np.uint64(1)
    Peq, lut = _build_peq(B, lb, W)
    free = [
        _below_mask(np.clip(lb - 64 * w, 0, 64).astype(np.uint64))
        for w in range(W)
    ]
    matched_a = np.zeros((nt, max_a), bool)
    matched_b = [np.zeros(nt, np.uint64) for _ in range(W)]
    rows_all = np.arange(nt)
    with np.errstate(over="ignore"):
        for i in range(max_a):
            m = int(active[i])
            if m == 0:
                break
            wn = window[:m]
            lo = np.maximum(i - wn, 0)
            hi = np.minimum(i + wn + 1, lb[:m])
            taken = np.zeros(m, bool)
            for w in range(W):
                wlo = np.clip(lo - 64 * w, 0, 64)
                whi = np.clip(hi - 64 * w, 0, 64)
                win = _BELOW[whi] & ~_BELOW[wlo]
                cand = Peq[rows_all[:m], lut[A[:m, i]], w] & free[w][:m] & win
                cand = np.where(taken, np.uint64(0), cand)
                v = cand & (~cand + one)  # lowest set bit (0 = no candidate)
                free[w][:m] &= ~v
                matched_b[w][:m] |= v
                hit = cand != 0
                taken |= hit
            matched_a[:m, i] = taken
    return matched_a, matched_b


def levenshtein_ratio_batch(
    pairs_a: list[str], pairs_b: list[str], cap: int | None = None
) -> np.ndarray:
    """Vectorized edit-distance ratios for many string pairs at once: one DP
    whose row updates run across ALL pairs simultaneously (numpy ops on
    (n_pairs, max_len) matrices). This is what makes the pairwise scorer's
    hot path batch-vectorized instead of a per-pair Python DP.

    Bandwidth engineering (this kernel is memory-traffic-bound):
      - per pair, the LONGER string is the iteration axis and the shorter is
        the DP-row axis, so the row arrays are as narrow as possible;
      - pairs are processed in descending iteration-length order, so the
        active row set is a prefix that shrinks as the DP proceeds — total
        work is Σ len_long·width, not max·n·width;
      - int16 DP cells (distances ≤ cap ≪ 32767; the prefix-min scan needs a
        signed type) and uint8 character codes when the batch is pure
        Latin-1, uint32 otherwise.
    """
    n = len(pairs_a)
    if n == 0:
        return np.zeros(0, np.float64)
    if cap is not None:
        pairs_a = [s[:cap] for s in pairs_a]
        pairs_b = [s[:cap] for s in pairs_b]
    la0 = np.asarray([len(s) for s in pairs_a], np.int64)
    lb0 = np.asarray([len(s) for s in pairs_b], np.int64)
    max_len = np.maximum(la0, lb0)
    out = np.zeros(n, np.int64)
    # equal-string shortcut (C-speed memcmp): near-dup workloads share many
    # turn texts verbatim — those pairs skip the kernels entirely
    equal = np.fromiter(
        (x == y for x, y in zip(pairs_a, pairs_b)), bool, n
    )
    todo = ~equal & (la0 > 0) & (lb0 > 0)
    out[~todo] = max_len[~todo] * ~equal[~todo]  # one side empty → |other|
    # size-partition: pairs whose SHORT side fits one 64-bit word take the
    # 1-word bit-parallel Myers path, ≤128 the 2-word variant, the rest the
    # DP. Partitioned per pair, not per batch — one long outlier must not
    # force the whole batch onto the slow path (turn texts are ~60 chars
    # with a 128-char cap, so mixed batches are the norm).
    min_len = np.minimum(la0, lb0)
    for group in (
        todo & (min_len <= 64),
        todo & (min_len > 64) & (min_len <= 128),
        todo & (min_len > 128),
    ):
        if not group.any():
            continue
        tidx = np.nonzero(group)[0]
        # per-pair swap: long side → iteration axis (symmetric distance)
        swap = lb0[tidx] > la0[tidx]
        longs = [
            pairs_b[i] if sw else pairs_a[i] for i, sw in zip(tidx, swap)
        ]
        shorts = [
            pairs_a[i] if sw else pairs_b[i] for i, sw in zip(tidx, swap)
        ]
        len_l = np.where(swap, lb0[tidx], la0[tidx])
        len_s = np.where(swap, la0[tidx], lb0[tidx])

        order = np.argsort(-len_l, kind="stable")
        longs = [longs[i] for i in order]
        shorts = [shorts[i] for i in order]
        len_l = len_l[order]
        len_s = len_s[order]
        nt = len(tidx)
        max_l = int(len_l[0])
        max_s = int(len_s.max())

        # character matrices; padding needs no sentinel — cell (r, j ≤
        # len_s[r]) never depends on columns right of j, and we only read
        # cur[r, len_s[r]]
        A = np.zeros((nt, max_l), np.uint32)
        B = np.zeros((nt, max_s), np.uint32)
        for i, s in enumerate(longs):
            if s:
                A[i, : len(s)] = np.frombuffer(
                    s.encode("utf-32-le"), np.uint32
                )
        for i, s in enumerate(shorts):
            if s:
                B[i, : len(s)] = np.frombuffer(
                    s.encode("utf-32-le"), np.uint32
                )
        if int(A.max(initial=0)) < 256 and int(B.max(initial=0)) < 256:
            A = A.astype(np.uint8)
            B = B.astype(np.uint8)

        # active-prefix size per iteration i: #rows with len_l ≥ i+1
        # (len_l sorted desc ⇒ -len_l asc; count via 'right')
        active = np.searchsorted(-len_l, -np.arange(1, max_l + 1), side="right")
        if A.dtype == np.uint8 and max_s <= 64:
            # bit-parallel Myers (Hyyrö): the ≤64-char short side is the
            # bit-vector pattern, one uint64 per pair, ~5× the DP's speed
            out_sorted = _myers_batch_u8(A, B, len_l, len_s, active)
        elif A.dtype == np.uint8 and max_s <= 128:
            out_sorted = _myers_batch_u8_w2(A, B, len_l, len_s, active)
        else:
            out_sorted = _dp_batch(A, B, len_l, len_s, active, max_l, max_s)
        out[tidx[order]] = out_sorted
    ratio = np.ones(n, np.float64)
    nz = max_len > 0
    ratio[nz] = 1.0 - out[nz] / max_len[nz]
    return ratio


def _dp_batch(A, B, len_l, len_s, active, max_l, max_s) -> np.ndarray:
    """Row-DP edit distance across pairs (general fallback: any alphabet,
    any length). int16 cells, int32 beyond their range."""
    nt = A.shape[0]
    cell_dt = np.int16 if max_l < 32000 else np.int32
    one = cell_dt(1)
    rng = np.arange(max_s + 1, dtype=cell_dt)
    prev = np.broadcast_to(rng, (nt, max_s + 1)).copy()
    cur = np.empty_like(prev)
    out_sorted = np.zeros(nt, np.int64)
    for i in range(max_l):
        m = int(active[i])
        if m == 0:
            break
        cost = B[:m] != A[:m, i : i + 1]
        cur[:m, 0] = i + 1
        np.minimum(
            prev[:m, 1:] + one,
            prev[:m, :-1] + cost,
            out=cur[:m, 1:],
        )
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1) is a prefix-min
        # scan of (cur - j): min over j' ≤ j of cur[j'] + (j - j')
        cur[:m] -= rng
        np.minimum.accumulate(cur[:m], axis=1, out=cur[:m])
        cur[:m] += rng
        m_next = int(active[i + 1]) if i + 1 < max_l else 0
        if m_next < m:  # rows [m_next, m) have len_l == i+1 → finished
            rows = np.arange(m_next, m)
            out_sorted[rows] = cur[rows, len_s[rows]]
        prev, cur = cur, prev
    return out_sorted


def _myers_batch_u8(A, B, len_l, len_s, active) -> np.ndarray:
    """Bit-parallel Myers/Hyyrö edit distance, vectorized ACROSS pairs: each
    pair's ≤64-char short side becomes one uint64 pattern word; the long side
    is consumed column-by-column with ~12 uint64 vector ops per step over the
    shrinking active prefix. Carries in the add only propagate upward, so
    bits above len_s[r]−1 never contaminate the score bit — no per-row
    masking needed (standard unmasked formulation).

    Rows with an empty short side come out correct automatically: Pv=0 makes
    every step a +1 horizontal delta, accumulating len_l."""
    nt, max_l = A.shape
    ones64 = np.uint64(0xFFFFFFFFFFFFFFFF)
    one = np.uint64(1)
    ls = len_s.astype(np.uint64)
    Peq3, lut = _build_peq(B, len_s, 1)
    Peq = Peq3[:, :, 0]
    nzs = ls > 0
    Pv = np.zeros(nt, np.uint64)
    Pv[nzs] = ones64 >> (np.uint64(64) - ls[nzs])
    Mv = np.zeros(nt, np.uint64)
    score = len_s.astype(np.int64).copy()
    hb = np.maximum(ls.astype(np.int64) - 1, 0).astype(np.uint64)
    rows_all = np.arange(nt)
    with np.errstate(over="ignore"):
        for i in range(max_l):
            m = int(active[i])
            if m == 0:
                break
            Eq = Peq[rows_all[:m], lut[A[:m, i]]]
            Pv_ = Pv[:m]
            Mv_ = Mv[:m]
            Xv = Eq | Mv_
            Xh = (((Eq & Pv_) + Pv_) ^ Pv_) | Eq
            Ph = Mv_ | ~(Xh | Pv_)
            Mh = Pv_ & Xh
            score[:m] += ((Ph >> hb[:m]) & one).astype(np.int64)
            score[:m] -= ((Mh >> hb[:m]) & one).astype(np.int64)
            Ph = (Ph << one) | one
            Mh = Mh << one
            Pv[:m] = Mh | ~(Xv | Ph)
            Mv[:m] = Ph & Xv
    return score


def _myers_batch_u8_w2(A, B, len_l, len_s, active) -> np.ndarray:
    """Two-word (≤128-char short side) block Myers: same recurrence as
    _myers_batch_u8 with a 128-bit virtual word — the add carries from word
    0 to word 1 (unsigned-wrap detection) and the left shifts carry the MSB
    across the word boundary. Covers the scorer's full score_text_cap=128
    range, so capped turn texts never fall back to the O(len²) DP."""
    nt, max_l = A.shape
    one = np.uint64(1)
    s63 = np.uint64(63)
    Peq, lut = _build_peq(B, len_s, 2)
    lo_bits = np.clip(len_s, 0, 64).astype(np.uint64)
    hi_bits = np.clip(len_s - 64, 0, 64).astype(np.uint64)
    Pv0 = _below_mask(lo_bits)
    Pv1 = _below_mask(hi_bits)
    Mv0 = np.zeros(nt, np.uint64)
    Mv1 = np.zeros(nt, np.uint64)
    score = len_s.astype(np.int64).copy()
    top = np.maximum(len_s - 1, 0)
    hw1 = top >= 64  # score bit lives in word 1
    hb = (top % 64).astype(np.uint64)
    rows_all = np.arange(nt)
    with np.errstate(over="ignore"):
        for i in range(max_l):
            m = int(active[i])
            if m == 0:
                break
            ch = A[:m, i]
            cc = lut[ch]
            Eq0 = Peq[rows_all[:m], cc, 0]
            Eq1 = Peq[rows_all[:m], cc, 1]
            Pv0_, Pv1_ = Pv0[:m], Pv1[:m]
            Mv0_, Mv1_ = Mv0[:m], Mv1[:m]
            Xv0 = Eq0 | Mv0_
            Xv1 = Eq1 | Mv1_
            a0 = Eq0 & Pv0_
            s0 = a0 + Pv0_
            carry = (s0 < a0).astype(np.uint64)
            s1 = (Eq1 & Pv1_) + Pv1_ + carry
            Xh0 = (s0 ^ Pv0_) | Eq0
            Xh1 = (s1 ^ Pv1_) | Eq1
            Ph0 = Mv0_ | ~(Xh0 | Pv0_)
            Ph1 = Mv1_ | ~(Xh1 | Pv1_)
            Mh0 = Pv0_ & Xh0
            Mh1 = Pv1_ & Xh1
            Ph_h = np.where(hw1[:m], Ph1, Ph0)
            Mh_h = np.where(hw1[:m], Mh1, Mh0)
            score[:m] += ((Ph_h >> hb[:m]) & one).astype(np.int64)
            score[:m] -= ((Mh_h >> hb[:m]) & one).astype(np.int64)
            Ph1 = (Ph1 << one) | (Ph0 >> s63)
            Ph0 = (Ph0 << one) | one
            Mh1 = (Mh1 << one) | (Mh0 >> s63)
            Mh0 = Mh0 << one
            Pv0[:m] = Mh0 | ~(Xv0 | Ph0)
            Pv1[:m] = Mh1 | ~(Xv1 | Ph1)
            Mv0[:m] = Ph0 & Xv0
            Mv1[:m] = Ph1 & Xv1
    return score


def levenshtein_batch(
    pairs_a: list[str], pairs_b: list[str], cap: int | None = None
) -> np.ndarray:
    """Raw edit distances for many pairs (same vectorized DP as
    levenshtein_ratio_batch, inverted from the ratio exactly)."""
    if len(pairs_a) == 0:
        return np.zeros(0, np.int64)
    if cap is not None:
        pairs_a = [s[:cap] for s in pairs_a]
        pairs_b = [s[:cap] for s in pairs_b]
    max_len = np.maximum(
        np.asarray([len(s) for s in pairs_a], np.int64),
        np.asarray([len(s) for s in pairs_b], np.int64),
    )
    ratio = levenshtein_ratio_batch(pairs_a, pairs_b)
    return np.rint((1.0 - ratio) * max_len).astype(np.int64)


def cosine(u: np.ndarray, v: np.ndarray) -> float:
    nu, nv = np.linalg.norm(u), np.linalg.norm(v)
    if nu == 0.0 or nv == 0.0:
        return 0.0
    return float(np.dot(u, v) / (nu * nv))
