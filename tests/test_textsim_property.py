"""Property tests (hypothesis) for the string-similarity kernels.

The batch kernels dispatch per pair among bit-parallel 1-word / 2-word and
matrix/DP fallback paths by size and alphabet (textsim.py:300-558); the
seeded parity suite (test_functions.TestKernelPathParity) covers each path,
and these property tests let hypothesis hunt the boundaries adversarially —
against an INDEPENDENT textbook DP oracle, not the repo's own scalar.

Pure numpy — no Ray session needed.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepblocker_ray.functions.textsim import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    levenshtein_batch,
    levenshtein_ratio_batch,
)

# mixed alphabet: Latin-1 run (uint8 code path), a word-boundary-hostile
# repeat char, and non-Latin-1 (uint32 / fallback path)
_CHARS = st.sampled_from(list("ab z-\xe9ÿ") + ["日", "中"])
_STR = st.text(alphabet=_CHARS, max_size=150)


def _dp_reference(a: str, b: str) -> int:
    """Textbook Wagner-Fischer, written independently of the library."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=8))
def test_levenshtein_batch_matches_textbook_dp(pairs):
    ca = [a for a, _ in pairs]
    cb = [b for _, b in pairs]
    got = levenshtein_batch(ca, cb)
    want = [_dp_reference(a, b) for a, b in pairs]
    assert got.tolist() == want


@settings(max_examples=150, deadline=None)
@given(_STR, _STR)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity of indiscernibles
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))  # bounds


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=8))
def test_ratio_batch_consistent_with_distance(pairs):
    ca = [a for a, _ in pairs]
    cb = [b for _, b in pairs]
    ratio = levenshtein_ratio_batch(ca, cb)
    for a, b, r in zip(ca, cb, ratio):
        m = max(len(a), len(b))
        want = 1.0 if m == 0 else 1.0 - _dp_reference(a, b) / m
        assert abs(r - want) < 1e-12


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=8))
def test_jaro_winkler_batch_matches_scalar(pairs):
    ca = [a for a, _ in pairs]
    cb = [b for _, b in pairs]
    got = jaro_winkler_batch(ca, cb)
    for a, b, v in zip(ca, cb, got):
        assert abs(jaro_winkler(a, b) - v) < 1e-12


@settings(max_examples=150, deadline=None)
@given(_STR, _STR)
def test_jaro_properties(a, b):
    v = jaro(a, b)
    assert 0.0 <= v <= 1.0
    assert v == jaro(b, a)  # jaro is symmetric
    if a == b and a:
        assert v == 1.0
    w = jaro_winkler(a, b)
    assert 0.0 <= w <= 1.0 + 1e-12
    assert w >= v - 1e-12  # prefix bonus never lowers the score
