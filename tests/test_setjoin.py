"""set_similarity_join: prefix-filter exactness vs brute force, threshold
semantics (integer cross-multiplication, rational taus), empty/null text,
identical-corpus hot-key path, join-fallback parity."""

import itertools

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig
from deepblocker_ray.functions.tokenizer import tokenize
from deepblocker_ray.stages.setjoin import set_similarity_join

CFG = EngineConfig(num_buckets=8)


def _brute(texts: dict[str, str | None], tau_num: int, tau_den: int):
    sets = {
        k: set(tokenize(v)) for k, v in texts.items() if v is not None
    }
    rows = []
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        i, u = len(A & B), len(A | B)
        if u > 0 and i * tau_den >= tau_num * u:
            rows.append((a, b, i, u))
    return sorted(rows)


def _run(texts, tau_num, tau_den, cfg=CFG, **kw):
    import ray.data as rd

    df = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    out = set_similarity_join(
        rd.from_pandas(df), cfg, tau_num=tau_num, tau_den=tau_den, **kw
    ).to_pandas()
    if len(out) == 0:
        return []
    return sorted(
        zip(
            out["left_id"],
            out["right_id"],
            out["n_inter"].astype(int),
            out["n_union"].astype(int),
        )
    )


class TestSetSimilarityJoin:
    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(40)]
        texts = {}
        base = list(rng.choice(vocab, 12, replace=False))
        for i in range(60):
            if i % 3 == 0:  # near-dup family around `base`
                words = base.copy()
                if i % 6 == 0:
                    words[rng.integers(len(words))] = str(
                        rng.choice(vocab)
                    )
            else:
                words = list(rng.choice(vocab, rng.integers(3, 15)))
            texts[f"d{i:03d}"] = " ".join(words)
        for tau in [(1, 2), (3, 5), (4, 5), (1, 1)]:
            assert _run(texts, *tau) == _brute(texts, *tau), tau

    def test_tau_one_is_exact_set_equality(self, ray_session):
        texts = {
            "a": "x y z",
            "b": "z y x x",  # same SET, different multiset/order
            "c": "x y",
            "d": "x y z w",
        }
        got = _run(texts, 1, 1)
        assert got == [("a", "b", 3, 3)]

    def test_null_and_empty_text_join_nothing(self, ray_session):
        texts = {"a": "x y z", "b": None, "c": "", "d": "x y z"}
        got = _run(texts, 1, 2)
        assert got == [("a", "d", 3, 3)]

    def test_single_doc_no_pairs(self, ray_session):
        assert _run({"only": "a b c"}, 1, 2) == []

    def test_identical_corpus_hot_prefix_salted_exact(self, ray_session):
        """Every doc identical → one prefix key holds ALL docs; the salting
        path must still emit exactly C(n,2) pairs."""
        n = 40
        texts = {f"d{i:03d}": "p q r s" for i in range(n)}
        stats = {}
        got = _run(texts, 1, 2, max_bucket=8, stats_out=stats)
        assert len(got) == n * (n - 1) // 2
        assert all(i == 4 and u == 4 for _, _, i, u in got)
        assert stats["n_hot_keys"] >= 1
        assert stats["n_subsampled_keys"] == 0

    def test_join_fallback_matches_broadcast(self, ray_session):
        texts = {
            f"d{i}": " ".join(f"t{j}" for j in range(i, i + 6))
            for i in range(30)
        }
        small = EngineConfig(num_buckets=8, broadcast_rows_max=3)
        assert _run(texts, 1, 3, cfg=small) == _run(texts, 1, 3)

    def test_bad_threshold_raises(self, ray_session):
        with pytest.raises(ValueError):
            _run({"a": "x"}, 0, 5)
        with pytest.raises(ValueError):
            _run({"a": "x"}, 6, 5)

    def test_prefix_lengths_rule(self):
        """ceil(t*n) via integers: prefix = n - ceil(t*n) + 1."""
        for n, tau_num, tau_den, want in [
            (10, 9, 10, 2),   # ceil(9)=9 → 2
            (10, 1, 2, 6),    # ceil(5)=5 → 6
            (1, 1, 1, 1),
            (7, 2, 3, 3),     # ceil(14/3)=5 → 3
        ]:
            need = (tau_num * n + tau_den - 1) // tau_den
            assert n - need + 1 == want
