"""ER assignment + match-weight estimation stages (stages/matching.py).

The reference stops at top-K candidate emission (main.py:30-36); these
cover the assignment tail: reciprocal best-match 1:1 filtering and the
Fellegi-Sunter agreement-pattern sufficient statistic.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from deepblocker_ray.config import EngineConfig
from deepblocker_ray.stages.matching import fs_patterns, one_to_one_match


def _cfg():
    return EngineConfig(num_buckets=8)


def _emb_ds(vectors):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vectors), dtype=np.int64),
                "embedding": [list(map(float, v)) for v in vectors],
            }
        )
    )


class TestOneToOne:
    def test_mutual_pairs_only(self, ray_session):
        # 0↔1 tight pair; 2's best is 3 but 3's best is 2? make 3's best 4:
        # 2→3, 3→4, 4→3  ⇒ mutual pairs: (0,1), (3,4) only
        vecs = [
            [1.0, 0.0, 0.0],
            [0.999, 0.01, 0.0],
            [0.0, 1.0, 0.1],
            [0.0, 0.9, 0.5],
            [0.0, 0.88, 0.52],
        ]
        out = one_to_one_match(_emb_ds(vecs), _cfg()).to_pandas()
        got = sorted(map(tuple, out[["left_id", "right_id"]].to_numpy()))
        assert got == [("0", "1"), ("3", "4")]

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(7)
        mat = rng.normal(size=(40, 8)).astype(np.float64)
        out = one_to_one_match(_emb_ds(mat), _cfg()).to_pandas()
        # brute-force oracle: normalized top-1 with (cos DESC, id-str ASC)
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = norm @ norm.T
        np.fill_diagonal(cos, -np.inf)
        ids = np.array([str(i) for i in range(len(mat))], dtype=object)
        best = {}
        for i in range(len(mat)):
            order = sorted(
                range(len(mat)),
                key=lambda j: (-cos[i, j], ids[j]),
            )
            best[ids[i]] = ids[order[0]]
        want = sorted(
            {
                (min(x, y), max(x, y))
                for x, y in best.items()
                if best[y] == x
            }
        )
        got = sorted(map(tuple, out[["left_id", "right_id"]].to_numpy()))
        assert got == want

    def test_string_id_tiebreak(self, ray_session):
        # identical vectors: everyone's top-1 is the smallest OTHER id in
        # STRING order; with ids 0,1,2: 0→1? no — "1" < "2", so 0→1, 1→0,
        # 2→0. Mutual: (0,1) only.
        vecs = [[1.0, 0.0]] * 3
        out = one_to_one_match(_emb_ds(vecs), _cfg()).to_pandas()
        got = sorted(map(tuple, out[["left_id", "right_id"]].to_numpy()))
        assert got == [("0", "1")]


class TestFSPatterns:
    def _orders(self, rows):
        return rd.from_pandas(
            pd.DataFrame(
                rows,
                columns=[
                    "o_custkey",
                    "o_orderkey",
                    "o_orderstatus",
                    "o_orderpriority",
                    "o_totalprice",
                ],
            )
        )

    def test_hand_computed(self, ray_session):
        rows = [
            # cust 1: three orders → 3 pairs
            (1, 10, "F", "HI", 100.0),   # pb = 0
            (1, 11, "F", "HI", 100.5),   # pb = 0
            (1, 12, "O", "LO", 99999.0), # pb = 9999900 // 5000000 = 1
            # cust 2: singleton → no pairs
            (2, 20, "F", "HI", 100.0),
        ]
        # pairs: (10,11): st agree, pri agree, pb agree → 7
        #        (10,12): st diff, pri diff, pb: 10000 vs 9999900 cents
        #                 → 0 vs 1 → disagree → 0
        #        (11,12): same → 0
        out = fs_patterns(self._orders(rows), _cfg()).to_pandas()
        got = dict(zip(out["pattern"], out["n_pairs"]))
        assert got == {0: 2, 7: 1}
        assert out["pattern"].dtype == np.int32
        assert out["n_pairs"].dtype == np.int64

    def test_pair_count_total(self, ray_session):
        rng = np.random.default_rng(3)
        n = 200
        rows = [
            (
                int(rng.integers(0, 20)),
                i,
                rng.choice(["F", "O", "P"]),
                rng.choice(["HI", "LO"]),
                float(rng.integers(1, 200000)),
            )
            for i in range(n)
        ]
        out = fs_patterns(self._orders(rows), _cfg()).to_pandas()
        df = pd.DataFrame(
            rows, columns=["k", "o", "s", "p", "t"]
        ).groupby("k").size()
        want_pairs = int((df * (df - 1) // 2).sum())
        assert int(out["n_pairs"].sum()) == want_pairs

    def test_empty(self, ray_session):
        out = fs_patterns(self._orders([]), _cfg()).to_pandas()
        assert len(out) == 0


class TestFSScore:
    def _orders(self, rows):
        return rd.from_pandas(
            pd.DataFrame(
                rows,
                columns=[
                    "o_custkey",
                    "o_orderkey",
                    "o_orderstatus",
                    "o_orderpriority",
                    "o_totalprice",
                ],
            )
        )

    def test_weights_and_threshold(self, ray_session):
        from deepblocker_ray.stages.matching import fs_score

        rows = [
            (1, 10, "F", "HI", 100.0),
            (1, 11, "F", "HI", 100.5),    # vs 10: 30+20+10 = 60 ✓
            (1, 12, "F", "LO", 100.0),    # vs 10: 30-8+10 = 32 ✓ (boundary)
            (1, 13, "O", "LO", 99999.0),  # vs 10: -5-8-12 = -25 ✗
        ]
        out = fs_score(self._orders(rows), _cfg()).to_pandas()
        got = {
            (l, r): s
            for l, r, s in out[
                ["left_okey", "right_okey", "score"]
            ].to_numpy()
        }
        assert got[(10, 11)] == 60
        assert got[(10, 12)] == 32
        assert (10, 13) not in got
        # (11,12): 30-8+10=32 ✓; (11,13): -25 ✗; (12,13): 30-8-12=10 ✗
        assert set(got) == {(10, 11), (10, 12), (11, 12)}

    def test_custom_threshold(self, ray_session):
        from deepblocker_ray.stages.matching import fs_score

        rows = [(1, 1, "F", "HI", 1.0), (1, 2, "O", "HI", 1.0)]
        # score = -5+20+10 = 25
        out = fs_score(
            self._orders(rows), _cfg(), threshold=25
        ).to_pandas()
        assert len(out) == 1 and out["score"].iloc[0] == 25
        out = fs_score(
            self._orders(rows), _cfg(), threshold=26
        ).to_pandas()
        assert len(out) == 0


class TestOneToOne2T:
    def test_mutual_across_tables(self, ray_session):
        from deepblocker_ray.stages.matching import one_to_one_match_2t

        # A = ids 0,1 ; B = ids 10, 11, 12
        # 0 ↔ 10 tight; 1 → 11 but 11's best in A is 0?  craft:
        a = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": np.array([0, 1], dtype=np.int64),
                    "embedding": [[1.0, 0.0], [0.0, 1.0]],
                }
            )
        )
        b = rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": np.array([10, 11, 12], dtype=np.int64),
                    "embedding": [
                        [0.99, 0.01],   # 10: closest to 0
                        [0.1, 0.9],     # 11: closest to 1
                        [0.98, 0.02],   # 12: also near 0 but 10 wins
                    ],
                }
            )
        )
        out = one_to_one_match_2t(a, b, _cfg()).to_pandas()
        got = sorted(map(tuple, out[["left_id", "right_id"]].to_numpy()))
        assert got == [("0", "10"), ("1", "11")]

    def test_brute_force_parity(self, ray_session):
        from deepblocker_ray.stages.matching import one_to_one_match_2t

        rng = np.random.default_rng(9)
        na, nb_ = 15, 20
        mat = rng.normal(size=(na + nb_, 6))
        ids = np.arange(na + nb_, dtype=np.int64)
        mk = lambda lo, hi: rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": ids[lo:hi],
                    "embedding": [list(v) for v in mat[lo:hi]],
                }
            )
        )
        out = one_to_one_match_2t(mk(0, na), mk(na, na + nb_), _cfg())
        got = sorted(
            map(tuple, out.to_pandas()[["left_id", "right_id"]].to_numpy())
        )
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = norm[:na] @ norm[na:].T
        sa = [str(i) for i in range(na)]
        sb = [str(na + j) for j in range(nb_)]
        best_ab = {
            sa[i]: min(range(nb_), key=lambda j: (-cos[i, j], sb[j]))
            for i in range(na)
        }
        best_ba = {
            sb[j]: min(range(na), key=lambda i: (-cos[i, j], sa[i]))
            for j in range(nb_)
        }
        want = sorted(
            (sa[best_ba[sb[j]]], sb[j])
            for j in range(nb_)
            if best_ab[sa[best_ba[sb[j]]]] == j
        )
        assert got == want


class TestCalibrationPairs:
    def test_dedup_across_rounds_and_bins(self, ray_session):
        from deepblocker_ray.stages.matching import calibration_pairs

        # n_buckets=1 → every sampled doc collides in BOTH rounds: the
        # histogram must count each pair once (identical-bin dedup)
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(40, dtype=np.int64),
                    "text": ["hello world"] * 40,
                }
            )
        )
        out = calibration_pairs(
            docs, _cfg(), doc_mod=1, rounds=2, n_buckets=1
        ).to_pandas()
        # identical texts → jw = 1.0 → clamped to the top bin (19)
        assert out["bin"].tolist() == [19]
        assert int(out["n_pairs"].iloc[0]) == 40 * 39 // 2

    def test_doc_sampling_reduces_pairs(self, ray_session):
        from deepblocker_ray.stages.matching import calibration_pairs

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(60, dtype=np.int64),
                    "text": ["abc"] * 60,
                }
            )
        )
        full = calibration_pairs(
            docs, _cfg(), doc_mod=1, rounds=1, n_buckets=1
        ).to_pandas()["n_pairs"].sum()
        sampled = calibration_pairs(
            docs, _cfg(), doc_mod=4, rounds=1, n_buckets=1
        ).to_pandas()["n_pairs"].sum()
        assert 0 < sampled < full


class TestBlockerAgreement:
    def test_bitmask_counts(self, ray_session):
        from deepblocker_ray.stages.matching import blocker_agreement

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(3, dtype=np.int64),
                    "text": ["alpha beta gamma delta"] * 3,
                }
            )
        )
        out = blocker_agreement(docs, _cfg()).to_pandas()
        # all 3 pairs found by BOTH passes → one row (sources=3, n=3)
        assert out.to_dict("records") == [{"sources": 3, "n_pairs": 3}]


class TestSuffixBlocking:
    def test_shared_suffix_pairs_and_purge(self, ray_session):
        from deepblocker_ray.stages.neighborhood import suffix_blocking

        df = pd.DataFrame(
            {
                "id": np.arange(6, dtype=np.int64),
                "key": [
                    "smith",    # 0: shares "ith">="ith" with 1
                    "smyith",   # 1: suffixes ith/yith/myith...
                    "jones",    # 2: singleton suffixes
                    "bones",    # 3: shares "ones"/"nes" with 2
                    "xx",       # 4: shorter than min_len -> no suffixes
                    "ith",      # 5: whole key = the shared suffix
                ],
            }
        )
        out = (
            suffix_blocking(
                rd.from_pandas(df),
                EngineConfig(num_buckets=4),
                id_col="id",
                key_col="key",
                min_len=3,
                max_block=50,
            )
            .to_pandas()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
        got = set(map(tuple, out[["left_id", "right_id"]].values))
        assert got == {("0", "1"), ("0", "5"), ("1", "5"), ("2", "3")}

    def test_purged_block_emits_nothing(self, ray_session):
        from deepblocker_ray.stages.neighborhood import suffix_blocking

        # all 5 keys share suffix "abc": block size 5 > max_block 4 purged
        df = pd.DataFrame(
            {
                "id": np.arange(5, dtype=np.int64),
                "key": [f"{c}abc" for c in "vwxyz"],
            }
        )
        out = suffix_blocking(
            rd.from_pandas(df),
            EngineConfig(num_buckets=4),
            id_col="id",
            key_col="key",
            min_len=3,
            max_block=4,
        ).to_pandas()
        assert len(out) == 0


class TestBlockCleaning:
    def test_purge_then_keep_smallest(self, ray_session):
        from deepblocker_ray.stages.neighborhood import block_cleaning

        # token "common" appears in 4 records -> purged at cap 3;
        # the rest: record 0 has 3 surviving blocks, keeps the 2 smallest
        df = pd.DataFrame(
            {
                "id": np.arange(4, dtype=np.int64),
                "key": [
                    "common alpha beta gamma",
                    "common alpha beta",
                    "common alpha",
                    "common",
                ],
            }
        )
        out = (
            block_cleaning(
                rd.from_pandas(df),
                EngineConfig(num_buckets=4),
                id_col="id",
                key_col="key",
                purge_cap=3,
                keep_per_record=2,
            )
            .to_pandas()
            .sort_values(["id", "bkey"])
            .reset_index(drop=True)
        )
        got = set(map(tuple, out[["id", "bkey", "block_size"]].values))
        # sizes: alpha=3, beta=2, gamma=1; common=4 purged
        # id0: smallest two = gamma(1), beta(2); id1: beta(2), alpha(3)
        # id2: alpha(3); id3: nothing left
        assert got == {
            (0, "gamma", 1),
            (0, "beta", 2),
            (1, "beta", 2),
            (1, "alpha", 3),
            (2, "alpha", 3),
        }

    def test_tie_by_key(self, ray_session):
        from deepblocker_ray.stages.neighborhood import block_cleaning

        # two blocks of equal size 1 -> tie broken by key asc
        df = pd.DataFrame(
            {"id": np.array([7], np.int64), "key": ["zeta eta"]}
        )
        out = block_cleaning(
            rd.from_pandas(df),
            EngineConfig(num_buckets=4),
            id_col="id",
            key_col="key",
            purge_cap=10,
            keep_per_record=1,
        ).to_pandas()
        assert list(out["bkey"]) == ["eta"]


class TestMongeElkan:
    def _brute(self, at, bt):
        from deepblocker_ray.functions.textsim import jaro_winkler
        from deepblocker_ray.functions.tokenizer import tokenize_many

        ta, tb = tokenize_many([at])[0], tokenize_many([bt])[0]
        s = 0
        for t in ta:
            if tb:
                s += max(
                    int(np.floor(jaro_winkler(t, u) * 1e6)) for u in tb
                )
        return len(ta), s

    def test_matches_scalar_brute_force(self, ray_session):
        from deepblocker_ray.stages.matching import monge_elkan

        pairs = pd.DataFrame(
            {
                "left_id": [0, 1, 2, 3, 4],
                "right_id": [10, 11, 12, 13, 14],
                "left_text": [
                    "acme corp ltd",
                    "the quick fox fox",
                    "",
                    "hello",
                    "jon smith junior",
                ],
                "right_text": [
                    "acme corporation",
                    "quick brown fox",
                    "world",
                    "",
                    "smith jon jr",
                ],
            }
        )
        out = (
            monge_elkan(
                rd.from_pandas(pairs).repartition(2),
                EngineConfig(num_buckets=4),
            )
            .to_pandas()
            .sort_values("left_id")
            .reset_index(drop=True)
        )
        for i, r in out.iterrows():
            na, lr = self._brute(
                pairs.loc[i, "left_text"], pairs.loc[i, "right_text"]
            )
            nb, rl = self._brute(
                pairs.loc[i, "right_text"], pairs.loc[i, "left_text"]
            )
            assert (r["n_left"], r["me_lr"]) == (na, lr)
            assert (r["n_right"], r["me_rl"]) == (nb, rl)

    def test_reordered_tokens_score_near_max(self, ray_session):
        from deepblocker_ray.stages.matching import monge_elkan

        pairs = pd.DataFrame(
            {
                "left_id": [0],
                "right_id": [1],
                "left_text": ["alpha beta gamma"],
                "right_text": ["gamma alpha beta"],
            }
        )
        out = monge_elkan(
            rd.from_pandas(pairs), EngineConfig(num_buckets=4)
        ).to_pandas()
        # exact token permutation: every max is JW=1.0 -> 10^6 each
        assert out["me_lr"].iloc[0] == 3 * 10**6
        assert out["me_rl"].iloc[0] == 3 * 10**6


class TestWeightedJaccard:
    def test_multiset_min_max(self, ray_session):
        from deepblocker_ray.stages.matching import weighted_jaccard

        pairs = pd.DataFrame(
            {
                "left_id": [0, 1, 2],
                "right_id": [10, 11, 12],
                "left_text": ["a a a b", "x y", ""],
                "right_text": ["a b b", "x y", ""],
            }
        )
        out = weighted_jaccard(
            rd.from_pandas(pairs).repartition(2),
            EngineConfig(num_buckets=4),
        ).to_pandas().set_index("left_id")
        # pair 0: a:(3,1) b:(1,2) -> min 1+1=2, max 3+2=5
        assert tuple(out.loc[0][["sum_min", "sum_max"]]) == (2, 5)
        # identical -> min == max == 2
        assert tuple(out.loc[1][["sum_min", "sum_max"]]) == (2, 2)
        # both empty -> dropped
        assert 2 not in out.index


class TestPairDivergence:
    def test_lcp_edges(self, ray_session):
        from deepblocker_ray.stages.matching import pair_divergence

        pairs = pd.DataFrame(
            {
                "left_id": [0, 1, 2, 3],
                "right_id": [10, 11, 12, 13],
                "left_text": ["hello world", "abc", "", "same"],
                "right_text": ["hello there", "xyz", "nonempty", "same"],
            }
        )
        out = pair_divergence(
            rd.from_pandas(pairs).repartition(2),
            EngineConfig(num_buckets=4),
        ).to_pandas().set_index("left_id")
        assert tuple(out.loc[0]) == (10, 6, 11, 11)   # "hello " shared
        assert tuple(out.loc[1]) == (11, 0, 3, 3)
        assert tuple(out.loc[2]) == (12, 0, 0, 8)
        assert tuple(out.loc[3]) == (13, 4, 4, 4)
