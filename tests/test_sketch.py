"""Unit tests for the deterministic sketches (stages/sketch.py), the
interval range_join (stages/relational.py) and substring-level
duplicate_spans (stages/dedup.py). The DuckDB twins are regression-covered
by the driver correctness sweep; these pin the sketch math (register/rank
rules, integer-exact estimates, no-false-negative guarantees) against
hand-rolled scalar recomputations and brute-force oracles."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def _ds(df, blocks=1):
    import ray.data as rd

    if blocks == 1:
        return rd.from_pandas(df)
    parts = np.array_split(df, blocks)
    return rd.from_pandas([p for p in parts if len(p)])


class TestBitLength:
    def test_matches_int_bit_length(self):
        from deepblocker_ray.stages.sketch import _bit_length_u64

        rng = np.random.default_rng(0)
        vals = np.concatenate(
            [
                np.array([0, 1, 2, 3, 255, 256, 2**56 - 1, 2**63, 2**64 - 1],
                         np.uint64),
                rng.integers(0, 2**63, size=500, dtype=np.uint64),
            ]
        )
        got = _bit_length_u64(vals)
        want = np.array([int(v).bit_length() for v in vals], np.int32)
        assert (got == want).all()


def _hll_oracle(keys, p=8):
    """Scalar HLL recompute: registers, scaled sum, integer estimate."""
    from deepblocker_ray.stages.sketch import ALPHA_E6, _HLL_SCALE_BITS

    m = 1 << p
    regs = [0] * m
    for k in keys:
        h = _md5_64(str(k) + "|hll")
        r = h & (m - 1)
        v = h >> p
        rank = (64 - p + 1) - v.bit_length()
        regs[r] = max(regs[r], rank)
    s = sum(
        (1 << (_HLL_SCALE_BITS - mm)) if mm <= _HLL_SCALE_BITS else 0
        for mm in regs
    )
    est = ALPHA_E6[m] * m * m * (1 << _HLL_SCALE_BITS) // s // 10**6
    return sum(1 for mm in regs if mm == 0), s, est


class TestApproxDistinct:
    def test_matches_scalar_oracle_cross_block(self, ray_session):
        from deepblocker_ray.stages.sketch import approx_distinct

        rng = np.random.default_rng(1)
        rows = pd.DataFrame(
            {
                "grp": np.where(rng.random(400) < 0.5, "a", "b"),
                "k": rng.integers(0, 120, size=400),
            }
        )
        out = (
            approx_distinct(
                _ds(rows, blocks=7), key_col="k", group_col="grp", cfg=CFG
            )
            .to_pandas()
            .set_index("grp")
            .sort_index()
        )
        for g in ["a", "b"]:
            keys = rows.loc[rows["grp"] == g, "k"].unique()
            zr, s, est = _hll_oracle(keys)
            assert out.loc[g, "zero_registers"] == zr
            assert out.loc[g, "hll_sum_scaled"] == s
            assert out.loc[g, "approx_distinct"] == est

    def test_estimate_accuracy(self, ray_session):
        # HLL p=8 has σ ≈ 1.04/√256 ≈ 6.5%; assert within 4σ on one draw
        from deepblocker_ray.stages.sketch import approx_distinct

        n = 5000
        rows = pd.DataFrame({"grp": ["x"] * n, "k": np.arange(n)})
        out = approx_distinct(
            _ds(rows, blocks=4), key_col="k", group_col="grp", cfg=CFG
        ).to_pandas()
        est = int(out["approx_distinct"].iloc[0])
        assert abs(est - n) / n < 0.26

    def test_bad_p_rejected(self):
        from deepblocker_ray.stages.sketch import approx_distinct

        with pytest.raises(ValueError):
            approx_distinct(None, key_col="k", group_col="g", p=3)


class TestCountMin:
    def test_estimate_ge_truth_and_scalar_parity(self, ray_session):
        from deepblocker_ray.stages.sketch import cms_build, heavy_hitters

        texts = (
            ["alpha beta beta gamma"] * 10
            + ["delta epsilon"] * 3
            + ["beta zeta", ""]
        )
        docs = _ds(pd.DataFrame({"text": texts}), blocks=5)
        depth, width = 4, 64  # narrow: force collisions
        sk = cms_build(docs, depth=depth, width=width)

        # scalar recompute of the whole sketch
        from deepblocker_ray.functions.tokenizer import tokenize

        truth: dict[str, int] = {}
        for t in texts:
            for tok in tokenize(t):
                truth[tok] = truth.get(tok, 0) + 1
        want = np.zeros((depth, width), np.int64)
        for tok, c in truth.items():
            for i in range(depth):
                want[i][_md5_64(f"{tok}|cms{i}") % width] += c
        assert (sk == want).all()

        docs2 = _ds(pd.DataFrame({"text": texts}), blocks=5)
        hh = (
            heavy_hitters(docs2, cfg=CFG, depth=depth, width=width,
                          min_count=3)
            .to_pandas()
            .set_index("token")["est_count"]
        )
        # no false negatives: every token with true count ≥ 3 present,
        # estimate ≥ truth
        for tok, c in truth.items():
            if c >= 3:
                assert hh[tok] >= c
        # estimates are the min-over-rows of the verified sketch
        for tok in hh.index:
            mn = min(
                sk[i][_md5_64(f"{tok}|cms{i}") % width] for i in range(depth)
            )
            assert hh[tok] == mn


class TestBloomSemiJoin:
    def test_no_false_negatives_and_deterministic_fps(self, ray_session):
        from deepblocker_ray.stages.sketch import (
            bloom_positions,
            bloom_semi_join,
        )

        rng = np.random.default_rng(2)
        members = np.unique(rng.integers(0, 10_000, size=60))
        probe = np.arange(0, 3000)
        big = _ds(pd.DataFrame({"k": probe, "payload": probe * 2}), blocks=6)
        small = _ds(pd.DataFrame({"m": members}), blocks=3)
        m_bits, kh = 512, 3
        out = (
            bloom_semi_join(big, small, big_key="k", small_key="m",
                            cfg=CFG, m_bits=m_bits, k_hashes=kh)
            .to_pandas()
            .sort_values("k")
        )
        got = set(out["k"].tolist())
        # zero false negatives
        in_range = set(members[members < 3000].tolist())
        assert in_range <= got
        # exact FP set: scalar bloom recompute
        bits = set()
        for v in members:
            for j in range(kh):
                bits.add(_md5_64(f"{v}|bf{j}") % m_bits)
        want = {
            int(v)
            for v in probe
            if all(_md5_64(f"{v}|bf{j}") % m_bits in bits for j in range(kh))
        }
        assert got == want
        # payload rides through untouched
        assert (out["payload"].to_numpy() == out["k"].to_numpy() * 2).all()
        # positions helper shape
        assert bloom_positions(np.array([1, 2]), m_bits, kh).shape == (2, kh)

    def test_empty_key_side_keeps_nothing(self, ray_session):
        from deepblocker_ray.stages.sketch import bloom_semi_join

        big = _ds(pd.DataFrame({"k": np.arange(10)}))
        small = _ds(pd.DataFrame({"m": pd.Series([], dtype="int64")}))
        out = bloom_semi_join(
            big, small, big_key="k", small_key="m", cfg=CFG, m_bits=64
        ).to_pandas()
        assert len(out) == 0


class TestRangeJoin:
    def test_bands_inner_semantics(self, ray_session):
        from deepblocker_ray.stages.relational import range_join

        bands = [(0, 10, "lo"), (10, 20, "mid"), (50, 60, "hi")]
        vals = pd.DataFrame(
            {"id": np.arange(8),
             "v": np.array([-5, 0, 9, 10, 19, 20, 55, 60], np.int64)}
        )
        out = (
            range_join(_ds(vals, blocks=4), bands, value_col="v", cfg=CFG)
            .to_pandas()
            .sort_values("id")
        )
        # -5 (below), 20 (gap), 60 (past last hi) drop; boundaries half-open
        assert out["id"].tolist() == [1, 2, 3, 4, 6]
        assert out["band"].tolist() == ["lo", "lo", "mid", "mid", "hi"]

    def test_overlap_and_empty_rejected(self):
        from deepblocker_ray.stages.relational import range_join

        with pytest.raises(ValueError):
            range_join(None, [(0, 10, "a"), (5, 15, "b")], value_col="v")
        with pytest.raises(ValueError):
            range_join(None, [], value_col="v")
        with pytest.raises(ValueError):
            range_join(None, [(10, 10, "a")], value_col="v")


class TestDuplicateSpans:
    @staticmethod
    def _oracle(texts, k=8, stride=4):
        """Brute-force window multiset on the substrings themselves."""
        from collections import Counter

        wins = []
        for i, t in enumerate(texts):
            b = t.encode()
            n = max(0, (len(b) - k) // stride + 1)
            wins.append([b[j * stride : j * stride + k] for j in range(n)])
        tot = Counter(w for ws in wins for w in ws)
        out = []
        for i, ws in enumerate(wins):
            nd = sum(1 for w in ws if tot[w] >= 2)
            out.append((len(ws), nd, nd / len(ws) if ws else 0.0))
        return out

    def test_planted_spans_match_bruteforce(self, ray_session):
        from deepblocker_ray.stages.dedup import duplicate_spans

        span = "REPEATED-SPAN-CONTENT-0123456789"  # 32 chars
        texts = [
            "unique text one with nothing shared here at all ok",
            "prefix " + span + " middle filler text " + span + " suffix",
            span + " another doc that quotes the very same span",
            "short",  # < k bytes → zero windows
            "",
        ]
        df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                           "text": texts})
        out = (
            duplicate_spans(_ds(df, blocks=5), CFG, k=8, stride=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._oracle(texts, k=8, stride=4)
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
        for i, (nw, nd, fr) in enumerate(want):
            assert out.loc[i, "n_windows"] == nw
            assert out.loc[i, "n_dup_windows"] == nd
            assert out.loc[i, "dup_frac"] == pytest.approx(fr, abs=0)
        # the planted-span docs actually show duplication
        assert out.loc[1, "n_dup_windows"] > 0
        assert out.loc[3, "n_windows"] == 0 and out.loc[3, "dup_frac"] == 0.0

    def test_within_doc_repetition_counts(self, ray_session):
        from deepblocker_ray.stages.dedup import duplicate_spans

        # one doc repeating its own content: windows duplicate within doc
        df = pd.DataFrame(
            {"doc_id": np.array([7], np.int64), "text": ["abcdabcdabcd"]}
        )
        out = duplicate_spans(_ds(df), CFG, k=4, stride=4).to_pandas()
        assert out["n_windows"].iloc[0] == 3
        assert out["n_dup_windows"].iloc[0] == 3  # all three are "abcd"
        assert out["dup_frac"].iloc[0] == 1.0


class TestSortedNeighborhood:
    @staticmethod
    def _oracle(ids, keys, w):
        order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
        pairs = set()
        for a in range(len(order)):
            for b in range(a + 1, min(a + w, len(order))):
                pairs.add((ids[order[a]], ids[order[b]], b - a))
        return pairs

    def test_matches_bruteforce_across_ranges(self, ray_session):
        from deepblocker_ray.stages.neighborhood import sorted_neighborhood

        rng = np.random.default_rng(3)
        n, w = 200, 5
        ids = np.arange(n, dtype=np.int64)
        # diverse first bytes so rows spread over many prefix ranges AND
        # collide on keys (ties) — exercises in-range + halo + tie order
        keys = [
            chr(97 + int(x)) + str(int(y))
            for x, y in zip(rng.integers(0, 26, n), rng.integers(0, 9, n))
        ]
        df = pd.DataFrame({"doc_id": ids, "key": keys})
        out = sorted_neighborhood(
            _ds(df, blocks=9), CFG, id_col="doc_id", key_col="key", window=w
        ).to_pandas()
        got = set(zip(out["left_id"], out["right_id"], out["dist"]))
        assert got == self._oracle(ids.tolist(), keys, w)
        # no duplicates emitted (in-range vs halo disjointness)
        assert len(out) == len(got)

    def test_tiny_ranges_and_window_larger_than_range(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.neighborhood import sorted_neighborhood

        # num_buckets >> rows: most ranges hold 0-1 rows, every pair is a
        # halo pair; window spans several ranges
        cfg = EngineConfig(num_buckets=64)
        ids = np.arange(10, dtype=np.int64)
        keys = [chr(97 + i) for i in range(10)]  # a..j, one per range-ish
        out = sorted_neighborhood(
            _ds(pd.DataFrame({"doc_id": ids, "key": keys}), blocks=3),
            cfg, id_col="doc_id", key_col="key", window=4,
        ).to_pandas()
        got = set(zip(out["left_id"], out["right_id"], out["dist"]))
        assert got == self._oracle(ids.tolist(), keys, 4)

    def test_empty_and_bad_window(self, ray_session):
        from deepblocker_ray.stages.neighborhood import sorted_neighborhood

        empty = _ds(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                  "key": pd.Series([], dtype="object")}))
        out = sorted_neighborhood(
            empty, CFG, id_col="doc_id", key_col="key", window=3
        ).to_pandas()
        assert len(out) == 0
        with pytest.raises(ValueError):
            sorted_neighborhood(None, CFG, window=1)


class TestBlockingStatsFromLabels:
    def test_counts_and_ratios(self, ray_session):
        from deepblocker_ray.pipelines.evaluate import (
            blocking_stats_from_labels,
        )

        # 6 items, labels: {0: a,b,c}, {1: d,e}, {2: f} → golden = 3+1 = 4
        labels = pd.DataFrame(
            {"vec_id": np.arange(6, dtype=np.int64),
             "label": np.array([0, 0, 0, 1, 1, 2], np.int64)}
        )
        # candidates: (0,1)+ (0,2)+ (3,4)+ (0,5)- (2,4)-  → hits 3, cand 5
        cands = pd.DataFrame(
            {"left_id": ["0", "0", "3", "0", "2"],
             "right_id": ["1", "2", "4", "5", "4"]}
        )
        out = blocking_stats_from_labels(
            _ds(cands, blocks=2), _ds(labels, blocks=3),
            id_col="vec_id", label_col="label", cfg=CFG,
        )
        row = out.iloc[0]
        assert row["n_items"] == 6
        assert row["n_golden"] == 4
        assert row["n_candidates"] == 5
        assert row["n_hits"] == 3
        assert row["recall"] == 3 / 4
        assert row["cssr"] == 5 / (6.0 * 5 / 2)


class TestSnmDedup:
    def test_planted_near_dups(self, ray_session):
        from deepblocker_ray.stages.neighborhood import snm_dedup

        # near-dup pairs share a long prefix (SNM adjacency) and high JW
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    "customer record alpha street 12 springfield",
                    "customer record alpha street 12 springfeld",  # dup of 0
                    "totally different document about zebras",
                    "customer record beta avenue 99 shelbyville",
                    "warehouse inventory list gamma section",
                    "customer record alpha street 12 springfield!",  # dup of 0
                ],
            }
        )
        out = (
            snm_dedup(_ds(docs, blocks=3), CFG, key_chars=12, window=4,
                      jw_threshold=0.9)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [str(i) for i in range(6)]
        # 0, 1, 5 form one cluster labeled by min id "0"
        assert out.loc[[0, 1, 5], "cluster_id"].tolist() == ["0", "0", "0"]
        assert out.loc[[0, 1, 5], "is_duplicate"].tolist() == [
            False, True, True
        ]
        # the rest are singletons
        for i in (2, 3, 4):
            assert out.loc[i, "cluster_id"] == str(i)
            assert not out.loc[i, "is_duplicate"]


class TestPairwiseClusterEval:
    def test_hand_computed(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import pairwise_cluster_eval

        # pred clusters {a:{1,2,3}, b:{4,5}}, gold {x:{1,2}, y:{3,4,5}}
        # pred_pairs = 3+1 = 4; gold_pairs = 1+3 = 4
        # tp: (a,x) C(2,2)=1, (a,y) C(1,2)=0, (b,y) C(2,2)=1 → 2
        pred = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": ["1", "2", "3", "4", "5"],
                    "cluster_id": ["a", "a", "a", "b", "b"],
                }
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": [1, 2, 3, 4, 5], "label": [7, 7, 9, 9, 9]}
            )
        )
        out = pairwise_cluster_eval(pred, labels, cfg=CFG)
        row = out.iloc[0]
        assert row["n_items"] == 5
        assert row["pred_pairs"] == 4
        assert row["gold_pairs"] == 4
        assert row["tp_pairs"] == 2
        assert row["pair_precision"] == 0.5
        assert row["pair_recall"] == 0.5
        assert row["pair_f1"] == 0.5

    def test_perfect_and_empty(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import pairwise_cluster_eval

        pred = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": ["1", "2", "3"], "cluster_id": ["c", "c", "d"]}
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame({"vec_id": [1, 2, 3], "label": [1, 1, 2]})
        )
        row = pairwise_cluster_eval(pred, labels, cfg=CFG).iloc[0]
        assert row["pair_f1"] == 1.0
        # all singletons on both sides: no pairs anywhere → all-zero metrics
        pred2 = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": ["1", "2"], "cluster_id": ["p", "q"]}
            )
        )
        labels2 = rd.from_pandas(
            pd.DataFrame({"vec_id": [1, 2], "label": [5, 6]})
        )
        row2 = pairwise_cluster_eval(pred2, labels2, cfg=CFG).iloc[0]
        assert row2["pred_pairs"] == 0 and row2["gold_pairs"] == 0
        assert row2["pair_precision"] == 0.0
        assert row2["pair_f1"] == 0.0


class TestFuzzyJoin:
    def test_best_match_per_left(self, ray_session):
        from deepblocker_ray.stages.neighborhood import fuzzy_join

        left = pd.DataFrame(
            {
                "doc_id": [0, 2, 4],
                "text": [
                    "customer record alpha street twelve",
                    "warehouse inventory gamma section",
                    "zzz nothing matches this one zzz",
                ],
            }
        )
        right = pd.DataFrame(
            {
                "doc_id": [1, 3, 5, 7],
                "text": [
                    "customer record alpha street twelv",   # match for 0
                    "customer record alpha street twe",     # weaker match for 0
                    "warehouse inventory gamma sectio",     # match for 2
                    "completely unrelated text here",
                ],
            }
        )
        out = (
            fuzzy_join(_ds(left, blocks=2), _ds(right, blocks=2), CFG,
                       key_chars=8, jw_threshold=0.85)
            .to_pandas()
            .sort_values("left_id")
            .reset_index(drop=True)
        )
        # left 4 has no candidate (prefix 'zzz nothi' unshared) → absent
        assert out["left_id"].tolist() == ["0", "2"]
        # best match wins: doc 1 (longer common text → higher JW) over doc 3
        assert out["right_id"].tolist() == ["1", "5"]
        assert (out["jw"] >= 0.85).all()

    def test_tie_breaks_on_min_right_id(self, ray_session):
        from deepblocker_ray.stages.neighborhood import fuzzy_join

        left = pd.DataFrame({"doc_id": [0], "text": ["identical text"]})
        right = pd.DataFrame(
            {"doc_id": [9, 3], "text": ["identical text", "identical text"]}
        )
        out = fuzzy_join(
            _ds(left, blocks=1), _ds(right, blocks=2), CFG,
            key_chars=8, jw_threshold=0.85,
        ).to_pandas()
        assert out["right_id"].tolist() == ["3"]
        assert out["jw"].tolist() == [1.0]


class TestAdjustedRand:
    def _pred_labels(self, rd):
        pred = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": ["1", "2", "3", "4", "5"],
                    "cluster_id": ["a", "a", "a", "b", "b"],
                }
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": [1, 2, 3, 4, 5], "label": [7, 7, 9, 9, 9]}
            )
        )
        return pred, labels

    def test_hand_computed(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import adjusted_rand_index

        # tot = C(5,2) = 10, pp = gp = 4, tp = 2
        # ARI = 2·(10·2 − 16) / (10·8 − 32) = 8/48 = 1/6
        pred, labels = self._pred_labels(rd)
        row = adjusted_rand_index(pred, labels, cfg=CFG).iloc[0]
        assert row["tp_pairs"] == 2
        assert row["ari"] == 8.0 / 48.0

    def test_perfect_agreement_is_one(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import adjusted_rand_index

        pred = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": ["1", "2", "3", "4"],
                    "cluster_id": ["a", "a", "b", "b"],
                }
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame({"vec_id": [1, 2, 3, 4], "label": [5, 5, 6, 6]})
        )
        assert adjusted_rand_index(pred, labels, cfg=CFG).iloc[0]["ari"] == 1.0

    def test_degenerate_all_singletons(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import adjusted_rand_index

        pred = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": ["1", "2", "3"], "cluster_id": ["1", "2", "3"]}
            )
        )
        labels = rd.from_pandas(
            pd.DataFrame({"vec_id": [1, 2, 3], "label": [1, 2, 3]})
        )
        # pp = gp = tp = 0 → denominator 0 → pinned 0.0
        assert adjusted_rand_index(pred, labels, cfg=CFG).iloc[0]["ari"] == 0.0


class TestKMVSourceSimilarity:
    def test_exact_small_overlap(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import _stable_hash64
        from deepblocker_ray.stages.sketch import kmv_source_similarity

        # with k >= |union| the KMV estimate IS the exact Jaccard
        a_keys = [f"k{i}" for i in range(6)]
        b_keys = [f"k{i}" for i in range(3, 9)]   # overlap = 3, union = 9
        df = pd.DataFrame(
            {
                "source": ["a"] * 6 + ["b"] * 6,
                "text": a_keys + b_keys,
            }
        )
        out = (
            kmv_source_similarity(
                rd.from_pandas(df).repartition(3), CFG,
                group_col="source", key_col="text", k=16,
            )
            .to_pandas().iloc[0]
        )
        assert out["k_merged"] == 9
        assert out["n_shared"] == 3
        assert out["jaccard_est"] == 3.0 / 9.0
        del _stable_hash64

    def test_truncated_k_deterministic(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import _stable_hash64
        from deepblocker_ray.stages.sketch import kmv_source_similarity

        keys_a = [f"x{i}" for i in range(40)]
        keys_b = [f"x{i}" for i in range(20, 60)]
        df = pd.DataFrame(
            {"source": ["a"] * 40 + ["b"] * 40, "text": keys_a + keys_b}
        )
        k = 8
        out = (
            kmv_source_similarity(
                rd.from_pandas(df).repartition(5), CFG,
                group_col="source", key_col="text", k=k,
            )
            .to_pandas().iloc[0]
        )
        # scalar recompute of the same estimator
        ha = sorted(int(_stable_hash64(s.encode())) for s in keys_a)[:k]
        hb = sorted(int(_stable_hash64(s.encode())) for s in keys_b)[:k]
        merged = sorted(set(ha) | set(hb))[:k]
        shared = sum(1 for h in merged if h in set(ha) and h in set(hb))
        assert out["k_merged"] == len(merged)
        assert out["n_shared"] == shared
        assert out["jaccard_est"] == float(shared) / len(merged)


class TestPairScoreAuc:
    def _emb_ds(self, vecs, labels):
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": np.arange(len(vecs), dtype=np.int64),
                    "embedding": [list(map(float, v)) for v in vecs],
                    "label": np.asarray(labels, np.int32),
                }
            )
        )

    @staticmethod
    def _brute_auc(scores, pos):
        """Probabilistic definition: P(s_pos > s_neg) + 0.5 P(tie)."""
        s = np.asarray(scores, np.int64)
        p = np.asarray(pos, bool)
        sp, sn = s[p], s[~p]
        if len(sp) == 0 or len(sn) == 0:
            return None
        gt = (sp[:, None] > sn[None, :]).sum()
        eq = (sp[:, None] == sn[None, :]).sum()
        return (gt + 0.5 * eq) / (len(sp) * len(sn))

    def test_matches_brute_force_with_ties(self, ray_session):
        from deepblocker_ray.pipelines.evaluate import pair_score_auc
        from deepblocker_ray.stages.annsearch import _quantize_rows

        rng = np.random.default_rng(7)
        n, d = 40, 6
        vecs = rng.normal(size=(n, d))
        # coarse value grid so quantized dots collide -> real tie groups
        vecs = np.round(vecs * 2) / 2 + 0.5
        vecs[np.abs(vecs).sum(axis=1) == 0] += 1.0
        labels = rng.integers(0, 3, n)
        out = pair_score_auc(
            self._emb_ds(vecs, labels), CFG, n_queries=5
        ).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]

        q = _quantize_rows(vecs.astype(np.float64))
        scores, pos = [], []
        for i in range(5):
            for j in range(n):
                if j == i:
                    continue
                scores.append(int(q[i] @ q[j]))
                pos.append(labels[i] == labels[j])
        exp = self._brute_auc(scores, pos)
        assert row["n_pairs"] == 5 * (n - 1)
        assert row["n_pos"] == int(np.sum(pos))
        assert row["auc"] == pytest.approx(exp, abs=1e-12)
        # ties must actually occur for this test to bite
        assert len(np.unique(scores)) < len(scores)

    def test_single_class_null(self, ray_session):
        from deepblocker_ray.pipelines.evaluate import pair_score_auc

        vecs = np.eye(4) + 0.1
        out = pair_score_auc(
            self._emb_ds(vecs, [1, 1, 1, 1]), CFG, n_queries=2
        ).to_pandas()
        row = out.iloc[0]
        assert row["n_neg"] == 0
        assert pd.isna(row["auc"])
