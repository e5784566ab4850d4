"""Dedup suite semantics on planted duplicates (not just rows-only)."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig
from deepblocker_ray.stages.dedup import (
    _shingle_hashes,
    embedding_neardup,
    exact_dedup,
    jaccard,
    minhash_lsh_dedup,
    minhash_signature,
    _minhash_params,
    ngram_jaccard_dedup,
    simhash_dedup,
    tfidf_dedup,
)

CFG = EngineConfig(num_buckets=8)


def corpus_with_dups(n_base=60, seed=5):
    """Docs 0..n_base-1 distinct; each doc in the dup set gets a near-copy
    (small token edits) and doc 0 also an exact copy."""
    rng = np.random.default_rng(seed)
    vocab = np.asarray([f"w{i}" for i in range(300)], object)
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(30, 60))))
        for _ in range(n_base)
    ]
    rows_id, rows_text, truth = [], [], {}
    for i, t in enumerate(texts):
        rows_id.append(i)
        rows_text.append(t)
        truth[str(i)] = str(i)
    next_id = n_base
    # exact copy of doc 0
    rows_id.append(next_id)
    rows_text.append(texts[0])
    truth[str(next_id)] = "0"
    next_id += 1
    # near-copies of docs 1..15 (drop 2 tokens)
    for i in range(1, 16):
        toks = texts[i].split()
        for _ in range(2):
            toks.pop(int(rng.integers(0, len(toks))))
        rows_id.append(next_id)
        rows_text.append(" ".join(toks))
        truth[str(next_id)] = str(i)
        next_id += 1
    df = pd.DataFrame({"doc_id": rows_id, "text": rows_text})
    return df, truth


def clusters_agree(out: pd.DataFrame, truth: dict[str, str]) -> float:
    """fraction of docs whose predicted co-cluster set == planted set."""
    pred = dict(zip(out["doc_id"], out["cluster_id"]))
    by_pred = {}
    by_truth = {}
    for d in truth:
        by_pred.setdefault(pred[d], set()).add(d)
        by_truth.setdefault(truth[d], set()).add(d)
    ok = sum(
        1 for d in truth if by_pred[pred[d]] == by_truth[truth[d]]
    )
    return ok / len(truth)


class TestUnits:
    def test_minhash_similarity_estimate(self):
        a, b = _minhash_params(256, seed=1)
        s1 = _shingle_hashes("the quick brown fox jumps over the lazy dog", 5)
        s2 = _shingle_hashes("the quick brown fox jumped over the lazy dog", 5)
        sig1 = minhash_signature(s1, a, b)
        sig2 = minhash_signature(s2, a, b)
        est = (sig1 == sig2).mean()
        true_j = jaccard(s1, s2)
        assert abs(est - true_j) < 0.15

    def test_shingles_deterministic(self):
        np.testing.assert_array_equal(
            _shingle_hashes("hello world", 5), _shingle_hashes("hello world", 5)
        )


class TestExactDedup:
    def test_exact(self, ray_session):
        import ray.data as rd

        df, _ = corpus_with_dups()
        out = exact_dedup(rd.from_pandas(df), cfg=CFG).to_pandas()
        # exactly one exact duplicate pair planted (doc 0 and its copy)
        assert len(out) == len(df) - 1
        dup_row = out[out["n_dups"] == 2]
        assert len(dup_row) == 1
        assert int(dup_row.iloc[0]["doc_id"]) == 0


class TestNearDedup:
    @pytest.mark.parametrize(
        "fn,kwargs",
        [
            (minhash_lsh_dedup, dict(threshold=0.5)),
            (simhash_dedup, dict(max_hamming=6)),
            (ngram_jaccard_dedup, dict(threshold=0.4)),
            (tfidf_dedup, dict(tau_num=2, tau_den=5)),
        ],
    )
    def test_finds_planted_near_dups(self, ray_session, fn, kwargs):
        import ray.data as rd

        df, truth = corpus_with_dups()
        out = fn(rd.from_pandas(df), cfg=CFG, **kwargs).to_pandas()
        assert set(out["doc_id"]) == set(truth)
        agreement = clusters_agree(out, truth)
        assert agreement >= 0.9, (fn.__name__, agreement)
        # distinct docs must NOT merge into giant clusters
        assert out["cluster_id"].nunique() >= 55


class TestTfidfDedup:
    def test_stop_gram_exclusion(self, ray_session):
        """Docs whose ONLY shared grams exceed df_cap are never candidates,
        even at threshold 0 — the posting-list cap is semantic, not a perf
        shortcut."""
        import ray.data as rd

        # 8 docs all share the same 3 tokens (one common gram, df=8 > cap 5);
        # each also has a unique tail so pairwise overlap exists only via
        # the stop gram.
        texts = [f"alpha beta gamma tail{i} end{i} fin{i}" for i in range(8)]
        df = pd.DataFrame({"doc_id": range(8), "text": texts})
        out = tfidf_dedup(
            rd.from_pandas(df), cfg=CFG, df_cap=5, tau_num=0, tau_den=1
        ).to_pandas()
        assert out["cluster_id"].nunique() == 8
        assert not out["is_duplicate"].any()

    def test_rare_gram_weight_dominates(self, ray_session):
        """Two docs sharing one rare gram plus a long distinct tail: the
        weighted score (rare gram's weight = n_docs // 2) clears a threshold
        the unweighted Jaccard would miss."""
        import ray.data as rd

        n_fill = 38
        fill = [
            f"f{i}a f{i}b f{i}c f{i}d f{i}e f{i}f" for i in range(n_fill)
        ]
        # docs 100/101 share the rare gram "rare one gram" (df=2, weight 20)
        # plus 3 unique grams each (df=1, weight 40): num=20, den=2*140-20=
        # wait: tw = 20 + 3*40 = 140 each → den = 260, num/den = 20/260.
        pair = [
            "rare one gram xa xb xc",
            "rare one gram ya yb yc",
        ]
        df = pd.DataFrame(
            {
                "doc_id": list(range(n_fill)) + [100, 101],
                "text": fill + pair,
            }
        )
        out = tfidf_dedup(
            rd.from_pandas(df), cfg=CFG, df_cap=5, tau_num=1, tau_den=20
        ).to_pandas().set_index("doc_id")
        assert out.loc["100", "cluster_id"] == out.loc["101", "cluster_id"]
        # fill docs share nothing → singletons
        assert out["cluster_id"].nunique() == n_fill + 1

    def test_bad_params(self):
        for kw in (dict(ngram=0), dict(df_cap=1), dict(tau_den=0),
                   dict(tau_num=-1)):
            with pytest.raises(ValueError):
                tfidf_dedup(None, cfg=CFG, **kw)


class TestEmbeddingNearDup:
    def test_finds_planted_vector_dups(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from deepblocker_ray.stages.embed import numpy_to_emb

        rng = np.random.default_rng(3)
        base = rng.standard_normal((50, 32)).astype(np.float32)
        near = base[:10] + rng.normal(0, 0.01, (10, 32)).astype(np.float32)
        mat = np.vstack([base, near])
        ids = [f"{i:04d}" for i in range(60)]
        emb = pa.table({"vec_id": pa.array(ids), "emb": numpy_to_emb(mat)})
        out = embedding_neardup(
            rd.from_arrow(emb), cfg=EngineConfig(num_buckets=8), id_col="vec_id",
            threshold=0.98, k=5,
        ).to_pandas()
        pred = dict(zip(out["doc_id"], out["cluster_id"]))
        for i in range(10):
            assert pred[f"{i:04d}"] == pred[f"{50 + i:04d}"]
        assert out["cluster_id"].nunique() == 50
        assert out["is_duplicate"].sum() == 10


class TestDecontaminate:
    def test_planted_contamination(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import decontaminate

        bench_texts = [
            "alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine",
        ]
        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    # verbatim benchmark copy → contamination 1.0
                    bench_texts[0],
                    # half benchmark / half novel
                    "one two three four five planet comet nebula star moon",
                    # disjoint
                    "red green blue cyan magenta yellow black white",
                ],
            }
        )
        bench = pd.DataFrame({"bench_id": [0, 1], "text": bench_texts})
        out = (
            decontaminate(
                rd.from_pandas(docs), rd.from_pandas(bench), cfg=CFG
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "contamination"] == 1.0
        assert bool(out.loc[0, "is_contaminated"])
        assert 0.0 < out.loc[1, "contamination"] < 1.0
        assert out.loc[2, "contamination"] == 0.0
        assert not bool(out.loc[2, "is_contaminated"])
        assert out.loc[0, "n_grams"] == 6  # 8 words → 6 trigrams


class TestMetaBlocking:
    def test_wnp_rule_vs_brute_force(self, ray_session):
        import itertools

        import ray.data as rd

        from deepblocker_ray.functions.tokenizer import tokenize
        from deepblocker_ray.stages.dedup import meta_blocking

        rng = np.random.default_rng(17)
        vocab = [f"w{i}" for i in range(25)]
        texts = {}
        for i in range(50):
            k = int(rng.integers(3, 12))
            texts[f"d{i:03d}"] = " ".join(rng.choice(vocab, k))
        df = pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}
        )
        out = meta_blocking(
            rd.from_pandas(df), cfg=EngineConfig(num_buckets=8)
        ).to_pandas()
        got = sorted(
            zip(out["left_id"], out["right_id"], out["w"].astype(int))
        )

        # brute force: word-3-gram blocks (short-doc fallback), df in [2,5],
        # CBS weights, WNP keep rule
        def grams(t):
            tk = tokenize(t)
            if not tk:
                return set()
            if len(tk) < 3:
                return {" ".join(tk)}
            return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}

        from collections import Counter, defaultdict

        gsets = {k: grams(v) for k, v in texts.items()}
        df_ = Counter(g for s in gsets.values() for g in s)
        w = Counter()
        for a, b in itertools.combinations(sorted(gsets), 2):
            shared = {
                g for g in gsets[a] & gsets[b] if 2 <= df_[g] <= 5
            }
            if shared:
                w[(a, b)] = len(shared)
        deg, sw = Counter(), Counter()
        for (a, b), ww in w.items():
            deg[a] += 1; deg[b] += 1; sw[a] += ww; sw[b] += ww
        want = sorted(
            (a, b, ww) for (a, b), ww in w.items()
            if ww * deg[a] >= sw[a] or ww * deg[b] >= sw[b]
        )
        assert got == want

    def test_df_cap_validation(self, ray_session):
        from deepblocker_ray.stages.dedup import meta_blocking

        with pytest.raises(ValueError):
            meta_blocking(None, df_cap=1)


class TestSegmentDedup:
    """Span-level dedup with reassembly: winner = min (doc_id, seg_idx),
    docs rebuild in original order, both attach paths identical."""

    def _docs(self, rd):
        import pandas as pd

        w8a = "a b c d e f g h"          # shared 8-word run
        w8b = "p q r s t u v w"
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        w8a + " " + w8b,          # doc1: owns both segments
                        w8b + " " + "x y z",      # doc2: loses seg0, keeps tail
                        w8a,                      # doc3: loses its only segment
                        "solo words here",        # doc4: unique, kept whole
                    ],
                }
            )
        )

    def test_first_occurrence_wins_and_reassembly(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import segment_dedup

        out = (
            segment_dedup(self._docs(rd), EngineConfig(num_buckets=4),
                          seg_words=8)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[1, "text"] == "a b c d e f g h p q r s t u v w"
        assert out.loc[2, "text"] == "x y z"      # seg0 lost, 3-word tail kept
        assert out.loc[3, "text"] == ""           # all segments lost
        assert out.loc[3, "n_kept"] == 0 and out.loc[3, "n_segs"] == 1
        assert out.loc[4, "text"] == "solo words here"
        assert out.loc[1, "n_segs"] == 2 and out.loc[1, "n_kept"] == 2

    def test_attach_paths_equal(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import segment_dedup

        a = (
            segment_dedup(self._docs(rd), EngineConfig(num_buckets=4),
                          seg_words=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            segment_dedup(
                self._docs(rd),
                EngineConfig(num_buckets=4, broadcast_rows_max=0),
                seg_words=8,
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_cross_batch_winner_order(self, ray_session):
        """Winner must be the global (doc_id, seg_idx) minimum even when
        the occurrences land in different blocks."""
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import segment_dedup

        seg = "k l m n o p q r"
        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": list(range(10, 0, -1)),
                 "text": [seg] * 10}
            )
        ).repartition(5)
        out = (
            segment_dedup(docs, EngineConfig(num_buckets=4), seg_words=8)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[1, "text"] == seg
        assert (out.loc[2:, "text"] == "").all()


class TestSharedPrefixes:
    def test_counts_and_threshold(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import shared_prefixes

        head = "x" * 24
        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": [
                        head + " tail one",
                        head + " tail two",
                        "unique document text here",
                        head + " tail three",
                    ],
                }
            )
        ).repartition(3)
        out = (
            shared_prefixes(
                docs, EngineConfig(num_buckets=4),
                prefix_chars=24, min_docs=2,
            )
            .to_pandas()
        )
        assert len(out) == 1
        assert out.iloc[0]["prefix"] == head
        assert out.iloc[0]["n_docs"] == 3

    def test_codepoint_slicing(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import shared_prefixes

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [1, 2],
                    "text": ["ü" * 3 + "abc", "ü" * 3 + "xyz"],
                }
            )
        )
        out = shared_prefixes(
            docs, EngineConfig(num_buckets=4), prefix_chars=4, min_docs=2
        ).to_pandas()
        # 4 CODE POINTS, not bytes: 'üüüa' vs 'üüüx' differ → no shared prefix
        assert len(out) == 0
        out3 = shared_prefixes(
            docs, EngineConfig(num_buckets=4), prefix_chars=3, min_docs=2
        ).to_pandas()
        assert len(out3) == 1 and out3.iloc[0]["prefix"] == "üüü"


class TestEditDistanceJoin:
    def test_brute_force_parity(self, ray_session):
        """Random short strings from a small alphabet — every ≤d pair must
        survive the prefix filter (exactness), nothing above d emitted."""
        import itertools
        import random

        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.functions.textsim import levenshtein_batch
        from deepblocker_ray.stages.dedup import edit_distance_join

        rng = random.Random(7)
        words = ["ring", "bolt", "gear", "widget", "gizmo", "sprocket"]
        texts = [
            " ".join(rng.choices(words, k=rng.randint(2, 3)))
            for _ in range(80)
        ]
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": range(80), "text": texts})
        ).repartition(4)
        out = edit_distance_join(
            docs, EngineConfig(num_buckets=8), max_dist=2, q=2
        ).to_pandas()
        got = set(zip(out["left_id"], out["right_id"], out["dist"]))

        want = set()
        for i, j in itertools.combinations(range(80), 2):
            d = int(levenshtein_batch([texts[i]], [texts[j]])[0])
            if d <= 2:
                a, b = sorted((str(i), str(j)))
                want.add((a, b, d))
        assert got == want

    def test_low_gram_docs_surfaced(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import edit_distance_join

        # 'aaaa' has ONE distinct 2-gram < q·d+1 = 5 → vacuous count bound
        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2], "text": ["aaaa", "some longer text here"]}
            )
        )
        stats: dict = {}
        edit_distance_join(
            docs, EngineConfig(num_buckets=4), max_dist=2, q=2,
            stats_out=stats,
        ).to_pandas()
        assert stats["low_gram_docs"] == 1

    def test_exact_duplicates_distance_zero(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import edit_distance_join

        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": [1, 2, 3], "text": ["same text"] * 3}
            )
        )
        out = edit_distance_join(
            docs, EngineConfig(num_buckets=4), max_dist=1, q=2
        ).to_pandas()
        assert len(out) == 3 and (out["dist"] == 0).all()


class TestContainmentDedup:
    def test_planted_excerpt_is_directed(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import containment_dedup

        words = [f"w{i}" for i in range(30)]
        full = " ".join(words)             # doc 0: the container
        excerpt = " ".join(words[5:15])    # doc 1: contiguous excerpt
        other = " ".join(f"z{i}" for i in range(30))  # doc 2: unrelated
        df = pd.DataFrame(
            {
                "doc_id": np.arange(3, dtype=np.int64),
                "text": [full, excerpt, other],
            }
        )
        out = containment_dedup(
            rd.from_pandas(df), cfg=CFG, ngram=3, threshold=(9, 10)
        ).to_pandas()
        got = set(map(tuple, out[["inner_id", "outer_id"]].values))
        # the excerpt's grams are all in the container; not vice versa
        assert got == {("1", "0")}
        row = out.iloc[0]
        # excerpt has 10 tokens -> 8 distinct 3-grams, all shared
        assert row["inner_size"] == 8
        assert row["n_shared"] == 8

    def test_mutual_containment_of_duplicates(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import containment_dedup

        text = " ".join(f"a{i}" for i in range(20))
        df = pd.DataFrame(
            {"doc_id": np.array([0, 1], np.int64), "text": [text, text]}
        )
        out = containment_dedup(
            rd.from_pandas(df), cfg=CFG, threshold=(10, 10)
        ).to_pandas()
        got = set(map(tuple, out[["inner_id", "outer_id"]].values))
        assert got == {("0", "1"), ("1", "0")}


class TestCrossSourceDups:
    def test_shared_text_matrix(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import cross_source_dups

        df = pd.DataFrame(
            {
                "doc_id": np.arange(7, dtype=np.int64),
                "text": ["x", "x", "x", "y", "y", "z", "x"],
                "source": ["A", "B", "B", "A", "C", "A", "C"],
            }
        )
        # text x in {A, B, C} -> pairs AB, AC, BC; y in {A, C} -> AC
        # z only in A -> nothing; duplicate (x, B) counts once
        out = (
            cross_source_dups(rd.from_pandas(df), CFG)
            .to_pandas()
            .sort_values(["source_a", "source_b"])
            .reset_index(drop=True)
        )
        got = set(map(tuple, out.values))
        assert got == {("A", "B", 1), ("A", "C", 2), ("B", "C", 1)}


class TestGramNovelty:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import gram_novelty

        texts = [
            "the quick brown fox jumps",
            "the quick brown cat sleeps",
            "completely different words here",
            "tiny",                       # < 8 bytes: whole-text gram
            "tiny",                       # duplicate short doc
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(5, dtype=np.int64), "text": texts}
        )
        out = (
            gram_novelty(
                rd.from_pandas(df).repartition(2),
                EngineConfig(num_buckets=4), k=8,
            )
            .to_pandas()
            .set_index("doc_id")
        )

        def grams(t):
            b = t.encode()
            if len(b) < 8:
                return {t}
            return {b[i : i + 8] for i in range(len(b) - 7)}

        gsets = [grams(t) for t in texts]
        for i, gs in enumerate(gsets):
            shared = sum(
                1
                for g in gs
                if any(g in other for j, other in enumerate(gsets) if j != i)
            )
            r = out.loc[i]
            assert r["n_grams"] == len(gs)
            assert r["n_shared"] == shared
        # the twin short docs share their single gram
        assert out.loc[3, "n_shared"] == 1
        assert out.loc[2, "n_shared"] == 0


class TestTopSharedPairs:
    def test_ranking_and_df_cap(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import top_shared_pairs

        base = "abcdefghijklmnopqrst"       # 20 chars -> 13 grams
        texts = [
            base,                            # 0: shares 13 grams with 1
            base,                            # 1
            base[:12],                       # 2: shares 5 grams with 0/1
            "zzzzzzzzzzz",                   # 3: unrelated
            "completely different text",    # 4
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(5, dtype=np.int64), "text": texts}
        )
        out = top_shared_pairs(
            rd.from_pandas(df).repartition(2),
            EngineConfig(num_buckets=4), k_top=3, gram_k=8, df_cap=50,
        ).to_pandas()
        assert list(out.iloc[0][["left_id", "right_id", "n_shared"]]) \
            == [0, 1, 13]
        assert out.iloc[0]["rank"] == 1
        # next: (0,2) and (1,2) sharing the first 5 grams, tie broken
        # by (left, right)
        assert list(out.iloc[1][["left_id", "right_id", "n_shared"]]) \
            == [0, 2, 5]
        assert list(out.iloc[2][["left_id", "right_id", "n_shared"]]) \
            == [1, 2, 5]

    def test_ubiquitous_grams_excluded(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import top_shared_pairs

        # the shared gram appears in ALL 4 docs; df_cap=3 excludes it
        texts = ["XXcommonXX1", "XXcommonXX2", "XXcommonXX3",
                 "XXcommonXX4"]
        df = pd.DataFrame(
            {"doc_id": np.arange(4, dtype=np.int64), "text": texts}
        )
        out = top_shared_pairs(
            rd.from_pandas(df), EngineConfig(num_buckets=4),
            k_top=5, gram_k=8, df_cap=3,
        ).to_pandas()
        assert len(out) == 0


class TestClusterMedoid:
    def test_hand_built_clusters_and_tie(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.dedup import cluster_medoid

        labeled = pd.DataFrame(
            {
                "doc_id": ["1", "2", "3", "4", "5", "9"],
                "cluster_id": ["c1", "c1", "c1", "c2", "c2", "9"],
            }
        )
        docs = pd.DataFrame(
            {
                "doc_id": ["1", "2", "3", "4", "5", "9"],
                "text": [
                    "abcdef",     # lev to 2: 1, to 3: 3 -> tot 4
                    "abcdefg",    # lev to 1: 1, to 3: 4 -> tot 5
                    "abc",        # 3 + 4 = 7
                    "same",       # c2: identical pair -> tie, min id wins
                    "same",
                    "singleton",
                ],
            }
        )
        out = (
            cluster_medoid(
                rd.from_pandas(labeled).repartition(2),
                rd.from_pandas(docs).repartition(3),
                EngineConfig(num_buckets=4),
            )
            .to_pandas()
            .set_index("cluster_id")
        )
        assert len(out) == 2  # singleton excluded
        assert out.loc["c1", "medoid_id"] == "1"
        assert out.loc["c1", "n_members"] == 3
        assert out.loc["c1", "total_lev"] == 4
        assert out.loc["c2", "medoid_id"] == "4"  # tie -> smaller id
        assert out.loc["c2", "total_lev"] == 0
