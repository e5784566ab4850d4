"""Unit tests for the map-side partial top-k stage (stages/topk.py), the
semi/anti exists-join (stages/relational.broadcast_exists_join), and the
text_normalize / characteristic_term text operators. Driver twins are
regression-covered by the correctness sweep; these pin the tie/edge
semantics and the path equalities."""

import numpy as np
import pandas as pd

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)


def _docs_ds(rows, blocks=1):
    """rows: (doc_id, lang, n_chars). Split into `blocks` single-row-ish
    frames so map-side partials genuinely recombine."""
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
    if blocks == 1:
        return rd.from_pandas(df)
    parts = np.array_split(df, blocks)
    return rd.from_pandas([p for p in parts if len(p)])


class TestGroupTopk:
    def test_ties_rank_and_cross_block_merge(self, ray_session):
        from deepblocker_ray.stages.topk import group_topk

        rows = [
            (1, "en", 10),
            (2, "en", 10),  # tie with doc 1 → doc_id asc wins rank 1
            (3, "en", 30),
            (4, "en", 5),
            (5, "de", 7),
            (6, "de", 7),
        ]
        out = (
            group_topk(
                _docs_ds(rows, blocks=6), CFG,
                order_col="n_chars", id_col="doc_id", k=2, group_col="lang",
            )
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        assert out[out["lang"] == "en"]["doc_id"].tolist() == [3, 1]
        assert out[out["lang"] == "en"]["rank"].tolist() == [1, 2]
        # k=2 > de group after top-k keeps both, ties by doc_id
        assert out[out["lang"] == "de"]["doc_id"].tolist() == [5, 6]

    def test_k_larger_than_group(self, ray_session):
        from deepblocker_ray.stages.topk import group_topk

        out = group_topk(
            _docs_ds([(1, "en", 1)]), CFG,
            order_col="n_chars", id_col="doc_id", k=10, group_col="lang",
        ).to_pandas()
        assert len(out) == 1 and out["rank"].tolist() == [1]

    def test_global_mode_matches_full_sort(self, ray_session):
        from deepblocker_ray.stages.topk import group_topk

        rng = np.random.default_rng(3)
        rows = [(i, "x", int(v)) for i, v in
                enumerate(rng.integers(0, 50, 200))]
        out = (
            group_topk(
                _docs_ds(rows, blocks=13), CFG,
                order_col="n_chars", id_col="doc_id", k=15,
            )
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
        exp = df.sort_values(["n_chars", "doc_id"],
                             ascending=[False, True]).head(15)
        assert out["doc_id"].tolist() == exp["doc_id"].tolist()
        assert out["rank"].tolist() == list(range(1, 16))

    def test_ascending_order(self, ray_session):
        from deepblocker_ray.stages.topk import group_topk

        rows = [(1, "x", 9), (2, "x", 1), (3, "x", 5)]
        out = (
            group_topk(
                _docs_ds(rows), CFG,
                order_col="n_chars", id_col="doc_id", k=2, descending=False,
            )
            .to_pandas()
            .sort_values("rank")
        )
        assert out["doc_id"].tolist() == [2, 3]


class TestExistsJoin:
    def _sides(self, dup_keys=False):
        import ray.data as rd

        big = rd.from_pandas(
            pd.DataFrame(
                {"c_custkey": [1, 2, 3, 4, 5],
                 "c_name": ["a", "b", "c", "d", "e"]}
            )
        )
        keys = [2, 4] + ([2, 2, 4] if dup_keys else [])
        small = rd.from_pandas(pd.DataFrame({"o_custkey": keys}))
        return big, small

    def test_broadcast_and_join_paths_agree(self, ray_session):
        """Semi and anti results identical on both paths; duplicate keys in
        the exclusion side never duplicate probe rows (the marker side is
        made distinct before the hash join)."""
        from deepblocker_ray.stages.relational import broadcast_exists_join

        for anti, expect in [(True, [1, 3, 5]), (False, [2, 4])]:
            outs = []
            for cap in (2_000_000, 0):  # broadcast path, join path
                big, small = self._sides(dup_keys=True)
                cfg = EngineConfig(num_buckets=8, broadcast_rows_max=cap)
                out = (
                    broadcast_exists_join(
                        big, small, big_key="c_custkey",
                        small_key="o_custkey", cfg=cfg, anti=anti,
                    )
                    .to_pandas()
                    .sort_values("c_custkey")
                    .reset_index(drop=True)
                )
                assert out["c_custkey"].tolist() == expect
                assert list(out.columns) == ["c_custkey", "c_name"]
                outs.append(out)
            assert outs[0].equals(outs[1])

    def test_empty_small_side(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.relational import broadcast_exists_join

        big, _ = self._sides()
        small = rd.from_pandas(pd.DataFrame({"o_custkey": pd.Series(dtype="int64")}))
        anti = broadcast_exists_join(
            big, small, big_key="c_custkey", small_key="o_custkey",
            cfg=CFG, anti=True,
        ).to_pandas()
        assert sorted(anti["c_custkey"]) == [1, 2, 3, 4, 5]
        semi = broadcast_exists_join(
            big, small, big_key="c_custkey", small_key="o_custkey",
            cfg=CFG, anti=False,
        ).to_pandas()
        assert len(semi) == 0


class TestTextNormalize:
    def test_planted_controls_and_whitespace(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.textstats import text_normalize

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "  Hello\tWorld\r\n x ",
                    "A\x00B\x1fC",
                    "",
                ],
            }
        )
        out = (
            text_normalize(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["norm_text"].tolist() == ["hello world x", "a b c", ""]
        assert out["n_chars_norm"].tolist() == [13, 5, 0]


class TestCharacteristicTerm:
    def test_tf_then_rare_df_then_lex(self, ray_session):
        """tf desc first; df asc breaks tf ties; term asc breaks df ties.
        Empty docs are dropped. df counts span blocks exactly."""
        import ray.data as rd

        from deepblocker_ray.stages.textstats import characteristic_term

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "apple apple banana",       # tf: apple wins outright
                    "banana cherry",            # tf tie → rarer df wins
                    "banana zebra",             # df(zebra)=1 < df(banana)=3
                    "",                          # no tokens → dropped
                ],
            }
        )
        parts = [df.iloc[[i]] for i in range(len(df))]
        out = (
            characteristic_term(rd.from_pandas(parts), CFG)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 3]
        assert out["term"].tolist() == ["apple", "cherry", "zebra"]
        assert out["tf"].tolist() == [2, 1, 1]
        # df: apple 1, banana 3, cherry 1, zebra 1
        assert out["df"].tolist() == [1, 1, 1]

    def test_min_df_truncation_falls_back_to_one(self, ray_session):
        """Terms truncated from the broadcast df table (df < min_df) are
        scored with the rare-token fallback df=1 — same rule as SIF fit."""
        import ray.data as rd

        from deepblocker_ray.stages.textstats import characteristic_term

        df = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["common rare", "common other"],
            }
        )
        out = (
            characteristic_term(rd.from_pandas(df), CFG, min_df=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # all tf=1; truncated singletons get df=1 < df(common)=2, and the
        # lexicographically-smallest singleton wins
        assert out["term"].tolist() == ["rare", "other"]
        assert out["df"].tolist() == [1, 1]


class TestGroupQuantileFilter:
    def _ds(self, blocks=1):
        import ray.data as rd

        # en: values 1..20 → p90 rank = ceil(0.9·20) = 18 → thr 18
        # de: values 1..3  → p90 rank = ceil(2.7) = 3  → thr 3 (all kept)
        rows = [(i, "en", i) for i in range(1, 21)] + [
            (100 + i, "de", i) for i in range(1, 4)
        ]
        df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
        if blocks == 1:
            return rd.from_pandas(df)
        return rd.from_pandas(
            [p for p in np.array_split(df, blocks) if len(p)]
        )

    def test_threshold_boundary_and_cross_block(self, ray_session):
        from deepblocker_ray.stages.topk import group_quantile_filter

        out = (
            group_quantile_filter(
                self._ds(blocks=7), CFG, group_col="lang",
                value_col="n_chars", num=9, den=10, keep="le",
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        en = out[out["lang"] == "en"]["n_chars"].tolist()
        # value == threshold (18) is KEPT; 19, 20 dropped
        assert en == list(range(1, 19))
        assert out[out["lang"] == "de"]["n_chars"].tolist() == [1, 2, 3]

    def test_ge_mode(self, ray_session):
        from deepblocker_ray.stages.topk import group_quantile_filter

        out = group_quantile_filter(
            self._ds(), CFG, group_col="lang", value_col="n_chars",
            num=1, den=2, keep="ge",
        ).to_pandas()
        en = sorted(out[out["lang"] == "en"]["n_chars"])
        # p50 rank = ceil(10) = 10 → thr 10; keep ≥ 10
        assert en == list(range(10, 21))

    def test_bad_keep_rejected(self):
        import pytest

        from deepblocker_ray.stages.topk import group_quantile_filter

        with pytest.raises(ValueError):
            group_quantile_filter(
                None, CFG, group_col="g", value_col="v",
                num=1, den=2, keep="lt",
            )

    def test_bad_quantile_rejected(self):
        """num > den would IndexError past the cumsum inside a remote task;
        den <= 0 / num < 1 likewise have no defined rank. All must raise a
        clear ValueError up front, without touching the dataset."""
        import pytest

        from deepblocker_ray.stages.topk import group_quantile_filter

        for num, den in [(11, 10), (0, 10), (-1, 10), (1, 0), (1, -2)]:
            with pytest.raises(ValueError, match="num <= den"):
                group_quantile_filter(
                    None, CFG, group_col="g", value_col="v",
                    num=num, den=den,
                )


class TestArgumentGuards:
    def test_topk_k_below_one_rejected(self):
        """pandas head(-1) silently returns all-but-last rows per group —
        k < 1 must be an explicit error, not a near-full-corpus result."""
        import pytest

        from deepblocker_ray.stages.topk import group_topk

        for k in (0, -1):
            with pytest.raises(ValueError, match="k must be >= 1"):
                group_topk(
                    None, CFG, order_col="n_chars", id_col="doc_id", k=k
                )

    def test_exists_join_int32_key_on_join_path(self, ray_session):
        """Parquet-typical int32 keys must work on the hash-join fallback
        path too (the marker side is int64; the big side's key is cast to a
        temp int64 column before the join), with output schema/dtype
        unchanged."""
        import ray.data as rd

        from deepblocker_ray.stages.relational import broadcast_exists_join

        big = rd.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": np.array([1, 2, 3, 4, 5], np.int32),
                    "c_name": ["a", "b", "c", "d", "e"],
                }
            )
        )
        for cap in (2_000_000, 0):  # broadcast path, join path
            small = rd.from_pandas(pd.DataFrame({"o_custkey": [2, 4]}))
            cfg = EngineConfig(num_buckets=8, broadcast_rows_max=cap)
            out = broadcast_exists_join(
                big, small, big_key="c_custkey", small_key="o_custkey",
                cfg=cfg, anti=True,
            ).to_pandas()
            assert sorted(out["c_custkey"]) == [1, 3, 5]
            assert list(out.columns) == ["c_custkey", "c_name"]
            assert out["c_custkey"].dtype == np.int32


class TestJsonFieldExtract:
    def test_int_str_missing_null(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from deepblocker_ray.stages.textstats import json_field_extract

        props = [
            '{"k": 69}',
            '{"k":-7, "name": "bob"}',
            '{"other": 1}',       # field missing → NULL
            None,                  # null json → NULL
            '{"k": "notanum"}',    # int pattern doesn't match → NULL
        ]
        ds = rd.from_arrow(
            pa.table({"event_id": list(range(5)), "props": props})
        )
        out = (
            json_field_extract(ds, "props", "k", keep_cols=["event_id"])
            .to_pandas()
            .sort_values("event_id")
        )
        assert out["k"].tolist()[:2] == [69, -7]
        assert out["k"].isna().tolist() == [False, False, True, True, True]

        out2 = json_field_extract(
            ds, "props", "name", out_type="str", keep_cols=["event_id"]
        ).to_pandas().sort_values("event_id")
        assert out2["name"].tolist()[1] == "bob"
        assert out2["name"].isna().sum() == 4

        import pytest as _pt

        with _pt.raises(ValueError):
            json_field_extract(ds, "props", "k", out_type="float")


class TestTriangleCount:
    def _run(self, ray_session, edges):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.cluster import triangle_count

        df = pd.DataFrame(edges, columns=["left_id", "right_id"])
        out = triangle_count(
            rd.from_pandas(df), EngineConfig(num_buckets=8)
        ).to_pandas()
        return int(out["n_edges"].iloc[0]), int(out["n_triangles"].iloc[0])

    def test_known_graphs(self, ray_session):
        # triangle + pendant edge: K3 on a,b,c plus c-d
        assert self._run(
            ray_session, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
        ) == (4, 1)
        # K4 has 4 triangles
        k4 = [("a", "b"), ("a", "c"), ("a", "d"),
              ("b", "c"), ("b", "d"), ("c", "d")]
        assert self._run(ray_session, k4) == (6, 4)
        # path graph: none
        assert self._run(
            ray_session, [("a", "b"), ("b", "c"), ("c", "d")]
        ) == (3, 0)

    def test_random_graph_vs_brute(self, ray_session):
        import itertools

        rng = np.random.default_rng(31)
        nodes = [f"n{i:02d}" for i in range(20)]
        edges = sorted(
            {tuple(sorted(rng.choice(nodes, 2, replace=False)))
             for _ in range(60)}
        )
        eset = set(edges)
        want = sum(
            1 for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in eset and (x, z) in eset and (y, z) in eset
        )
        got_e, got_t = self._run(ray_session, edges)
        assert (got_e, got_t) == (len(edges), want)


class TestNtileBins:
    def test_even_split_and_remainder(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.scan import ntile_bins

        # n = 23, k = 4 → floor((rank-1)*4/23): remainder spread evenly
        df = pd.DataFrame(
            {
                "id": np.arange(23, dtype=np.int64),
                "v": np.arange(23, dtype=np.int64)[::-1].copy(),
            }
        )
        out = (
            ntile_bins(
                rd.from_pandas([p for p in np.array_split(df, 3)]),
                EngineConfig(num_buckets=4), id_col="id", value_col="v",
                k=4,
            )
            .to_pandas()
            .sort_values("rank")
        )
        want = [(r - 1) * 4 // 23 for r in range(1, 24)]
        assert out["bin"].tolist() == want
        # ranks follow value order: id 22 has v=0 → rank 1
        assert out.iloc[0]["id"] == 22


class TestIdGaps:
    def _run(self, ids, nb=4):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.scan import id_gaps

        df = pd.DataFrame({"event_id": np.asarray(ids, np.int64)})
        out = id_gaps(
            rd.from_pandas([p for p in np.array_split(df, 3)])
            if len(df) >= 3 else rd.from_pandas(df),
            EngineConfig(num_buckets=nb), id_col="event_id",
        ).to_pandas()
        if len(out) == 0:
            # Ray drops 0-row map outputs, so an all-dense input loses the
            # schema too — callers must len-check before column access
            return []
        return list(map(tuple, out.sort_values("gap_start").to_numpy()))

    def test_gaps_with_duplicates_and_cross_range(self, ray_session):
        # ids spread over [0, 1000] so the 4 value-ranges split them;
        # dup 500 must not create phantom gaps
        ids = [0, 1, 5, 500, 500, 501, 999, 1000]
        assert self._run(ids) == [
            (2, 4, 3),
            (6, 499, 494),
            (502, 998, 497),
        ]

    def test_dense_no_gaps(self, ray_session):
        assert self._run(list(range(50))) == []

    def test_python_oracle_random(self, ray_session):
        rng = np.random.default_rng(2)
        ids = np.unique(rng.integers(0, 3000, 400))
        want = [
            (int(a) + 1, int(b) - 1, int(b - a - 1))
            for a, b in zip(ids[:-1], ids[1:])
            if b > a + 1
        ]
        assert self._run(ids.tolist(), nb=8) == want


class TestRunningTotal:
    def test_prefix_sum_across_ranges(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.scan import running_total

        day = 86_400_000_000
        rows = []
        # 40 days spread across the 4 ranges, 2 events/day
        for d in range(40):
            rows.append((2 * d, d * day, 7, "a", float(d)))
            rows.append((2 * d + 1, d * day + 1, 7, "a", 0.5))
        df = pd.DataFrame(
            rows, columns=["event_id", "ts_us", "user_id", "event_type",
                           "value"]
        )
        df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
        out = (
            running_total(
                rd.from_pandas([p for p in np.array_split(df, 5)]),
                EngineConfig(num_buckets=4),
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        want_day = [d * 100 + 50 for d in range(40)]
        assert out["day_cents"].tolist() == want_day
        assert out["cum_cents"].tolist() == np.cumsum(want_day).tolist()


class TestWinsorize:
    def test_bounds_and_clip(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.scan import winsorize

        # n=21: lo rank = 20*5//100+1 = 2 → value 2; hi = 20*95//100+1=20
        df = pd.DataFrame(
            {
                "id": np.arange(21, dtype=np.int64),
                "v": np.arange(1, 22, dtype=np.int64),
            }
        )
        out = (
            winsorize(
                rd.from_pandas([p for p in np.array_split(df, 4)]),
                EngineConfig(num_buckets=4), id_col="id", value_col="v",
            )
            .to_pandas()
            .sort_values("id")
        )
        assert out["clipped"].min() == 2
        assert out["clipped"].max() == 20
        assert out.loc[out["v"] == 10, "clipped"].iloc[0] == 10
        assert len(out) == 21


class TestRangeSplits:
    def test_balanced_boundaries(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.scan import range_splits

        df = pd.DataFrame(
            {
                "rid": np.arange(100, dtype=np.int64),
                "key": np.arange(100, dtype=np.int64) * 3,
            }
        )
        out = (
            range_splits(
                rd.from_pandas([p for p in np.array_split(df, 5)]),
                EngineConfig(num_buckets=4), id_col="rid", key_col="key",
                k=4,
            )
            .to_pandas()
            .sort_values("split_idx")
        )
        # boundaries at ranks 25, 50, 75 → keys 24*3, 49*3, 74*3
        assert out["split_idx"].tolist() == [1, 2, 3]
        assert out["boundary"].tolist() == [72, 147, 222]


class TestRankFusion:
    def _mk(self, seed):
        import ray.data as rd

        r = np.random.RandomState(seed)
        rows = []
        for q in range(5):
            for rk, it in enumerate(r.choice(20, 10, replace=False)):
                rows.append((str(q), str(it), rk))
        df = pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "rank"]
        )
        return df, rd.from_pandas(df).repartition(3)

    def test_matches_pandas_borda(self, ray_session):
        from deepblocker_ray.stages.topk import rank_fusion

        da, a = self._mk(1)
        db, b = self._mk(2)
        out = (
            rank_fusion(a, b, EngineConfig(num_buckets=4), k=10)
            .to_pandas()
            .sort_values(["query_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )
        m = da.merge(
            db, on=["query_id", "neighbor_id"], how="outer",
            suffixes=("_a", "_b"),
        )
        m["fused"] = (
            m["rank_a"].fillna(10).astype(np.int64)
            + m["rank_b"].fillna(10).astype(np.int64)
        )
        m = m.sort_values(
            ["query_id", "fused", "neighbor_id"], kind="mergesort"
        )
        top = m.groupby("query_id").head(10).copy()
        top["rank"] = top.groupby("query_id").cumcount().astype(np.int64)
        want = top[
            ["query_id", "neighbor_id", "fused", "rank"]
        ].reset_index(drop=True)
        assert out.astype(str).equals(want.astype(str))

    def test_agreeing_lists_and_missing_query(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.topk import rank_fusion

        # identical lists -> fused = 2*rank; query only in one list ->
        # every item pays the penalty once
        df = pd.DataFrame(
            {
                "query_id": ["a", "a", "b"],
                "neighbor_id": ["x", "y", "z"],
                "rank": [0, 1, 0],
            }
        )
        only_a = df[df["query_id"] == "b"]
        out = rank_fusion(
            rd.from_pandas(df), rd.from_pandas(df.drop(only_a.index)),
            EngineConfig(num_buckets=4), k=2, penalty=5,
        ).to_pandas()
        got = {
            (r["query_id"], r["neighbor_id"]): (r["fused"], r["rank"])
            for _, r in out.iterrows()
        }
        assert got == {
            ("a", "x"): (0, 0),
            ("a", "y"): (2, 1),
            ("b", "z"): (5, 0),
        }

    def test_k_validation(self, ray_session):
        import pytest
        import ray.data as rd

        from deepblocker_ray.stages.topk import rank_fusion

        df = pd.DataFrame(
            {"query_id": ["a"], "neighbor_id": ["x"], "rank": [0]}
        )
        with pytest.raises(ValueError):
            rank_fusion(
                rd.from_pandas(df), rd.from_pandas(df),
                EngineConfig(num_buckets=4), k=0,
            )


class TestKendallDisagreement:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.topk import kendall_disagreement

        r = np.random.RandomState(3)
        rows_a, rows_b = [], []
        for q in range(6):
            items = [str(x) for x in r.choice(30, 10, replace=False)]
            perm = list(items)
            r.shuffle(perm)
            # ranker B sees a subset in permuted order
            sub = perm[:7]
            rows_a += [(str(q), it, i) for i, it in enumerate(items)]
            rows_b += [(str(q), it, i) for i, it in enumerate(sub)]
        cols = ["query_id", "neighbor_id", "rank"]
        da = pd.DataFrame(rows_a, columns=cols)
        db = pd.DataFrame(rows_b, columns=cols)
        out = kendall_disagreement(
            rd.from_pandas(da).repartition(2),
            rd.from_pandas(db).repartition(3),
            EngineConfig(num_buckets=4),
        ).to_pandas()
        got = {
            r2["query_id"]: (r2["n_shared"], r2["n_disc"])
            for _, r2 in out.iterrows()
        }
        for q in range(6):
            a = da[da.query_id == str(q)].set_index("neighbor_id")["rank"]
            b = db[db.query_id == str(q)].set_index("neighbor_id")["rank"]
            shared = sorted(set(a.index) & set(b.index))
            disc = sum(
                1
                for i in range(len(shared))
                for j in range(len(shared))
                if a[shared[i]] < a[shared[j]]
                and b[shared[i]] > b[shared[j]]
            )
            assert got[str(q)] == (len(shared), disc)

    def test_identical_and_reversed(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.topk import kendall_disagreement

        df = pd.DataFrame(
            {
                "query_id": ["q"] * 4,
                "neighbor_id": list("wxyz"),
                "rank": [0, 1, 2, 3],
            }
        )
        rev = df.assign(rank=[3, 2, 1, 0])
        same = kendall_disagreement(
            rd.from_pandas(df), rd.from_pandas(df),
            EngineConfig(num_buckets=4),
        ).to_pandas()
        assert tuple(same.iloc[0][["n_shared", "n_disc"]]) == (4, 0)
        flipped = kendall_disagreement(
            rd.from_pandas(df), rd.from_pandas(rev),
            EngineConfig(num_buckets=4),
        ).to_pandas()
        assert tuple(flipped.iloc[0][["n_shared", "n_disc"]]) == (4, 6)


class TestOverlapAtDepth:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.topk import overlap_at_depth

        r = np.random.RandomState(7)
        rows_a, rows_b = [], []
        for q in range(4):
            ia = [str(x) for x in r.choice(25, 8, replace=False)]
            ib = [str(x) for x in r.choice(25, 8, replace=False)]
            rows_a += [(str(q), it, i) for i, it in enumerate(ia)]
            rows_b += [(str(q), it, i) for i, it in enumerate(ib)]
        cols = ["query_id", "neighbor_id", "rank"]
        da, db = pd.DataFrame(rows_a, columns=cols), pd.DataFrame(
            rows_b, columns=cols
        )
        k = 8
        out = overlap_at_depth(
            rd.from_pandas(da).repartition(2),
            rd.from_pandas(db).repartition(2),
            EngineConfig(num_buckets=4), k=k,
        ).to_pandas()
        for q in range(4):
            a = da[da.query_id == str(q)]
            b = db[db.query_id == str(q)]
            for d in range(1, k + 1):
                want = len(
                    set(a[a["rank"] < d]["neighbor_id"])
                    & set(b[b["rank"] < d]["neighbor_id"])
                )
                got = out[
                    (out.query_id == str(q)) & (out.depth == d)
                ]["n_overlap"].iloc[0]
                assert got == want, (q, d, got, want)
        assert len(out) == 4 * k

    def test_disjoint_and_identical(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.topk import overlap_at_depth

        df = pd.DataFrame(
            {
                "query_id": ["q"] * 3,
                "neighbor_id": ["a", "b", "c"],
                "rank": [0, 1, 2],
            }
        )
        other = df.assign(neighbor_id=["x", "y", "z"])
        out = overlap_at_depth(
            rd.from_pandas(df), rd.from_pandas(df),
            EngineConfig(num_buckets=4), k=3,
        ).to_pandas().sort_values("depth")
        assert out["n_overlap"].tolist() == [1, 2, 3]
        out2 = overlap_at_depth(
            rd.from_pandas(df), rd.from_pandas(other),
            EngineConfig(num_buckets=4), k=3,
        ).to_pandas()
        assert (out2["n_overlap"] == 0).all()
