"""Edge-case tests for the event-stream operators (sessionize, window_agg,
asof_join) and the pii_scrub / repetition_stats text operators. The driver
twins are regression-covered by test_oracle_parity; these pin the boundary
semantics: gap exactly at the threshold, as-of ties and exact matches,
planted PII, crafted repetition."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)

T0 = 1_700_000_000_000_000  # epoch micros
MIN = 60_000_000


def _events_df(rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts_us", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    return df[["event_id", "ts", "user_id", "event_type", "value"]]


def _from_pandas(ray_session, df):
    import ray.data as rd

    return rd.from_pandas(df)


class TestSessionize:
    def test_gap_boundary_and_seq(self, ray_session):
        from deepblocker_ray.stages.events import sessionize

        rows = [
            # user 1: 3 events; gap of EXACTLY 30 min does NOT split
            (0, 1, T0, "view", 1.00),
            (1, 1, T0 + 30 * MIN, "view", 2.00),
            # gap of 30 min + 1 us DOES split
            (2, 1, T0 + 60 * MIN + 1, "view", 3.00),
            # user 2: single event
            (3, 2, T0, "click", 0.50),
        ]
        out = (
            sessionize(_from_pandas(ray_session, _events_df(rows)), CFG)
            .to_pandas()
            .sort_values(["user_id", "session_seq"])
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 1, 2]
        assert out["session_seq"].tolist() == [1, 2, 1]
        assert out["n_events"].tolist() == [2, 1, 1]
        assert out["sum_cents"].tolist() == [300, 300, 50]
        assert out["t_start_us"].tolist() == [T0, T0 + 60 * MIN + 1, T0]
        assert out["t_end_us"].tolist() == [
            T0 + 30 * MIN,
            T0 + 60 * MIN + 1,
            T0,
        ]

    def test_ts_tie_ordered_by_event_id(self, ray_session):
        from deepblocker_ray.stages.events import sessionize

        # two events at the identical timestamp: one session, both counted
        rows = [
            (5, 7, T0, "view", 1.25),
            (4, 7, T0, "view", 1.25),
        ]
        out = sessionize(
            _from_pandas(ray_session, _events_df(rows)), CFG
        ).to_pandas()
        assert len(out) == 1
        assert int(out["n_events"].iloc[0]) == 2
        assert int(out["sum_cents"].iloc[0]) == 250


class TestWindowAgg:
    def test_hour_windows(self, ray_session):
        from deepblocker_ray.stages.events import window_agg

        h = 60 * MIN
        base = (T0 // h) * h
        rows = [
            (0, 1, base + 1, "view", 1.00),
            (1, 1, base + h - 1, "view", 2.00),   # same window
            (2, 1, base + h, "view", 4.00),       # next window boundary
            (3, 2, base + 1, "click", 8.00),      # other type, same window
        ]
        out = (
            window_agg(_from_pandas(ray_session, _events_df(rows)), CFG)
            .to_pandas()
            .sort_values(["event_type", "window_us"])
            .reset_index(drop=True)
        )
        assert out.values.tolist() == [
            ["click", base, 1, 800],
            ["view", base, 2, 300],
            ["view", base + h, 1, 400],
        ]

    def test_partial_preaggregation_counts(self, ray_session):
        """Many events, one (type, window) key: output is one exact row."""
        from deepblocker_ray.stages.events import window_agg

        n = 500
        rows = [(i, i % 13, T0 + i, "view", 0.01) for i in range(n)]
        out = window_agg(
            _from_pandas(ray_session, _events_df(rows)), CFG
        ).to_pandas()
        assert len(out) == 1
        assert int(out["n_events"].iloc[0]) == n
        assert int(out["sum_cents"].iloc[0]) == n


class TestAsofJoin:
    def test_backward_match_ties_and_drops(self, ray_session):
        from deepblocker_ray.stages.events import asof_join

        rows = [
            # user 1: two views at the SAME ts, then a click → max event_id wins
            (10, 1, T0, "view", 0.0),
            (11, 1, T0, "view", 0.0),
            (12, 1, T0 + MIN, "click", 0.0),
            # user 1: click exactly AT a view ts → exact match allowed
            (13, 1, T0 + 5 * MIN, "view", 0.0),
            (14, 1, T0 + 5 * MIN, "click", 0.0),
            # user 2: click BEFORE any view → dropped
            (20, 2, T0, "click", 0.0),
            (21, 2, T0 + MIN, "view", 0.0),
            # user 3: view only → no output row
            (30, 3, T0, "view", 0.0),
        ]
        out = (
            asof_join(_from_pandas(ray_session, _events_df(rows)), CFG)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["event_id"].tolist() == [12, 14]
        assert out["matched_id"].tolist() == [11, 13]
        assert out["lag_us"].tolist() == [MIN, 0]

    def test_same_type_rejected(self):
        from deepblocker_ray.stages.events import asof_join

        with pytest.raises(ValueError):
            asof_join(None, CFG, left_type="view", right_type="view")


class TestPiiScrub:
    def test_planted_pii(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.textstats import pii_scrub

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "contact bob.smith+x@example.co.uk today",
                    "server at 192.168.0.1 port 8080",
                    "call +1 (555) 123-4567 now",
                    "plain text no pii",
                    None,
                ],
            }
        )
        out = (
            pii_scrub(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["scrubbed"].tolist() == [
            "contact <EMAIL> today",
            "server at <IP> port <NUM>",
            "call <PHONE> now",
            "plain text no pii",
            "",
        ]
        assert out["n_redactions"].tolist() == [1, 2, 1, 0, 0]

    def test_order_email_before_number(self, ray_session):
        """Digits inside an email are consumed by the email pattern, not
        double-counted by the number pattern."""
        import ray.data as rd

        from deepblocker_ray.stages.textstats import pii_scrub

        df = pd.DataFrame({"doc_id": [0], "text": ["a1b2@x99.com plus 42"]})
        out = pii_scrub(rd.from_pandas(df)).to_pandas()
        assert out["scrubbed"].iloc[0] == "<EMAIL> plus <NUM>"
        assert int(out["n_redactions"].iloc[0]) == 2


class TestRepetitionStats:
    def test_crafted_repetition(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.textstats import repetition_stats

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b a b a b",      # 6 words {a,b}; 5 bigrams {ab,ba}
                    "x y z",            # all distinct
                    "w",                # single word: no 2/3-grams
                    "",                 # empty
                ],
            }
        )
        out = (
            repetition_stats(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_words"].tolist() == [6, 3, 1, 0]
        np.testing.assert_allclose(
            out["dup_word_frac"], [1 - 2 / 6, 0.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(
            out["dup_2gram_frac"], [1 - 2 / 5, 0.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(
            out["dup_3gram_frac"], [1 - 2 / 4, 0.0, 0.0, 0.0]
        )


class TestValueQuantiles:
    def test_exact_ranks(self, ray_session):
        from deepblocker_ray.stages.events import value_quantiles

        # type "a": values 1..10 cents → n=10, p50=rank5=5, p90=rank9=9,
        # p99=rank10=10. type "b": single value.
        rows = [(i, 1, T0 + i, "a", (i + 1) / 100.0) for i in range(10)]
        rows += [(99, 2, T0, "b", 0.07)]
        out = (
            value_quantiles(_from_pandas(ray_session, _events_df(rows)), CFG)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert out.values.tolist() == [
            ["a", 10, 5, 9, 10],
            ["b", 1, 7, 7, 7],
        ]

    def test_duplicate_values_and_cross_batch_merge(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.events import value_quantiles

        # 100 copies of 1 cent + 1 copy of 2 cents, split over many blocks:
        # partials from different batches must merge into ONE row
        rows = [(i, i, T0 + i, "x", 0.01) for i in range(100)]
        rows += [(100, 5, T0, "x", 0.02)]
        ds = rd.from_pandas(_events_df(rows)).repartition(8)
        out = value_quantiles(ds, CFG).to_pandas()
        assert len(out) == 1
        # n=101: p50 rank 51 → 1; p99 rank ceil(99.99)=100 → 1
        assert out.values.tolist() == [["x", 101, 1, 1, 1]]


class TestBroadcastJoin:
    def _tables(self, rd):
        big = rd.from_pandas(
            pd.DataFrame({"k": [1, 2, 2, 3, 4], "v": [10, 20, 21, 30, 40]})
        )
        small = rd.from_pandas(
            pd.DataFrame({"sk": [1, 2, 2, 5], "p": ["a", "b", "c", "z"]})
        )
        return big, small

    def test_broadcast_and_hashjoin_paths_agree(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import broadcast_join

        results = []
        for cap in (1_000_000, 1):  # broadcast path, then hash-join fallback
            big, small = self._tables(rd)
            out = broadcast_join(
                big,
                small,
                big_key="k",
                small_key="sk",
                payload_cols=["p"],
                cfg=EngineConfig(broadcast_rows_max=cap),
            ).to_pandas()
            results.append(
                out.sort_values(["k", "v", "p"]).reset_index(drop=True)[
                    ["k", "v", "p"]
                ]
            )
        # inner semantics: unmatched k=3/4 drop; duplicate small keys (k=2)
        # keep multiplicity — both big k=2 rows join both small rows
        assert results[0]["k"].tolist() == [1, 2, 2, 2, 2]
        assert results[0].equals(results[1])


class TestKeepLatest:
    def test_latest_with_ties_and_partial_combine(self, ray_session):
        """Winner = max ts, tie by max event_id; correct even when one
        user's rows span several input blocks (map-side partial argmax must
        recombine exactly)."""
        from deepblocker_ray.stages.events import keep_latest

        rows = [
            # user 1: later ts wins regardless of event_id order
            (10, 1, T0 + 5 * MIN, "view", 1.0),
            (3, 1, T0 + 9 * MIN, "click", 1.0),
            # user 2: ts tie → max event_id wins
            (20, 2, T0, "view", 1.0),
            (21, 2, T0, "error", 1.0),
            # user 3: single event
            (30, 3, T0 + MIN, "signup", 1.0),
        ]
        df = _events_df(rows)
        import ray.data as rd

        # 5 single-row blocks: every partial sees one row, the exchange
        # must still pick the global winner per user
        ds = rd.from_pandas([df.iloc[[i]] for i in range(len(df))])
        out = (
            keep_latest(ds, CFG)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 2, 3]
        assert out["event_id"].tolist() == [3, 21, 30]
        assert out["event_type"].tolist() == ["click", "error", "signup"]
        assert out["ts_us"].tolist() == [T0 + 9 * MIN, T0, T0 + MIN]


class TestHoppingWindow:
    def test_overlap_and_partial_combine(self, ray_session):
        """window=2min hop=1min: each event counted in exactly 2 windows;
        sums combine across blocks; hop must divide window."""
        import ray.data as rd

        from deepblocker_ray.stages.events import window_agg

        rows = [
            (0, 1, T0, "view", 1.00),           # windows T0, T0-1min
            (1, 1, T0 + MIN, "view", 2.00),      # windows T0+1min, T0
            (2, 2, T0 + MIN, "click", 4.00),
        ]
        df = _events_df(rows)
        ds = rd.from_pandas([df.iloc[[i]] for i in range(len(df))])
        out = (
            window_agg(ds, CFG, window_minutes=2.0, hop_minutes=1.0)
            .to_pandas()
            .sort_values(["event_type", "window_us"])
            .reset_index(drop=True)
        )
        views = out[out["event_type"] == "view"]
        got = dict(zip(views["window_us"], zip(views["n_events"],
                                               views["sum_cents"])))
        B = (T0 // MIN) * MIN  # windows are EPOCH-aligned, not T0-aligned
        assert got == {
            B - MIN: (1, 100),      # event 0 only
            B: (2, 300),            # both view events
            B + MIN: (1, 200),      # event 1 only
        }
        assert out["n_events"].sum() == 6  # 3 events × 2 windows

    def test_hop_must_divide_window(self):
        import pytest

        from deepblocker_ray.stages.events import window_agg

        with pytest.raises(ValueError, match="divide"):
            window_agg(None, CFG, window_minutes=3.0, hop_minutes=2.0)

    def test_hop_zero_or_negative_rejected(self):
        """numpy int64 % 0 returns 0 (RuntimeWarning only), so hop=0 would
        pass a bare divisibility check and silently drop every event via
        np.repeat(base, 0); negative hops would crash later with an
        unrelated message. Both must be a clear ValueError."""
        import pytest

        from deepblocker_ray.stages.events import window_agg

        for hop in (0.0, -1.0):
            with pytest.raises(ValueError, match="positive"):
                window_agg(None, CFG, window_minutes=2.0, hop_minutes=hop)


class TestValueOutliers:
    def test_median_mad_and_flags(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import value_outliers

        # type A: values 1..9 dollars plus one wild 100.00 → med 5.00(500),
        # devs {400..0..400, 9500} → mad 200; outlier ⇔ dev > 600 → only 100.00
        # type B: constant 2.00 → mad 0 → any deviation is an outlier
        vals_a = [float(i) for i in range(1, 10)] + [100.0]
        vals_b = [2.0] * 5 + [2.01]
        df = pd.DataFrame(
            {
                "event_id": np.arange(16, dtype=np.int64),
                "event_type": ["A"] * 10 + ["B"] * 6,
                "value": vals_a + vals_b,
            }
        )
        parts = [p for p in np.array_split(df, 4)]
        out = (
            value_outliers(rd.from_pandas(parts), EngineConfig(num_buckets=8), k=3)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        a = out[out["event_type"] == "A"]
        assert (a["med_cents"] == 500).all()
        assert (a["mad_cents"] == 200).all()
        assert a["is_outlier"].tolist() == [False] * 9 + [True]
        b = out[out["event_type"] == "B"]
        # even n=6: lower-middle rank (6+1)//2 = 3 → med 200; mad 0
        assert (b["med_cents"] == 200).all()
        assert (b["mad_cents"] == 0).all()
        assert b["is_outlier"].tolist() == [False] * 5 + [True]

    def test_bad_k(self):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import value_outliers

        import pytest as _pt

        with _pt.raises(ValueError):
            value_outliers(None, EngineConfig(), k=-1)


class TestNgramCounts:
    def test_counts_and_boundaries(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.textstats import ngram_counts

        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b c",       # grams: "a b", "b c"
                    "c a b",       # grams: "c a", "a b"  (no cross-doc "c c")
                    "solo",        # shorter than ngram → nothing
                    "a b",         # gram: "a b"
                ],
            }
        )
        out = (
            ngram_counts(
                rd.from_pandas(docs).repartition(3),
                EngineConfig(num_buckets=8),
                ngram=2,
                min_count=2,
            )
            .to_pandas()
            .sort_values("gram")
            .reset_index(drop=True)
        )
        # only "a b" reaches count 3 ≥ 2; "b c"/"c a" have count 1
        assert out["gram"].tolist() == ["a b"]
        assert out["count"].tolist() == [3]

    def test_min_count_one_keeps_tail(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.textstats import ngram_counts

        docs = pd.DataFrame({"doc_id": [0], "text": ["x y z"]})
        out = (
            ngram_counts(
                rd.from_pandas(docs), EngineConfig(num_buckets=8),
                ngram=2, min_count=1,
            )
            .to_pandas()
            .sort_values("gram")
            .reset_index(drop=True)
        )
        assert out["gram"].tolist() == ["x y", "y z"]
        assert out["count"].tolist() == [1, 1]

    def test_bad_params(self):
        import pytest as _pt

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.textstats import ngram_counts

        for kw in (dict(ngram=0), dict(min_count=0)):
            with _pt.raises(ValueError):
                ngram_counts(None, EngineConfig(), **kw)


class TestRollingAgg:
    def test_window_and_user_head(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import rolling_agg

        ts = pd.to_datetime(
            [f"2026-01-01 00:0{i}:00" for i in range(5)] * 2
        )
        df = pd.DataFrame(
            {
                "event_id": np.arange(10, dtype=np.int64),
                "user_id": np.int64([1] * 5 + [2] * 5),
                "ts": ts,
                "value": [1.0, 2.0, 3.0, 4.0, 5.0] * 2,
            }
        )
        out = (
            rolling_agg(
                rd.from_pandas([p for p in np.array_split(df, 3)]),
                EngineConfig(num_buckets=8),
                window=3,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # user 1: sums over last-3 window = 100, 300, 600, 900, 1200 cents
        assert out.loc[:4, "roll_sum_cents"].tolist() == [
            100, 300, 600, 900, 1200
        ]
        assert out.loc[:4, "roll_n"].tolist() == [1, 2, 3, 3, 3]
        # user 2 restarts its window (segment clamp), identical values
        assert out.loc[5:, "roll_sum_cents"].tolist() == [
            100, 300, 600, 900, 1200
        ]
        assert out.loc[2, "roll_mean"] == 600 / 3

    def test_bad_window(self):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import rolling_agg

        with pytest.raises(ValueError):
            rolling_agg(None, EngineConfig(), window=0)


class TestSnapshotDiff:
    def test_added_removed_changed_and_nulls(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import snapshot_diff

        old = pd.DataFrame(
            {
                "k": np.array([1, 2, 3, 4, 5], np.int64),
                "a": ["x", "y", None, "w", "v"],
                "b": [1.5, 2.5, 3.5, 4.5, 5.5],
            }
        )
        new = pd.DataFrame(
            {
                # 1 unchanged, 2 changed (a), 3 changed (NULL→string),
                # 4 unchanged (NULL stays NULL would be same; here same vals),
                # 5 removed, 6 added
                "k": np.array([1, 2, 3, 4, 6], np.int64),
                "a": ["x", "Y", "now", "w", "new"],
                "b": [1.5, 2.5, 3.5, 4.5, 6.5],
            }
        )
        out = (
            snapshot_diff(
                rd.from_pandas(old), rd.from_pandas(new),
                EngineConfig(num_buckets=4), key_col="k",
                value_cols=["a", "b"],
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["k"].tolist() == [2, 3, 5, 6]
        assert out["status"].tolist() == ["changed", "changed", "removed", "added"]

    def test_null_vs_string_sentinel(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import snapshot_diff

        # NULL on one side vs the literal sentinel-free 'None' string on the
        # other must count as CHANGED, and NULL vs NULL as unchanged
        old = pd.DataFrame(
            {"k": np.array([1, 2], np.int64), "a": [None, None]}
        )
        new = pd.DataFrame(
            {"k": np.array([1, 2], np.int64), "a": ["None", None]}
        )
        out = (
            snapshot_diff(
                rd.from_pandas(old), rd.from_pandas(new),
                EngineConfig(num_buckets=4), key_col="k", value_cols=["a"],
            )
            .to_pandas()
        )
        assert out["k"].tolist() == [1]
        assert out["status"].tolist() == ["changed"]

    def test_duplicate_key_raises(self, ray_session):
        import numpy as np
        import pandas as pd
        import pytest as _pt
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.relational import snapshot_diff

        dup = pd.DataFrame(
            {"k": np.array([1, 1], np.int64), "a": ["x", "y"]}
        )
        ok = pd.DataFrame({"k": np.array([1], np.int64), "a": ["x"]})
        with _pt.raises(Exception, match="duplicate"):
            snapshot_diff(
                rd.from_pandas(dup), rd.from_pandas(ok),
                EngineConfig(num_buckets=1), key_col="k", value_cols=["a"],
            ).to_pandas()


class TestDebounce:
    def test_lag_rule_ties_and_segments(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import debounce

        base = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "event_id": np.arange(7, dtype=np.int64),
                "user_id": np.array([1, 1, 1, 1, 2, 1, 1], np.int64),
                "event_type": ["a", "a", "a", "b", "a", "a", "a"],
                "ts": [
                    base,            # keep (first)
                    base + 30 * s,   # drop (30s after prev)
                    base + 65 * s,   # drop — 65s after e0 (the last KEPT)
                                     # but the lag rule compares vs the
                                     # PREVIOUS EVENT e1: 35s ≤ 60
                    base,            # keep (different type)
                    base + 10 * s,   # keep (different user)
                    base + 200 * s,  # keep (135s gap)
                    base + 260 * s,  # drop (60s gap NOT > 60s — strict)
                ],
            }
        )
        out = (
            debounce(rd.from_pandas(df), EngineConfig(num_buckets=4),
                     gap_seconds=60.0)
            .to_pandas()
            .sort_values("event_id")
        )
        # lag rule: e2 is 35s after e1 (dropped or not) → dropped;
        # e6 is exactly 60s after e5 → dropped (strict >)
        assert out["event_id"].tolist() == [0, 3, 4, 5]

    def test_bad_gap(self):
        import pytest as _pt

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import debounce

        with _pt.raises(ValueError):
            debounce(None, EngineConfig(), gap_seconds=0)


class TestValueHistogram:
    def test_integer_edges_and_counts(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import value_histogram

        # cents from -100 to 349 → span 450, 4 bins → width ceil(450/4)=113
        vals = np.arange(-100, 350, dtype=np.int64)
        df = pd.DataFrame({"value": vals / 100.0})
        out = (
            value_histogram(
                rd.from_pandas([p for p in np.array_split(df, 3)]),
                EngineConfig(num_buckets=4), n_bins=4,
            )
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        width = (349 - (-100) + 4) // 4  # 113
        assert out["bin"].tolist() == [0, 1, 2, 3]
        assert out["lo_cents"].tolist() == [-100 + i * width for i in range(4)]
        assert out["hi_cents"].tolist() == [
            -100 + (i + 1) * width for i in range(4)
        ]
        assert out["n"].sum() == len(vals)
        assert out["n"].tolist()[:3] == [width, width, width]

    def test_single_value_and_bad_bins(self, ray_session):
        import pytest as _pt
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import value_histogram

        df = pd.DataFrame({"value": [2.0, 2.0, 2.0]})
        out = value_histogram(
            rd.from_pandas(df), EngineConfig(num_buckets=4), n_bins=5
        ).to_pandas()
        assert out["bin"].tolist() == [0]
        assert out["n"].tolist() == [3]
        with _pt.raises(ValueError):
            value_histogram(None, EngineConfig(), n_bins=0)


class TestWindowDistinct:
    def test_distinct_across_batches(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import window_distinct

        h = 3_600_000_000
        base = (T0 // h) * h
        rows = [
            # window 0, view: users 1,1,2 → 2 distinct (dup across batches)
            (0, 1, base + 1, "view", 0.0),
            (1, 1, base + 2, "view", 0.0),
            (2, 2, base + 3, "view", 0.0),
            # window 0, click: user 1
            (3, 1, base + 4, "click", 0.0),
            # window 1, view: users 1,3
            (4, 1, base + h + 1, "view", 0.0),
            (5, 3, base + h + 2, "view", 0.0),
        ]
        out = (
            window_distinct(
                _from_pandas(ray_session, _events_df(rows)), CFG
            )
            .to_pandas()
            .sort_values(["event_type", "window_us"])
            .reset_index(drop=True)
        )
        assert list(map(tuple, out.to_numpy())) == [
            ("click", base, 1),
            ("view", base, 2),
            ("view", base + h, 2),
        ]


class TestFunnel:
    def test_window_boundaries_and_order(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import funnel

        w = 60 * MIN
        rows = [
            # user 1: view at T0; purchase exactly at +60min → converted
            (0, 1, T0, "view", 0.0),
            (1, 1, T0 + w, "purchase", 0.0),
            # user 2: purchase BEFORE the view → not converted
            (2, 2, T0 - 1, "purchase", 0.0),
            (3, 2, T0, "view", 0.0),
            # user 3: purchase 1us past window → not converted
            (4, 3, T0, "view", 0.0),
            (5, 3, T0 + w + 1, "purchase", 0.0),
            # user 4: earliest view counts, second view's window does NOT
            (6, 4, T0, "view", 0.0),
            (7, 4, T0 + 2 * w, "view", 0.0),
            (8, 4, T0 + 2 * w + 1, "purchase", 0.0),
            # user 5: purchase only → absent from output
            (9, 5, T0, "purchase", 0.0),
        ]
        out = (
            funnel(
                _from_pandas(ray_session, _events_df(rows)), CFG,
                first_type="view", then_type="purchase",
                within_minutes=60.0,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [1, 2, 3, 4]
        assert out["converted"].tolist() == [True, False, False, False]
        assert out["ts_a_us"].tolist() == [T0, T0, T0, T0]

    def test_same_steps_rejected(self):
        import pytest as _pt

        from deepblocker_ray.stages.events import funnel

        with _pt.raises(ValueError):
            funnel(None, CFG, first_type="view", then_type="view")


class TestRetention:
    def test_cohorts_and_offsets(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import retention

        P = 7 * 86_400_000_000
        base = (T0 // P) * P
        rows = [
            # user 1: weeks 0 and 2 (relative to its own first week)
            (0, 1, base + 1, "view", 0.0),
            (1, 1, base + 2 * P + 1, "view", 0.0),
            (2, 1, base + 2 * P + 2, "view", 0.0),  # dup (user, period)
            # user 2: same cohort, week 0 only
            (3, 2, base + 5, "view", 0.0),
            # user 3: later cohort (week 1), active weeks 1 and 2
            (4, 3, base + P + 1, "view", 0.0),
            (5, 3, base + 2 * P + 3, "view", 0.0),
        ]
        out = (
            retention(
                _from_pandas(ray_session, _events_df(rows)), CFG,
                period_days=7.0,
            )
            .to_pandas()
            .sort_values(["cohort_us", "period_offset"])
            .reset_index(drop=True)
        )
        assert list(map(tuple, out.to_numpy())) == [
            (base, 0, 2),          # users 1,2
            (base, 2, 1),          # user 1
            (base + P, 0, 1),      # user 3
            (base + P, 1, 1),      # user 3
        ]


class TestTransitionCounts:
    def _run(self, ray_session, rows):
        import ray.data as rd

        from deepblocker_ray.stages.events import transition_counts

        out = transition_counts(
            rd.from_pandas(_events_df(rows)), CFG
        ).to_pandas()
        if len(out) == 0:
            return {}
        return {
            (r.from_type, r.to_type): int(r.n_transitions)
            for r in out.itertuples()
        }

    def test_basic_bigrams(self, ray_session):
        rows = [
            (1, 10, T0 + 0, "a", 0.0),
            (2, 10, T0 + 1, "b", 0.0),
            (3, 10, T0 + 2, "a", 0.0),
            (4, 20, T0 + 0, "a", 0.0),
            (5, 20, T0 + 5, "b", 0.0),
        ]
        assert self._run(ray_session, rows) == {
            ("a", "b"): 2,
            ("b", "a"): 1,
        }

    def test_ts_tie_breaks_on_event_id(self, ray_session):
        rows = [
            (9, 10, T0, "x", 0.0),
            (3, 10, T0, "y", 0.0),  # same ts: order = event_id → y before x
            (5, 10, T0, "z", 0.0),
        ]
        assert self._run(ray_session, rows) == {
            ("y", "z"): 1,
            ("z", "x"): 1,
        }

    def test_null_types_dropped_but_not_bridged(self, ray_session):
        rows = [
            (1, 10, T0 + 0, "a", 0.0),
            (2, 10, T0 + 1, None, 0.0),
            (3, 10, T0 + 2, "b", 0.0),
        ]
        # a→NULL and NULL→b both dropped; a→b must NOT appear (lag rule,
        # not gap-bridging)
        assert self._run(ray_session, rows) == {}

    def test_single_event_users_and_empty(self, ray_session):
        rows = [(1, 10, T0, "a", 0.0), (2, 20, T0, "b", 0.0)]
        assert self._run(ray_session, rows) == {}
        assert self._run(ray_session, []) == {}


class TestClusterContingency:
    def _run(self, ray_session, pred_rows, lab_rows, cfg=CFG):
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import cluster_contingency

        pred = rd.from_pandas(
            pd.DataFrame(pred_rows, columns=["doc_id", "cluster_id"])
        )
        lab = rd.from_pandas(
            pd.DataFrame(lab_rows, columns=["vec_id", "label"])
        )
        out = cluster_contingency(pred, lab, cfg=cfg).to_pandas()
        return sorted(
            (r.cluster_id, int(r.label), int(r.n_cl), int(r.n_c), int(r.n_l))
            for r in out.itertuples()
        )

    PRED = [("1", "c1"), ("2", "c1"), ("3", "c1"), ("4", "c2"), ("5", "c2")]
    LAB = [(1, 7), (2, 7), (3, 8), (4, 8), (5, 8)]
    WANT = [
        ("c1", 7, 2, 3, 2),
        ("c1", 8, 1, 3, 3),
        ("c2", 8, 2, 2, 3),
    ]

    def test_cells_and_marginals(self, ray_session):
        assert self._run(ray_session, self.PRED, self.LAB) == self.WANT

    def test_inner_join_scope(self, ray_session):
        # item 9 only in pred, item 5 only in labels → both excluded;
        # marginals count joined items only
        pred = self.PRED[:4] + [("9", "c9")]
        want = [
            ("c1", 7, 2, 3, 2),
            ("c1", 8, 1, 3, 2),
            ("c2", 8, 1, 1, 2),
        ]
        assert self._run(ray_session, pred, self.LAB) == want

    def test_join_fallback_matches_broadcast(self, ray_session):
        small = EngineConfig(num_buckets=8, broadcast_rows_max=2)
        assert self._run(
            ray_session, self.PRED, self.LAB, cfg=small
        ) == self.WANT


class TestSessionPaths:
    def _run(self, ray_session, rows, gap_minutes=30.0):
        import ray.data as rd

        from deepblocker_ray.stages.events import session_paths

        out = session_paths(
            rd.from_pandas(_events_df(rows)), CFG, gap_minutes=gap_minutes
        ).to_pandas()
        return sorted(
            (int(r.user_id), int(r.session_seq), r.path, int(r.n_events))
            for r in out.itertuples()
        )

    def test_paths_split_on_gap(self, ray_session):
        rows = [
            (1, 10, T0 + 0 * MIN, "a", 0.0),
            (2, 10, T0 + 5 * MIN, "b", 0.0),
            (3, 10, T0 + 99 * MIN, "c", 0.0),  # > 30 min gap → new session
            (4, 20, T0, "z", 0.0),
        ]
        assert self._run(ray_session, rows) == [
            (10, 1, "a>b", 2),
            (10, 2, "c", 1),
            (20, 1, "z", 1),
        ]

    def test_null_type_renders_empty_and_order_ties(self, ray_session):
        rows = [
            (7, 10, T0, None, 0.0),
            (2, 10, T0, "b", 0.0),  # same ts → event_id order: 2 before 7
            (9, 10, T0 + MIN, "c", 0.0),
        ]
        assert self._run(ray_session, rows) == [(10, 1, "b>>c", 3)]

    def test_matches_sessionize_boundaries(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.events import session_paths, sessionize

        rng = np.random.default_rng(3)
        rows = [
            (i, int(rng.integers(5)), T0 + int(rng.integers(0, 300)) * MIN,
             str(rng.choice(["a", "b", "c"])), 0.0)
            for i in range(200)
        ]
        df = _events_df(rows)
        sp = session_paths(rd.from_pandas(df), CFG).to_pandas()
        sz = sessionize(rd.from_pandas(df), CFG).to_pandas()
        key = ["user_id", "session_seq"]
        sp = sp.sort_values(key).reset_index(drop=True)
        sz = sz.sort_values(key).reset_index(drop=True)
        assert sp[key + ["n_events"]].equals(sz[key + ["n_events"]])
        assert (
            sp["path"].str.count(">") + 1 == sp["n_events"]
        ).all()


class TestPivotCounts:
    def _run(self, ray_session, rows, types=("a", "b")):
        import ray.data as rd

        from deepblocker_ray.stages.events import pivot_counts

        out = pivot_counts(
            rd.from_pandas(_events_df(rows)), CFG, types=types
        ).to_pandas()
        return out.sort_values("user_id").reset_index(drop=True)

    def test_counts_other_and_total(self, ray_session):
        rows = [
            (1, 10, T0, "a", 0.0),
            (2, 10, T0, "a", 0.0),
            (3, 10, T0, "b", 0.0),
            (4, 10, T0, "zzz", 0.0),  # unknown type → n_other
            (5, 10, T0, None, 0.0),   # NULL type → n_other
            (6, 20, T0, "b", 0.0),
        ]
        out = self._run(ray_session, rows)
        assert list(out.columns) == [
            "user_id", "n_a", "n_b", "n_other", "n_total"
        ]
        assert out.values.tolist() == [
            [10, 2, 1, 2, 5],
            [20, 0, 1, 0, 1],
        ]

    def test_fixed_schema_with_absent_type(self, ray_session):
        rows = [(1, 10, T0, "a", 0.0)]
        out = self._run(ray_session, rows, types=("a", "never_seen"))
        assert list(out.columns) == [
            "user_id", "n_a", "n_never_seen", "n_other", "n_total"
        ]
        assert out.values.tolist() == [[10, 1, 0, 0, 1]]

    def test_duplicate_or_empty_types_rejected(self, ray_session):
        with pytest.raises(ValueError):
            self._run(ray_session, [], types=("a", "a"))
        with pytest.raises(ValueError):
            self._run(ray_session, [], types=())


class TestResampleFfill:
    def _run(self, ray_session, rows, period_minutes=60.0):
        import ray.data as rd

        from deepblocker_ray.stages.events import resample_ffill

        out = resample_ffill(
            rd.from_pandas(_events_df(rows)), CFG,
            period_minutes=period_minutes,
        ).to_pandas()
        return sorted(
            (int(r.user_id), int(r.period_us), int(r.cents))
            for r in out.itertuples()
        )

    def test_forward_fill_and_alignment(self, ray_session):
        H = 60 * MIN
        base = (T0 // H) * H  # aligned hour at/below T0
        rows = [
            (1, 10, base + 10 * MIN, "a", 1.0),   # 100 cents
            (2, 10, base + 70 * MIN, "a", 2.5),   # 250 cents
            (3, 10, base + 200 * MIN, "a", 4.0),  # 400 cents
        ]
        # span [base+10m, base+200m] → aligned boundaries h1, h2, h3
        got = self._run(ray_session, rows)
        assert got == [
            (10, base + H, 100),       # h1: only the 10m event ≤ it
            (10, base + 2 * H, 250),   # h2: 70m event is latest
            (10, base + 3 * H, 250),   # h3: still the 70m event
        ]

    def test_tie_on_ts_takes_max_event_id(self, ray_session):
        H = 60 * MIN
        base = (T0 // H) * H
        rows = [
            (5, 10, base + H, "a", 1.0),
            (9, 10, base + H, "a", 7.0),  # same ts, higher id wins → 700
            (2, 10, base + H, "a", 3.0),
        ]
        assert self._run(ray_session, rows) == [(10, base + H, 700)]

    def test_no_aligned_boundary_in_span(self, ray_session):
        H = 60 * MIN
        base = (T0 // H) * H
        rows = [
            (1, 10, base + 5 * MIN, "a", 1.0),
            (2, 10, base + 20 * MIN, "a", 2.0),
        ]
        assert self._run(ray_session, rows) == []

    def test_bad_period_rejected(self, ray_session):
        with pytest.raises(ValueError):
            self._run(ray_session, [], period_minutes=0)


class TestGapStats:
    def _run(self, ray_session, rows):
        import ray.data as rd

        from deepblocker_ray.stages.events import gap_stats

        out = gap_stats(rd.from_pandas(_events_df(rows)), CFG).to_pandas()
        return sorted(
            (int(r.user_id), int(r.n_gaps), int(r.median_gap_us),
             int(r.max_gap_us))
            for r in out.itertuples()
        )

    def test_lower_median_rule(self, ray_session):
        rows = [
            (1, 10, T0 + 0 * MIN, "a", 0.0),
            (2, 10, T0 + 1 * MIN, "a", 0.0),   # gap 1
            (3, 10, T0 + 4 * MIN, "a", 0.0),   # gap 3
            (4, 10, T0 + 9 * MIN, "a", 0.0),   # gap 5
            (5, 10, T0 + 16 * MIN, "a", 0.0),  # gap 7
        ]
        # gaps [1,3,5,7] → lower median = sorted[(4-1)//2] = index 1 = 3
        assert self._run(ray_session, rows) == [(10, 4, 3 * MIN, 7 * MIN)]

    def test_single_event_user_excluded_and_ties(self, ray_session):
        rows = [
            (1, 10, T0, "a", 0.0),
            (7, 20, T0, "a", 0.0),
            (3, 20, T0, "a", 0.0),  # same ts → gap 0 (order by event_id)
            (9, 20, T0 + MIN, "a", 0.0),
        ]
        assert self._run(ray_session, rows) == [(20, 2, 0, MIN)]


class TestWindowJoin:
    def _run(self, ray_session, rows, **kw):
        import ray.data as rd

        from deepblocker_ray.stages.events import window_join

        out = window_join(
            rd.from_pandas(_events_df(rows)), CFG,
            left_type="purchase", right_type="click", **kw
        ).to_pandas()
        return sorted(
            (int(r.left_id), int(r.right_id), int(r.lag_us))
            for r in out.itertuples()
        )

    def test_all_matches_within_window(self, ray_session):
        rows = [
            (1, 10, T0 + 0 * MIN, "click", 0.0),
            (2, 10, T0 + 30 * MIN, "click", 0.0),
            (3, 10, T0 + 61 * MIN, "click", 0.0),
            (4, 10, T0 + 61 * MIN, "purchase", 0.0),   # matches 2,3 (1 is 61m back)
            (5, 10, T0 + 200 * MIN, "purchase", 0.0),  # nothing in window
            (6, 20, T0 + 61 * MIN, "purchase", 0.0),   # other user: no clicks
        ]
        assert self._run(ray_session, rows) == [
            (4, 2, 31 * MIN),
            (4, 3, 0),
        ]

    def test_window_boundary_inclusive(self, ray_session):
        rows = [
            (1, 10, T0, "click", 0.0),
            (2, 10, T0 + 60 * MIN, "purchase", 0.0),  # exactly Δ back → in
        ]
        assert self._run(ray_session, rows) == [(2, 1, 60 * MIN)]

    def test_matches_brute_force(self, ray_session):
        rng = np.random.default_rng(13)
        rows = []
        for i in range(400):
            rows.append(
                (i, int(rng.integers(6)),
                 T0 + int(rng.integers(0, 500)) * MIN,
                 str(rng.choice(["click", "purchase", "view"])), 0.0)
            )
        got = self._run(ray_session, rows)
        lb = 60 * MIN
        want = sorted(
            (l[0], r[0], l[2] - r[2])
            for l in rows if l[3] == "purchase"
            for r in rows if r[3] == "click" and r[1] == l[1]
            and 0 <= l[2] - r[2] <= lb
        )
        assert got == want

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            self._run(ray_session, [], lookback_minutes=0)
        from deepblocker_ray.stages.events import window_join

        with pytest.raises(ValueError):
            window_join(None, CFG, left_type="x", right_type="x")


class TestReviewFixes:
    def test_pivot_rejects_builtin_collisions(self, ray_session):
        from deepblocker_ray.stages.events import pivot_counts

        with pytest.raises(ValueError):
            pivot_counts(None, CFG, types=("a", "other"))
        with pytest.raises(ValueError):
            pivot_counts(None, CFG, types=("total",))

    def test_contingency_null_labels_excluded(self, ray_session):
        """Items with NULL gold labels are excluded entirely — cells AND
        both marginals stay internally consistent (sum(n_cl) == n_c)."""
        import ray.data as rd

        from deepblocker_ray.pipelines.evaluate import cluster_contingency

        pred = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": ["1", "2", "3"], "cluster_id": ["c", "c", "c"]}
            )
        )
        lab = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": [1, 2, 3], "label": pd.array([7, None, 7],
                                                        dtype="Int64")}
            )
        )
        out = cluster_contingency(pred, lab, cfg=CFG).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["cluster_id"], int(r["label"]), int(r["n_cl"]),
                int(r["n_c"]), int(r["n_l"])) == ("c", 7, 2, 2, 2)


class TestSkyline:
    def _brute(self, pts):
        out = []
        for i, (t, c) in enumerate(pts):
            dom = any(
                (t2 <= t and c2 >= c and (t2 < t or c2 > c))
                for j, (t2, c2) in enumerate(pts) if j != i
            )
            if not dom:
                out.append(i)
        return out

    def test_frontier_matches_brute_force_with_dups(self):
        from deepblocker_ray.stages.events import _frontier_2d

        rng = np.random.default_rng(21)
        ts = rng.integers(0, 12, 300).astype(np.int64)
        cents = rng.integers(0, 12, 300).astype(np.int64)  # many exact dups
        keep = _frontier_2d(ts, cents)
        want = set(self._brute(list(zip(ts, cents))))
        assert set(np.nonzero(keep)[0]) == want

    def test_distributed_merge_equals_single_pass(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.events import _frontier_2d, skyline

        rng = np.random.default_rng(22)
        n = 500
        rows = [
            (i, int(rng.integers(9)), T0 + int(rng.integers(0, 1000)) * MIN,
             "purchase", float(rng.integers(0, 50)) / 7)
            for i in range(n)
        ]
        # many small blocks to force a real local→merge path
        ds = rd.from_pandas(_events_df(rows)).repartition(16)
        out = skyline(ds, CFG).to_pandas()
        ts = np.array([r[2] for r in rows], np.int64)
        cents = np.round(
            np.array([r[4] for r in rows]) * 100
        ).astype(np.int64)
        keep = _frontier_2d(ts, cents)
        want = sorted(np.array([r[0] for r in rows])[keep].tolist())
        assert sorted(out["event_id"].tolist()) == want


class TestGroupMode:
    def test_tie_breaks_on_type_asc_and_nulls_excluded(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.events import group_mode

        rows = [
            (1, 10, T0, "b", 0.0),
            (2, 10, T0, "b", 0.0),
            (3, 10, T0, "a", 0.0),
            (4, 10, T0, "a", 0.0),   # tie a vs b → 'a' wins (type ASC)
            (5, 10, T0, None, 0.0),  # NULLs excluded from counting
            (6, 20, T0, None, 0.0),  # all-null user → no row
            (7, 30, T0, "z", 0.0),
        ]
        out = group_mode(
            rd.from_pandas(_events_df(rows)), CFG
        ).to_pandas().sort_values("user_id")
        assert list(
            zip(out["user_id"], out["mode_type"], out["n"].astype(int))
        ) == [(10, "a", 2), (30, "z", 1)]


class TestSCD2:
    def _ds(self, rows):
        import ray.data as rd

        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id"]
        )
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        return rd.from_pandas(df)

    def test_intervals(self, ray_session):
        from deepblocker_ray.stages.events import scd2_intervals

        rows = [
            (1, "2024-01-01", 7),
            (2, "2024-01-03", 7),
            (3, "2024-01-02", 7),
            (4, "2024-01-05", 9),
        ]
        out = (
            scd2_intervals(self._ds(rows), EngineConfig(num_buckets=4))
            .to_pandas()
            .sort_values(["user_id", "valid_from_us"])
        )
        us = lambda s: int(pd.Timestamp(s).value // 1000)
        got = list(
            map(tuple, out[["event_id", "valid_from_us", "valid_to_us"]].to_numpy())
        )
        # user 7 ordered by ts: e1 → e3 → e2 (chain), e2 open; user 9: open
        assert got == [
            (1, us("2024-01-01"), us("2024-01-02")),
            (3, us("2024-01-02"), us("2024-01-03")),
            (2, us("2024-01-03"), -1),
            (4, us("2024-01-05"), -1),
        ]

    def test_ts_tie_breaks_by_event_id(self, ray_session):
        from deepblocker_ray.stages.events import scd2_intervals

        rows = [(5, "2024-02-01", 1), (4, "2024-02-01", 1)]
        out = (
            scd2_intervals(self._ds(rows), EngineConfig(num_buckets=4))
            .to_pandas()
            .sort_values("event_id")
        )
        # same ts: event 4 precedes event 5; 4 closes at 5's ts, 5 open
        assert out.loc[out["event_id"] == 4, "valid_to_us"].iloc[0] != -1
        assert out.loc[out["event_id"] == 5, "valid_to_us"].iloc[0] == -1


class TestNearestJoin:
    def _run(self, rows):
        from deepblocker_ray.stages.events import nearest_event_join

        return (
            nearest_event_join(_from_pandas(None, _events_df(rows)), CFG)
            .to_pandas()
            .set_index("event_id")
        )

    def test_direction_pick_and_ties(self, ray_session):
        rows = [
            # user 1: views at T0 and T0+10min; clicks between
            (1, 1, T0, "view", 0.0),
            (2, 1, T0 + 10 * MIN, "view", 0.0),
            (3, 1, T0 + 3 * MIN, "click", 0.0),   # nearer backward (3<7)
            (4, 1, T0 + 7 * MIN, "click", 0.0),   # nearer forward (3<7)
            (5, 1, T0 + 5 * MIN, "click", 0.0),   # exact tie → backward
            # user 2: no views → clicks drop
            (6, 2, T0, "click", 0.0),
        ]
        out = self._run(rows)
        assert out.loc[3, "matched_id"] == 1
        assert out.loc[3, "delta_us"] == -3 * MIN
        assert out.loc[4, "matched_id"] == 2
        assert out.loc[4, "delta_us"] == 3 * MIN
        assert out.loc[5, "matched_id"] == 1     # tie → backward
        assert out.loc[5, "delta_us"] == -5 * MIN
        assert 6 not in out.index

    def test_same_ts_duplicates(self, ray_session):
        rows = [
            (1, 1, T0, "view", 0.0),
            (2, 1, T0, "view", 0.0),       # same ts: backward takes MAX id
            (3, 1, T0, "click", 0.0),
            (4, 1, T0 + MIN, "view", 0.0),
        ]
        out = self._run(rows)
        assert out.loc[3, "matched_id"] == 2
        assert out.loc[3, "delta_us"] == 0


class TestEventRuns:
    def test_runs_collapse_and_null_excluded(self, ray_session):
        from deepblocker_ray.stages.events import event_runs

        rows = [
            (1, 1, T0 + 0 * MIN, "a", 0.0),
            (2, 1, T0 + 1 * MIN, "a", 0.0),
            (3, 1, T0 + 2 * MIN, None, 0.0),   # excluded — a-runs merge?
            (4, 1, T0 + 3 * MIN, "a", 0.0),    # ...yes: still run 0
            (5, 1, T0 + 4 * MIN, "b", 0.0),
            (6, 1, T0 + 5 * MIN, "a", 0.0),
            (7, 2, T0, "b", 0.0),
        ]
        out = (
            event_runs(_from_pandas(None, _events_df(rows)), CFG)
            .to_pandas()
            .sort_values(["user_id", "run_idx"])
            .reset_index(drop=True)
        )
        got = list(
            map(
                tuple,
                out[
                    ["user_id", "run_idx", "event_type", "n_events"]
                ].to_numpy(),
            )
        )
        assert got == [
            (1, 0, "a", 3),
            (1, 1, "b", 1),
            (1, 2, "a", 1),
            (2, 0, "b", 1),
        ]
        r0 = out.iloc[0]
        assert r0["start_us"] == T0 and r0["end_us"] == T0 + 3 * MIN


class TestTimeHistogram:
    def test_epoch_dow_hour(self, ray_session):
        from deepblocker_ray.stages.events import time_histogram

        # 1970-01-01 00:xx was a THURSDAY (dow 4, Sunday=0)
        rows = [
            (1, 1, 0, "a", 0.0),                       # Thu 00
            (2, 1, 3_600_000_000, "a", 0.0),           # Thu 01
            (3, 1, 3 * 86_400_000_000, "a", 0.0),      # Sun 00 (Jan 4)
            (4, 1, 3 * 86_400_000_000 + 1, "a", 0.0),  # Sun 00
        ]
        out = (
            time_histogram(_from_pandas(None, _events_df(rows)), CFG)
            .to_pandas()
        )
        got = {(d, h): n for d, h, n in out.to_numpy()}
        assert got == {(4, 0): 1, (4, 1): 1, (0, 0): 2}


class TestAttribution:
    def test_window_edges_and_split(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import attribution

        base = pd.Timestamp("2026-01-01")
        h = pd.Timedelta(hours=1)
        df = pd.DataFrame(
            {
                "event_id": np.arange(8, dtype=np.int64),
                "user_id": np.array([1, 1, 1, 1, 1, 2, 2, 3], np.int64),
                "event_type": [
                    "click",     # e0: exactly at conv-72h -> INSIDE
                    "view",      # e1: inside
                    "click",     # e2: exactly at conv ts -> EXCLUDED
                    "purchase",  # e3: conversion, 2 touches
                    "click",     # e4: after conversion -> excluded
                    "click",     # e5: other user's touch
                    "purchase",  # e6: user 2, 1 touch
                    "purchase",  # e7: user 3, zero touches -> dropped
                ],
                "ts": [
                    base,                # = e3.ts - 72h
                    base + 10 * h,
                    base + 72 * h,       # = e3.ts
                    base + 72 * h,
                    base + 73 * h,
                    base + 71 * h,
                    base + 72 * h,
                    base + 72 * h,
                ],
                "value": [0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 7.77, 5.0],
                "props": ["{}"] * 8,
            }
        )
        out = (
            attribution(
                rd.from_pandas(df), EngineConfig(num_buckets=4),
                lookback_hours=72.0,
            )
            .to_pandas()
            .sort_values(["purchase_id", "touch_id"])
            .reset_index(drop=True)
        )
        assert list(out["purchase_id"]) == [3, 3, 6]
        assert list(out["touch_id"]) == [0, 1, 5]
        assert list(out["n_touches"]) == [2, 2, 1]
        assert list(out["credit_cents"]) == [500.0, 500.0, 777.0]

    def test_empty_sides(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import attribution

        df = pd.DataFrame(
            {
                "event_id": np.array([0], np.int64),
                "user_id": np.array([1], np.int64),
                "event_type": ["purchase"],
                "ts": [pd.Timestamp("2026-01-01")],
                "value": [1.0],
                "props": ["{}"],
            }
        )
        out = attribution(
            rd.from_pandas(df), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert len(out) == 0


class TestGroupRegression:
    def test_matches_closed_form(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import group_regression

        base = pd.Timestamp("2026-01-01")
        h = pd.Timedelta(hours=1)
        # type a: y = 100*x + noise-free line in cents over 4 hours
        # type b: single x value -> NULL slope/intercept
        df = pd.DataFrame(
            {
                "event_id": np.arange(6, dtype=np.int64),
                "user_id": np.ones(6, np.int64),
                "event_type": ["a", "a", "a", "a", "b", "b"],
                "ts": [base, base + h, base + 2 * h, base + 3 * h,
                       base, base],
                "value": [1.0, 2.0, 3.0, 4.0, 9.0, 11.0],
                "props": ["{}"] * 6,
            }
        )
        out = (
            group_regression(rd.from_pandas(df), EngineConfig(num_buckets=4))
            .to_pandas()
            .set_index("event_type")
        )
        a = out.loc["a"]
        assert a["n"] == 4
        # exact line: slope 100 cents/hour
        assert a["slope"] == pytest.approx(100.0, abs=1e-9)
        x0 = (base - pd.Timestamp("1970-01-01")).value // int(3.6e12)
        assert a["intercept"] == pytest.approx(100.0 - 100.0 * x0, rel=1e-12)
        b = out.loc["b"]
        assert b["n"] == 2
        assert pd.isna(b["slope"]) and pd.isna(b["intercept"])


class TestLateEvents:
    def test_matches_pandas_replay(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import late_events
        from deepblocker_ray.stages.sampling import _id_hashes
        import pyarrow as pa

        base = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        n = 50
        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": [base + int(x) * s for x in rng.integers(0, 40, n)],
            }
        )
        out = (
            late_events(rd.from_pandas(df), EngineConfig(num_buckets=4))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # oracle: replay in (hash, id) order, running max
        h = _id_hashes(pa.array([str(i) for i in range(n)]), 1)
        order = np.lexsort((np.arange(n), h))
        ts = (
            df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        )[order]
        exp = []
        wm = None
        for pos, i in enumerate(order):
            if wm is not None and ts[pos] < wm:
                exp.append((i, int(wm - ts[pos])))
            wm = ts[pos] if wm is None else max(wm, ts[pos])
        exp.sort()
        assert list(map(tuple, out[["event_id", "lateness_us"]].values)) \
            == exp
        assert len(exp) > 0  # the shuffled replay must produce lateness

    def test_empty(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import late_events

        df = pd.DataFrame(
            {"event_id": pd.Series(dtype=np.int64),
             "ts": pd.Series(dtype="datetime64[us]")}
        )
        out = late_events(
            rd.from_pandas(df), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert len(out) == 0


class TestABTest:
    def test_counts_and_z(self, ray_session):
        import math

        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import ab_test

        # users 0,2 variant A (0 converts), users 1,3,5 variant B (2 convert)
        rows = [
            (0, "view"), (0, "purchase"),
            (2, "click"),
            (1, "purchase"), (1, "purchase"),
            (3, "view"),
            (5, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=["user_id", "event_type"])
        out = ab_test(
            rd.from_pandas(df), EngineConfig(num_buckets=4)
        ).to_pandas()
        r = out.iloc[0]
        assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (2, 1, 3, 2)
        p = 3.0 / 5.0
        z = (2.0 / 3.0 - 1.0 / 2.0) / math.sqrt(
            p * (1.0 - p) * (1.0 / 2.0 + 1.0 / 3.0)
        )
        assert r["z"] == z

    def test_degenerate_null(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import ab_test

        # nobody converts -> pooled p = 0 -> NULL z
        df = pd.DataFrame(
            [(0, "view"), (1, "view")], columns=["user_id", "event_type"]
        )
        out = ab_test(
            rd.from_pandas(df), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert pd.isna(out.iloc[0]["z"])


class TestFunnelSteps:
    def _ds(self, rows):
        import ray.data as rd

        df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
        df["event_id"] = np.arange(len(df), dtype=np.int64)
        df["value"] = 0.0
        df["props"] = "{}"
        return rd.from_pandas(df)

    def test_levels_and_window(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import funnel_steps

        base = pd.Timestamp("2026-01-01")
        h = pd.Timedelta(hours=1)
        rows = [
            # user 1: full funnel within 24h of earliest A
            (1, "A", base), (1, "B", base + h), (1, "C", base + 2 * h),
            # user 2: B exactly at t1 (not strictly after) -> level 1
            (2, "A", base), (2, "B", base),
            # user 3: C before B -> greedy order blocks it -> level 2
            (3, "A", base), (3, "C", base + h), (3, "B", base + 2 * h),
            # user 4: B outside the 24h window of earliest A -> level 1
            (4, "A", base), (4, "B", base + 25 * h),
            # user 5: no A at all -> absent
            (5, "B", base), (5, "C", base + h),
            # user 6: B at exactly t1+24h (inclusive end) -> level 2
            (6, "A", base), (6, "B", base + 24 * h),
        ]
        out = (
            funnel_steps(
                self._ds(rows), EngineConfig(num_buckets=4),
                steps=("A", "B", "C"), window_hours=24.0,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert list(out["user_id"]) == [1, 2, 3, 4, 6]
        assert list(out["level"]) == [3, 1, 2, 1, 2]

    def test_anchor_is_earliest_first_step(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import funnel_steps

        base = pd.Timestamp("2026-01-01")
        h = pd.Timedelta(hours=1)
        # a LATER anchor (A at +30h) would reach B at +31h, but the pinned
        # rule anchors at the EARLIEST A: window ends +24h -> level 1
        rows = [
            (1, "A", base), (1, "A", base + 30 * h), (1, "B", base + 31 * h),
        ]
        out = funnel_steps(
            self._ds(rows), EngineConfig(num_buckets=4),
            steps=("A", "B"), window_hours=24.0,
        ).to_pandas()
        assert list(out["level"]) == [1]


class TestIntervalCoverage:
    def _ds(self, rows):
        import ray.data as rd

        df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        df["event_id"] = np.arange(len(df), dtype=np.int64)
        df["event_type"] = "x"
        df["props"] = "{}"
        return rd.from_pandas(df)

    def test_union_semantics(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import interval_coverage

        base = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        rows = [
            # user 1: [0,10) + [5,12) overlap -> 12; [12,20) touches -> 20
            (1, base, 10.0), (1, base + 5 * s, 7.0), (1, base + 12 * s, 8.0),
            # user 2: nested [0,10) contains [2,4) -> 10; disjoint [20,25) -> 15
            (2, base, 10.0), (2, base + 2 * s, 2.0), (2, base + 20 * s, 5.0),
            # user 3: zero-duration event -> 0
            (3, base, 0.0),
        ]
        out = (
            interval_coverage(self._ds(rows), EngineConfig(num_buckets=4))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert list(out["user_id"]) == [1, 2, 3]
        assert list(out["covered_us"]) == [20_000_000, 15_000_000, 0]

    def test_matches_brute_force(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import interval_coverage

        rng = np.random.RandomState(11)
        base = pd.Timestamp("2026-01-01")
        rows = [
            (int(rng.randint(0, 8)),
             base + pd.Timedelta(microseconds=int(rng.randint(0, 5_000_000))),
             float(np.round(rng.uniform(0, 3), 2)))
            for _ in range(300)
        ]
        out = (
            interval_coverage(self._ds(rows), EngineConfig(num_buckets=4))
            .to_pandas()
            .set_index("user_id")["covered_us"]
            .to_dict()
        )
        # brute-force oracle: merge sorted intervals per user
        from collections import defaultdict

        ivs = defaultdict(list)
        for u, ts, v in rows:
            s0 = (ts - base) // pd.Timedelta(microseconds=1)
            ivs[u].append((s0, s0 + int(round(v * 100)) * 10_000))
        for u, spans in ivs.items():
            tot, cur_s, cur_e = 0, None, None
            for a, b in sorted(spans):
                if b <= a:
                    continue
                if cur_e is None or a > cur_e:
                    if cur_e is not None:
                        tot += cur_e - cur_s
                    cur_s, cur_e = a, b
                else:
                    cur_e = max(cur_e, b)
            if cur_e is not None:
                tot += cur_e - cur_s
            assert out[u] == tot, u


class TestRankTests:
    def _ds(self, users, values):
        import ray.data as rd

        df = pd.DataFrame(
            {
                "user_id": np.asarray(users, np.int64),
                "value": np.asarray(values, np.float64),
            }
        )
        df["event_id"] = np.arange(len(df), dtype=np.int64)
        df["event_type"] = "x"
        df["ts"] = pd.Timestamp("2026-01-01")
        df["props"] = "{}"
        return rd.from_pandas(df)

    def test_matches_brute_force(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import rank_tests

        rng = np.random.RandomState(3)
        users = rng.randint(0, 40, 500)
        values = np.round(rng.uniform(0, 3, 500), 2)  # heavy ties
        out = rank_tests(
            self._ds(users, values), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        cents = np.rint(values * 100).astype(np.int64)
        a = cents[users % 2 == 0]
        b = cents[users % 2 == 1]
        # brute force: doubled U from pairwise comparisons
        gt = (a[:, None] > b[None, :]).sum()
        eq = (a[:, None] == b[None, :]).sum()
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["u2_a"] == 2 * gt + eq
        assert r["u2_b"] == 2 * (len(a) * len(b) - gt - eq) + eq
        # tie term
        _, t = np.unique(cents, return_counts=True)
        assert r["tie_cubes"] == int((t**3 - t).sum())
        # KS distance cross-multiplied
        vals = np.unique(cents)
        ca = np.array([(a <= v).sum() for v in vals])
        cb = np.array([(b <= v).sum() for v in vals])
        assert r["d_num"] == np.abs(len(b) * ca - len(a) * cb).max()

    def test_empty_and_one_sided(self, ray_session):
        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import rank_tests

        out = rank_tests(
            self._ds([], []), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert len(out) == 0
        # all users even -> variant b empty
        out = rank_tests(
            self._ds([2, 4, 6], [1.0, 2.0, 3.0]),
            EngineConfig(num_buckets=4),
        ).to_pandas()
        r = out.iloc[0]
        assert (r["n_a"], r["n_b"], r["u2_a"], r["u2_b"], r["d_num"]) == (
            3, 0, 0, 0, 0,
        )


class TestCusumByType:
    def test_matches_brute_force_with_planted_shift(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import cusum_by_type

        r = np.random.RandomState(7)
        n = 500
        ev = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": pd.to_datetime("2026-01-01")
                + pd.to_timedelta(r.randint(0, 10000, n), unit="s"),
                "event_type": r.choice(["a", "b", "c"], n),
                "value": np.round(r.lognormal(2, 1, n), 2),
            }
        )
        shift = (ev.event_type == "a") & (
            ev.ts > pd.to_datetime("2026-01-01 01:00:00")
        )
        ev.loc[shift, "value"] += 50
        out = (
            cusum_by_type(
                rd.from_pandas(ev).repartition(4),
                EngineConfig(num_buckets=8),
            )
            .to_pandas()
            .set_index("event_type")
        )
        assert len(out) == 3  # one row per group, no per-range dupes
        for g, gdf in ev.groupby("event_type"):
            gdf = gdf.sort_values(["ts", "event_id"], kind="mergesort")
            c = (
                np.rint(gdf["value"].to_numpy() * 100)
                .astype(np.int64)
                .astype(object)
            )
            s = np.cumsum(c)
            ntot, stot = len(c), int(s[-1])
            i = np.arange(1, ntot + 1).astype(object)
            dev = np.abs(ntot * s - i * stot)
            j = int(np.argmax(dev == dev.max()))
            row = out.loc[g]
            assert row["n"] == ntot
            assert row["total_cents"] == stot
            assert row["max_dev"] == int(dev[j])
            assert row["at_i"] == j + 1

    def test_constant_stream_and_ties(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import cusum_by_type

        ev = pd.DataFrame(
            {
                "event_id": np.arange(6, dtype=np.int64),
                "ts": pd.to_datetime("2026-01-01")
                + pd.to_timedelta(np.arange(6), unit="s"),
                "event_type": ["k"] * 6,
                "value": [2.0] * 6,
            }
        )
        out = cusum_by_type(
            rd.from_pandas(ev), EngineConfig(num_buckets=8)
        ).to_pandas()
        assert out["max_dev"].iloc[0] == 0
        assert out["at_i"].iloc[0] == 1  # earliest tie wins

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import cusum_by_type

        ev = pd.DataFrame(
            {
                "event_id": pd.Series(dtype=np.int64),
                "ts": pd.Series(dtype="datetime64[us]"),
                "event_type": pd.Series(dtype=str),
                "value": pd.Series(dtype=np.float64),
            }
        )
        out = cusum_by_type(
            rd.from_pandas(ev), EngineConfig(num_buckets=8)
        ).to_pandas()
        assert len(out) == 0


class TestBurstDetect:
    def test_matches_brute_force_with_ties(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import burst_detect

        r = np.random.RandomState(31)
        n = 400
        ev = pd.DataFrame(
            {
                "user_id": r.randint(0, 12, n).astype(np.int64),
                # coarse second resolution forces tie timestamps
                "ts": pd.to_datetime("2026-01-01")
                + pd.to_timedelta(r.randint(0, 500, n), unit="s"),
            }
        )
        w_us, cap = 60_000_000, 4
        out = (
            burst_detect(
                rd.from_pandas(ev).repartition(3),
                EngineConfig(num_buckets=8),
                window_us=w_us, cap=cap,
            )
            .to_pandas()
            .set_index("user_id")
        )
        for u, g in ev.groupby("user_id"):
            t = np.sort(
                g["ts"].astype("datetime64[us]").astype(np.int64)
            )
            burst = np.searchsorted(t, t, "right") - np.searchsorted(
                t, t - w_us + 1, "left"
            )
            if burst.max() > cap:
                row = out.loc[u]
                assert row["max_burst"] == burst.max()
                assert row["n_violations"] == int((burst > cap).sum())
            else:
                assert u not in out.index

    def test_quiet_stream_empty(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import burst_detect

        ev = pd.DataFrame(
            {
                "user_id": np.array([1, 1, 2], np.int64),
                "ts": pd.to_datetime(
                    ["2026-01-01", "2026-01-02", "2026-01-01"]
                ),
            }
        )
        out = burst_detect(
            rd.from_pandas(ev), EngineConfig(num_buckets=4),
            window_us=1_000_000, cap=1,
        ).to_pandas()
        assert len(out) == 0


class TestStreaks:
    def test_hand_built_runs(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import streaks

        days = {
            1: ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-07"],
            2: ["2026-01-05"],
            3: ["2026-02-01", "2026-02-02", "2026-02-04", "2026-02-05",
                "2026-02-06", "2026-02-07"],
        }
        rows = []
        for u, ds_ in days.items():
            for d in ds_:
                # two events on some days: dedup must collapse them
                rows.append((u, d + " 08:00:00"))
                rows.append((u, d + " 20:00:00"))
        ev = pd.DataFrame(rows, columns=["user_id", "ts"])
        ev["ts"] = pd.to_datetime(ev["ts"])
        ev["user_id"] = ev["user_id"].astype(np.int64)
        out = (
            streaks(rd.from_pandas(ev).repartition(3),
                    EngineConfig(num_buckets=4))
            .to_pandas()
            .set_index("user_id")
        )
        assert tuple(out.loc[1]) == (4, 3)
        assert tuple(out.loc[2]) == (1, 1)
        assert tuple(out.loc[3]) == (6, 4)


class TestCubeCounts:
    def test_all_grouping_sets(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import cube_counts

        ev = pd.DataFrame(
            {
                "event_type": ["a", "a", "b", "b", "b"],
                "user_id": np.array([0, 1, 0, 8, 15], np.int64),
            }
        )
        out = cube_counts(
            rd.from_pandas(ev).repartition(2),
            EngineConfig(num_buckets=4), b_mod=7,
        ).to_pandas()
        got = {
            (r["event_type"], r["user_id"]): r["n"]
            for _, r in out.iterrows()
        }
        # user_id % 7: 0,1,0,1,1
        assert got == {
            ("a", "0"): 1, ("a", "1"): 1,
            ("b", "0"): 1, ("b", "1"): 2,
            ("a", "*"): 2, ("b", "*"): 3,
            ("*", "0"): 2, ("*", "1"): 3,
            ("*", "*"): 5,
        }


class TestAutocorrCounts:
    def test_hand_built_days(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import autocorr_counts

        # day counts: d0:2, d1:3, d2:1, d4:5 (gap at d3)
        days = ["2026-01-01"] * 2 + ["2026-01-02"] * 3 + \
               ["2026-01-03"] + ["2026-01-05"] * 5
        ev = pd.DataFrame({"ts": pd.to_datetime(days)})
        out = (
            autocorr_counts(
                rd.from_pandas(ev).repartition(2),
                EngineConfig(num_buckets=4), lags=(1, 2, 7),
            )
            .to_pandas()
            .set_index("lag")
        )
        # lag1: (d0,d1)+(d1,d2) -> 2*3 + 3*1 = 9, 2 pairs
        assert tuple(out.loc[1]) == (2, 9)
        # lag2: (d0,d2)=2, (d2,d4)=5 -> 7, 2 pairs
        assert tuple(out.loc[2]) == (2, 7)
        # lag7: none
        assert tuple(out.loc[7]) == (0, 0)


class TestRegressionOutliers:
    def test_planted_spike_ranks_first(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import (
            group_regression,
            regression_outliers,
        )

        r = np.random.RandomState(3)
        n = 120
        base = pd.to_datetime("2026-01-01")
        ev = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": base + pd.to_timedelta(np.arange(n), unit="h"),
                "event_type": ["t"] * n,
                "value": np.round(
                    10.0 + 0.5 * np.arange(n) + r.normal(0, 0.5, n), 2
                ),
            }
        )
        ev.loc[60, "value"] += 500.0  # the spike
        out = regression_outliers(
            rd.from_pandas(ev).repartition(3),
            EngineConfig(num_buckets=4), k_top=3,
        ).to_pandas()
        assert out.iloc[0]["event_id"] == 60
        assert out.iloc[0]["rank"] == 1
        assert len(out) == 3
        # residual reproduces the pinned expression over the fit
        co = group_regression(
            rd.from_pandas(ev), EngineConfig(num_buckets=4)
        ).to_pandas().iloc[0]
        x = float(
            (ev.loc[60, "ts"].value // 10**3) // 3_600_000_000
        )
        y = float(np.rint(ev.loc[60, "value"] * 100))
        want = y - (float(co["intercept"]) + float(co["slope"]) * x)
        assert out.iloc[0]["resid"] == want

    def test_degenerate_type_emits_nothing(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import regression_outliers

        ev = pd.DataFrame(
            {
                "event_id": np.arange(3, dtype=np.int64),
                "ts": pd.to_datetime(["2026-01-01 05:10"] * 3),
                "event_type": ["solo"] * 3,
                "value": [1.0, 2.0, 3.0],
            }
        )
        out = regression_outliers(
            rd.from_pandas(ev), EngineConfig(num_buckets=4)
        ).to_pandas()
        assert len(out) == 0


class TestActiveUsers:
    def test_matches_brute_force_sliding_distinct(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import active_users

        r = np.random.RandomState(37)
        rows = []
        for u in range(15):
            for d in r.choice(30, r.randint(1, 12), replace=False):
                rows.append((u, d))
        ev = pd.DataFrame(rows, columns=["user_id", "dday"])
        ev["ts"] = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            ev["dday"], unit="D"
        )
        ev["user_id"] = ev["user_id"].astype(np.int64)
        out = (
            active_users(
                rd.from_pandas(ev[["user_id", "ts"]]).repartition(3),
                EngineConfig(num_buckets=8), window_days=7,
            )
            .to_pandas()
            .set_index("day")
        )
        base = pd.Timestamp("2026-01-01").value // 10**3 // 86_400_000_000
        active = ev.drop_duplicates(["user_id", "dday"])
        for dday in sorted(active["dday"].unique()):
            dau = active[active.dday == dday]["user_id"].nunique()
            wau = active[
                (active.dday >= dday - 6) & (active.dday <= dday)
            ]["user_id"].nunique()
            row = out.loc[base + dday]
            assert row["dau"] == dau
            assert row["wau"] == wau, dday
        assert len(out) == active["dday"].nunique()


class TestTypeTrigramsAndPeakLoad:
    def test_trigrams_respect_user_boundaries(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import type_trigrams

        rows = []
        eid = 0
        for u, seq in [(1, "aabab"), (2, "abab"), (3, "ab")]:
            for i, t in enumerate(seq):
                rows.append((eid, u, i, t))
                eid += 1
        ev = pd.DataFrame(
            rows, columns=["event_id", "user_id", "hour", "event_type"]
        )
        ev["ts"] = pd.to_datetime("2026-01-01") + pd.to_timedelta(
            ev["hour"], unit="h"
        )
        out = type_trigrams(
            rd.from_pandas(ev[["event_id", "ts", "user_id",
                               "event_type"]]).repartition(3),
            EngineConfig(num_buckets=4), min_count=2,
        ).to_pandas()
        got = {
            (r["t1"], r["t2"], r["t3"]): r["n"]
            for _, r in out.iterrows()
        }
        # u1: aab aba bab ; u2: aba bab ; u3 too short
        # counts: aba 2, bab 2, aab 1(filtered)
        assert got == {("a", "b", "a"): 2, ("b", "a", "b"): 2}

    def test_peak_load_hand_built(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import peak_load

        base = pd.Timestamp("2026-01-01")
        # durations value*1s; intervals: [0,10) [5,15) [10,20) [12,13)
        ev = pd.DataFrame(
            {
                "ts": [base, base + pd.Timedelta(seconds=5),
                       base + pd.Timedelta(seconds=10),
                       base + pd.Timedelta(seconds=12)],
                "value": [10.0, 10.0, 10.0, 1.0],
            }
        )
        out = peak_load(
            rd.from_pandas(ev), EngineConfig(num_buckets=4)
        ).to_pandas()
        # peak 3 first attained at t=12s ([5,15),[10,20),[12,13));
        # at t=10 exactly: [0,10) closed -> only 2 active
        t0 = base.value // 10**3
        assert out.iloc[0]["peak"] == 3
        assert out.iloc[0]["at_us"] == t0 + 12_000_000


class TestTrendConcordance:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.events import trend_concordance

        r = np.random.RandomState(11)
        n = 300
        ev = pd.DataFrame(
            {
                "event_type": r.choice(["up", "noise"], n),
                "ts": pd.to_datetime("2026-01-01")
                + pd.to_timedelta(r.randint(0, 72, n), unit="h"),
                "value": np.round(r.uniform(1, 50, n), 2),
            }
        )
        up = ev.event_type == "up"
        # make 'up' trend with time (value follows hour + noise)
        hours = (ev["ts"] - ev["ts"].min()).dt.total_seconds() / 3600
        ev.loc[up, "value"] = np.round(hours[up] * 0.5 + 1, 2)
        out = (
            trend_concordance(
                rd.from_pandas(ev).repartition(3),
                EngineConfig(num_buckets=4),
            )
            .to_pandas()
            .set_index("event_type")
        )
        for g, gdf in ev.groupby("event_type"):
            t = (
                gdf["ts"].astype("datetime64[us]").astype(np.int64)
                // 3_600_000_000
            ).to_numpy()
            v = np.rint(gdf["value"].to_numpy() * 100).astype(np.int64)
            nc = nd = 0
            for i in range(len(t)):
                for j in range(len(t)):
                    if t[j] > t[i] and v[j] > v[i]:
                        nc += 1
                    elif t[j] > t[i] and v[j] < v[i]:
                        nd += 1
            row = out.loc[g]
            assert row["n"] == len(gdf)
            assert row["n_conc"] == nc
            assert row["n_disc"] == nd
        # the planted trend is near-perfectly concordant
        assert out.loc["up", "n_conc"] > 20 * max(out.loc["up", "n_disc"], 1)
