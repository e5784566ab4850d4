"""Deterministic hash-sampling invariants: rerun/repartition stability,
threshold nesting (a 10% sample is a subset of the 20% sample), endpoint
exactness, and per-stratum thresholds. Driver SQL twins are covered by
test_oracle_parity."""

import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)


def _docs(rd, n=400):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(n),
                "lang": [["en", "de", "zh", "fr"][i % 4] for i in range(n)],
            }
        )
    )


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import hash_sample

        a = hash_sample(_docs(rd), 0.3, seed=5).to_pandas()
        b = hash_sample(_docs(rd).repartition(16), 0.3, seed=5).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        assert 0 < len(a) < 400

    def test_threshold_nesting(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import hash_sample

        small = set(hash_sample(_docs(rd), 0.1, seed=5).to_pandas()["doc_id"])
        large = set(hash_sample(_docs(rd), 0.2, seed=5).to_pandas()["doc_id"])
        assert small <= large

    def test_endpoints_exact(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import hash_sample

        assert hash_sample(_docs(rd), 0.0).count() == 0
        assert hash_sample(_docs(rd), 1.0).count() == 400

    def test_seed_changes_sample(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import hash_sample

        a = set(hash_sample(_docs(rd), 0.3, seed=1).to_pandas()["doc_id"])
        b = set(hash_sample(_docs(rd), 0.3, seed=2).to_pandas()["doc_id"])
        assert a != b

    def test_bad_fraction(self):
        from deepblocker_ray.stages.sampling import hash_sample

        with pytest.raises(ValueError):
            hash_sample(None, 1.5)


class TestStratifiedSample:
    def test_per_stratum_rates(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import stratified_sample

        out = stratified_sample(
            _docs(rd),
            {"en": 1.0, "de": 0.0},
            strata_col="lang",
            default_fraction=0.5,
            seed=3,
        ).to_pandas()
        counts = out["lang"].value_counts().to_dict()
        assert counts.get("en") == 100       # fraction 1.0 keeps all
        assert "de" not in counts            # fraction 0.0 drops all
        assert 0 < counts.get("zh", 0) < 100  # default ~50%
        assert 0 < counts.get("fr", 0) < 100

    def test_stratified_matches_flat_when_uniform(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import (
            hash_sample,
            stratified_sample,
        )

        flat = hash_sample(_docs(rd), 0.4, seed=9).to_pandas()
        strat = stratified_sample(
            _docs(rd), {}, strata_col="lang", default_fraction=0.4, seed=9
        ).to_pandas()
        assert sorted(flat["doc_id"]) == sorted(strat["doc_id"])


class TestBalanceSample:
    def test_caps_head_keeps_tail_and_integer_threshold(self, ray_session):
        import hashlib

        import numpy as np
        import ray.data as rd

        from deepblocker_ray.stages.sampling import balance_sample

        # skewed corpus: en 300, de 60, fr 10; target 60 per lang
        langs = ["en"] * 300 + ["de"] * 60 + ["fr"] * 10
        df = pd.DataFrame({"doc_id": range(len(langs)), "lang": langs})
        ds = rd.from_pandas([p for p in __import__("numpy").array_split(df, 7)])
        out = balance_sample(
            ds, strata_col="lang", target_count=60, id_col="doc_id", seed=0
        ).to_pandas()

        # scalar recompute: integer threshold, md5 rule
        def h(v):
            return int.from_bytes(
                hashlib.md5(f"{v}|0".encode()).digest()[8:16], "little"
            ) % (1 << 32)

        want = set()
        thr = {"en": (60 << 32) // 300, "de": 1 << 32, "fr": 1 << 32}
        for _, r in df.iterrows():
            if h(r["doc_id"]) < thr[r["lang"]]:
                want.add(r["doc_id"])
        assert set(out["doc_id"]) == want
        # tail strata (target >= actual) are kept WHOLE, exactly
        assert (out["lang"] == "de").sum() == 60
        assert (out["lang"] == "fr").sum() == 10
        # head stratum actually downsampled around the target
        n_en = (out["lang"] == "en").sum()
        assert 30 <= n_en <= 90

    def test_bad_target(self):
        from deepblocker_ray.stages.sampling import balance_sample

        with pytest.raises(ValueError):
            balance_sample(None, strata_col="lang", target_count=-1)


class TestWeightedSample:
    def test_priority_rule_and_zero_weight(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.sampling import (
            _DENOM, _id_hashes, weighted_sample,
        )

        df = pd.DataFrame(
            {
                "doc_id": np.arange(20, dtype=np.int64),
                "w": np.concatenate(
                    [np.zeros(5, np.int64), np.arange(1, 16, dtype=np.int64) * 100]
                ),
            }
        )
        out = (
            weighted_sample(
                rd.from_pandas(df), EngineConfig(num_buckets=4),
                weight_col="w", k=6, id_col="doc_id", seed=3,
            )
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        # numpy oracle: same integer priority, (priority desc, id asc) top-6
        import pyarrow as pa

        h32 = (_id_hashes(pa.array(df["doc_id"].astype(str)), 3)
               % _DENOM).astype(np.int64)
        prio = (df["w"].to_numpy(np.int64) << np.int64(32)) // (h32 + 1)
        order = np.lexsort((df["doc_id"].to_numpy(), -prio))[:6]
        assert out["doc_id"].tolist() == df["doc_id"].to_numpy()[order].tolist()
        assert out["priority"].tolist() == prio[order].tolist()
        # zero-weight rows cannot outrank positive weights in a top-6 of 15
        assert all(out["priority"] > 0)

    def test_weight_bounds(self, ray_session):
        import numpy as np
        import pandas as pd
        import pytest as _pt
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.sampling import weighted_sample

        bad = pd.DataFrame(
            {"doc_id": np.array([1], np.int64),
             "w": np.array([1 << 31], np.int64)}
        )
        with _pt.raises(Exception, match="2\\^31"):
            weighted_sample(
                rd.from_pandas(bad), EngineConfig(), weight_col="w", k=1
            ).to_pandas()


class TestGroupCap:
    def test_exact_cap_and_small_groups(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.sampling import group_cap

        df = pd.DataFrame(
            {
                "doc_id": np.arange(30, dtype=np.int64),
                "lang": ["en"] * 20 + ["fr"] * 8 + ["zz"] * 2,
            }
        )
        out = (
            group_cap(
                rd.from_pandas([p for p in np.array_split(df, 3)]),
                EngineConfig(num_buckets=4),
                strata_col="lang", n_max=5, seed=3,
            )
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        sizes = out.groupby("lang").size().to_dict()
        # exact: min(n_max, group size) — never Binomial variance
        assert sizes == {"en": 5, "fr": 5, "zz": 2}
        # deterministic: rerun picks the identical ids
        out2 = (
            group_cap(
                rd.from_pandas(df), EngineConfig(num_buckets=8),
                strata_col="lang", n_max=5, seed=3,
            )
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == out2["doc_id"].tolist()


class TestSplitAssign:
    def test_partition_of_corpus(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import split_assign

        out = split_assign(
            _docs(rd), id_col="doc_id", seed=9, train_pct=70, val_pct=20
        ).to_pandas()
        assert len(out) == 400                      # every row labeled
        assert set(out["split"]) <= {"train", "val", "test"}
        counts = out["split"].value_counts()
        # Binomial(400, p): all three bands populated at these fractions
        assert counts.get("train", 0) > counts.get("val", 0) > 0
        assert counts.get("test", 0) > 0

    def test_stable_under_repartition_and_growth(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.sampling import split_assign

        a = (
            split_assign(_docs(rd, 200), id_col="doc_id", seed=9)
            .to_pandas().set_index("doc_id")["split"]
        )
        b = (
            split_assign(
                _docs(rd, 400).repartition(16), id_col="doc_id", seed=9
            )
            .to_pandas().set_index("doc_id")["split"]
        )
        # growing the corpus never moves an existing row between splits
        assert (b.loc[a.index] == a).all()

    def test_threshold_rule_exact(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.dedup import _stable_hash64
        from deepblocker_ray.stages.sampling import (
            split_assign,
            split_thresholds,
        )

        t1, t2 = split_thresholds(80, 10)
        out = (
            split_assign(_docs(rd, 50), id_col="doc_id", seed=3)
            .to_pandas().set_index("doc_id")["split"]
        )
        for i in range(50):
            h = int(_stable_hash64(f"{i}|3".encode())) % (1 << 32)
            want = "train" if h < t1 else ("val" if h < t2 else "test")
            assert out.loc[i] == want

    def test_invalid_percents_raise(self, ray_session):
        import pytest as _pytest

        from deepblocker_ray.stages.sampling import split_thresholds

        with _pytest.raises(ValueError):
            split_thresholds(90, 20)
