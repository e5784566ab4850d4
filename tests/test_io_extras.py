"""process_match_files (F5), weight save/load (S4), distributed synthetic
pairs (T4 distributed)."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.sources.io import process_match_files, read_transcripts
from deepblocker_ray.stages.train import (
    load_weights,
    save_weights,
    synthetic_pairs_dataset,
    train_autoencoder,
)


class TestProcessMatchFiles:
    def test_label_filter_union(self, ray_session, tmp_path):
        rng = np.random.default_rng(1)
        for name in ["train", "valid", "test"]:
            pd.DataFrame(
                {
                    "ltable_id": np.arange(20),
                    "rtable_id": np.arange(20) + 100,
                    "label": rng.integers(0, 2, 20).astype(np.int8),
                }
            ).to_parquet(tmp_path / f"{name}.parquet")
        out = process_match_files(str(tmp_path)).to_pandas()
        expect = 0
        for name in ["train", "valid", "test"]:
            df = pd.read_parquet(tmp_path / f"{name}.parquet")
            expect += int((df["label"] == 1).sum())
        assert len(out) == expect
        assert list(out.columns) == ["ltable_id", "rtable_id"]

    def test_missing_files_raise(self, ray_session, tmp_path):
        with pytest.raises(FileNotFoundError):
            process_match_files(str(tmp_path / "nope"))


class TestWeightCheckpoint:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((50, 8))
        params = train_autoencoder(x, (6, 3), num_epochs=3, seed=1)
        p = str(tmp_path / "ae.npz")
        save_weights(params, p)
        loaded = load_weights(p)
        assert set(loaded) == set(params)
        for k in params:
            np.testing.assert_array_equal(params[k], loaded[k])


class TestDistributedSyntheticPairs:
    def test_shapes_and_determinism(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame(
            {
                "conv_id": [f"c{i}" for i in range(30)],
                "tuple_text": [
                    f"alpha bravo charlie delta echo foxtrot {i}" for i in range(30)
                ],
            }
        )
        ds = rd.from_pandas(df)
        out1 = synthetic_pairs_dataset(ds, reservoir_size=30).to_pandas()
        out2 = synthetic_pairs_dataset(ds, reservoir_size=30).to_pandas()
        assert len(out1) == 30 * 10
        assert (out1["label"] == 1).sum() == 30 * 5
        pd.testing.assert_frame_equal(
            out1.sort_values(["left_text", "right_text", "label"]).reset_index(drop=True),
            out2.sort_values(["left_text", "right_text", "label"]).reset_index(drop=True),
        )
        # positives are subsequences with bounded removal
        pos = out1[out1["label"] == 1]
        for l, r in zip(pos["left_text"], pos["right_text"]):
            lt, rt = l.split(), r.split()
            assert len(rt) >= len(lt) - int(len(lt) * 0.4)


class TestReadTranscripts:
    def test_column_pruning(self, ray_session, tmp_path):
        from deepblocker_ray.fixtures import synth_transcripts

        df, _ = synth_transcripts(n_base=10, seed=1)
        p = str(tmp_path / "t.parquet")
        df.to_parquet(p)
        ds = read_transcripts(p)
        assert set(ds.schema().names) == {"conv_id", "turn_idx", "role", "text", "tool"}


class TestUnionByName:
    def test_align_nulls_and_conflict(self, ray_session):
        import numpy as np
        import pandas as pd
        import pytest as _pt
        import ray.data as rd

        from deepblocker_ray.sources.io import union_by_name

        a = rd.from_pandas(
            pd.DataFrame(
                {"id": np.array([1, 2], np.int64), "x": ["a", "b"]}
            )
        )
        b = rd.from_pandas(
            pd.DataFrame(
                {"id": np.array([3], np.int64),
                 "y": np.array([9.5], np.float64)}
            )
        )
        out = (
            union_by_name(a, b).to_pandas().sort_values("id")
            .reset_index(drop=True)
        )
        assert list(out.columns) == ["id", "x", "y"]
        assert out["x"].tolist()[:2] == ["a", "b"] and pd.isna(out["x"][2])
        assert pd.isna(out["y"][0]) and out["y"][2] == 9.5
        # conflicting type for the same name must raise
        c = rd.from_pandas(pd.DataFrame({"id": ["s"], "x": ["v"]}))
        with _pt.raises(ValueError, match="conflicting"):
            union_by_name(a, c)


class TestJsonl:
    def test_roundtrip_and_pruned_read(self, ray_session, tmp_path):
        import ray.data as rd

        from deepblocker_ray.sources.io import read_jsonl, write_jsonl

        df = pd.DataFrame(
            {
                "doc_id": np.arange(7, dtype=np.int64),
                "text": [f"line {i}" for i in range(7)],
                "extra": np.arange(7, dtype=np.int64) * 2,
            }
        )
        out_dir = str(tmp_path / "jl")
        write_jsonl(rd.from_pandas(df), out_dir)
        back = (
            read_jsonl(out_dir, columns=["doc_id", "text"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(back.columns) == ["doc_id", "text"]
        assert back["text"].tolist() == df["text"].tolist()
