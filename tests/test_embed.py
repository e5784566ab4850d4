"""SIF / Average embedding conformance vs the single-process numpy oracle."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray import oracle
from deepblocker_ray.config import EngineConfig
from deepblocker_ray.functions.hash_embedding import HashEmbedding
from deepblocker_ray.stages.embed import (
    AverageEmbedder,
    SIFEmbedder,
    emb_to_numpy,
    sif_weight_dict,
    token_frequencies,
    top_pc,
)

DIM = 32
CFG = EngineConfig(emb_dim=DIM, seed=1234, embed_batch_size=16, num_buckets=4)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the five boxing wizards jump quickly",
    "sphinx of black quartz, judge my vow!",
    "the quick onyx goblin jumps over the lazy dwarf",
    "how quickly daft jumping zebras vex.",
    "quick zephyrs blow, vexing daft jim",
    "the jay, pig, fox, zebra and my wolves quack",
]


def tuples_df():
    return pd.DataFrame(
        {
            "conv_id": pd.array([f"t{i}" for i in range(len(CORPUS))], dtype="string"),
            "tuple_text": pd.array(CORPUS, dtype="string"),
        }
    )


def sorted_emb(ds, dim=DIM):
    pdf = ds.to_pandas().sort_values("conv_id").reset_index(drop=True)
    return np.stack([np.asarray(e, np.float64) for e in pdf["emb"]]), pdf


class TestTokenFrequencies:
    def test_matches_oracle(self, ray_session):
        import ray.data as rd

        freq = token_frequencies(rd.from_pandas(tuples_df())).to_pandas()
        w_oracle, total_oracle = oracle.sif_weights(CORPUS)
        weights, total = sif_weight_dict(freq)
        assert total == total_oracle
        assert set(weights) == set(w_oracle)
        for k in weights:
            assert weights[k] == pytest.approx(w_oracle[k], rel=1e-12)


class TestAverageEmbedder:
    def test_matches_oracle(self, ray_session):
        import ray.data as rd

        ds = AverageEmbedder(CFG).transform(rd.from_pandas(tuples_df()))
        got, _ = sorted_emb(ds)
        table = HashEmbedding(dim=DIM, seed=1234)
        want = oracle.average_embed(CORPUS, table)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestSIFEmbedder:
    def test_matches_oracle_no_pc(self, ray_session):
        import ray.data as rd

        ds_in = rd.from_pandas(tuples_df())
        emb = SIFEmbedder(CFG, remove_pc=False).fit(ds_in).transform(ds_in)
        got, _ = sorted_emb(emb)
        table = HashEmbedding(dim=DIM, seed=1234)
        w, _ = oracle.sif_weights(CORPUS)
        want = oracle.sif_embed(CORPUS, table, w, remove_pc=False)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_matches_oracle_with_pc(self, ray_session):
        import ray.data as rd

        ds_in = rd.from_pandas(tuples_df())
        emb = SIFEmbedder(CFG, remove_pc=True).fit(ds_in).transform(ds_in)
        got, _ = sorted_emb(emb)
        table = HashEmbedding(dim=DIM, seed=1234)
        w, _ = oracle.sif_weights(CORPUS)
        want = oracle.sif_embed(CORPUS, table, w, remove_pc=True)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_empty_text_zero_row(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame(
            {
                "conv_id": pd.array(["a", "b"], dtype="string"),
                "tuple_text": pd.array([" ", "hello world"], dtype="string"),
            }
        )
        emb = SIFEmbedder(CFG, remove_pc=False).fit(rd.from_pandas(df)).transform(
            rd.from_pandas(df)
        )
        pdf = emb.to_pandas().sort_values("conv_id").reset_index(drop=True)
        assert pdf.loc[0, "emb_empty"]
        np.testing.assert_array_equal(np.asarray(pdf.loc[0, "emb"]), np.zeros(DIM))
        assert not pdf.loc[1, "emb_empty"]


class TestTopPC:
    def test_matches_oracle(self, ray_session):
        import ray.data as rd

        ds_in = rd.from_pandas(tuples_df())
        emb = SIFEmbedder(CFG, remove_pc=False).fit(ds_in).transform(ds_in)
        pc = top_pc(emb, DIM)
        table = HashEmbedding(dim=DIM, seed=1234)
        w, _ = oracle.sif_weights(CORPUS)
        x = oracle.sif_embed(CORPUS, table, w, remove_pc=False)
        want = oracle.top_principal_component(x)
        # engine stores embeddings as float32 → ~1e-7 wobble vs float64 oracle
        np.testing.assert_allclose(np.abs(pc), np.abs(want), atol=1e-6)


class TestHashedWeightsFit:
    """SIFEmbedder.fit keeps the vocabulary in the object store (a
    HashedWeightsHandle), never a driver dict — these pin the truncation
    rule and dict-parity of the hashed map."""

    def test_truncation_matches_reference_rule(self, ray_session):
        import ray.data as rd

        # min_freq=2: singleton tokens get weight exactly 1.0 (reference
        # tuple_embedding_models.py:116-119) == the OOV fallback, so they
        # are absent from the hashed map — and the transform still matches
        # the numpy oracle that carries them explicitly at 1.0.
        m = SIFEmbedder(CFG, remove_pc=False, min_freq=2)
        ds_in = rd.from_pandas(tuples_df())
        emb = m.fit(ds_in).transform(ds_in)
        got, _ = sorted_emb(emb)
        table = HashEmbedding(dim=DIM, seed=1234)
        w, total = oracle.sif_weights(CORPUS, min_freq=2)
        want = oracle.sif_embed(CORPUS, table, w, remove_pc=False)
        np.testing.assert_allclose(got, want, atol=1e-6)

        hashed = m.weights_ref.resolve()
        n_frequent = sum(1 for v in w.values() if v != 1.0)
        assert len(hashed) == n_frequent  # rare tokens truly truncated
        assert len(hashed) < len(w)
        assert m.total_tokens == total

    def test_hashed_map_parity_with_dict(self, ray_session):
        import ray.data as rd

        m = SIFEmbedder(CFG, remove_pc=False).fit(rd.from_pandas(tuples_df()))
        hashed = m.weights_ref.resolve()
        w, _ = oracle.sif_weights(CORPUS)
        assert len(hashed) == len(w)
        for tok, want in w.items():
            assert hashed.get(tok) == pytest.approx(want, rel=1e-12)
        assert hashed.get("never-seen-token") == 1.0
        assert hashed.get("never-seen-token", 0.25) == 0.25


class TestEmbToNumpyViews:
    """emb_to_numpy must be exact (and zero-copy) on sliced and chunked
    fixed_size_list columns — Ray's batch_size slicing and the query stage's
    internal table.slice make non-zero offsets the common case, and pyarrow's
    flatten() takes an element-wise copy path there."""

    def test_sliced_and_chunked_views_match_flatten(self):
        import pyarrow as pa

        from deepblocker_ray.stages.embed import numpy_to_emb

        n, d = 1000, 7
        mat = np.arange(n * d, dtype=np.float32).reshape(n, d)
        col = numpy_to_emb(mat)

        sl = col.slice(137, 600)
        expect = np.asarray(sl.flatten()).reshape(-1, d)
        got = emb_to_numpy(sl)
        assert np.array_equal(got, expect)
        # the view must share the original buffer (zero-copy)
        assert got.base is not None

        chunked = pa.chunked_array([col.slice(0, 400), col.slice(350, 650)])
        expect2 = np.concatenate(
            [
                np.asarray(c.flatten()).reshape(-1, d)
                for c in chunked.chunks
            ]
        )
        assert np.array_equal(emb_to_numpy(chunked), expect2)

    def test_table_slice_roundtrip(self):
        import pyarrow as pa

        from deepblocker_ray.stages.embed import numpy_to_emb

        n, d = 64, 3
        mat = np.random.default_rng(0).standard_normal((n, d)).astype(np.float32)
        t = pa.table({"emb": numpy_to_emb(mat)})
        part = t.slice(10, 20)
        assert np.array_equal(emb_to_numpy(part.column("emb")), mat[10:30])


def test_truncated_weights_reject_nondefault_oov(ray_session):
    """min_freq-truncated HashedWeights dropped rare-but-seen tokens to the
    1.0 fallback; a non-default oov_weight would silently re-weight them as
    unseen — _embed_stage must refuse the combination."""
    import pytest
    import ray.data as rd

    from deepblocker_ray.config import EngineConfig
    from deepblocker_ray.stages.embed import SIFEmbedder, _embed_stage

    cfg = EngineConfig(num_buckets=8)
    ds = rd.from_pandas(
        pd.DataFrame(
            {"conv_id": ["a", "b"], "tuple_text": ["x x y", "x z z"]}
        )
    )
    m = SIFEmbedder(cfg, min_freq=2)
    m.fit(ds)
    with pytest.raises(ValueError, match="min_freq-truncated"):
        _embed_stage(
            ds, cfg, "conv_id", "tuple_text", m.weights_ref, oov_weight=0.0
        )
    # default oov_weight stays allowed
    assert m.transform(ds).count() == 2


class TestVocabBuild:
    def test_rank_ties_and_min_freq(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.embed import vocab_build

        texts = (
            ["zebra apple"] * 5      # zebra 5+1, apple 5
            + ["apple banana"] * 0
            + ["banana cherry zebra"]  # banana 1, cherry 1, zebra 6
        )
        ds = rd.from_pandas(
            [p for p in np.array_split(
                pd.DataFrame({"tuple_text": texts}), 3)]
        )
        out = (
            vocab_build(ds, EngineConfig(num_buckets=8), min_freq=1)
            .to_pandas()
            .sort_values("token_id")
            .reset_index(drop=True)
        )
        # zebra 6, apple 5, then count-1 ties in token-asc order
        assert out["token"].tolist() == ["zebra", "apple", "banana", "cherry"]
        assert out["count"].tolist() == [6, 5, 1, 1]
        assert out["token_id"].tolist() == [0, 1, 2, 3]

        out2 = vocab_build(
            ds, EngineConfig(num_buckets=8), min_freq=2
        ).to_pandas().sort_values("token_id")
        assert out2["token"].tolist() == ["zebra", "apple"]

    def test_empty_corpus(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.embed import vocab_build

        ds = rd.from_pandas(
            pd.DataFrame({"tuple_text": pd.Series([], dtype="object")})
        )
        out = vocab_build(ds, EngineConfig(num_buckets=8))
        assert out.count() == 0
        # (to_pandas() on an empty arrow dataset drops columns — Ray quirk;
        # the schema is the contract, same note as test_packing)
        assert out.schema().names == ["token", "count", "token_id"]


class TestEncodeTokens:
    def test_ids_positions_and_oov(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.embed import encode_tokens, vocab_build

        docs = pd.DataFrame(
            {
                "doc_id": [10, 11, 12],
                "text": [
                    "apple banana apple",
                    "banana cherry",
                    "",
                ],
            }
        )
        ds = rd.from_pandas(docs)
        vocab = vocab_build(
            ds.map_batches(
                lambda df: df.rename(columns={"text": "tuple_text"})[
                    ["tuple_text"]
                ],
                batch_format="pandas",
            ),
            EngineConfig(num_buckets=8),
            min_freq=2,
        )
        # counts: apple 2, banana 2, cherry 1 → vocab {apple:0, banana:1}
        # (count desc, token asc); cherry is OOV
        out = (
            encode_tokens(ds, vocab, EngineConfig(num_buckets=8))
            .to_pandas()
            .sort_values(["doc_id", "pos"])
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [10, 10, 10, 11, 11]
        assert out["pos"].tolist() == [0, 1, 2, 0, 1]
        got = out["token_id"].tolist()
        assert got[:4] == [0, 1, 0, 1]
        assert pd.isna(got[4])  # cherry → OOV NULL

    def test_empty_vocab(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.embed import encode_tokens, vocab_build

        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": [1], "text": ["solo words only"]})
        )
        vocab = vocab_build(
            ds.map_batches(
                lambda df: df.rename(columns={"text": "tuple_text"})[
                    ["tuple_text"]
                ],
                batch_format="pandas",
            ),
            EngineConfig(num_buckets=8),
            min_freq=5,
        )
        out = encode_tokens(ds, vocab, EngineConfig(num_buckets=8)).to_pandas()
        assert len(out) == 3
        assert out["token_id"].isna().all()
