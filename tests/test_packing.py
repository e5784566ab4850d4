"""Sequence packing (stages/packing.py): exact concat-and-chunk layout vs a
single-process pandas oracle, boundary straddles, zero-token docs, empty
input, and argument validation. The driver twin (window prefix sum in SQL)
is regression-covered by the correctness sweep."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray.config import EngineConfig

CFG = EngineConfig(num_buckets=8)


def _oracle(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    d = df.sort_values("doc_id").reset_index(drop=True)
    n = d["text"].fillna("").str.split().str.len().to_numpy(np.int64)
    start = np.cumsum(n) - n
    first = start // cap
    last = np.where(n > 0, (start + n - 1) // cap, first)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].to_numpy(np.int64),
            "n_tokens": n,
            "start_tok": start,
            "first_seq": first,
            "last_seq": last,
        }
    )


def _run(df: pd.DataFrame, cap: int, blocks: int = 5) -> pd.DataFrame:
    import ray.data as rd

    from deepblocker_ray.stages.packing import sequence_pack

    parts = [p for p in np.array_split(df, blocks) if len(p)]
    ds = rd.from_pandas(parts if len(parts) > 1 else df)
    out = sequence_pack(ds, CFG, tokens_per_seq=cap).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class TestSequencePack:
    def test_layout_matches_oracle_across_blocks(self, ray_session):
        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                # non-contiguous, shuffled ids → exercises range partitioning
                "doc_id": rng.permutation(np.arange(0, 400, 3)),
                "text": [
                    " ".join(["w"] * int(k))
                    for k in rng.integers(0, 50, size=134)
                ],
            }
        )
        got = _run(df, cap=64)
        exp = _oracle(df, cap=64)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # layout invariants: contiguous, gap-free token stream
        assert (np.diff(got["start_tok"]) == got["n_tokens"][:-1]).all()

    def test_boundary_straddle_and_zero_token_docs(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b c", "", "d e f g", "h"],
            }
        )
        got = _run(df, cap=4, blocks=2)
        # doc1: [0,3) seq 0; doc2: empty at 3 → seq 0/0; doc3: [3,7) spans
        # seqs 0-1; doc4: [7,8) seq 1
        assert got["start_tok"].tolist() == [0, 3, 3, 7]
        assert got["first_seq"].tolist() == [0, 0, 0, 1]
        assert got["last_seq"].tolist() == [0, 0, 1, 1]

    def test_empty_input_and_bad_cap(self, ray_session):
        import ray.data as rd

        from deepblocker_ray.stages.packing import sequence_pack

        empty = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype=object)})
        )
        out = sequence_pack(empty, CFG)
        assert out.count() == 0
        # (to_pandas() on an empty arrow dataset drops columns — Ray quirk;
        # the schema is the contract)
        assert out.schema().names == [
            "doc_id", "n_tokens", "start_tok", "first_seq", "last_seq"
        ]
        with pytest.raises(ValueError, match="tokens_per_seq"):
            sequence_pack(empty, CFG, tokens_per_seq=0)


class TestLengthBatches:
    def _run(self, df: pd.DataFrame, batch_docs: int) -> pd.DataFrame:
        import ray.data as rd

        from deepblocker_ray.stages.packing import length_batches

        parts = [p for p in np.array_split(df, 4) if len(p)]
        ds = rd.from_pandas(parts if len(parts) > 1 else df)
        out = length_batches(ds, CFG, batch_docs=batch_docs).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def test_matches_rank_oracle(self, ray_session):
        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "doc_id": rng.permutation(np.arange(0, 300, 2)),
                "text": [
                    " ".join(["w"] * int(k))
                    for k in rng.integers(0, 12, size=150)  # heavy length ties
                ],
            }
        )
        got = self._run(df, batch_docs=8)
        d = df.copy()
        d["n_tokens"] = d["text"].str.split().str.len().fillna(0).astype(int)
        d = d.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
        d["batch_id"] = np.arange(len(d)) // 8
        exp = (
            d[["doc_id", "n_tokens", "batch_id"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # batching invariant: each full batch spans a contiguous length range
        by_batch = got.groupby("batch_id")["n_tokens"]
        assert (by_batch.size() <= 8).all()
        mins, maxs = by_batch.min().sort_index(), by_batch.max().sort_index()
        assert (maxs.to_numpy()[:-1] <= mins.to_numpy()[1:]).all()

    def test_empty_and_bad_args(self, ray_session):
        import pytest
        import ray.data as rd

        from deepblocker_ray.stages.packing import length_batches

        empty = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype=object)})
        )
        out = length_batches(empty, CFG)
        assert out.count() == 0
        assert out.schema().names == ["doc_id", "n_tokens", "batch_id"]
        with pytest.raises(ValueError, match="batch_docs"):
            length_batches(empty, CFG, batch_docs=0)


class TestPretrainCurate:
    def test_dedup_gate_and_offsets(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.pipelines.pretrain import pretrain_curate

        good = (
            "The quick brown fox jumps over the lazy dog and it is a fine "
            "day in the park"
        )
        rows = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    good,                      # 0: survives
                    "  " + good.upper() + " ",  # 1: dup of 0 after normalize
                    good + " extra words here",  # 2: survives (distinct)
                    "@@@ ###",                 # 3: junk → quality-gated out
                    good.replace(" ", "   "),  # 4: dup of 0 (ws collapse)
                    "12345 67890",             # 5: digits, short → gated out
                ],
            }
        )
        out = (
            pretrain_curate(
                rd.from_pandas([p for p in np.array_split(rows, 3)]),
                EngineConfig(num_buckets=8),
                quality_min=0.5,
                tokens_per_seq=8,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # survivors: 0 (wins its dup group) and 2; 1/4 deduped, 3/5 gated
        assert out["doc_id"].tolist() == [0, 2]
        n0 = len(good.split())
        assert out["n_tokens"].tolist() == [n0, n0 + 3]
        # packing offsets: ascending id concat, chunked every 8 tokens
        assert out["start_tok"].tolist() == [0, n0]
        assert out["first_seq"].tolist() == [0, n0 // 8]
        assert out["last_seq"].iloc[0] == (n0 - 1) // 8


class TestChunkDocuments:
    def test_boundaries_overlap_and_nonascii(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.packing import chunk_documents

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(5, dtype=np.int64),
                "text": [
                    "a" * 10,        # one exact-ish chunk
                    "b" * 11,        # 11 > chunk(10) → 2 chunks
                    "",              # empty → one empty chunk
                    None,            # NULL → one empty chunk
                    "é" * 13,        # non-ASCII: CHARACTER windows
                ],
            }
        )
        out = (
            chunk_documents(
                rd.from_pandas([p for p in np.array_split(docs, 2)]),
                EngineConfig(num_buckets=8),
                chunk_chars=10, overlap=4,
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        by = {k: g for k, g in out.groupby("doc_id")}
        assert len(by[0]) == 1 and by[0]["chunk_text"].iloc[0] == "a" * 10
        # doc 1: stride 6 → starts 1, 7 (1-based)
        assert by[1]["start_char"].tolist() == [1, 7]
        assert by[1]["chunk_text"].tolist() == ["b" * 10, "b" * 5]
        assert by[2]["chunk_text"].tolist() == [""]
        assert by[3]["chunk_text"].tolist() == [""]
        # doc 4: 13 chars → starts 1, 7; second chunk é×7 (chars, not bytes)
        assert by[4]["chunk_text"].tolist() == ["é" * 10, "é" * 7]
        # full reconstruction: stripping the overlap re-concatenates the doc
        rec = by[1]["chunk_text"].iloc[0] + by[1]["chunk_text"].iloc[1][4:]
        assert rec == "b" * 11

    def test_bad_params(self):
        from deepblocker_ray.stages.packing import chunk_documents

        import pytest as _pt

        with _pt.raises(ValueError):
            chunk_documents(None, chunk_chars=10, overlap=10)
        with _pt.raises(ValueError):
            chunk_documents(None, chunk_chars=0, overlap=0)


class TestReassembleChunks:
    def test_roundtrip_identity(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.packing import (
            chunk_documents,
            reassemble_chunks,
        )

        texts = [
            "a" * 10,            # exactly one chunk
            "b" * 11,            # straddles one boundary
            "",                  # empty → one empty chunk
            None,                # NULL → '' after the roundtrip
            "é" * 23,            # non-ASCII across 3 chunks
            "xy",                # shorter than one chunk
            " ".join(str(i) for i in range(40)),  # many chunks
        ]
        docs = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        cfg = EngineConfig(num_buckets=8)
        chunks = chunk_documents(
            rd.from_pandas([p for p in np.array_split(docs, 3)]),
            cfg, chunk_chars=10, overlap=4,
        )
        out = (
            reassemble_chunks(chunks, cfg, overlap=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = [t if t is not None else "" for t in texts]
        assert out["doc_id"].tolist() == list(range(len(texts)))
        assert out["text"].tolist() == want

    def test_zero_overlap_and_shuffled_input(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepblocker_ray.config import EngineConfig
        from deepblocker_ray.stages.packing import reassemble_chunks

        # chunks arrive in arbitrary order; idx carries the stitch order
        chunks = pd.DataFrame(
            {
                "doc_id": np.array([7, 7, 7, 9], np.int64),
                "chunk_idx": np.array([2, 0, 1, 0], np.int64),
                "chunk_text": ["CC", "AA", "BB", "solo"],
            }
        )
        out = (
            reassemble_chunks(
                rd.from_pandas(chunks), EngineConfig(num_buckets=4)
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [7, 9]
        assert out["text"].tolist() == ["AABBCC", "solo"]

    def test_bad_overlap(self):
        import pytest as _pt

        from deepblocker_ray.stages.packing import reassemble_chunks

        with _pt.raises(ValueError):
            reassemble_chunks(None, overlap=-1)
