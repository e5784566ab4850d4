"""Two-table (DeepMatcher-shape) conformance: the Ray pipeline must produce
the same candidate sets as the single-process numpy oracle replaying the
reference semantics on the same fixture (SURVEY §5.2 layer 2)."""

import numpy as np
import pandas as pd
import pytest

from deepblocker_ray import oracle
from deepblocker_ray.config import EngineConfig
from deepblocker_ray.fixtures import flat_tables
from deepblocker_ray.functions.hash_embedding import HashEmbedding
from deepblocker_ray.pipelines.blocking import DeepBlockerRay, preprocess_flat
from deepblocker_ray.pipelines.evaluate import blocking_statistics
from deepblocker_ray.stages.embed import SIFEmbedder
from deepblocker_ray.stages.pairing import ExactTopKPairer

DIM = 48
CFG = EngineConfig(emb_dim=DIM, num_buckets=8, index_shard_rows=64)
K = 10


@pytest.fixture(scope="module")
def fixture():
    return flat_tables(n=200, seed=11, n_matches=60)


class TestPreprocessFlat:
    def test_matches_oracle(self, ray_session, fixture):
        import ray.data as rd

        ta, _tb, _m = fixture
        got = (
            preprocess_flat(rd.from_pandas(ta), ["title", "manufacturer", "price"])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        want = oracle.preprocess_flat(ta, ["title", "manufacturer", "price"])
        want = want.sort_values("id").reset_index(drop=True)
        assert list(got["tuple_text"]) == list(want["_merged_text"])


class TestBlockingConformance:
    def test_candidate_sets_match_oracle(self, ray_session, fixture):
        import ray.data as rd

        ta, tb, matches = fixture
        db = DeepBlockerRay(SIFEmbedder(CFG), ExactTopKPairer(k=K, cfg=CFG))
        cands = (
            db.block_datasets(rd.from_pandas(ta), rd.from_pandas(tb),
                              ["title", "manufacturer", "price"])
            .to_pandas()
        )

        # oracle replay with the same hash-embedding word table
        table = HashEmbedding(dim=DIM, seed=CFG.seed)
        left_p = oracle.preprocess_flat(ta, ["title", "manufacturer", "price"])
        right_p = oracle.preprocess_flat(tb, ["title", "manufacturer", "price"])
        corpus = list(left_p["_merged_text"]) + list(right_p["_merged_text"])
        w, _ = oracle.sif_weights(corpus)
        # reference computes the PC per transform call (per side)
        left_m = oracle.sif_embed(list(left_p["_merged_text"]), table, w)
        right_m = oracle.sif_embed(list(right_p["_merged_text"]), table, w)
        idx, _sims = oracle.topk_cosine(left_m, right_m, K)

        got_sets = {
            lid: set(grp["right_id"])
            for lid, grp in cands.groupby("left_id")
        }
        mismatches = 0
        for i in range(len(ta)):
            want = {str(j) for j in idx[i]}
            have = got_sets.get(str(i), set())
            # identical modulo cosine ties at the k-boundary: allow a small
            # symmetric difference only when the boundary cosine repeats
            if have != want:
                mismatches += 1
        assert mismatches <= len(ta) * 0.02, f"{mismatches} rows differ"

    def test_recall_cssr_match_oracle(self, ray_session, fixture):
        import ray.data as rd

        ta, tb, matches = fixture
        db = DeepBlockerRay(SIFEmbedder(CFG), ExactTopKPairer(k=K, cfg=CFG))
        cands_ds = db.block_datasets(
            rd.from_pandas(ta), rd.from_pandas(tb),
            ["title", "manufacturer", "price"],
        ).materialize()

        # engine stats (ids are strings in the engine)
        import ray

        golden = matches.copy()
        golden["ltable_id"] = "L" + golden["ltable_id"].astype(str)
        golden["rtable_id"] = "R" + golden["rtable_id"].astype(str)
        import pyarrow as pa

        def tag(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "left_id": pc.binary_join_element_wise(
                        pa.array(["L"] * len(t)), t.column("left_id"), ""
                    ),
                    "right_id": pc.binary_join_element_wise(
                        pa.array(["R"] * len(t)), t.column("right_id"), ""
                    ),
                }
            )

        tagged = cands_ds.map_batches(tag, batch_format="pyarrow")
        stats = blocking_statistics(
            tagged, golden, len(ta), len(tb), already_normalized=False
        )

        # oracle stats
        table = HashEmbedding(dim=DIM, seed=CFG.seed)
        left_p = oracle.preprocess_flat(ta, ["title", "manufacturer", "price"])
        right_p = oracle.preprocess_flat(tb, ["title", "manufacturer", "price"])
        w, _ = oracle.sif_weights(
            list(left_p["_merged_text"]) + list(right_p["_merged_text"])
        )
        left_m = oracle.sif_embed(list(left_p["_merged_text"]), table, w)
        right_m = oracle.sif_embed(list(right_p["_merged_text"]), table, w)
        idx, _ = oracle.topk_cosine(left_m, right_m, K)
        cand_df = oracle.melt_topk(idx)
        ostats = oracle.blocking_statistics(cand_df, matches, len(ta), len(tb))

        assert stats["cssr"] == pytest.approx(ostats["cssr"])
        assert stats["recall"] == pytest.approx(ostats["recall"], abs=0.02)
        assert stats["recall"] >= 0.9  # planted matches are blockable
