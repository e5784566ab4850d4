"""Pairwise candidate scoring: embedding cosine + Jaro-Winkler + Levenshtein
on per-turn text (BASELINE.json north_star; no reference equivalent — the
reference stops at the candidate set).

Candidates arrive as (left_id, right_id, rank, cosine). The scorer needs both
sides' turn texts: the tuple table is broadcast once via ray.put when it fits
(EngineConfig.broadcast_rows_max) — the common shape, since canonical tuples
are ~10^3× smaller than turns — else it falls back to two hash joins
(Dataset.join). Per-turn similarities are averaged over aligned turn indices
(up to the shorter side), strings capped at ``score_text_cap`` chars to bound
the O(n·m) edit distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import (
    EngineConfig,
    actor_pool_size,
    join_partitions,
    parallel_blocks,
)
from ..functions.textsim import (
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein_ratio,
    levenshtein_ratio_batch,
)

SCORE_WEIGHTS = {"cosine": 0.4, "jw": 0.3, "lev": 0.3}


def pair_similarity(
    turns_a: list[str],
    turns_b: list[str],
    cosine: float,
    cap: int,
    weights: dict[str, float] = SCORE_WEIGHTS,
) -> tuple[float, float, float]:
    """(jw, lev, combined) for one candidate pair — scalar reference version;
    the hot path uses score_pairs_batch."""
    n = min(len(turns_a), len(turns_b))
    if n == 0:
        jw = lev = 0.0
    else:
        jw = float(
            np.mean([jaro_winkler(turns_a[i][:cap], turns_b[i][:cap]) for i in range(n)])
        )
        lev = float(
            np.mean(
                [levenshtein_ratio(turns_a[i], turns_b[i], cap=cap) for i in range(n)]
            )
        )
    cos = max(0.0, min(1.0, float(cosine)))
    total_w = sum(weights.values())
    combined = (
        weights["cosine"] * cos + weights["jw"] * jw + weights["lev"] * lev
    ) / total_w
    return jw, lev, combined


def score_pairs_batch(
    turns_a_list: list[list[str]],
    turns_b_list: list[list[str]],
    cosines,
    cap: int,
    weights: dict[str, float] = SCORE_WEIGHTS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch scorer: one vectorized Levenshtein DP over every aligned turn
    pair of the whole candidate batch, Jaro-Winkler per turn pair (numpy
    inner loop). Returns (jw, lev, combined) float arrays."""
    n = len(turns_a_list)
    counts = np.empty(n, np.int64)
    flat_a: list[str] = []
    flat_b: list[str] = []
    for i, (ta, tb) in enumerate(zip(turns_a_list, turns_b_list)):
        m = min(len(ta), len(tb))
        counts[i] = m
        for j in range(m):
            flat_a.append(ta[j][:cap])
            flat_b.append(tb[j][:cap])
    lev_flat = levenshtein_ratio_batch(flat_a, flat_b)
    jw_flat = jaro_winkler_batch(flat_a, flat_b)
    jw = np.zeros(n)
    lev = np.zeros(n)
    nonempty = counts > 0
    if nonempty.any():
        offsets = np.zeros(n, np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        starts = offsets[nonempty]
        jw[nonempty] = np.add.reduceat(jw_flat, starts) / counts[nonempty]
        lev[nonempty] = np.add.reduceat(lev_flat, starts) / counts[nonempty]
    cos = np.clip(np.asarray(cosines, np.float64), 0.0, 1.0)
    total_w = sum(weights.values())
    combined = (
        weights["cosine"] * cos + weights["jw"] * jw + weights["lev"] * lev
    ) / total_w
    return jw, lev, combined


class TurnLookup:
    """Worker-side id → turn_texts lookup built from plasma block refs.

    Thin wrapper over state/lookup.ColumnLookup (the canonical hash-indexed
    zero-copy broadcast lookup — see its docstring for the per-process-build
    cost story and collision handling); _turn_refs ships the precomputed
    ``_h`` uint64 id-hash column that keeps the per-process build at
    milliseconds."""

    def __init__(self, refs):
        from ..state.lookup import ColumnLookup

        # keyed on "_id" by construction: _turn_refs renames id_col to _id
        # and ships the matching precomputed _h hash column
        self._lk = ColumnLookup(refs, "_id", "turn_texts", hash_col="_h")

    def get_lists(self, keys) -> list[list[str]]:
        vals = self._lk.take_pylist(keys)
        return [v if v is not None else [] for v in vals]


def _turn_refs(tuples_ds, id_col: str):
    """Materialize (_id, _h, turn_texts) into the object store; returns block
    refs (the broadcast small side — put once, read zero-copy by every
    task). ``_h`` is the precomputed stable id hash that makes the
    per-process TurnLookup build O(n) uint64 work instead of an
    object-string sort."""

    def project(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.string())
        h = pd.util.hash_array(np.asarray(ids.to_pylist(), dtype=object))
        return pa.table(
            {
                "_id": ids,
                "_h": pa.array(h),
                "turn_texts": t.column("turn_texts"),
            }
        )

    return (
        tuples_ds.map_batches(project, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )


def score_candidates(
    candidates,
    tuples_ds,
    right_tuples_ds=None,
    cfg: EngineConfig | None = None,
    threshold: float | None = None,
    id_col: str = "conv_id",
):
    """candidates + canonical tuples → scored pairs with ``is_match``.

    ``right_tuples_ds=None`` means self-linkage (both sides from tuples_ds).
    """
    cfg = cfg or EngineConfig()
    threshold = cfg.match_threshold if threshold is None else threshold

    n_left = tuples_ds.count()
    n_right = right_tuples_ds.count() if right_tuples_ds is not None else 0
    if max(n_left, n_right) > cfg.broadcast_rows_max:
        return _score_via_join(
            candidates, tuples_ds, right_tuples_ds, cfg, threshold, id_col
        )

    left_refs = _turn_refs(tuples_ds, id_col)
    right_refs = (
        _turn_refs(right_tuples_ds, id_col)
        if right_tuples_ds is not None
        else None
    )
    cap = cfg.score_text_cap
    lkey = "turns:" + ",".join(r.hex() for r in left_refs)
    rkey = (
        "turns:" + ",".join(r.hex() for r in right_refs)
        if right_refs is not None
        else lkey
    )

    def score_fn(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_compute

        left = cached_compute(lkey, lambda: TurnLookup(left_refs))
        right = (
            cached_compute(rkey, lambda: TurnLookup(right_refs))
            if right_refs is not None
            else left
        )
        lids = batch.column("left_id").to_pylist()
        rids = batch.column("right_id").to_pylist()
        cosines = batch.column("cosine").to_pylist()
        ta = left.get_lists(lids)
        tb = right.get_lists(rids)
        jw, lev, score = score_pairs_batch(ta, tb, cosines, cap)
        return batch.append_column(
            "jw", pa.array(jw.astype(np.float32))
        ).append_column("lev", pa.array(lev.astype(np.float32))).append_column(
            "score", pa.array(score.astype(np.float32))
        ).append_column(
            "is_match", pa.array(score >= threshold)
        )

    return parallel_blocks(candidates).map_batches(
        score_fn, batch_format="pyarrow", batch_size=cfg.score_batch_size
    )


def _score_via_join(candidates, tuples_ds, right_tuples_ds, cfg, threshold, id_col):
    """Large-side path: two hash joins to attach turn texts, then a stateless
    scoring map. Partition count sized to the session parallelism."""
    nparts = join_partitions()
    left_side = tuples_ds.select_columns([id_col, "turn_texts"]).rename_columns(
        {id_col: "left_id", "turn_texts": "_lt"}
    )
    right_src = right_tuples_ds if right_tuples_ds is not None else tuples_ds
    right_side = right_src.select_columns([id_col, "turn_texts"]).rename_columns(
        {id_col: "right_id", "turn_texts": "_rt"}
    )
    joined = candidates.join(
        left_side, join_type="inner", num_partitions=nparts, on=("left_id",)
    ).join(right_side, join_type="inner", num_partitions=nparts, on=("right_id",))

    cap = cfg.score_text_cap

    def score_batch(batch: pa.Table) -> pa.Table:
        lts = [t or [] for t in batch.column("_lt").to_pylist()]
        rts = [t or [] for t in batch.column("_rt").to_pylist()]
        cosines = batch.column("cosine").to_pylist()
        jw, lev, score = score_pairs_batch(lts, rts, cosines, cap)
        batch = batch.drop_columns(["_lt", "_rt"])
        return batch.append_column(
            "jw", pa.array(jw.astype(np.float32))
        ).append_column("lev", pa.array(lev.astype(np.float32))).append_column(
            "score", pa.array(score.astype(np.float32))
        ).append_column(
            "is_match", pa.array(score >= threshold)
        )

    return joined.map_batches(
        score_batch, batch_format="pyarrow", batch_size=cfg.score_batch_size
    )
