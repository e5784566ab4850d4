"""Deterministic seeded global shuffle order (training-data-pipeline op).

Before packing, a pre-training corpus is globally shuffled so each training
sequence mixes unrelated documents. At 100 TB the naive recipe — assign a
random key, globally sort — is a full-corpus all-to-all over the TEXT. This
operator computes the shuffle as an ORDER, not a data movement: it emits
(doc_id, shuffle_pos) where shuffle_pos is the document's dense 0-based rank
in the seeded permutation. Only (id, hash) ever rides an exchange; the text
stays where it is and downstream stages (e.g. ``sequence_pack`` consumers or
a partitioned writer) route by the skinny position column.

The permutation key is the stable md5-lower64 hash of ``id || '|' || seed``
(the ``sampling._id_hashes`` convention), which makes the order seed-stable,
rerun/resume-stable, and EXACTLY reproducible in SQL:

    row_number() OVER (ORDER BY md5_number_lower(id || '|seed'), id) - 1

Dense ranking without a global sort — the same exact distributed prefix
scan as ``packing.sequence_pack``, but with a better partitioning key: the
hash itself. Because h is uniform on [0, 2^64), range-partitioning on its
top 32 bits is skew-free BY CONSTRUCTION (no min/max aggregates, no salting,
no hot keys — every range holds ~n/R docs regardless of id distribution):

1. skinny map: (id, h) — one vectorized hash pass;
2. map-side partials count docs per hash range (≤R tiny rows per batch);
   the driver cumsums R counts into offsets (O(R) state) and broadcasts;
3. ONE bucketed exchange on the range id; per range one stable sort by
   (h, id) + arange yields every doc's dense global position.

Hash ties (p ≈ n²·2⁻⁶⁴) are broken by id on both the engine and SQL sides,
so the permutation is a total order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from .sampling import _id_hashes

_HI_DENOM = np.uint64(1) << np.uint64(32)


def corpus_shuffle(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    seed: int = 7,
):
    """Emit ``(doc_id, shuffle_pos)``: each document's dense 0-based rank in
    the seeded global permutation (order by md5-lower64 of ``id || '|seed'``,
    ties by id). Ids must be unique (they are hashed individually; duplicate
    ids would receive distinct adjacent ranks in id order, which is still
    deterministic but rarely what a caller wants)."""
    cfg = cfg or EngineConfig()
    nr = cfg.num_buckets

    def skinny(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        h = _id_hashes(ids.cast(pa.string()), seed)
        return pa.table({"_id": ids, "_h": pa.array(h, pa.uint64())})

    hashed = ds.select_columns([id_col]).map_batches(
        skinny, batch_format="pyarrow"
    ).materialize()

    def rng_of(h: np.ndarray) -> np.ndarray:
        # top-32-bit range partition: uniform h → even ranges, no aggregates
        return ((h >> np.uint64(32)) * np.uint64(nr) // _HI_DENOM).astype(
            np.int64
        )

    import ray

    from .scan import range_offsets

    offsets, total = range_offsets(
        hashed,
        lambda t: rng_of(np.asarray(t.column("_h")).astype(np.uint64)),
        nr,
    )
    if total == 0:  # empty input: typed empty output
        sch = hashed.schema()
        id_type = (
            sch.base_schema.field("_id").type
            if sch is not None and hasattr(sch, "base_schema")
            else pa.int64()  # empty pipelines surface no schema — default
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], id_type),
                    "shuffle_pos": pa.array([], pa.int64()),
                }
            )
        )
    off_ref = ray.put(offsets)

    def bucketed(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("_h")).astype(np.uint64)
        return t.append_column(
            "_bucket", pa.array(rng_of(h).astype(np.int32))
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        offs = cached_get(off_ref)
        g = g.sort_values(["_h", "_id"], kind="mergesort")
        pos = offs[int(g["_bucket"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({"doc_id": g["_id"].to_numpy(), "shuffle_pos": pos})

    return (
        hashed.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank, batch_format="pandas")
    )


def rendezvous_assign(ds, cfg=None, *, id_col: str = "doc_id",
                      n_shards: int = 16):
    """Rendezvous (highest-random-weight) shard assignment: each record
    goes to argmaxₛ hash(id ‖ '#' ‖ s) over s ∈ [0, n_shards) — the
    consistent-routing rule whose defining property is minimal movement
    when shards are added/removed (only keys whose winner changes move,
    ≈ 1/(n+1) of them). Priority is the repo's md5-lower64 stable hash
    shifted into int63 (DuckDB ``md5_number_lower(...) // 2``), ties
    broken by the smaller shard. Output (``id_col``, shard:int32,
    priority:int64 of the winner).

    Scale shape: pure map-side — n_shards vectorized hash passes per
    batch, one argmax; no shuffle, no state."""
    import pandas as pd

    from ..config import EngineConfig
    from .dedup import hash64_strs

    cfg = cfg or EngineConfig()
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype(str)
        pri = np.empty((len(df), n_shards), np.int64)
        for s in range(n_shards):
            pri[:, s] = (
                hash64_strs(ids + f"#{s}") // np.uint64(2)
            ).astype(np.int64)
        best = pri.argmax(axis=1)  # first max = smallest shard on ties
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shard": best.astype(np.int32),
                "priority": pri[np.arange(len(df)), best],
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def reshard_delta(ds, cfg=None, *, id_col: str = "doc_id",
                  n_from: int = 16, n_to: int = 17):
    """Reshard movement audit — the number consistent hashing exists to
    minimize: per NEW shard, how many records it gains when the
    rendezvous ring grows n_from → n_to (HRW's defining property is
    that ONLY keys whose argmax becomes one of the new shards move —
    expected moved fraction (n_to−n_from)/n_to). Emits one row per
    destination shard of moved keys plus a (-1, total) row:
    (shard:int32, n_moved:int64).

    Scale shape: pure map-side — both assignments are n_to vectorized
    hash passes per batch, moved-count partials are O(shards), tiny
    driver fold."""
    import pandas as pd

    import ray.data as rd

    from ..config import EngineConfig
    from .dedup import hash64_strs

    cfg = cfg or EngineConfig()
    if not (0 < n_from < n_to):
        raise ValueError(f"need 0 < n_from < n_to, got {n_from}/{n_to}")

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t.column(id_col).to_pandas().astype(str)
        # ONE priority pass over all n_to shards (vectorized string
        # concat, the rendezvous_assign convention); both winners derive
        # from the same matrix — no duplicated hashing
        best_a = np.full(len(ids), -1, np.int64)
        pa_best = np.full(len(ids), -1, np.int64)
        best_b = np.full(len(ids), -1, np.int64)
        pb_best = np.full(len(ids), -1, np.int64)
        for s in range(n_to):
            p = (
                hash64_strs((ids + f"#{s}").to_numpy(object))
                >> np.uint64(1)
            ).astype(np.int64)
            win_b = p > pb_best
            best_b[win_b] = s
            pb_best[win_b] = p[win_b]
            if s < n_from:
                win_a = p > pa_best
                best_a[win_a] = s
                pa_best[win_a] = p[win_a]
        moved = best_b[best_a != best_b]
        c = pd.Series(moved).value_counts()
        return pd.DataFrame(
            {
                "shard": c.index.to_numpy(np.int64),
                "n_moved": c.to_numpy(np.int64),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("shard")["n_moved"]
        .sum()
        .sort_index()
    )
    shards = parts.index.to_numpy(np.int64)
    counts = parts.to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "shard": pa.array(
                    np.concatenate(([np.int64(-1)], shards)).astype(
                        np.int32
                    )
                ),
                "n_moved": pa.array(
                    np.concatenate(([counts.sum()], counts)).astype(
                        np.int64
                    )
                ),
            }
        )
    )
