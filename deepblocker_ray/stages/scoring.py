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


def _pack_turns_fn(id_col: str, out_id: str, prefix: str):
    """map_batches fn: (id, turn_texts) → (out_id, {prefix}tx, {prefix}tl).

    pyarrow's hash join rejects list<string> non-key fields, so the turn
    lists are packed into two PLAIN STRING columns around the join:
    ``tx`` = the texts joined by a 1-byte filler (\\x1f), ``tl`` = the
    comma-joined decimal BYTE lengths. Decoding slices ``tx`` by the
    lengths — the filler is never interpreted as data, so the round-trip is
    exact for ANY text content (including texts containing \\x1f), and []
    vs [""] stays unambiguous (tl "" vs "0"). Both encodes are vectorized
    Arrow kernels; null lists pack to null and decode to []."""
    import pyarrow.compute as pc

    from ..state.lookup import one_chunk

    def fn(batch: pa.Table) -> pa.Table:
        col = one_chunk(batch.column("turn_texts"))
        if pa.types.is_null(col.type.value_type):  # all-empty block
            col = col.cast(pa.list_(pa.string()))
        tx = pc.binary_join(col, "\x1f")
        lens = pc.cast(pc.binary_length(col.values), pa.string())
        tl = pc.binary_join(
            pa.ListArray.from_arrays(col.offsets, lens), ","
        )
        return pa.table(
            {
                out_id: batch.column(id_col).cast(pa.string()),
                prefix + "tx": tx,
                prefix + "tl": tl,
            }
        )

    return fn


def _unpack_turns(txs: list, tls: list) -> list[list[str]]:
    out = []
    for tx, tl in zip(txs, tls):
        if tx is None or tl is None or tl == "":
            out.append([])
            continue
        b = tx.encode("utf-8")
        row, pos = [], 0
        for ls in tl.split(","):
            n = int(ls)
            row.append(b[pos : pos + n].decode("utf-8"))
            pos += n + 1  # skip the 1-byte filler
        out.append(row)
    return out


def _attach_packed(cands, packed, key_col, prefix, cfg, cand_schema):
    """Inner-attach a packed-turns side (key, {prefix}tx, {prefix}tl) onto
    candidate rows via ONE bucketed hash exchange + in-bucket merges — NOT
    ``Dataset.join``, whose hash aggregator crashes on any partition where
    one side is empty (schemaless empty table → FieldRef error, observed on
    ray 2.49 even at toy scale). Both sides are tagged into an identical
    arrow schema (typed null padding), unioned, bucketed on hash(key), and
    merged per bucket; the packed text rides the exchange exactly once."""
    import pandas as pd

    from .canonicalize import bucket_of

    nb = cfg.num_buckets
    names = [f.name for f in cand_schema]
    out_schema = pa.schema(
        list(cand_schema)
        + [
            pa.field(prefix + "tx", pa.string()),
            pa.field(prefix + "tl", pa.string()),
        ]
    )
    tx, tl = prefix + "tx", prefix + "tl"

    def tag_c(batch: pa.Table) -> pa.Table:
        n = len(batch)
        b = bucket_of(batch.column(key_col).to_pandas(), nb)
        return pa.table(
            [batch.column(nm) for nm in names]
            + [
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                pa.array(np.zeros(n, np.int8)),
                pa.array(b),
            ],
            names=names + [tx, tl, "_src", "_b"],
        )

    def tag_p(batch: pa.Table) -> pa.Table:
        n = len(batch)
        b = bucket_of(batch.column(key_col).to_pandas(), nb)
        cols = [
            batch.column(key_col).cast(f.type)
            if f.name == key_col
            else pa.nulls(n, f.type)
            for f in cand_schema
        ]
        return pa.table(
            cols
            + [
                batch.column(tx),
                batch.column(tl),
                pa.array(np.ones(n, np.int8)),
                pa.array(b),
            ],
            names=names + [tx, tl, "_src", "_b"],
        )

    def attach(df: pd.DataFrame) -> pa.Table:
        c = df[df["_src"] == 0].drop(columns=[tx, tl])
        p = df[df["_src"] == 1]
        m = c.merge(p[[key_col, tx, tl]], on=key_col, how="inner")
        m = m[names + [tx, tl]]
        return pa.Table.from_pandas(
            m, schema=out_schema, preserve_index=False
        )

    tagged = cands.map_batches(tag_c, batch_format="pyarrow").union(
        packed.map_batches(tag_p, batch_format="pyarrow")
    )
    return tagged.groupby("_b").map_groups(attach, batch_format="pandas")


def _score_via_join(candidates, tuples_ds, right_tuples_ds, cfg, threshold, id_col):
    """Beyond-plasma path: attach PACKED turn texts (see _pack_turns_fn —
    arrow carries no list<string> through exchanges here) to the candidate
    pairs with two bucketed exchanges, then a stateless scoring map."""
    cand_schema = pa.schema(
        [
            pa.field(nm, t)
            for nm, t in zip(
                candidates.schema().names, candidates.schema().types
            )
        ]
    )
    left_side = tuples_ds.select_columns([id_col, "turn_texts"]).map_batches(
        _pack_turns_fn(id_col, "left_id", "_l"), batch_format="pyarrow"
    )
    right_src = right_tuples_ds if right_tuples_ds is not None else tuples_ds
    right_side = right_src.select_columns([id_col, "turn_texts"]).map_batches(
        _pack_turns_fn(id_col, "right_id", "_r"), batch_format="pyarrow"
    )
    half = _attach_packed(
        candidates, left_side, "left_id", "_l", cfg, cand_schema
    )
    half_schema = pa.schema(
        list(cand_schema)
        + [pa.field("_ltx", pa.string()), pa.field("_ltl", pa.string())]
    )
    joined = _attach_packed(
        half, right_side, "right_id", "_r", cfg, half_schema
    )

    cap = cfg.score_text_cap

    def score_batch(batch: pa.Table) -> pa.Table:
        lts = _unpack_turns(
            batch.column("_ltx").to_pylist(), batch.column("_ltl").to_pylist()
        )
        rts = _unpack_turns(
            batch.column("_rtx").to_pylist(), batch.column("_rtl").to_pylist()
        )
        cosines = batch.column("cosine").to_pylist()
        jw, lev, score = score_pairs_batch(lts, rts, cosines, cap)
        batch = batch.drop_columns(["_ltx", "_ltl", "_rtx", "_rtl"])
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
