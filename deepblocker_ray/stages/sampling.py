"""Deterministic sampling operators (training-data-pipeline ops).

Large-scale sampling must be shuffle-free, seed-stable, and resumable: the
decision for a row may depend only on the row itself, never on a global
count, a random stream position, or which worker saw it. These operators
decide per row from a stable 64-bit hash of (id, seed) — the same
``md5_number_lower`` convention as the dedup fingerprints
(stages/dedup._stable_hash64), which is what gives every sample an EXACT
DuckDB SQL twin and makes reruns/resume byte-identical.

- ``hash_sample``: keep a row iff hash(id|seed) mod 2^32 < fraction·2^32.
- ``stratified_sample``: per-stratum fractions (e.g. per language, per
  source) with a default — the hash threshold varies by stratum, the
  mechanics are one vectorized pass, no groupby.

Sampling error vs an exact-count sample is Binomial(n, fraction) per
stratum — the standard trade for determinism at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _stable_hash64

_DENOM = np.uint64(1) << np.uint64(32)


def _keep_threshold(fraction: float) -> np.uint64:
    """fraction → integer threshold in [0, 2^32]; exact at both endpoints.
    Computed in integer space (round(fraction·2^32)) so the engine and the
    SQL twin compare against the SAME constant."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return np.uint64(round(fraction * float(_DENOM)))


def _id_hashes(ids, seed: int) -> np.ndarray:
    """Stable per-row uint64 hash of CAST(id AS VARCHAR) || '|' || seed —
    exactly ``md5_number_lower(id || '|<seed>')`` in DuckDB."""
    suffix = f"|{seed}".encode()
    return np.fromiter(
        (_stable_hash64(str(v).encode() + suffix) for v in ids.to_pylist()),
        np.uint64,
        len(ids),
    )


def sample_threshold_sql(fraction: float) -> int:
    """The integer threshold the SQL twin must compare against (kept in one
    place so engine and oracle cannot drift)."""
    return int(_keep_threshold(fraction))


def hash_sample(ds, fraction: float, id_col: str = "doc_id", seed: int = 0):
    """Deterministic ~``fraction`` sample: keep rows whose stable id-hash
    lands under the threshold. Stateless vectorized filter — no shuffle, no
    global count, stable under reruns, resume, and repartitioning."""
    thr = _keep_threshold(fraction)

    def pick(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(id_col).cast(pa.string()), seed)
        return batch.filter(pa.array((h % _DENOM) < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def balance_sample(
    ds,
    *,
    strata_col: str,
    target_count: int,
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Rebalance a skewed corpus toward ``target_count`` rows per stratum
    (the data-mixing step of a training pipeline: cap the head sources /
    languages, keep the tail whole). Per-stratum keep-fraction is
    target/actual, realized as the same shuffle-free stable-hash threshold
    as ``hash_sample`` — so the sample is deterministic, rerun/resume-stable
    and exactly SQL-twinnable.

    The threshold is computed in INTEGER space — ``min(2^32,
    (target << 32) // actual)`` — because a float ``round(frac · 2^32)``
    would hang engine-vs-oracle equality on a float rounding boundary;
    floor division of exact ints cannot drift. Strata counts come from
    map-side partials (O(strata × blocks) exchange, never the corpus); the
    resulting per-stratum sample size is Binomial(actual, target/actual) —
    the standard determinism-for-exactness trade, same as hash_sample."""
    if target_count < 0:
        raise ValueError(f"target_count must be >= 0, got {target_count}")

    import pandas as pd

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(strata_col, sort=False, observed=True)
            .agg(c=(strata_col, "size")).reset_index()
        )

    counts = (
        ds.select_columns([strata_col])
        .map_batches(hist, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda df: df.groupby(strata_col, sort=False, observed=True)
            .agg(c=("c", "sum")).reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    thr_map = {
        s: np.uint64(min(int(_DENOM), (target_count << 32) // int(c)))
        for s, c in zip(counts[strata_col], counts["c"])
    }

    def pick(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(id_col).cast(pa.string()), seed)
        strata = batch.column(strata_col).to_pylist()
        thr = np.fromiter(
            (thr_map.get(s, np.uint64(0)) for s in strata),
            np.uint64,
            len(strata),
        )
        return batch.filter(pa.array((h % _DENOM) < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def stratified_sample(
    ds,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 0,
):
    """Per-stratum deterministic sampling: each row's keep-threshold comes
    from ``fractions[row[strata_col]]`` (``default_fraction`` otherwise).
    One vectorized pass — the stratum only selects the threshold, so there
    is no groupby and skewed strata cost nothing extra."""
    thr_map = {k: _keep_threshold(v) for k, v in fractions.items()}
    default_thr = _keep_threshold(default_fraction)

    def pick(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(id_col).cast(pa.string()), seed)
        strata = batch.column(strata_col).to_pylist()
        thr = np.fromiter(
            (thr_map.get(s, default_thr) for s in strata),
            np.uint64,
            len(strata),
        )
        return batch.filter(pa.array((h % _DENOM) < thr))

    return ds.map_batches(pick, batch_format="pyarrow")


def weighted_sample(
    ds,
    cfg,
    *,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
):
    """Deterministic weighted top-``k`` sample — the corpus-curation
    subsample where higher-weight rows (quality score, length, dedup
    cluster size) are proportionally more likely to be kept. Each row gets
    an INTEGER priority

        priority = (weight << 32) // ((hash32(id|seed)) + 1)

    (a rank-preserving integer surrogate for the A-ES key u^(1/w): both
    are monotone in weight for fixed hash and monotone in the uniform
    hash for fixed weight; integer division instead of ``pow`` because
    libm ``pow`` may differ between engines in the last ulp and a sample
    boundary must not hang on it). The sample is the global top-k by
    (priority desc, id asc) — seed-stable, shuffle-free map-side partials
    through the house top-k merge, rerun/resume-identical.

    Emits (rank, id_col, priority). Weights must be integers in
    [0, 2^31) — zero-weight rows get priority 0 and are only picked after
    every positive-weight row.
    """
    from .topk import group_topk

    def prio(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch.column(weight_col), np.int64)
        if len(w) and (w.min() < 0 or w.max() >= (1 << 31)):
            raise ValueError(
                f"{weight_col} must be in [0, 2^31), got "
                f"[{w.min()}, {w.max()}]"
            )
        h32 = (_id_hashes(batch.column(id_col).cast(pa.string()), seed)
               % _DENOM).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "priority": pa.array((w << np.int64(32)) // (h32 + 1)),
            }
        )

    skinny = ds.select_columns([id_col, weight_col]).map_batches(
        prio, batch_format="pyarrow"
    )
    return group_topk(skinny, cfg, order_col="priority", id_col=id_col, k=k)


def group_cap(
    ds,
    cfg,
    *,
    strata_col: str,
    n_max: int,
    id_col: str = "doc_id",
    seed: int = 0,
):
    """EXACT per-stratum cap — keep exactly ``min(n_max, stratum size)``
    rows per stratum, chosen by ascending (hash(id|seed), id): the
    head-source / head-language cap when the count must be exact (the
    deterministic-exact complement to ``balance_sample``'s Binomial
    thresholding; same stable-hash rule, so the choice is seed-stable and
    rerun/resume-identical). Emits (strata_col, rank, id_col, priority)
    with rank 1..cap within the stratum.

    Pure reuse of the associative top-k machinery: priority = the id hash
    (int64), per-batch per-group partial top-k map-side, partials bucketed
    on hash(stratum) — the corpus never rides the exchange.
    """
    from .topk import group_topk

    if n_max < 1:
        raise ValueError(f"n_max must be >= 1, got {n_max}")

    def prio(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(id_col).cast(pa.string()), seed)
        return pa.table(
            {
                strata_col: batch.column(strata_col),
                id_col: batch.column(id_col),
                # shift into non-negative int64 preserving uint64 order
                "priority": pa.array(
                    (h >> np.uint64(1)).astype(np.int64)
                ),
            }
        )

    skinny = ds.select_columns([strata_col, id_col]).map_batches(
        prio, batch_format="pyarrow"
    )
    return group_topk(
        skinny, cfg, order_col="priority", id_col=id_col, k=n_max,
        group_col=strata_col, descending=False,
    )


def split_thresholds(train_pct: int, val_pct: int) -> tuple[int, int]:
    """Integer hash-space thresholds for the 3-way split, in one place so
    the engine and the SQL twin compare against the SAME constants:
    t1 = (train_pct << 32) // 100, t2 = ((train_pct + val_pct) << 32) // 100.
    Floor division of exact ints — a float round would hang engine-vs-
    oracle equality on a rounding boundary (the balance_sample rule)."""
    if not (0 <= train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(
            f"invalid split percentages train={train_pct} val={val_pct}"
        )
    t1 = (train_pct << 32) // 100
    t2 = ((train_pct + val_pct) << 32) // 100
    return t1, t2


def split_assign(
    ds,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    train_pct: int = 80,
    val_pct: int = 10,
):
    """Deterministic train/val/test split — the dataset-versioning staple
    of a training pipeline: every row gets a split label from its stable
    id-hash alone (train if h32 < t1, val if < t2, else test), so the
    assignment is shuffle-free, rerun/resume-stable, independent of
    partitioning, and DISJOINT BY CONSTRUCTION (one hash, three bands —
    unlike three independent samples, which would overlap). Growing the
    corpus never moves an existing row between splits. Output
    (id, split). Same md5-lower64 identity as hash_sample, so the split is
    exactly SQL-twinnable."""
    t1, t2 = split_thresholds(train_pct, val_pct)

    def assign(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(id_col).cast(pa.string()), seed)
        h32 = (h % _DENOM).astype(np.uint64)
        lab = np.where(
            h32 < np.uint64(t1),
            "train",
            np.where(h32 < np.uint64(t2), "val", "test"),
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "split": pa.array(lab, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def leakage_safe_split(
    ds,
    *,
    id_col: str = "doc_id",
    group_col: str = "cluster_id",
    seed: int = 7,
    train_pct: int = 90,
    val_pct: int = 5,
):
    """Leakage-safe train/val/test split: every row's split label derives
    from its GROUP's stable hash (near-dup cluster, conversation,
    source…), so all members of a group land in the SAME split and
    near-duplicates can never straddle train/test — the contamination
    failure the plain per-row split invites. Feed it a clustering output
    (e.g. minhash_lsh_dedup's (doc_id, cluster_id)); the assignment is
    shuffle-free (one stateless map over already-labeled rows), rerun-
    stable, and disjoint by construction (one hash, three bands — the
    split_assign rule applied to the group key). Output (id, group,
    split); same md5-lower64 identity as hash_sample → exactly
    SQL-twinnable."""
    t1, t2 = split_thresholds(train_pct, val_pct)

    def assign(batch: pa.Table) -> pa.Table:
        h = _id_hashes(batch.column(group_col).cast(pa.string()), seed)
        h32 = (h % _DENOM).astype(np.uint64)
        lab = np.where(
            h32 < np.uint64(t1),
            "train",
            np.where(h32 < np.uint64(t2), "val", "test"),
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "split": pa.array(lab, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
