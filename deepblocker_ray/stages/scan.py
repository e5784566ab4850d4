"""Shared exact distributed prefix-scan machinery.

Three layout operators rank or offset every row of a corpus against a
global order WITHOUT a global sort: ``packing.sequence_pack`` (token-offset
prefix sums over doc-id ranges), ``shuffle.corpus_shuffle`` (dense rank over
hash ranges) and ``packing.length_batches`` (dense rank over token-count
ranges). They share this step: map-side per-range weighted partials → O(R)
driver cumsum → broadcast offsets. Only skinny (key, weight) rows ever ride
an exchange; the driver state is O(R) regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def range_offsets(skinny, rng_fn, nr: int, weight_col: str | None = None):
    """Exact start offset of every range under the global order the ranges
    partition. ``rng_fn(batch) -> int64 ndarray`` assigns each row its range
    in [0, nr); ``weight_col`` sums that column per range (None = row
    counts). Returns ``(offsets ndarray[int64, nr], total int)`` — callers
    ``ray.put`` the offsets and finish per-range."""

    def partial(t: pa.Table) -> pa.Table:
        r = rng_fn(t)
        if weight_col is None:
            sums = np.bincount(r, minlength=nr).astype(np.int64)
        else:
            w = np.asarray(t.column(weight_col))
            sums = np.zeros(nr, np.int64)
            np.add.at(sums, r, w)  # exact int64 (bincount weights are float)
        nz = np.nonzero(sums)[0]
        return pa.table(
            {
                "_rng": pa.array(nz.astype(np.int64)),
                "_sum": pa.array(sums[nz].astype(np.int64)),
            }
        )

    part_df = skinny.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # ≤nr rows per batch — driver state stays O(nr)
    range_sums = np.zeros(nr, np.int64)
    if len(part_df):
        np.add.at(
            range_sums,
            part_df["_rng"].to_numpy(np.int64),
            part_df["_sum"].to_numpy(np.int64),
        )
    offsets = np.zeros(nr, np.int64)
    np.cumsum(range_sums[:-1], out=offsets[1:])
    return offsets, int(range_sums.sum())


def rank_transform(ds, cfg, *, id_col: str, value_col: str):
    """Exact global rank normalization — every row's 1-based
    ``row_number()`` under the total order (``value_col`` asc, ``id_col``
    asc), WITHOUT a global sort: the feature-engineering primitive behind
    percentile features, rank-based winsorization and copula transforms.
    Emits (id, value, rank). Both columns must be int64 (callers convert
    money to cents first — the repo-wide exactness rule).

    Same scale shape as the other ``scan`` users: skinny (id, value) rows
    only; value-RANGE partials → O(R) driver offsets → ONE bucketed
    exchange; per range a vectorized sort + arange + broadcast offset.
    Uniform values give even ranges; a single hot value bounds one range
    (per-range finish is O(range·log) compute, not a shuffle blow-up).
    """
    import pandas as pd

    import ray

    nr = cfg.num_buckets
    skinny = ds.select_columns([id_col, value_col]).materialize()

    from ray.data.aggregate import Max, Min

    bounds = skinny.aggregate(Min(value_col), Max(value_col))
    if bounds is None or bounds.get(f"min({value_col})") is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    value_col: pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        )
    lo = int(bounds[f"min({value_col})"])
    hi = int(bounds[f"max({value_col})"])
    span = float(hi - lo + 1)  # Python ints: no int64 overflow on wide spans

    def rng_of(v: np.ndarray) -> np.ndarray:
        # float mapping instead of (v-lo)*nr//span: the integer product
        # overflows int64 once span > 2^63/nr. IEEE division/multiply/floor
        # are monotone non-decreasing in v, which is all range-partitioning
        # needs (both passes use the identical function); clamp covers the
        # v == hi edge.
        # subtract in float too — int64 v - lo wraps when span > 2^63; the
        # int64→float64 conversion is itself monotone (ties are fine)
        r = v.astype(np.float64) - float(lo)
        return np.minimum(
            np.maximum((r / span * nr).astype(np.int64), 0),
            np.int64(nr - 1),
        )

    offsets, _total = range_offsets(
        skinny,
        lambda t: rng_of(np.asarray(t.column(value_col), np.int64)),
        nr,
    )
    off_ref = ray.put(offsets)

    def bucketed(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(value_col), np.int64)
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                value_col: pa.array(v),
                "_bucket": pa.array(rng_of(v).astype(np.int32)),
            }
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        offs = cached_get(off_ref)
        g = g.sort_values([value_col, id_col], kind="mergesort")
        pos = offs[int(g["_bucket"].iloc[0])] + np.arange(
            1, len(g) + 1, dtype=np.int64
        )
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                value_col: g[value_col].to_numpy(np.int64),
                "rank": pos,
            }
        )

    return (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank, batch_format="pandas")
    )


def ntile_bins(ds, cfg, *, id_col: str, value_col: str, k: int = 10):
    """Exact equal-frequency binning: bin = (rank − 1)·k // n over the
    total order (value asc, id asc) — the feature-engineering quantile
    bucket. The explicit floor formula (remainder spread evenly across
    bins) is pinned in the SQL twin rather than SQL NTILE, whose
    remainder goes to the FIRST bins — a different split. Emits
    (id, value, rank, bin:int64).

    Scale shape: ``rank_transform``'s range-partitioned scan (no global
    sort) plus one map-side formula; n is one driver-side scalar."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked = rank_transform(ds, cfg, id_col=id_col, value_col=value_col)
    ranked = ranked.materialize()
    n = ranked.count()

    def add_bin(t: pa.Table) -> pa.Table:
        r = np.asarray(t.column("rank"), np.int64)
        b = (r - 1) * k // max(n, 1)
        return t.append_column("bin", pa.array(b))

    return ranked.map_batches(add_bin, batch_format="pyarrow")


def id_gaps(ds, cfg, *, id_col: str):
    """Gaps-and-islands over an int64 id column: every maximal missing
    range strictly inside [min, max] of the DISTINCT ids — (gap_start,
    gap_end, gap_len:int64). The sequence-integrity check for ingest
    pipelines (dropped offsets, missing file parts).

    Scale shape: one (min, max) aggregate fixes nb equal-WIDTH value
    ranges; ids route to their range (dups land together and dedupe
    there); each range emits its internal gaps vectorized (diff on the
    sorted unique ids) plus one (range, lo, hi) summary row; the R
    summaries meet in a single tiny combine that emits the cross-range
    gaps (empty ranges collapse into them). Every globally-consecutive
    id pair is either intra-range (stage 2) or spans ranges (stage 3) —
    exactly one stage emits each gap."""
    import pandas as pd

    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    nr = cfg.num_buckets
    skinny = ds.select_columns([id_col]).materialize()
    bounds = skinny.aggregate(Min(id_col), Max(id_col))
    empty = pa.table(
        {
            "gap_start": pa.array([], pa.int64()),
            "gap_end": pa.array([], pa.int64()),
            "gap_len": pa.array([], pa.int64()),
        }
    )
    if bounds is None or bounds.get(f"min({id_col})") is None:
        return rd.from_arrow(empty)
    lo, hi = int(bounds[f"min({id_col})"]), int(bounds[f"max({id_col})"])
    width = max(1, (hi - lo) // nr + 1)

    def route(t: pa.Table) -> pd.DataFrame:
        ids = np.unique(np.asarray(t.column(id_col), np.int64))
        return pd.DataFrame(
            {"id": ids, "_bucket": ((ids - lo) // width).astype(np.int32)}
        )

    def in_range(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["id"].to_numpy(np.int64))
        d = np.diff(ids)
        at = np.flatnonzero(d > 1)
        gaps = pd.DataFrame(
            {
                "gap_start": ids[at] + 1,
                "gap_end": ids[at + 1] - 1,
                "_lo": np.zeros(len(at), np.int64),
                "_hi": np.zeros(len(at), np.int64),
                "_is_summary": np.zeros(len(at), np.int8),
            }
        )
        summary = pd.DataFrame(
            {
                "gap_start": [np.int64(0)],
                "gap_end": [np.int64(0)],
                "_lo": [ids[0]],
                "_hi": [ids[-1]],
                "_is_summary": [np.int8(1)],
            }
        )
        return pd.concat([gaps, summary], ignore_index=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["_is_summary"] == 0][["gap_start", "gap_end"]]
        s = df[df["_is_summary"] == 1].sort_values("_lo")
        hi_prev = s["_hi"].to_numpy(np.int64)[:-1]
        lo_next = s["_lo"].to_numpy(np.int64)[1:]
        cross = lo_next > hi_prev + 1
        out = pd.concat(
            [
                out,
                pd.DataFrame(
                    {
                        "gap_start": hi_prev[cross] + 1,
                        "gap_end": lo_next[cross] - 1,
                    }
                ),
            ],
            ignore_index=True,
        )
        gs = out["gap_start"].to_numpy(np.int64)
        ge = out["gap_end"].to_numpy(np.int64)
        # explicit Arrow schema: a 0-row pandas block loses its columns on
        # the way out (Ray drops empty pandas blocks from the schema)
        return pa.table(
            {
                "gap_start": pa.array(gs, pa.int64()),
                "gap_end": pa.array(ge, pa.int64()),
                "gap_len": pa.array(ge - gs + 1, pa.int64()),
            }
        )

    return (
        skinny.map_batches(route, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(in_range, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas")
    )


def running_total(ds, cfg, *, ts_col: str = "ts", value_col: str = "value"):
    """Exact global running total by day — the distributed prefix sum:
    (day = epoch-µs // 86400e6, day_cents = Σ round(value·100),
    cum_cents = running Σ over day order), all int64.

    Scale shape: the ``rank_transform`` scan pattern — per-batch per-day
    partials route to nb equal-WIDTH day ranges; range subtotals (R
    scalars, bounded by nb) come to the driver ONCE and ship back as
    prefix offsets; each range then finishes independently (sort its few
    days, cumsum, add offset). No global sort, no serial scan."""
    import pandas as pd

    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from ..state.broadcast import cached_get

    nr = cfg.num_buckets
    day_us = np.int64(86_400_000_000)

    def day_partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(
            t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        )
        cents = np.round(
            np.asarray(t.column(value_col), np.float64) * 100
        ).astype(np.int64)
        df = (
            pd.DataFrame({"day": ts // day_us, "cents": cents})
            .groupby("day", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return df

    partials = ds.map_batches(
        day_partial, batch_format="pyarrow"
    ).materialize()
    bounds = partials.aggregate(Min("day"), Max("day"))
    if bounds is None or bounds.get("min(day)") is None:
        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "day_cents": pa.array([], pa.int64()),
                    "cum_cents": pa.array([], pa.int64()),
                }
            )
        )
    lo, hi = int(bounds["min(day)"]), int(bounds["max(day)"])
    width = max(1, (hi - lo) // nr + 1)

    def route(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_range"] = (
            (out["day"].to_numpy(np.int64) - lo) // width
        ).astype(np.int32)
        return out

    routed = partials.map_batches(route, batch_format="pandas").materialize()

    def subtotal(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "_range": [np.int32(g["_range"].iloc[0])],
                "total": [np.int64(g["cents"].sum())],
            }
        )

    sub = (
        routed.groupby("_range")
        .map_groups(subtotal, batch_format="pandas")
        .to_pandas()
        .sort_values("_range")
    )
    offsets = np.zeros(nr + 1, np.int64)
    cum = 0
    for _, row in sub.iterrows():
        offsets[int(row["_range"])] = cum
        cum += int(row["total"])
    off_ref = ray.put(offsets)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        offs = cached_get(off_ref)
        s = (
            g.groupby("day", sort=False)["cents"].sum().reset_index()
        ).sort_values("day", kind="mergesort")
        day_cents = s["cents"].to_numpy(np.int64)
        cumv = np.cumsum(day_cents) + offs[int(g["_range"].iloc[0])]
        return pd.DataFrame(
            {
                "day": s["day"].to_numpy(np.int64),
                "day_cents": day_cents,
                "cum_cents": cumv.astype(np.int64),
            }
        )

    return (
        routed.groupby("_range").map_groups(finish, batch_format="pandas")
    )


def _order_stats(ds, cfg, *, id_col: str, value_col: str,
                 ranks: list[int]):
    """Values at specific 1-based global ranks (order statistics) via the
    rank scan — returns {rank: value} on the driver (len(ranks) scalars).
    Shared by winsorize / range_splits."""
    ranked = rank_transform(
        ds, cfg, id_col=id_col, value_col=value_col
    ).materialize()
    want = set(int(r) for r in ranks)

    def pick(t: pa.Table) -> pa.Table:
        r = np.asarray(t.column("rank"), np.int64)
        mask = np.isin(r, np.fromiter(want, np.int64, len(want)))
        return t.filter(pa.array(mask))

    rows = ranked.map_batches(pick, batch_format="pyarrow").to_pandas()
    return ranked, dict(
        zip(rows["rank"].to_numpy(np.int64),
            rows[value_col].to_numpy(np.int64))
    )


def winsorize(ds, cfg, *, id_col: str, value_col: str,
              lo_pct: int = 5, hi_pct: int = 95):
    """Exact percentile winsorization: clip values to the LOWER
    order-statistic bounds at ``lo_pct``/``hi_pct`` — rank (n−1)·p//100
    + 1 (1-based), the same lower-quantile rule as every exact quantile
    in this repo. Emits (id, value, clipped), all int64.

    Scale shape: the rank scan (no global sort) finds the two bounds —
    2 scalars to the driver — then one map-side clip over the already
    -materialized ranked rows; no further exchange."""
    if not (0 <= lo_pct <= hi_pct <= 100):
        raise ValueError(f"bad percentiles {lo_pct}, {hi_pct}")
    skinny = ds.select_columns([id_col, value_col]).materialize()
    n = skinny.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    value_col: pa.array([], pa.int64()),
                    "clipped": pa.array([], pa.int64()),
                }
            )
        )
    r_lo = (n - 1) * lo_pct // 100 + 1
    r_hi = (n - 1) * hi_pct // 100 + 1
    ranked, stats = _order_stats(
        skinny, cfg, id_col=id_col, value_col=value_col,
        ranks=[r_lo, r_hi],
    )
    lo_v, hi_v = stats[r_lo], stats[r_hi]

    def clip(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(value_col), np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                value_col: t.column(value_col),
                "clipped": pa.array(np.clip(v, lo_v, hi_v)),
            }
        )

    return ranked.map_batches(clip, batch_format="pyarrow").select_columns(
        [id_col, value_col, "clipped"]
    )


def range_splits(ds, cfg, *, id_col: str, key_col: str, k: int):
    """Balanced range-shard boundaries: the key at 1-based rank i·n//k
    for i = 1..k−1 under (key, id) order — the partition planner for
    range-sharding a 100-TB keyspace so each shard holds ~n/k rows.
    Output (split_idx:int64, boundary:int64); shard i = keys in
    (boundary[i−1], boundary[i]].

    Scale shape: the rank scan, then a k−1-row filter — boundaries never
    exceed O(k) driver state."""
    import ray.data as rd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    skinny = ds.select_columns([id_col, key_col]).materialize()
    n = skinny.count()
    targets = {i * n // k: i for i in range(1, k) if 1 <= i * n // k <= n}
    if not targets:
        return rd.from_arrow(
            pa.table(
                {
                    "split_idx": pa.array([], pa.int64()),
                    "boundary": pa.array([], pa.int64()),
                }
            )
        )
    _, stats = _order_stats(
        skinny, cfg, id_col=id_col, value_col=key_col,
        ranks=list(targets),
    )
    items = sorted((i, stats[r]) for r, i in targets.items())
    return rd.from_arrow(
        pa.table(
            {
                "split_idx": pa.array([i for i, _ in items], pa.int64()),
                "boundary": pa.array([b for _, b in items], pa.int64()),
            }
        )
    )
