"""Distributed top-k row selection — per group and global — via map-side
partial top-k.

The reference's only top-K surface is the per-QUERY-row neighbor top-K
(vector_pairing_models.py:36-46, handled by stages/pairing.py); a general
engine also needs top-k over ROWS of a table ("the 20 longest documents",
"the 5 highest-quality docs per language") without paying a global sort.

Scale shape: top-k is associative, so every map batch is first reduced to
its OWN top-k (per group) map-side; only those ≤ k×groups partial rows per
batch ride the exchange. Per-group mode buckets partials on a deterministic
hash of the group key (the repo's standard small-int-bucket exchange);
global mode collapses the tiny partials to one block. A full ``ds.sort``
would move the entire corpus through an all-to-all for k rows of output.

Ordering is total and deterministic: (order_col descending [or ascending],
id_col ascending) — equal order values are broken by the id, so the emitted
``rank`` (1-based within group) is exactly SQL's ``row_number() OVER
(PARTITION BY group ORDER BY order_col DESC, id_col)`` and the driver
oracles hash-match (see __ray_entry__.oracle_sql: ``global_topk``,
``group_topk``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig


def _hash_bucket_strs(values: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic bucket for a string key column: md5-lower64 hashed once
    per DISTINCT key (factorize), never per row. Null keys are rejected —
    a null group has no defined SQL-twin semantics here."""
    from .dedup import hash64_strs

    codes, uniq = pd.factorize(values, sort=False)
    if (codes < 0).any():
        raise ValueError("null group keys are not supported")
    uh = hash64_strs(uniq)
    return (uh[codes] % np.uint64(num_buckets)).astype(np.int32)


def _topk_frame(
    df: pd.DataFrame,
    group_col: str | None,
    order_col: str,
    id_col: str,
    k: int,
    descending: bool,
) -> pd.DataFrame:
    """Top-k rows (per group when group_col) under the total order
    (order_col desc|asc, id_col asc). Vectorized: one sort + groupby.head."""
    cols = ([group_col] if group_col else []) + [order_col, id_col]
    asc = ([True] if group_col else []) + [not descending, True]
    out = df.sort_values(cols, ascending=asc, kind="mergesort")
    if group_col:
        return out.groupby(group_col, sort=False, observed=True).head(k)
    return out.head(k)


def group_topk(
    ds,
    cfg: EngineConfig,
    *,
    order_col: str,
    id_col: str,
    k: int,
    group_col: str | None = None,
    descending: bool = True,
):
    """Top-k rows per group (or globally when ``group_col`` is None) under
    the deterministic order (order_col desc|asc, id_col asc). Emits

        ([group_col,] rank, id_col, order_col)

    with ``rank`` the 1-based position within the group."""
    # pandas head(k) with k < 1 silently returns "all but the last |k|"
    # rows — reject instead of shipping nearly the full corpus through
    # the exchange with a wrong result.
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    nb = cfg.num_buckets
    keep = ([group_col] if group_col else []) + [id_col, order_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        top = _topk_frame(df[keep], group_col, order_col, id_col, k, descending)
        if group_col:
            top = top.assign(
                _bucket=_hash_bucket_strs(top[group_col], nb)
            )
        return top

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keep]
        top = _topk_frame(df, group_col, order_col, id_col, k, descending)
        if group_col:
            rank = top.groupby(group_col, sort=False, observed=True).cumcount()
        else:
            rank = pd.Series(np.arange(len(top)), index=top.index)
        top = top.assign(rank=(rank + 1).astype("int64"))
        return top[([group_col] if group_col else []) + ["rank", id_col, order_col]]

    partials = ds.map_batches(partial, batch_format="pandas")
    if group_col:
        return partials.groupby("_bucket").map_groups(
            finish, batch_format="pandas"
        )
    # global mode: partials are ≤ k rows per input block — one tiny block
    return partials.repartition(1).map_batches(finish, batch_format="pandas")


# ------------------------------------------------- quantile threshold gate --


def group_quantile_filter(
    ds,
    cfg: EngineConfig,
    *,
    group_col: str,
    value_col: str,
    num: int,
    den: int,
    keep: str = "le",
):
    """Percentile-threshold gate (the C4/Gopher-style outlier filter): keep
    the rows of each group whose integer ``value_col`` is ≤ (``keep="le"``)
    or ≥ (``"ge"``) the group's exact discrete q-quantile, q = num/den —
    e.g. "drop documents longer than their language's p90".

    Quantile rule shared with events.value_quantiles: the q-th value is the
    element of rank ceil(q·n) (1-based) of the sorted group, the rank
    computed in exact integer arithmetic ((num·n + den − 1) // den — float
    q·n is wrong: 0.9×2000 = 1800.0000000000002).

    Scale shape — the corpus itself NEVER shuffles:
    1. map-side partial: each batch collapses to its distinct
       (group, value) counts;
    2. ONE bucketed exchange on hashed group merges the tiny partials and
       emits one (group, threshold) row per group (sort + cumsum +
       searchsorted);
    3. the threshold table (O(groups) rows) is broadcast via ``ray.put``
       and every batch filters map-side. Rows of groups absent from the
       threshold table (impossible by construction) would be dropped.
    """
    # num > den would index past the end of the cumsum inside a remote
    # task (opaque IndexError); den <= 0 likewise. Reject up front.
    if den <= 0 or num < 1 or num > den:
        raise ValueError(
            f"quantile num/den must satisfy 1 <= num <= den, got {num}/{den}"
        )
    import ray

    if keep not in ("le", "ge"):
        raise ValueError(f"keep must be 'le' or 'ge', got {keep!r}")
    nb = cfg.num_buckets

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([group_col, value_col], sort=False, observed=True)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["cnt"] = g["cnt"].astype("int64")
        g["_bucket"] = _hash_bucket_strs(g[group_col], nb)
        return g

    def thresholds(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for grp, g in df.groupby(group_col, sort=False, observed=True):
            agg = g.groupby(value_col, sort=True)["cnt"].sum()
            vals = agg.index.to_numpy(np.int64)
            cum = agg.to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            rank = (num * n + den - 1) // den
            rows.append(
                {group_col: grp,
                 "_thr": int(vals[np.searchsorted(cum, rank, "left")])}
            )
        if not rows:
            return pd.DataFrame(
                {group_col: pd.Series(dtype=object),
                 "_thr": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(rows)

    thr_df = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(thresholds, batch_format="pandas")
        .to_pandas()
    )
    thr_ref = ray.put(
        dict(zip(thr_df[group_col].tolist(), thr_df["_thr"].tolist()))
    )

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        thr_map = cached_get(thr_ref)
        thr = df[group_col].map(thr_map)
        vals = df[value_col]
        mask = (vals <= thr) if keep == "le" else (vals >= thr)
        return df[mask.fillna(False)]

    return ds.map_batches(gate, batch_format="pandas")


# ------------------------------------------------------ Borda rank fusion --


def rank_fusion(
    ranked_a,
    ranked_b,
    cfg: EngineConfig,
    *,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 10,
    penalty: int | None = None,
):
    """Borda-count fusion of two per-query candidate rankings — the
    standard hybrid-retrieval combiner (dense kNN list ∪ lexical/quantized
    list) kept INTEGER so the fused order is exact and SQL-twinnable:

        fused(q, item) = coalesce(rank_a, penalty) + coalesce(rank_b, penalty)

    with ``penalty`` defaulting to ``k`` (one past the worst possible
    0-based rank — an item missing from a list scores as if ranked just
    below its tail; reciprocal-rank fusion needs float 1/(c+r) sums whose
    order-dependence breaks exact reproducibility, Borda does not). Emits
    the per-query top-``k`` under (fused asc, item asc):
    (query_col, item_col, fused:int64, rank:int64 0-based) — missing-from-
    both items are by construction absent, queries present in either input
    appear with ≤ k rows.

    Scale shape: both inputs are already ≤ L rows per query (candidate
    lists, not the corpus); ONE hash(query) bucket exchange co-locates a
    query's ≤ 2L tagged rows, then one vectorized per-bucket pivot + sort.
    No corpus data rides the exchange and no per-distinct-query groupby is
    paid (the repo's standard small-int-bucket pattern)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pen = k if penalty is None else int(penalty)
    nb = cfg.num_buckets

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            q = df[query_col].astype(str)
            return pd.DataFrame(
                {
                    "_q": q.to_numpy(object),
                    "_item": df[item_col].astype(str).to_numpy(object),
                    "_r": df[rank_col].to_numpy(np.int64),
                    "_side": np.full(len(df), side, np.int8),
                    "_bucket": _hash_bucket_strs(q, nb),
                }
            )

        return f

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        p = (
            g.pivot_table(
                index=["_q", "_item"], columns="_side", values="_r",
                aggfunc="min",
            )
            .reindex(columns=[0, 1])
            .reset_index()
        )
        ra = p[0].fillna(pen).astype(np.int64) if 0 in p else np.full(
            len(p), pen, np.int64
        )
        rb = p[1].fillna(pen).astype(np.int64) if 1 in p else np.full(
            len(p), pen, np.int64
        )
        p["fused"] = ra + rb
        p = p.sort_values(["_q", "fused", "_item"], kind="mergesort")
        top = p.groupby("_q", sort=False).head(k)
        rank = top.groupby("_q", sort=False).cumcount().astype(np.int64)
        return pd.DataFrame(
            {
                query_col: top["_q"].to_numpy(object),
                item_col: top["_item"].to_numpy(object),
                "fused": top["fused"].to_numpy(np.int64),
                "rank": rank.to_numpy(np.int64),
            }
        )

    tagged = ranked_a.map_batches(tag(0), batch_format="pandas").union(
        ranked_b.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("_bucket").map_groups(fuse, batch_format="pandas")


def kendall_disagreement(
    ranked_a,
    ranked_b,
    cfg: EngineConfig,
    *,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
):
    """Kendall-tau disagreement between two per-query rankings — the
    ranker-drift diagnostic next to ``rank_fusion`` (fuse) and
    ``blocker_agreement`` (set overlap): per query, over the items BOTH
    rankers returned, the exact discordant-pair count

        n_disc = |{(i, j) : i < j by ranker A, j < i by ranker B}|

    plus n_shared, so Kendall's tau over the shared set is one formula
    away (1 - 4*n_disc / (s*(s-1))). Ranks are distinct within a ranker,
    so there are no ties to correct for. Queries present in both inputs
    with ≥ 1 shared item emit one row (n_shared = 1 gives n_disc = 0);
    a query whose two lists are disjoint emits nothing — the same rule
    as the SQL twin's inner shared-join.

    Scale shape: candidate lists are <= L rows per query; ONE hash(query)
    bucket exchange co-locates a query's rows, then pairs enumerate by
    repeat/offset index arithmetic over the per-query segments (O(s^2)
    with s <= L by construction — never corpus-sized)."""
    nb = cfg.num_buckets

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            q = df[query_col].astype(str)
            return pd.DataFrame(
                {
                    "_q": q.to_numpy(object),
                    "_item": df[item_col].astype(str).to_numpy(object),
                    "_r": df[rank_col].to_numpy(np.int64),
                    "_side": np.full(len(df), side, np.int8),
                    "_bucket": _hash_bucket_strs(q, nb),
                }
            )

        return f

    def fold(g: pd.DataFrame) -> pa.Table:
        a = g[g["_side"] == 0][["_q", "_item", "_r"]]
        b = g[g["_side"] == 1][["_q", "_item", "_r"]]
        m = a.merge(b, on=["_q", "_item"], suffixes=("_a", "_b"))
        if len(m) == 0:
            return pa.table(
                {
                    query_col: pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                    "n_disc": pa.array([], pa.int64()),
                }
            )
        m = m.sort_values(["_q", "_r_a"], kind="mergesort")
        q_codes, q_uniq = pd.factorize(m["_q"], sort=True)
        rb = m["_r_b"].to_numpy(np.int64)
        counts = np.bincount(q_codes)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # all within-query (i, j) pairs with i before j in A-rank order
        reps = (
            counts[q_codes]
            - (np.arange(len(m), dtype=np.int64) - starts[q_codes])
            - 1
        )
        i_idx = np.repeat(np.arange(len(m), dtype=np.int64), reps)
        off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        j_idx = i_idx + 1 + off
        disc = rb[i_idx] > rb[j_idx]  # A says i<j; discordant if B flips
        n_disc = np.zeros(len(q_uniq), np.int64)
        np.add.at(n_disc, q_codes[i_idx], disc.astype(np.int64))
        return pa.table(
            {
                query_col: pa.array(np.asarray(q_uniq, object),
                                    pa.string()),
                "n_shared": pa.array(counts.astype(np.int64)),
                "n_disc": pa.array(n_disc),
            }
        )

    tagged = ranked_a.map_batches(tag(0), batch_format="pandas").union(
        ranked_b.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("_bucket").map_groups(fold, batch_format="pandas")


def overlap_at_depth(
    ranked_a,
    ranked_b,
    cfg: EngineConfig,
    *,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 10,
):
    """Depth-wise ranking agreement — the integer sufficient statistics
    behind rank-biased overlap (RBO) and recall@k curves: per query and
    every depth d ∈ 1..k, n_overlap = |top_d(A) ∩ top_d(B)| (0-based
    ranks; a shared item enters at depth max(rank_a, rank_b)+1). RBO's
    geometric weighting is a float fold the CONSUMER applies to these
    exact counts — summing floats here would be order-dependent. Emits
    (query, depth:int64, n_overlap:int64), k rows per query present in
    either input.

    Scale shape: candidate lists are ≤ L rows per query; ONE hash(query)
    bucket exchange, then one bincount+cumsum per query."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    nb = cfg.num_buckets

    def tag(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            q = df[query_col].astype(str)
            return pd.DataFrame(
                {
                    "_q": q.to_numpy(object),
                    "_item": df[item_col].astype(str).to_numpy(object),
                    "_r": df[rank_col].to_numpy(np.int64),
                    "_side": np.full(len(df), side, np.int8),
                    "_bucket": _hash_bucket_strs(q, nb),
                }
            )

        return f

    def fold(g: pd.DataFrame) -> pa.Table:
        a = g[g["_side"] == 0][["_q", "_item", "_r"]]
        b = g[g["_side"] == 1][["_q", "_item", "_r"]]
        m = a.merge(b, on=["_q", "_item"], suffixes=("_a", "_b"))
        queries = pd.unique(g["_q"])
        qidx = {q: i for i, q in enumerate(queries)}
        counts = np.zeros((len(queries), k), np.int64)
        if len(m):
            enter = np.maximum(
                m["_r_a"].to_numpy(np.int64), m["_r_b"].to_numpy(np.int64)
            )
            qs = m["_q"].map(qidx).to_numpy(np.int64)
            ok = enter < k
            np.add.at(counts, (qs[ok], enter[ok]), 1)
        cum = np.cumsum(counts, axis=1)
        return pa.table(
            {
                query_col: pa.array(
                    np.repeat(np.asarray(queries, object), k),
                    pa.string(),
                ),
                "depth": pa.array(
                    np.tile(np.arange(1, k + 1, dtype=np.int64),
                            len(queries))
                ),
                "n_overlap": pa.array(cum.ravel()),
            }
        )

    tagged = ranked_a.map_batches(tag(0), batch_format="pandas").union(
        ranked_b.map_batches(tag(1), batch_format="pandas")
    )
    return tagged.groupby("_bucket").map_groups(fold, batch_format="pandas")
