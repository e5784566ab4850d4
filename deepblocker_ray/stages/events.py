"""Event-stream operators: gap-based sessionization, tumbling-window
aggregation, and an as-of (most-recent-prior) join.

The reference has no event/stream surface (its 745 LoC end at tuple
embedding + blocking); these are the windowed/stateful operators a
large-scale training-data pipeline needs and that Ray Data lacks natively.
All three follow the repo's standard scale shape:

- ONE hash-bucket exchange on the partition key (user_id), the same
  small-int-bucket pattern every other exchange in this repo uses — never a
  per-distinct-key groupby (Ray pays per-key overhead) and never a global
  sort (all-to-all over the corpus).
- Fully vectorized per-bucket kernels (numpy lexsort/cumsum/reduceat,
  pandas merge_asof) — no Python loop over rows.
- Money as integer cents (``round(value*100)`` as int64) and timestamps as
  epoch microseconds (int64), so every output column is exactly
  reproducible in the DuckDB SQL twins (float sums are order-dependent;
  integer sums are not).

Partitioning assumption (documented per the custom-operator contract): all
rows of one ``user_id`` land in one bucket, so per-user session boundaries
and as-of matches never cross a bucket. Window aggregation instead
pre-aggregates inside map_batches (partial combine) and exchanges only the
tiny (event_type, window) partials, bucketed by window index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig

_MIX64 = np.uint64(0x9E3779B97F4A7C15)


def _user_bucket(user_id: np.ndarray, num_buckets: int) -> np.ndarray:
    """Multiplicative-hash bucket for an int64 key column (skew-resistant vs
    raw modulo when ids are strided)."""
    u = user_id.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        mixed = (u * _MIX64) >> np.uint64(33)
    return (mixed % np.uint64(num_buckets)).astype(np.int32)


def _cents(value: np.ndarray) -> np.ndarray:
    """value → integer cents. ``np.rint`` and DuckDB ``round`` agree on every
    near-integer (they differ only at exact .5, impossible for 2-decimal
    inputs × 100), so integer-cent sums are bit-exact vs the SQL twin."""
    return np.rint(np.asarray(value, np.float64) * 100.0).astype(np.int64)


def _project_events(
    ds,
    cfg: EngineConfig,
    *,
    with_value: bool = False,
    with_type: bool = False,
    types: tuple[str, ...] | None = None,
):
    """Skinny projection: (event_id, user_id, ts_us[, cents][, event_type])
    + _bucket. Runs map-side before the exchange so only the needed int64
    columns ride the shuffle — at 100 TB the props/text payloads never move.
    """

    def project(t: pa.Table) -> pa.Table:
        if types is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.is_in(t.column("event_type"), pa.array(types)))
        user = np.asarray(t.column("user_id"), np.int64)
        cols = {
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            # normalize to epoch MICROseconds regardless of the source
            # timestamp unit (parquet is us; in-memory frames are often ns)
            "ts_us": t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            "_bucket": pa.array(_user_bucket(user, cfg.num_buckets)),
        }
        if with_value:
            cols["cents"] = pa.array(_cents(np.asarray(t.column("value"))))
        if with_type or types is not None:
            cols["event_type"] = t.column("event_type")
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


# ------------------------------------------------------------ sessionize --


def sessionize(ds, cfg: EngineConfig, gap_minutes: float = 30.0):
    """Gap-based sessionization: per user, events ordered by (ts, event_id)
    start a new session whenever the gap to the previous event exceeds
    ``gap_minutes``. Emits one row per session:

        (user_id, session_seq, n_events, t_start_us, t_end_us, sum_cents)

    ``session_seq`` is the 1-based session ordinal within the user. One
    bucketed exchange on hash(user_id); the per-bucket kernel is a single
    lexsort + boolean-diff + reduceat over the whole bucket (all users at
    once) — no per-user loop. SQL twin (lag/sum window functions) in
    __ray_entry__.oracle_sql."""
    gap_us = np.int64(round(gap_minutes * 60e6))
    skinny = _project_events(ds, cfg, with_value=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_sessions()
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, cents = u[order], ts[order], cents[order]
        new_user = np.ones(len(u), bool)
        new_user[1:] = u[1:] != u[:-1]
        new_s = new_user.copy()
        new_s[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_s)
        bounds = np.r_[starts, len(u)]
        n_events = np.diff(bounds)
        sess_user = u[starts]
        # 1-based ordinal within user: session index minus the index of the
        # user's first session
        first_of_user = new_user[starts]
        idx = np.arange(len(starts), dtype=np.int64)
        firsts = idx[first_of_user]
        base = np.repeat(firsts, np.diff(np.r_[firsts, len(starts)]))
        return pd.DataFrame(
            {
                "user_id": sess_user,
                "session_seq": idx - base + 1,
                "n_events": n_events.astype(np.int64),
                "t_start_us": ts[starts],
                "t_end_us": ts[bounds[1:] - 1],
                "sum_cents": np.add.reduceat(cents, starts),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def _empty_sessions() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series(dtype="int64")
            for c in (
                "user_id",
                "session_seq",
                "n_events",
                "t_start_us",
                "t_end_us",
                "sum_cents",
            )
        }
    )


# ------------------------------------------------------------ window_agg --


def window_agg(
    ds,
    cfg: EngineConfig,
    window_minutes: float = 60.0,
    hop_minutes: float | None = None,
):
    """Tumbling- or hopping-window rollup per (event_type, window):

        (event_type, window_us, n_events, sum_cents)

    ``window_us`` is the epoch-aligned window start in microseconds (for the
    60-minute default this equals ``date_trunc('hour', ts)``). With
    ``hop_minutes`` set (must divide ``window_minutes``), windows of length
    ``window_minutes`` start every ``hop_minutes`` and OVERLAP: each event
    lands in window/hop windows — the w/h replication happens map-side
    inside the partial combine, so the exchange still moves only partial
    rows, never events. The combiner runs INSIDE map_batches (partial
    counts/sums per batch) — the pre-aggregate-before-groupby pattern that
    keeps the shuffle O(keys) at 100 TB. Partials are bucketed by hashed
    window index."""
    window_us = np.int64(round(window_minutes * 60e6))
    hop_us = (
        window_us if hop_minutes is None
        else np.int64(round(hop_minutes * 60e6))
    )
    # hop_us <= 0 must be an explicit error: numpy int64 % 0 returns 0 with
    # only a RuntimeWarning, so a zero hop would sail past the divisibility
    # check and np.repeat(base, 0) would silently drop every event.
    if hop_us <= 0 or window_us % hop_us:
        raise ValueError("hop_minutes must be positive and divide window_minutes")
    n_win = int(window_us // hop_us)  # windows per event
    nb = cfg.num_buckets

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        )
        # latest hop-aligned start covering ts, then the n_win-1 earlier
        # starts (all of them cover ts because hop divides window)
        base = (ts // hop_us) * hop_us
        offs = np.arange(n_win, dtype=np.int64) * hop_us
        win = np.repeat(base, n_win) - np.tile(offs, len(base))
        df = pd.DataFrame(
            {
                "event_type": np.repeat(
                    t.column("event_type").to_numpy(zero_copy_only=False),
                    n_win,
                ),
                "window_us": win,
                "cents": np.repeat(
                    _cents(np.asarray(t.column("value"))), n_win
                ),
            }
        )
        g = (
            df.groupby(["event_type", "window_us"], sort=False, observed=True)
            .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "window_us": pa.array(g["window_us"].to_numpy(np.int64)),
                "n_events": pa.array(g["n_events"].to_numpy(np.int64)),
                "sum_cents": pa.array(g["sum_cents"].to_numpy(np.int64)),
                "_bucket": pa.array(
                    _user_bucket(
                        g["window_us"].to_numpy(np.int64) // hop_us, nb
                    )
                ),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["event_type", "window_us"], sort=False, observed=True)
            .agg(n_events=("n_events", "sum"), sum_cents=("sum_cents", "sum"))
            .reset_index()
        )
        g["n_events"] = g["n_events"].astype("int64")
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


# ------------------------------------------------------------- asof_join --


def asof_join(
    ds,
    cfg: EngineConfig,
    left_type: str = "click",
    right_type: str = "view",
):
    """As-of join within the event stream: for every ``left_type`` event,
    the most recent ``right_type`` event of the SAME user with
    ``right.ts <= left.ts`` (ties on ts broken by max event_id). Emits

        (event_id, user_id, ts_us, matched_id, lag_us)

    dropping left events with no prior match (inner as-of semantics).

    Ray Data has no as-of join; this is the composition form: one bucketed
    exchange on hash(user_id) co-locates each user's rows, then a
    per-bucket ``pandas.merge_asof`` (a vectorized sorted-merge backward
    scan) matches all users of the bucket in one pass. SQL twin
    (row_number over the range join) in __ray_entry__.oracle_sql."""
    if left_type == right_type:
        raise ValueError("asof_join requires distinct left/right event types")
    skinny = _project_events(ds, cfg, types=(left_type, right_type))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == left_type]
        right = df[df["event_type"] == right_type]
        if len(left) == 0 or len(right) == 0:
            return _empty_asof()
        left = left.sort_values(["ts_us", "event_id"])[
            ["event_id", "user_id", "ts_us"]
        ]
        right = (
            right.sort_values(["ts_us", "event_id"])[
                ["event_id", "user_id", "ts_us"]
            ]
            .rename(columns={"event_id": "matched_id", "ts_us": "m_ts_us"})
        )
        m = pd.merge_asof(
            left,
            right,
            left_on="ts_us",
            right_on="m_ts_us",
            by="user_id",
            direction="backward",
        )
        m = m[m["matched_id"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].to_numpy(np.int64),
                "user_id": m["user_id"].to_numpy(np.int64),
                "ts_us": m["ts_us"].to_numpy(np.int64),
                "matched_id": m["matched_id"].to_numpy(np.int64),
                "lag_us": (
                    m["ts_us"].to_numpy(np.int64)
                    - m["m_ts_us"].to_numpy(np.int64)
                ),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


# ----------------------------------------------------------- keep_latest --


def _latest_per_user(
    u: np.ndarray, ts: np.ndarray, eid: np.ndarray
) -> np.ndarray:
    """Indices of the winning row per user: max ts, ties broken by max
    event_id. One lexsort over the whole input (all users at once) + a
    last-of-run boundary mask — no per-user loop."""
    order = np.lexsort((eid, ts, u))
    last = np.ones(len(order), bool)
    last[:-1] = u[order][1:] != u[order][:-1]
    return order[last]


def keep_latest(ds, cfg: EngineConfig):
    """Snapshot compaction: the single most recent event per user
    (max ts, ties broken by max event_id) — the latest-version-per-key
    operator every mutable-corpus pipeline needs (latest crawl per URL,
    latest profile per account). Emits

        (user_id, event_id, ts_us, event_type)

    Scale shape: argmax is associative, so each map batch is first reduced
    to its OWN per-user winners map-side; only those winners (≤ distinct
    users per batch rows) ride the ONE bucketed exchange on hash(user_id),
    where the identical kernel picks the global winner per user. The event
    payload (props) never moves. SQL twin (row_number over
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) in
    __ray_entry__.oracle_sql."""
    skinny = _project_events(ds, cfg, with_type=True)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        u = np.asarray(t.column("user_id"), np.int64)
        ts = np.asarray(t.column("ts_us"), np.int64)
        eid = np.asarray(t.column("event_id"), np.int64)
        return t.take(pa.array(_latest_per_user(u, ts, eid)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "ts_us": pd.Series(dtype="int64"),
                    "event_type": pd.Series(dtype=object),
                }
            )
        win = _latest_per_user(
            df["user_id"].to_numpy(np.int64),
            df["ts_us"].to_numpy(np.int64),
            df["event_id"].to_numpy(np.int64),
        )
        out = df.iloc[win]
        return out[["user_id", "event_id", "ts_us", "event_type"]]

    return (
        skinny.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


# ------------------------------------------------------- value_quantiles --

# (numerator, denominator, column) — quantile ranks are computed in exact
# integer arithmetic (ceil(num·n/den) = (num·n + den − 1) // den), never via
# float q·n, because e.g. 0.9 × 2000 = 1800.0000000000002 in binary and a
# float ceil would silently shift the rank.
QUANTILES: list[tuple[int, int, str]] = [
    (1, 2, "p50_cents"),
    (9, 10, "p90_cents"),
    (99, 100, "p99_cents"),
]


def value_quantiles(ds, cfg: EngineConfig):
    """EXACT discrete quantiles of the event value per event_type:

        (event_type, n_events, p50_cents, p90_cents, p99_cents)

    where p_q is the q-th smallest-rank element (rank ceil(q·n), 1-based) of
    the sorted per-type cent values — the inverted-CDF definition, exactly
    reproducible in SQL via row_number.

    Scale shape: map_batches partials collapse each batch to its distinct
    (type, cents) counts — the exchange moves O(types × distinct cents) rows
    per batch, never events (cent values are a bounded domain; for genuinely
    unbounded heavy-tailed domains bin first). One bucketed exchange on
    hash(type); the per-type finish is a sort + cumsum + searchsorted."""
    nb = cfg.num_buckets

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas(),
                "cents": _cents(np.asarray(t.column("value"))),
            }
        )
        g = (
            df.groupby(["event_type", "cents"], sort=False, observed=True)
            .size()
            .rename("cnt")
            .reset_index()
        )
        # bucket on a DETERMINISTIC hash of the type string (per-batch
        # factorize codes are not stable across batches and would scatter
        # one type over several buckets); hashed once per distinct type
        codes, uniq = pd.factorize(g["event_type"], sort=False)
        from .dedup import hash64_strs

        uh = hash64_strs(uniq)
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "cents": pa.array(g["cents"].to_numpy(np.int64)),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
                "_bucket": pa.array(
                    (uh[codes] % np.uint64(nb)).astype(np.int32)
                ),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for etype, g in df.groupby("event_type", sort=False, observed=True):
            agg = g.groupby("cents", sort=True)["cnt"].sum()
            cents = agg.index.to_numpy(np.int64)
            cum = agg.to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            row = {"event_type": etype, "n_events": n}
            for num, den, col in QUANTILES:
                rank = (num * n + den - 1) // den
                row[col] = int(cents[np.searchsorted(cum, rank, "left")])
            out_rows.append(row)
        if not out_rows:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_events": pd.Series(dtype="int64"),
                    **{
                        c: pd.Series(dtype="int64")
                        for _, _, c in QUANTILES
                    },
                }
            )
        return pd.DataFrame(out_rows)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


def _empty_asof() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series(dtype="int64")
            for c in ("event_id", "user_id", "ts_us", "matched_id", "lag_us")
        }
    )


# ---------------------------------------------------------- MAD outliers --


def _group_median_from_counts(ds_counts):
    """(group, value, cnt) partial rows → {group: exact discrete median}
    with the (n+1)//2 lower-middle rank rule (1-based). Driver state is
    O(groups); the exchange already happened upstream."""
    df = ds_counts.to_pandas()
    med: dict = {}
    if len(df) == 0:
        return med
    for grp, g in df.groupby("_grp", sort=False, observed=True):
        agg = g.groupby("_val", sort=True)["_cnt"].sum()
        vals = agg.index.to_numpy(np.int64)
        cum = agg.to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        rank = (n + 1) // 2
        med[grp] = int(vals[np.searchsorted(cum, rank, "left")])
    return med


def value_outliers(ds, cfg: EngineConfig, *, k: int = 3):
    """Robust per-type outlier flags on the event value, in EXACT integer
    arithmetic: med = discrete median of cents (lower-middle rank
    (n+1)//2), mad = discrete median of |cents − med|, outlier ⇔
    |cents − med| > k·mad. Median/MAD resist the contamination that makes
    mean/stddev gates circular (the outliers move the gate).

    Output: (event_id, event_type, cents, med_cents, mad_cents,
    is_outlier). Two statistics passes ship only per-batch (type, value)
    count partials — O(types × distinct cents) rows, never events — then
    one map-side flagging pass; medians broadcast as an O(types) dict.
    Every quantity is an int64, so the SQL twin (row_number rank picks)
    matches bit-for-bit."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")

    def counts_of(value_fn):
        def partial(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "_grp": t.column("event_type").to_pandas(),
                    "_val": value_fn(t),
                }
            )
            g = (
                df.groupby(["_grp", "_val"], sort=False, observed=True)
                .size().rename("_cnt").reset_index()
            )
            return pa.table(
                {
                    "_grp": pa.array(g["_grp"], pa.string()),
                    "_val": pa.array(g["_val"].to_numpy(np.int64)),
                    "_cnt": pa.array(g["_cnt"].to_numpy(np.int64)),
                }
            )

        return ds.map_batches(partial, batch_format="pyarrow").repartition(
            1
        ).map_batches(
            lambda df: df.groupby(["_grp", "_val"], sort=False)
            .agg(_cnt=("_cnt", "sum")).reset_index(),
            batch_format="pandas",
        )

    import ray

    cents_fn = lambda t: _cents(np.asarray(t.column("value")))  # noqa: E731
    med = _group_median_from_counts(counts_of(cents_fn))
    med_ref = ray.put(med)

    def dev_fn(t: pa.Table) -> np.ndarray:
        from ..state.broadcast import cached_get

        m = cached_get(med_ref)
        c = _cents(np.asarray(t.column("value")))
        mm = np.fromiter(
            (m[g] for g in t.column("event_type").to_pylist()),
            np.int64,
            len(c),
        )
        return np.abs(c - mm)

    mad = _group_median_from_counts(counts_of(dev_fn))
    mad_ref = ray.put(mad)

    def flag(t: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        m = cached_get(med_ref)
        md = cached_get(mad_ref)
        types = t.column("event_type").to_pylist()
        c = _cents(np.asarray(t.column("value")))
        mm = np.fromiter((m[g] for g in types), np.int64, len(c))
        dd = np.fromiter((md[g] for g in types), np.int64, len(c))
        dev = np.abs(c - mm)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "cents": pa.array(c),
                "med_cents": pa.array(mm),
                "mad_cents": pa.array(dd),
                "is_outlier": pa.array(dev > k * dd),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------------- rolling aggregate --


def rolling_agg(ds, cfg: EngineConfig, *, window: int = 4):
    """Per-user ORDERED rolling aggregate — the windowed primitive behind
    rate metrics and smoothing: for each event, sum/mean of the value over
    the last ``window`` events of the same user ordered by (ts, event_id)
    (SQL frame ROWS BETWEEN window−1 PRECEDING AND CURRENT ROW; expanding
    at each user's head). Output
    (event_id, user_id, roll_n, roll_sum_cents, roll_mean).

    One bucketed exchange on hash(user_id) of skinny int64 rows; the
    per-bucket kernel is a single lexsort + ONE cumulative sum over the
    whole bucket — the rolling sum is cs[i+1] − cs[lo] with the window
    lower bound clamped to each user's segment start by pure index
    arithmetic (no per-user loop, no pandas rolling). Sums are exact
    int64 cents; roll_mean is one IEEE division of those ints, so the SQL
    twin matches bit-for-bit."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    skinny = _project_events(ds, cfg, with_value=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty_rolling()
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, cents = u[order], ts[order], eid[order], cents[order]
        n = len(u)
        new_user = np.ones(n, bool)
        new_user[1:] = u[1:] != u[:-1]
        seg_start = np.flatnonzero(new_user)
        start_of = np.repeat(seg_start, np.diff(np.r_[seg_start, n]))
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - (window - 1), start_of)
        cs = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        roll_sum = cs[idx + 1] - cs[lo]
        roll_n = idx - lo + 1
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "roll_n": roll_n,
                "roll_sum_cents": roll_sum,
                "roll_mean": roll_sum / roll_n,
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def _empty_rolling() -> pd.DataFrame:
    cols = {
        c: pd.Series(dtype=np.int64)
        for c in ("event_id", "user_id", "roll_n", "roll_sum_cents")
    }
    cols["roll_mean"] = pd.Series(dtype=np.float64)
    return pd.DataFrame(cols)


def debounce(ds, cfg: EngineConfig, *, gap_seconds: float = 60.0):
    """Min-gap suppression — the telemetry/click-stream noise filter: an
    event is DROPPED when the immediately preceding event of the same
    (user_id, event_type), ordered by (ts, event_id), is within
    ``gap_seconds``. The comparison is against the previous event in the
    stream (the SQL ``lag`` rule — exact, order-independent to compute),
    NOT against the last kept one; a steady sub-gap stream therefore keeps
    every other event rather than only the first (document-pinned
    semantics, matched bit-for-bit by the twin's window function).

    One bucketed exchange of skinny int64 rows on hash(user_id); per
    bucket a single lexsort over (user, type-code, ts, event_id) and one
    shifted-diff — no per-key loop. Emits (event_id, user_id, event_type)
    for the kept events.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    gap_us = int(round(gap_seconds * 1e6))
    skinny = _project_events(ds, cfg, with_type=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype=np.int64),
                    "user_id": pd.Series(dtype=np.int64),
                    "event_type": pd.Series(dtype=object),
                }
            )
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        etype = df["event_type"].to_numpy(object)
        tcode, tuniq = pd.factorize(etype, sort=False)
        order = np.lexsort((eid, ts, tcode, u))
        u, ts, eid, tcode = u[order], ts[order], eid[order], tcode[order]
        same_key = np.zeros(len(u), bool)
        same_key[1:] = (u[1:] == u[:-1]) & (tcode[1:] == tcode[:-1])
        gap_ok = np.ones(len(u), bool)
        gap_ok[1:] = (ts[1:] - ts[:-1]) > gap_us
        keep = ~same_key | gap_ok
        return pd.DataFrame(
            {
                "event_id": eid[keep],
                "user_id": u[keep],
                # factorize gives code -1 for NULL types (one group, the
                # same null-grouping SQL window partitioning uses) —
                # tuniq.take(-1) would WRAP to the last type; emit None
                "event_type": np.where(
                    tcode[keep] >= 0,
                    tuniq.take(np.maximum(tcode[keep], 0)),
                    None,
                ),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def value_histogram(ds, cfg: EngineConfig, *, n_bins: int = 20):
    """Fixed-width histogram of the event value in integer cents — the
    distribution scan behind threshold picking and drift monitoring.
    Bin edges derive from the global (min, max): width = ceil(span/n_bins)
    in exact integer arithmetic, bin = (cents − lo) // width, so the SQL
    twin reproduces every edge bit-for-bit (a float width would hang bin
    membership on rounding). Emits (bin:int64, lo_cents, hi_cents,
    n:int64) for non-empty bins only; hi_cents is EXCLUSIVE except the
    last bin, which the floor rule closes at the max.

    Two scalar aggregates (min/max) + map-side bincount partials: the
    exchange carries O(n_bins × blocks) int rows to one tiny combine —
    the corpus never shuffles.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")

    def cents_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {"cents": pa.array(_cents(np.asarray(t.column("value"))))}
        )

    skinny = ds.select_columns(["value"]).map_batches(
        cents_of, batch_format="pyarrow"
    ).materialize()

    import ray
    from ray.data.aggregate import Max, Min

    bounds = skinny.aggregate(Min("cents"), Max("cents"))
    empty = pa.table(
        {
            "bin": pa.array([], pa.int64()),
            "lo_cents": pa.array([], pa.int64()),
            "hi_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    if bounds is None or bounds.get("min(cents)") is None:
        return ray.data.from_arrow(empty)
    lo = int(bounds["min(cents)"])
    hi = int(bounds["max(cents)"])
    width = max((hi - lo + n_bins) // n_bins, 1)  # ceil(span+1 / n_bins)

    def partial(t: pa.Table) -> pa.Table:
        c = np.asarray(t.column("cents"), np.int64)
        b = (c - lo) // width
        counts = np.bincount(b, minlength=n_bins).astype(np.int64)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bin": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz]),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", sort=True)["n"].sum().reset_index()
        b = g["bin"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "bin": b,
                "lo_cents": lo + b * width,
                "hi_cents": lo + (b + 1) * width,
                "n": g["n"].to_numpy(np.int64),
            }
        )

    return (
        skinny.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def window_distinct(ds, cfg: EngineConfig, *, window_minutes: float = 60.0):
    """EXACT distinct-user count per (event_type, tumbling window) — the
    unique-visitors rollup (the exact companion to the HLL sketch in
    ``stages/sketch.py``, for when the key space per window fits and the
    answer must be exact). Emits (event_type, window_us, n_users:int64).

    Map-side the batch collapses to its DISTINCT (type, window, user)
    triples (np.unique over packed int codes — already deduplicated, so
    the exchange carries at most the per-batch distinct set, bucketed on
    hash(user)); buckets partition users, so per-bucket distinct counts
    are disjoint and exact, and only (type, window, partial) rows reach
    the final O(keys) combine.
    """
    window_us = np.int64(round(window_minutes * 60e6))
    if window_us <= 0:
        raise ValueError(f"window_minutes must be > 0, got {window_minutes}")
    nb = cfg.num_buckets
    skinny = _project_events(ds, cfg, with_type=True)

    def partial(t: pa.Table) -> pd.DataFrame:
        if len(t) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "window_us": pd.Series(dtype=np.int64),
                    "user_id": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_numpy(
                    zero_copy_only=False
                ),
                "window_us": (
                    np.asarray(t.column("ts_us"), np.int64) // window_us
                ) * window_us,
                "user_id": np.asarray(t.column("user_id"), np.int64),
            }
        ).drop_duplicates()
        df["_bucket"] = _user_bucket(df["user_id"].to_numpy(np.int64), nb)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "window_us": pd.Series(dtype=np.int64),
                    "n_users": pd.Series(dtype=np.int64),
                }
            )
        d = df[["event_type", "window_us", "user_id"]].drop_duplicates()
        g = (
            d.groupby(["event_type", "window_us"], sort=False,
                      observed=True)
            .size()
            .reset_index(name="n_users")
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["event_type", "window_us"], sort=False,
                       observed=True)["n_users"]
            .sum()
            .reset_index()
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return (
        skinny.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def funnel(
    ds,
    cfg: EngineConfig,
    *,
    first_type: str,
    then_type: str,
    within_minutes: float = 60.0,
):
    """Two-step funnel — the conversion primitive of event analytics: for
    every user with at least one ``first_type`` event, did a
    ``then_type`` event follow their EARLIEST ``first_type`` within
    ``within_minutes``? Emits (user_id, ts_a_us:int64, converted:bool)
    with ts_a = min ts of the first step (the window is (ts_a,
    ts_a + within]; strictly-after, inclusive end — pinned semantics the
    twin reproduces with an EXISTS).

    One bucketed exchange of skinny (user, ts, type) int rows filtered to
    the two step types map-side; per bucket both steps resolve vectorized
    (segment-min for step A, one merge + boolean groupby-any for step B —
    no per-user loop).
    """
    if first_type == then_type:
        raise ValueError("funnel steps must differ")
    within_us = np.int64(round(within_minutes * 60e6))
    if within_us <= 0:
        raise ValueError(
            f"within_minutes must be > 0, got {within_minutes}"
        )
    skinny = _project_events(ds, cfg, types=(first_type, then_type))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "ts_a_us": pd.Series(dtype=np.int64),
                "converted": pd.Series(dtype=bool),
            }
        )
        if len(df) == 0:
            return empty
        a = df[df["event_type"] == first_type]
        if not len(a):
            return empty
        ts_a = a.groupby("user_id", sort=True)["ts_us"].min()
        b = df[df["event_type"] == then_type][["user_id", "ts_us"]]
        m = b.merge(
            ts_a.rename("ts_a").reset_index(), on="user_id", how="inner"
        )
        hit = m[
            (m["ts_us"] > m["ts_a"])
            & (m["ts_us"] <= m["ts_a"] + within_us)
        ]
        users = ts_a.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "user_id": users,
                "ts_a_us": ts_a.to_numpy(np.int64),
                "converted": np.isin(
                    users, hit["user_id"].unique()
                ),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def retention(ds, cfg: EngineConfig, *, period_days: float = 7.0):
    """Cohort retention — the activity-over-time rollup: cohort = each
    user's FIRST-activity period (epoch-aligned ``period_days`` bins);
    for every (cohort, periods-since-cohort) pair, how many of the
    cohort's users were active then. Emits (cohort_us:int64,
    period_offset:int64, n_users:int64) — offset 0 rows equal cohort
    sizes by construction.

    Map-side each batch collapses to DISTINCT (user, period) pairs; ONE
    bucketed exchange on hash(user) (all periods of a user co-locate, so
    the per-bucket cohort assignment is exact and bucket partials are
    disjoint in users); per bucket a segment-min + offset count, then the
    tiny (cohort, offset, n) partials sum in an O(keys) combine.
    """
    period_us = np.int64(round(period_days * 86_400e6))
    if period_us <= 0:
        raise ValueError(f"period_days must be > 0, got {period_days}")
    nb = cfg.num_buckets
    skinny = _project_events(ds, cfg)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": np.asarray(t.column("user_id"), np.int64),
                "period": (
                    np.asarray(t.column("ts_us"), np.int64) // period_us
                ),
            }
        ).drop_duplicates()
        df["_bucket"] = _user_bucket(df["user_id"].to_numpy(np.int64), nb)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cohort_us": pd.Series(dtype=np.int64),
                "period_offset": pd.Series(dtype=np.int64),
                "n_users": pd.Series(dtype=np.int64),
            }
        )
        if len(df) == 0:
            return empty
        d = df[["user_id", "period"]].drop_duplicates()
        first = d.groupby("user_id", sort=False)["period"].transform("min")
        g = (
            pd.DataFrame(
                {
                    "cohort_us": first.to_numpy(np.int64) * period_us,
                    "period_offset": d["period"].to_numpy(np.int64)
                    - first.to_numpy(np.int64),
                }
            )
            .groupby(["cohort_us", "period_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["cohort_us", "period_offset"], sort=True)["n_users"]
            .sum()
            .reset_index()
        )
        g["n_users"] = g["n_users"].astype(np.int64)
        return g

    return (
        skinny.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def transition_counts(ds, cfg: EngineConfig):
    """Event-type transition (Markov-edge) counts — the user-journey
    bigram table: for every user's event stream ordered by (ts, event_id),
    count each consecutive (from_type → to_type) pair corpus-wide. Pairs
    touching a NULL event_type are dropped (the twin's
    ``prev IS NOT NULL AND event_type IS NOT NULL`` rule). Emits
    (from_type, to_type, n_transitions:int64).

    Scale shape: skinny int64 projection map-side, ONE bucketed exchange
    on hash(user_id) (a user's whole stream co-locates, so consecutive
    pairs are exact); per bucket a single lexsort + shifted compare and a
    bincount over pair codes — no per-user loop. Bucket partials are
    (from, to, cnt) rows, at most |types|² per bucket, combined by a
    second tiny pair-bucket exchange; driver state is O(1).
    """
    skinny = _project_events(ds, cfg, with_type=True)
    nb = cfg.num_buckets

    empty = pd.DataFrame(
        {
            "from_type": pd.Series(dtype=object),
            "to_type": pd.Series(dtype=object),
            "cnt": pd.Series(dtype=np.int64),
            "_bucket2": pd.Series(dtype=np.int32),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        tcode, tuniq = pd.factorize(df["event_type"].to_numpy(object))
        order = np.lexsort((eid, ts, u))
        u, tcode = u[order], tcode[order]
        ok = (u[1:] == u[:-1]) & (tcode[1:] >= 0) & (tcode[:-1] >= 0)
        fr = tcode[:-1][ok]
        to = tcode[1:][ok]
        if len(fr) == 0:
            return empty
        # sparse pair-code counting: np.unique bounds memory by OBSERVED
        # (from,to) pairs — a dense k*k bincount would allocate quadratic
        # space for open type domains (URL/page-id-valued event types)
        k = np.int64(len(tuniq))
        nz, counts = np.unique(fr * k + to, return_counts=True)
        out = pd.DataFrame(
            {
                "from_type": tuniq.take(nz // k),
                "to_type": tuniq.take(nz % k),
                "cnt": counts.astype(np.int64),
            }
        )
        from .canonicalize import bucket_of

        out["_bucket2"] = bucket_of(
            out["from_type"].astype(str) + "\x00" + out["to_type"].astype(str),
            nb,
        )
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["from_type", "to_type"], sort=False)["cnt"].sum()
        return pd.DataFrame(
            {
                "from_type": s.index.get_level_values(0),
                "to_type": s.index.get_level_values(1),
                "n_transitions": s.to_numpy(np.int64),
            }
        )

    return (
        skinny.groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(combine, batch_format="pandas")
    )


def session_paths(ds, cfg: EngineConfig, *, gap_minutes: float = 30.0):
    """Per-session ordered event-type path — the clickstream journey
    string: sessions form exactly as in ``sessionize`` (gap > gap_minutes
    starts a new one; order (ts, event_id)); each session emits
    (user_id, session_seq, path, n_events) with ``path`` = event types
    joined by '>' in stream order, NULL types rendered as '' (the twin's
    ``string_agg(coalesce(event_type, ''), '>')``).

    One bucketed exchange on hash(user_id) — the same single-lexsort
    session kernel as sessionize; the only per-session work is the
    unavoidable output-string join (pandas groupby-agg over codes,
    bounded by output size)."""
    gap_us = np.int64(round(gap_minutes * 60e6))
    skinny = _project_events(ds, cfg, with_type=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "session_seq": pd.Series(dtype=np.int64),
                "path": pd.Series(dtype=object),
                "n_events": pd.Series(dtype=np.int64),
            }
        )
        if len(df) == 0:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        etype = df["event_type"].to_numpy(object)
        order = np.lexsort((eid, ts, u))
        u, ts, etype = u[order], ts[order], etype[order]
        new_user = np.ones(len(u), bool)
        new_user[1:] = u[1:] != u[:-1]
        new_s = new_user.copy()
        new_s[1:] |= (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(new_s) - 1  # 0-based global session index
        starts = np.flatnonzero(new_s)
        n_events = np.diff(np.r_[starts, len(u)])
        first_of_user = new_user[starts]
        idx = np.arange(len(starts), dtype=np.int64)
        firsts = idx[first_of_user]
        base = np.repeat(firsts, np.diff(np.r_[firsts, len(starts)]))
        paths = (
            pd.Series(
                np.where(pd.isna(etype), "", etype.astype(str)), dtype=object
            )
            .groupby(sess, sort=True)
            .agg(">".join)
            .to_numpy(object)
        )
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "session_seq": idx - base + 1,
                "path": paths,
                "n_events": n_events.astype(np.int64),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def pivot_counts(
    ds,
    cfg: EngineConfig,
    *,
    types: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
):
    """Cross-tab pivot — the long→wide reshape: one row per user with one
    ``n_<type>`` count column per requested type plus ``n_other`` (any
    type NOT in ``types``, including NULL) and ``n_total``. The output
    schema is FIXED by the ``types`` argument (schema discovery from data
    would make the schema depend on which values exist — non-deterministic
    under sampling and un-twinnable), exactly like SQL's conditional
    aggregates.

    Scale shape: each batch collapses to a (user × type) count matrix
    map-side (factorize + one bincount — already the wide shape), so the
    ONE hash(user) exchange carries at most |users-in-batch| skinny int64
    rows; per bucket a plain column-sum groupby. Column count is
    len(types)+2 — the caller bounds it."""
    if len(set(types)) != len(types) or not types:
        raise ValueError(f"types must be non-empty and unique, got {types!r}")
    if {"other", "total"} & set(types):
        raise ValueError(
            "'other'/'total' collide with the built-in n_other/n_total "
            f"columns, got {types!r}"
        )
    skinny = _project_events(ds, cfg, with_type=True)
    cols = [f"n_{t}" for t in types] + ["n_other", "n_total"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ["user_id", *cols]}
            )
            out["_bucket"] = pd.Series(dtype=np.int32)
            return out
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(object)
        ucode, uuniq = pd.factorize(u)
        k = len(types)
        tmap = {t: i for i, t in enumerate(types)}
        tcode = np.fromiter(
            (tmap.get(t, k) for t in et), np.int64, len(et)
        )  # k = "other" slot (unknown or NULL type)
        mat = np.bincount(
            ucode * (k + 1) + tcode, minlength=len(uuniq) * (k + 1)
        ).reshape(len(uuniq), k + 1)
        out = pd.DataFrame(
            {"user_id": uuniq.astype(np.int64)}
        )
        for i, t in enumerate(types):
            out[f"n_{t}"] = mat[:, i].astype(np.int64)
        out["n_other"] = mat[:, k].astype(np.int64)
        out["n_total"] = mat.sum(axis=1).astype(np.int64)
        out["_bucket"] = _user_bucket(
            out["user_id"].to_numpy(np.int64), cfg.num_buckets
        )
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id", sort=False)[cols].sum().reset_index()
        for c in cols:
            s[c] = s[c].astype("int64")
        return s

    return (
        skinny.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def resample_ffill(ds, cfg: EngineConfig, *, period_minutes: float = 60.0):
    """Gap-fill resampling — the feature-pipeline regularizer: for every
    user, one row per epoch-aligned period boundary inside the user's
    event span ([ceil(min_ts/P)·P .. floor(max_ts/P)·P]), carrying the
    most recent value at or before that boundary (forward fill; ties on
    ts broken by max event_id). Emits (user_id, period_us, cents). Users
    whose span contains no aligned boundary emit nothing — identical to
    the twin's generate_series(gs, ge) being empty when gs > ge.

    One bucketed exchange on hash(user_id); per bucket the grid is pure
    index arithmetic (repeat + arange) and the fill is ONE
    ``pandas.merge_asof`` backward scan over all users of the bucket.
    Grid size is span/P per user — bounded by the caller's period, never
    by event count."""
    if period_minutes <= 0:
        raise ValueError(f"period_minutes must be > 0, got {period_minutes}")
    p_us = np.int64(round(period_minutes * 60e6))
    skinny = _project_events(ds, cfg, with_value=True)

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype=np.int64),
            "period_us": pd.Series(dtype=np.int64),
            "cents": pd.Series(dtype=np.int64),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        ev = df.sort_values(["ts_us", "event_id"], kind="mergesort")[
            ["user_id", "ts_us", "cents"]
        ]
        g = df.groupby("user_id", sort=True)["ts_us"].agg(["min", "max"])
        start = -(-g["min"].to_numpy(np.int64) // p_us) * p_us
        end = (g["max"].to_numpy(np.int64) // p_us) * p_us
        cnt = np.maximum((end - start) // p_us + 1, 0)
        if cnt.sum() == 0:
            return empty
        users = np.repeat(g.index.to_numpy(np.int64), cnt)
        offs = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        period = np.repeat(start, cnt) + offs * p_us
        grid = pd.DataFrame({"user_id": users, "period_us": period})
        m = pd.merge_asof(
            grid.sort_values("period_us", kind="mergesort"),
            ev,
            left_on="period_us",
            right_on="ts_us",
            by="user_id",
            direction="backward",
        )
        # period >= the user's first event by construction → always matched
        return pd.DataFrame(
            {
                "user_id": m["user_id"].to_numpy(np.int64),
                "period_us": m["period_us"].to_numpy(np.int64),
                "cents": m["cents"].to_numpy(np.int64),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def gap_stats(ds, cfg: EngineConfig):
    """Inter-event gap statistics per user — the cadence profile: over
    each user's stream ordered by (ts, event_id), the consecutive-gap
    list yields (user_id, n_gaps, median_gap_us, max_gap_us). Median is
    the LOWER median (sorted[(n-1)//2]) — bit-identical to DuckDB's
    ``quantile_disc(0.5)``. Users with a single event emit nothing (no
    gaps), matching the twin's HAVING count(*) >= 2.

    One bucketed exchange of skinny int64 rows; per bucket a single
    lexsort + diff, then one more lexsort over (user, gap) to read each
    user's k-th order statistic by pure index arithmetic — no per-user
    loop."""
    skinny = _project_events(ds, cfg)

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype=np.int64),
            "n_gaps": pd.Series(dtype=np.int64),
            "median_gap_us": pd.Series(dtype=np.int64),
            "max_gap_us": pd.Series(dtype=np.int64),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = u[1:] == u[:-1]
        gu = u[1:][same]
        gaps = (ts[1:] - ts[:-1])[same]
        if len(gaps) == 0:
            return empty
        o2 = np.lexsort((gaps, gu))
        gu, gaps = gu[o2], gaps[o2]
        starts = np.flatnonzero(
            np.concatenate(([True], gu[1:] != gu[:-1]))
        )
        n = np.diff(np.concatenate((starts, [len(gu)])))
        med = gaps[starts + (n - 1) // 2]
        mx = gaps[starts + n - 1]
        return pd.DataFrame(
            {
                "user_id": gu[starts],
                "n_gaps": n.astype(np.int64),
                "median_gap_us": med,
                "max_gap_us": mx,
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def window_join(
    ds,
    cfg: EngineConfig,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    lookback_minutes: float = 60.0,
):
    """Windowed stream-stream join — the attribution shape: every
    ``left_type`` event matched to ALL ``right_type`` events of the same
    user within the lookback window (``left.ts - Δ <= right.ts <=
    left.ts``; unlike ``asof_join`` which keeps only the latest). Emits
    (left_id, right_id, user_id, lag_us) with 0 ≤ lag_us ≤ Δ.

    One bucketed exchange on hash(user_id); per bucket both sides sort
    once and every window resolves to a [lo, hi) slice of the right array
    via TWO global searchsorted calls on a (dense-user-code × rebased-ts)
    composite key — no per-user or per-row loop. The composite stays in
    int64 by processing users in chunks of ⌊2⁶²/span⌋ when a bucket's
    user count × time span would overflow (never at sandbox scale, cheap
    insurance at 100 TB)."""
    if left_type == right_type:
        raise ValueError("window_join requires distinct left/right types")
    if lookback_minutes <= 0:
        raise ValueError(
            f"lookback_minutes must be > 0, got {lookback_minutes}"
        )
    lb = np.int64(round(lookback_minutes * 60e6))
    skinny = _project_events(ds, cfg, types=(left_type, right_type))

    empty = pd.DataFrame(
        {
            "left_id": pd.Series(dtype=np.int64),
            "right_id": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "lag_us": pd.Series(dtype=np.int64),
        }
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["event_type"] == left_type]
        right = df[df["event_type"] == right_type]
        if len(left) == 0 or len(right) == 0:
            return empty
        lu = left["user_id"].to_numpy(np.int64)
        lts = left["ts_us"].to_numpy(np.int64)
        lid = left["event_id"].to_numpy(np.int64)
        ru = right["user_id"].to_numpy(np.int64)
        rts = right["ts_us"].to_numpy(np.int64)
        rid = right["event_id"].to_numpy(np.int64)
        ro = np.lexsort((rts, ru))
        ru, rts, rid = ru[ro], rts[ro], rid[ro]
        tmin = np.int64(min(lts.min(), rts.min()))
        span = np.int64(max(lts.max(), rts.max())) - tmin + lb + 2
        uniq = np.unique(ru)
        pos = np.searchsorted(uniq, lu)
        pos = np.minimum(pos, len(uniq) - 1)
        lmask = uniq[pos] == lu
        parts = []
        chunk = max(1, int((1 << 62) // span))
        rpos = np.searchsorted(uniq, ru)  # hoisted: reused by every chunk
        for c0 in range(0, len(uniq), chunk):
            c1 = min(len(uniq), c0 + chunk)
            rm = (rpos >= c0) & (rpos < c1)
            lm = lmask & (pos >= c0) & (pos < c1)
            if not rm.any() or not lm.any():
                continue
            rcode = (rpos[rm] - c0).astype(np.int64)
            rkey = rcode * span + (rts[rm] - tmin)
            lcode = (pos[lm] - c0).astype(np.int64)
            l_ts = lts[lm]
            lo = np.searchsorted(
                rkey,
                lcode * span + np.maximum(l_ts - lb - tmin, 0),
                side="left",
            )
            hi = np.searchsorted(
                rkey, lcode * span + (l_ts - tmin), side="right"
            )
            cnt = hi - lo
            if cnt.sum() == 0:
                continue
            take = np.repeat(lo, cnt) + (
                np.arange(int(cnt.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            rid_c = rid[rm]
            rts_c = rts[rm]
            parts.append(
                pd.DataFrame(
                    {
                        "left_id": np.repeat(lid[lm], cnt),
                        "right_id": rid_c[take],
                        "user_id": np.repeat(lu[lm], cnt),
                        "lag_us": np.repeat(l_ts, cnt) - rts_c[take],
                    }
                )
            )
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def _frontier_2d(
    ts: np.ndarray, cents: np.ndarray
) -> np.ndarray:
    """Boolean mask of the 2D Pareto frontier (minimize ts, maximize
    cents) with EXACT tie semantics: a point is dominated iff some other
    point is ≤ in ts AND ≥ in cents AND strictly better in at least one;
    exact duplicates never dominate each other (all kept). Vectorized:
    unique (ts, cents) pairs, per-ts max, strict running max over ts
    ascending."""
    n = len(ts)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-cents.astype(np.int64), ts))
    ts_s, c_s = ts[order], cents[order]
    first_of_ts = np.concatenate(([True], ts_s[1:] != ts_s[:-1]))
    # per-ts max cents = the first entry of each ts group (cents desc)
    grp = np.cumsum(first_of_ts) - 1
    ts_max = c_s[first_of_ts]  # one per unique ts, ts ascending
    prevmax = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(ts_max)[:-1])
    )
    good_ts_group = ts_max > prevmax  # strict: equal cents earlier wins
    keep_sorted = good_ts_group[grp] & (c_s == ts_max[grp])
    keep = np.zeros(n, bool)
    keep[order] = keep_sorted
    return keep


def skyline(
    ds,
    cfg: EngineConfig,
    *,
    event_type: str = "purchase",
):
    """2D Pareto frontier — "earliest high-value" events of one type:
    keep every event not dominated by another (dominated = other has
    ts ≤ AND cents ≥ with at least one strict; exact (ts, cents)
    duplicates are mutually non-dominating and ALL kept). Emits
    (event_id, ts_us, cents).

    Textbook distributed skyline: each block computes its LOCAL frontier
    map-side (global frontier points survive every local pass; locally
    dominated points are globally dominated — both directions exact),
    then one single-partition pass over the union of local frontiers
    removes cross-block dominated points. The merge input is bounded by
    the frontier sizes, not the row count (worst case — all points on
    the frontier — degenerates to the output size, which any exact
    skyline must materialize anyway)."""
    skinny = _project_events(ds, cfg, with_value=True, types=(event_type,))

    empty = pd.DataFrame(
        {
            "event_id": pd.Series(dtype=np.int64),
            "ts_us": pd.Series(dtype=np.int64),
            "cents": pd.Series(dtype=np.int64),
        }
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        keep = _frontier_2d(
            df["ts_us"].to_numpy(np.int64), df["cents"].to_numpy(np.int64)
        )
        out = df.loc[keep, ["event_id", "ts_us", "cents"]]
        return out.astype(np.int64)

    return (
        skinny.map_batches(local, batch_format="pandas")
        .repartition(1)
        .map_batches(local, batch_format="pandas")
    )


def group_mode(ds, cfg: EngineConfig):
    """Per-user modal event type — the deterministic MODE aggregate SQL
    lacks portably: the type with the highest count, ties broken by type
    ASC (bit-stable; NULL types excluded). Emits (user_id, mode_type, n).

    Map-side (user, type, cnt) partials collapse each batch before the
    ONE hash(user) exchange; per bucket one groupby-sum and one lexsort
    picks every user's argmax row — no per-user loop."""
    skinny = _project_events(ds, cfg, with_type=True)

    empty = pd.DataFrame(
        {
            "user_id": pd.Series(dtype=np.int64),
            "mode_type": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].notna()]
        if len(df) == 0:
            out = empty.copy()
            out["_bucket"] = pd.Series(dtype=np.int32)
            return out.rename(columns={"mode_type": "event_type", "n": "cnt"})
        g = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["_bucket"] = _user_bucket(
            g["user_id"].to_numpy(np.int64), cfg.num_buckets
        )
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty
        s = (
            g.groupby(["user_id", "event_type"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        u = s["user_id"].to_numpy(np.int64)
        c = s["cnt"].to_numpy(np.int64)
        t = s["event_type"].to_numpy(object)
        order = np.lexsort((t, -c, u))
        u, c, t = u[order], c[order], t[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        return pd.DataFrame(
            {
                "user_id": u[first],
                "mode_type": t[first],
                "n": c[first],
            }
        )

    return (
        skinny.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def scd2_intervals(ds, cfg: EngineConfig | None = None):
    """Slowly-changing-dimension (type 2) interval build: treat each
    user's events as state versions and emit per event its validity
    window — valid_from_us = the event's own timestamp, valid_to_us = the
    user's NEXT event timestamp in (ts, event_id) order, or −1 for the
    user's current (open) version. −1, not NULL, so the int64 column
    round-trips exactly through the SQL twin (lead() + coalesce).

    Scale shape: skinny (event_id, user_id, ts_us) projection map-side,
    ONE hash(user_id) exchange, per-bucket mergesort + shift — the
    standard per-key ordered-window shape every rolling operator in this
    repo uses; no global sort."""
    cfg = cfg or EngineConfig()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype=np.int64),
                    "event_id": pd.Series(dtype=np.int64),
                    "valid_from_us": pd.Series(dtype=np.int64),
                    "valid_to_us": pd.Series(dtype=np.int64),
                }
            )
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        nxt = np.empty(len(g), np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = -1
        same_user = np.empty(len(g), bool)
        same_user[:-1] = user[1:] == user[:-1]
        same_user[-1] = False
        return pd.DataFrame(
            {
                "user_id": user,
                "event_id": g["event_id"].to_numpy(np.int64),
                "valid_from_us": ts,
                "valid_to_us": np.where(same_user, nxt, -1),
            }
        )

    return (
        _project_events(ds, cfg)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def nearest_event_join(
    ds,
    cfg: EngineConfig,
    left_type: str = "click",
    right_type: str = "view",
):
    """Bidirectional as-of ("nearest") join: for every ``left_type``
    event, the ``right_type`` event of the SAME user closest in time in
    EITHER direction. Tie rules, pinned exactly in the SQL twin: smaller
    |Δts| wins; equal |Δts| prefers the backward match (right.ts ≤
    left.ts); within the winning side, backward ties take the MAX right
    event_id (merge_asof backward keeps the last duplicate) and forward
    ties the MIN (forward keeps the first). Emits (event_id, user_id,
    ts_us, matched_id, delta_us = right.ts − left.ts, signed); left
    events of users with no right events drop (inner semantics).

    Scale shape: identical to ``asof_join`` — skinny typed projection,
    ONE hash(user) exchange, two vectorized ``merge_asof`` scans
    (backward + forward) per bucket and a vectorized argmin pick."""
    if left_type == right_type:
        raise ValueError(
            "nearest_event_join requires distinct left/right event types"
        )
    skinny = _project_events(ds, cfg, types=(left_type, right_type))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "ts_us": pd.Series(dtype=np.int64),
                "matched_id": pd.Series(dtype=np.int64),
                "delta_us": pd.Series(dtype=np.int64),
            }
        )
        left = df[df["event_type"] == left_type]
        right = df[df["event_type"] == right_type]
        if len(left) == 0 or len(right) == 0:
            return empty
        left = left.sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        right = right.sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        r = right[["user_id", "ts_us", "event_id"]].rename(
            columns={"ts_us": "r_ts", "event_id": "r_id"}
        )
        back = pd.merge_asof(
            left, r, left_on="ts_us", right_on="r_ts", by="user_id",
            direction="backward",
        )
        fwd = pd.merge_asof(
            left, r, left_on="ts_us", right_on="r_ts", by="user_id",
            direction="forward",
        )
        lts = left["ts_us"].to_numpy(np.int64)
        bd = lts - back["r_ts"].to_numpy(np.float64)   # NaN if no match
        fd = fwd["r_ts"].to_numpy(np.float64) - lts
        use_back = np.where(
            np.isnan(bd), False,
            np.where(np.isnan(fd), True, bd <= fd),
        )
        has = ~(np.isnan(bd) & np.isnan(fd))
        mid = np.where(
            use_back,
            back["r_id"].to_numpy(np.float64),
            fwd["r_id"].to_numpy(np.float64),
        )
        delta = np.where(use_back, -bd, fd)
        keep = has
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy(np.int64)[keep],
                "user_id": left["user_id"].to_numpy(np.int64)[keep],
                "ts_us": lts[keep],
                "matched_id": mid[keep].astype(np.int64),
                "delta_us": delta[keep].astype(np.int64),
            }
        )

    return (
        skinny.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    )


def event_runs(ds, cfg: EngineConfig | None = None):
    """Run-length encoding of each user's event-type timeline — the
    gaps-and-islands collapse: consecutive same-type events (in (ts,
    event_id) order) become one run. Emits (user_id, run_idx 0-based
    per user, event_type, start_us, end_us, n_events). NULL event types
    are excluded before the collapse (they would otherwise glue or split
    runs arbitrarily).

    Scale shape: skinny typed projection → ONE hash(user) exchange →
    per-bucket mergesort + boundary-mask reduceat (fully vectorized
    across all users of the bucket)."""
    cfg = cfg or EngineConfig()

    def not_null_type(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t.column("event_type")))

    skinny = _project_events(
        ds.map_batches(not_null_type, batch_format="pyarrow"),
        cfg, with_type=True,
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "run_idx": pd.Series(dtype=np.int64),
                "event_type": pd.Series(dtype=object),
                "start_us": pd.Series(dtype=np.int64),
                "end_us": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        new_user = np.empty(len(g), bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        new_run = new_user.copy()
        new_run[1:] |= et[1:] != et[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], len(g)] - 1
        run_user = user[starts]
        # run_idx: 0-based within user
        first_run_of_user = np.flatnonzero(new_user[starts])
        run_idx = np.arange(len(starts), dtype=np.int64)
        offsets = np.zeros(len(starts), np.int64)
        offsets[first_run_of_user] = run_idx[first_run_of_user]
        np.maximum.accumulate(offsets, out=offsets)
        run_idx = run_idx - offsets
        return pd.DataFrame(
            {
                "user_id": run_user,
                "run_idx": run_idx,
                "event_type": et[starts],
                "start_us": ts[starts],
                "end_us": ts[ends],
                "n_events": (ends - starts + 1).astype(np.int64),
            }
        )

    return (
        skinny.groupby("_bucket").map_groups(per_bucket, batch_format="pandas")
    )


def time_histogram(ds, cfg: EngineConfig | None = None):
    """Calendar telemetry histogram: exact event counts per (day-of-week,
    hour-of-day), computed from epoch-µs integer arithmetic — dow 0 =
    Sunday (DuckDB ``dayofweek`` convention, 1970-01-01 was a Thursday:
    (days + 4) % 7), hour = (µs // 3.6e9) % 24. Output (dow:int32,
    hour:int32, n_events:int64).

    Scale shape: per-batch 2-D bincount partial (≤ 168 rows each) → one
    tiny combine. Nothing else moves."""
    cfg = cfg or EngineConfig()
    day_us = np.int64(86_400_000_000)
    hour_us = np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        )
        dow = ((ts // day_us + 4) % 7).astype(np.int64)
        hod = ((ts // hour_us) % 24).astype(np.int64)
        c = np.bincount(dow * 24 + hod, minlength=168).astype(np.int64)
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {
                "dow": (nz // 24).astype(np.int32),
                "hour": (nz % 24).astype(np.int32),
                "n_events": c[nz],
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = (
            df.groupby(["dow", "hour"], sort=True)["n_events"]
            .sum()
            .reset_index()
        )
        return s.astype(
            {"dow": np.int32, "hour": np.int32, "n_events": np.int64}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def attribution(
    ds,
    cfg: EngineConfig | None = None,
    *,
    touch_types: tuple[str, ...] = ("click", "view"),
    conversion_type: str = "purchase",
    lookback_hours: float = 72.0,
):
    """Linear multi-touch revenue attribution: every conversion's value is
    split EQUALLY across all of that user's touch events in the lookback
    window [conv_ts − lookback, conv_ts) — inclusive left edge, strictly
    before the conversion. Emits one row per (conversion, touch) pair:
    (purchase_id, touch_id, n_touches:int64, credit_cents:double), where
    credit_cents = cents / n_touches is ONE IEEE division of exact int64
    operands, so every row is bit-reproducible in SQL with no float-sum
    ordering argument (conversions with zero touches emit nothing — inner
    semantics, like the twin's join).

    Scale shape: the standard skinny projection (int64 id/ts/cents rows
    only) and ONE hash(user_id) exchange; per bucket the touch ranks for
    ALL conversions at once come from a single merge-rank pass (concat +
    lexsort + cumsum — no per-user loop, no per-row searchsorted), and the
    pair expansion is repeat/cumsum index arithmetic. Output size is the
    true attribution fan-out Σ n_touches; a pathological user's window
    bounds one bucket's output, never a shuffle blow-up."""
    cfg = cfg or EngineConfig()
    look_us = np.int64(round(lookback_hours * 3_600_000_000))
    kinds = tuple(touch_types) + (conversion_type,)

    skinny = _project_events(ds, cfg, with_value=True, types=kinds)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        is_conv = (g["event_type"] == conversion_type).to_numpy()
        conv = g[is_conv]
        touch = g[~is_conv]
        empty = pa.table(
            {
                "purchase_id": pa.array([], pa.int64()),
                "touch_id": pa.array([], pa.int64()),
                "n_touches": pa.array([], pa.int64()),
                "credit_cents": pa.array([], pa.float64()),
            }
        )
        if len(conv) == 0 or len(touch) == 0:
            return empty
        tu = touch["user_id"].to_numpy(np.int64)
        tt = touch["ts_us"].to_numpy(np.int64)
        tid = touch["event_id"].to_numpy(np.int64)
        t_order = np.lexsort((tid, tt, tu))
        tu, tt, tid = tu[t_order], tt[t_order], tid[t_order]
        nt = len(tu)

        pu = conv["user_id"].to_numpy(np.int64)
        pt = conv["ts_us"].to_numpy(np.int64)
        pid = conv["event_id"].to_numpy(np.int64)
        cents = conv["cents"].to_numpy(np.int64)
        npur = len(pu)

        # merge-rank: rank(q) = #touches with (user, ts) < (q_user, q_ts);
        # queries sort BEFORE touches at equal keys, so a touch exactly at
        # the window edge is INSIDE at the left bound (ts = conv−look
        # counts) and OUTSIDE at the right (ts = conv_ts excluded)
        qu = np.concatenate([pu, pu])
        qx = np.concatenate([pt - look_us, pt])
        flag = np.concatenate(
            [np.ones(nt, np.int8), np.zeros(2 * npur, np.int8)]
        )
        order = np.lexsort(
            (flag, np.concatenate([tt, qx]), np.concatenate([tu, qu]))
        )
        cum = np.cumsum(flag[order])
        qmask = order >= nt
        ranks = np.empty(2 * npur, np.int64)
        ranks[order[qmask] - nt] = cum[qmask]
        lo, hi = ranks[:npur], ranks[npur:]

        reps = hi - lo
        cs = np.concatenate(([0], np.cumsum(reps)))
        total = int(cs[-1])
        if total == 0:
            return empty
        pidx = np.repeat(np.arange(npur), reps)
        intra = np.arange(total) - np.repeat(cs[:-1], reps)
        tpos = np.repeat(lo, reps) + intra
        n_rep = reps[pidx]
        return pa.table(
            {
                "purchase_id": pa.array(pid[pidx]),
                "touch_id": pa.array(tid[tpos]),
                "n_touches": pa.array(n_rep),
                "credit_cents": pa.array(
                    cents[pidx].astype(np.float64) / n_rep.astype(np.float64)
                ),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def group_regression(ds, cfg: EngineConfig | None = None):
    """Per-group ordinary least squares — value trend per event type:
    y = cents regressed on x = epoch-HOURS (ts_us // 3.6e9), emitting
    (event_type, n:int64, slope:double, intercept:double). The five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are EXACT integers, so
    slope = (nΣxy − ΣxΣy) / (nΣx² − Σx²) and
    intercept = (Σy − slope·Σx) / n are fixed short sequences of IEEE ops
    over exact operands — bit-identical in any engine that writes the same
    formula (the SQL twin does, via HUGEINT sums). Degenerate groups
    (single x value) emit NULL slope/intercept rather than ±inf.

    Scale shape: map-side per-type partials (5 int64 sums each) collapse
    every batch to O(types) rows; the single tiny combine runs in PYTHON
    ints (Σx² at corpus scale exceeds int64 — the promo_revenue overflow
    rule), so no intermediate ever wraps."""
    cfg = cfg or EngineConfig()

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = np.asarray(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        )
        x = ts // np.int64(3_600_000_000)
        y = _cents(np.asarray(t.column("value")))
        df = pd.DataFrame(
            {
                "event_type": t.column("event_type").to_pandas().astype(str),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return df.groupby("event_type", sort=False, as_index=False).sum()

    def combine(df: pd.DataFrame) -> pa.Table:
        types, ns, slopes, inters = [], [], [], []
        for et, g in df.groupby("event_type", sort=False):
            # Python ints: the global Σx² overflows int64 at corpus scale
            n = int(g["n"].sum())
            sx = sum(int(v) for v in g["sx"])
            sy = sum(int(v) for v in g["sy"])
            sxy = sum(int(v) for v in g["sxy"])
            sxx = sum(int(v) for v in g["sxx"])
            den = n * sxx - sx * sx
            if den == 0:
                slope = inter = None
            else:
                slope = float(n * sxy - sx * sy) / float(den)
                inter = (float(sy) - slope * float(sx)) / float(n)
            types.append(et)
            ns.append(n)
            slopes.append(slope)
            inters.append(inter)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "slope": pa.array(slopes, pa.float64()),
                "intercept": pa.array(inters, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def late_events(ds, cfg: EngineConfig | None = None, *, seed: int = 1):
    """Out-of-order arrival audit — the watermark diagnostic for streaming
    ingest: replay the stream in a DETERMINISTIC shuffled arrival order
    (the ``corpus_shuffle`` hash convention: md5-lower64(event_id|seed),
    ties by event_id — a seed-stable stand-in for a wall-clock ingest
    order; real pipelines would carry an arrival column) and flag every
    event whose event-time ts precedes the running maximum ts over
    earlier-arriving events. Emits only the late rows:
    (event_id, ts_us, lateness_us = watermark − ts_us > 0), all int64.

    Scale shape: the distributed prefix-MAX — the ``scan`` machinery's
    shape with max instead of sum: skinny (event_id, ts_us, h) rows route
    to hash ranges via h's top 32 bits (uniform ⇒ skew-free BY
    CONSTRUCTION), per-range max partials collapse to O(R) driver state,
    exclusive prefix maxima broadcast back, each range finishes with one
    sort + shifted cummax. No global sort, corpus rows move once."""
    import ray
    import ray.data as rd

    from ..state.broadcast import cached_get
    from .sampling import _id_hashes

    cfg = cfg or EngineConfig()
    nr = cfg.num_buckets

    def rng_of(h: np.ndarray) -> np.ndarray:
        return (
            (h >> np.uint64(32)) * np.uint64(nr) >> np.uint64(32)
        ).astype(np.int64)

    def project(t: pa.Table) -> pa.Table:
        h = _id_hashes(t.column("event_id").cast(pa.string()), seed)
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "ts_us": t.column("ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "h": pa.array(h),
                "_bucket": pa.array(rng_of(h).astype(np.int32)),
            }
        )

    skinny = ds.map_batches(project, batch_format="pyarrow").materialize()
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "lateness_us": pa.array([], pa.int64()),
        }
    )
    if skinny.count() == 0:
        return rd.from_arrow(empty)

    def max_partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "_rng": np.asarray(t.column("_bucket"), np.int64),
                "mx": np.asarray(t.column("ts_us"), np.int64),
            }
        )
        return df.groupby("_rng", as_index=False)["mx"].max()

    parts = (
        skinny.map_batches(max_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("_rng")["mx"]
        .max()
    )
    range_max = np.full(nr, np.iinfo(np.int64).min, np.int64)
    range_max[parts.index.to_numpy(np.int64)] = parts.to_numpy(np.int64)
    # exclusive prefix max: the watermark entering each range
    enter = np.empty(nr, np.int64)
    enter[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(range_max[:-1], out=enter[1:])
    enter_ref = ray.put(enter)

    def finish(g: pd.DataFrame) -> pa.Table:
        offs = cached_get(enter_ref)
        g = g.sort_values(["h", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy(np.int64)
        prev = np.empty(len(ts), np.int64)
        prev[0] = offs[int(g["_bucket"].iloc[0])]
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=prev[1:])
            np.maximum(prev[1:], prev[0], out=prev[1:])
        late = prev > ts
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(np.int64)[late]),
                "ts_us": pa.array(ts[late]),
                "lateness_us": pa.array(prev[late] - ts[late]),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        finish, batch_format="pandas"
    )


def ab_test(
    ds,
    cfg: EngineConfig | None = None,
    *,
    conversion_type: str = "purchase",
):
    """Two-proportion A/B z-statistic with deterministic assignment
    (variant = user_id % 2; unit = user, converted ⇔ any conversion_type
    event). Output ONE row (n_a, conv_a, n_b, conv_b, rate_a, rate_b, z).
    Every float is a PINNED IEEE expression of exact integer counts —
    division/multiply/sqrt are all correctly rounded, so writing the same
    expression tree in SQL reproduces z bit-for-bit; z is NULL when a
    variant is empty or the pooled rate is degenerate (0 or 1).

    Scale shape: per-batch (user, converted) partials pre-reduced with
    groupby-max, ONE hash(user) exchange makes users exact-distinct, per
    bucket O(1) count rows, tiny combine."""
    import math

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def partial(t: pa.Table) -> pd.DataFrame:
        user = np.asarray(t.column("user_id"), np.int64)
        conv = (
            t.column("event_type").to_pandas().astype(str)
            == conversion_type
        ).to_numpy(np.int64)
        df = (
            pd.DataFrame({"user": user, "conv": conv})
            .groupby("user", as_index=False)["conv"]
            .max()
        )
        df["_bucket"] = _user_bucket(
            df["user"].to_numpy(np.int64), nb
        )
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user", as_index=False)["conv"].max()
        variant = u["user"].to_numpy(np.int64) % 2
        conv = u["conv"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "n_a": [np.int64((variant == 0).sum())],
                "conv_a": [np.int64(conv[variant == 0].sum())],
                "n_b": [np.int64((variant == 1).sum())],
                "conv_b": [np.int64(conv[variant == 1].sum())],
            }
        )

    def combine(df: pd.DataFrame) -> pa.Table:
        na, ca = int(df["n_a"].sum()), int(df["conv_a"].sum())
        nbv, cb = int(df["n_b"].sum()), int(df["conv_b"].sum())
        rate_a = float(ca) / float(na) if na else None
        rate_b = float(cb) / float(nbv) if nbv else None
        z = None
        if na and nbv:
            p = float(ca + cb) / float(na + nbv)
            if 0.0 < p < 1.0:
                # pinned expression tree — mirrored verbatim in the twin
                z = (rate_b - rate_a) / math.sqrt(
                    p * (1.0 - p) * (1.0 / float(na) + 1.0 / float(nbv))
                )
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "conv_a": pa.array([ca], pa.int64()),
                "n_b": pa.array([nbv], pa.int64()),
                "conv_b": pa.array([cb], pa.int64()),
                "rate_a": pa.array([rate_a], pa.float64()),
                "rate_b": pa.array([rate_b], pa.float64()),
                "z": pa.array([z], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def funnel_steps(
    ds,
    cfg: EngineConfig | None = None,
    *,
    steps: tuple[str, ...],
    window_hours: float = 24.0,
):
    """k-step window funnel (the ClickHouse ``windowFunnel`` shape, with
    PINNED greedy semantics): per user, level = length of the longest step
    prefix reachable by anchoring t₁ at the user's EARLIEST step-1 event
    and then taking each next step's earliest event STRICTLY after the
    previous step and ≤ t₁ + window. Anchoring at the earliest step-1
    (rather than trying every anchor) is the documented deterministic
    rule — greedy-earliest is optimal GIVEN the anchor. Emits
    (user_id, t1_us:int64, level:int64) for users with level ≥ 1;
    generalizes the 2-step ``funnel``.

    Scale shape: skinny (user, ts, step-index) rows — non-step events are
    dropped map-side — through ONE hash(user) exchange; per bucket k−1
    vectorized passes (per-user min via groupby over the masked step
    rows), no per-user loop."""
    cfg = cfg or EngineConfig()
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    win_us = np.int64(round(window_hours * 3_600_000_000))

    skinny = _project_events(ds, cfg, types=tuple(steps))

    step_of = {s: i for i, s in enumerate(steps)}

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        si = g["event_type"].map(step_of).to_numpy(np.int64)
        user = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        first = (
            pd.DataFrame({"u": user[si == 0], "t": ts[si == 0]})
            .groupby("u")["t"]
            .min()
        )
        if len(first) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "t1_us": pa.array([], pa.int64()),
                    "level": pa.array([], pa.int64()),
                }
            )
        level = pd.Series(np.int64(1), index=first.index)
        prev_t = first.copy()
        deadline = first + win_us
        for i in range(1, len(steps)):
            m = si == i
            u_i = user[m]
            t_i = ts[m]
            pt = pd.Series(u_i).map(prev_t).to_numpy()
            dl = pd.Series(u_i).map(deadline).to_numpy()
            ok = (
                ~pd.isna(pt)
                & (t_i > np.where(pd.isna(pt), 0, pt).astype(np.int64))
                & (t_i <= np.where(pd.isna(dl), 0, dl).astype(np.int64))
            )
            nxt = (
                pd.DataFrame({"u": u_i[ok], "t": t_i[ok]})
                .groupby("u")["t"]
                .min()
            )
            # only users already at level i can advance
            nxt = nxt[nxt.index.map(level).to_numpy(np.int64) == i]
            if len(nxt) == 0:
                break
            level.loc[nxt.index] = i + 1
            prev_t = nxt  # users not in nxt keep NaN on .map -> excluded
            deadline = deadline.loc[nxt.index]
        return pa.table(
            {
                "user_id": pa.array(first.index.to_numpy(np.int64)),
                "t1_us": pa.array(first.to_numpy(np.int64)),
                "level": pa.array(level.to_numpy(np.int64)),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def interval_coverage(ds, cfg: EngineConfig | None = None):
    """Per-user union-of-intervals length: each event spans
    [ts, ts + round(value·100)·10 000 µs) — value is quantized to integer
    cents first, so durations are 10 ms-granular (this differs from a
    straight round(value·10⁶) when value carries >2 decimal places; the
    SQL twin uses the identical cents·10 000 convention) — and overlaps
    within a user collapse —
    the busy-time / session-coverage statistic computed EXACTLY in int64
    (the gaps-and-islands sweep, summed). Emits (user_id,
    covered_us:int64).

    Scale shape: skinny (user, ts, end, event_id) int rows, ONE
    hash(user) exchange; per bucket one lexsort by (user, ts, event_id)
    + a per-group running max of interval ends (pandas C-level cummax
    shifted by one) gives every row's overlap clip — contribution =
    max(0, end − max(start, prev_max_end)) — then one groupby-sum. No
    per-user loop; zero/negative durations contribute nothing."""
    cfg = cfg or EngineConfig()

    skinny = _project_events(ds, cfg, with_value=True)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        s = g["ts_us"].to_numpy(np.int64)
        # value carries SECONDS here: cents = round(value*100) so
        # duration_us = cents * 10_000 == round(value * 1e6)
        e = s + g["cents"].to_numpy(np.int64) * np.int64(10_000)
        prev = (
            pd.Series(e, index=g.index).groupby(
                g["user_id"], sort=False
            ).cummax().groupby(g["user_id"], sort=False).shift(1)
        )
        lo = np.maximum(s, prev.fillna(np.iinfo(np.int64).min).to_numpy(np.int64))
        contrib = np.maximum(e - lo, 0)
        out = (
            pd.DataFrame({"u": g["user_id"].to_numpy(np.int64), "c": contrib})
            .groupby("u", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(out["u"].to_numpy(np.int64)),
                "covered_us": pa.array(out["c"].to_numpy(np.int64)),
            }
        )

    return skinny.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def rank_tests(ds, cfg: EngineConfig | None = None):
    """Exact tie-corrected two-sample rank statistics between the two
    deterministic variants (variant = user_id % 2; one observation per
    EVENT, value in integer cents): Mann-Whitney U and the
    Kolmogorov-Smirnov distance, emitted as INTEGER sufficient statistics
    so the result is bit-reproducible — ONE row

        (n_a, n_b, u2_a, u2_b, tie_cubes, d_num)  all int64

    where u2_x = 2·U_x (doubled so tie midranks stay integral), tie_cubes
    = Σ(t³−t) over tie groups (the variance correction term), and the KS
    distance is the exact rational d_num / (n_a·n_b) (cross-multiplied so
    no division happens). Consumers finish z / D with two float ops.

    Scale shape: per batch ONE value-histogram partial (variant, cents,
    cnt) — partial size is bounded by DISTINCT cents, not rows; a
    hash(cents) bucketed exchange combines duplicates; the combined
    histogram (≤ one row per distinct price point, independent of corpus
    size) meets in a single final task that sorts it and applies the
    closed forms: a tie block of t = a+b rows after P predecessors holds
    ranks P+1..P+t, so Σ 2·midrank over the block's a-side = a·(2P+t+1)
    and Σ over a rank block of (2i−n−1) collapses likewise."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def partial(t: pa.Table) -> pd.DataFrame:
        user = np.asarray(t.column("user_id"), np.int64)
        c = _cents(np.asarray(t.column("value")))
        df = (
            pd.DataFrame({"variant": user % 2, "cents": c})
            .groupby(["variant", "cents"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        df["_bucket"] = _user_bucket(df["cents"].to_numpy(np.int64), nb)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["variant", "cents"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )

    def finish(df: pd.DataFrame) -> pa.Table:
        cols = ["n_a", "n_b", "u2_a", "u2_b", "tie_cubes", "d_num"]
        if len(df) == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in cols})
        h = (
            df.pivot_table(
                index="cents", columns="variant", values="cnt",
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=[0, 1], fill_value=0)
            .sort_index()
        )
        a = h[0].to_numpy(np.int64)
        b = h[1].to_numpy(np.int64)
        t = a + b
        p = np.concatenate(([np.int64(0)], np.cumsum(t)[:-1]))
        na, nb_ = int(a.sum()), int(b.sum())
        r2 = 2 * p + t + 1
        u2_a = int((a * r2).sum()) - na * (na + 1)
        u2_b = int((b * r2).sum()) - nb_ * (nb_ + 1)
        tie_cubes = int((t * t * t - t).sum())
        d_num = int(np.abs(nb_ * np.cumsum(a) - na * np.cumsum(b)).max())
        vals = [na, nb_, u2_a, u2_b, tie_cubes, d_num]
        return pa.table(
            {k: pa.array([v], pa.int64()) for k, v in zip(cols, vals)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas")
    )


def cusum_by_type(ds, cfg: EngineConfig | None = None, *,
                  group_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value"):
    """Exact CUSUM changepoint statistic per group — the level-shift /
    drift screen over a metric stream: with the group's events in
    (ts, event_id) order and Sᵢ the running cents sum,

        devᵢ = |n·Sᵢ − i·Sₙ|      (the scaled CUSUM: n·Sₙ·|Fᵢ − i/n|)

    emit per group (group, n, total_cents, max_dev, at_i) where max_dev =
    maxᵢ devᵢ and at_i = the SMALLEST 1-based i attaining it (the split
    point of the best single changepoint). Scaling by n instead of
    dividing by it keeps every value an exact integer: deviations are
    computed in arbitrary-precision Python ints and must fit int64 on
    output (n·|S| < 2⁶³ — holds to ~10⁹ events of ~10⁹ total cents;
    callers beyond that shard by time first). A constant stream has
    devᵢ ≡ 0 everywhere, so it reports (0, at_i=1); ties always resolve
    to the earliest i.

    Scale shape: the shared prefix-scan pattern (stages/scan.py) — rows
    route to ts-RANGE shards (monotone float mapping, same-ts rows share
    a shard so the (ts, id) tiebreak never crosses shards), per-(shard ×
    group) count/sum partials collapse to O(R·groups) driver state,
    exclusive prefixes broadcast back, each shard finishes with one sort
    + cumsum per group slice. No global sort; rows move once."""
    import ray
    import ray.data as rd

    from ..state.broadcast import cached_get
    from .dedup import hash64_strs

    cfg = cfg or EngineConfig()
    nr = cfg.num_buckets

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": t.column(group_col).cast(pa.string()),
                "ts_us": t.column(ts_col)
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "id": t.column(id_col).cast(pa.int64()),
                "cents": pa.array(
                    _cents(np.asarray(t.column(value_col), np.float64))
                ),
            }
        )

    empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "max_dev": pa.array([], pa.int64()),
            "at_i": pa.array([], pa.int64()),
        }
    )
    skinny = ds.map_batches(project, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max, Min

    bounds = skinny.aggregate(Min("ts_us"), Max("ts_us"))
    if bounds is None or bounds.get("min(ts_us)") is None:
        return rd.from_arrow(empty)
    lo, hi = int(bounds["min(ts_us)"]), int(bounds["max(ts_us)"])
    span = float(hi - lo + 1)

    def rng_of(ts: np.ndarray) -> np.ndarray:
        r = ts.astype(np.float64) - float(lo)
        return np.minimum(
            np.maximum((r / span * nr).astype(np.int64), 0),
            np.int64(nr - 1),
        )

    # per-(range, group) count/sum partials -> O(R·groups) driver state
    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "_rng": rng_of(np.asarray(t.column("ts_us"), np.int64)),
                "g": t.column("g").to_pandas(),
                "cents": np.asarray(t.column("cents"), np.int64),
            }
        )
        agg = df.groupby(["_rng", "g"], sort=False).agg(
            cnt=("cents", "size"), sm=("cents", "sum")
        )
        return agg.reset_index()

    parts = (
        skinny.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["_rng", "g"], sort=True)
        .sum()
        .reset_index()
    )
    # exclusive prefix (entering count i0 / sum s0) per group per range,
    # plus group totals — all O(R·groups)
    state: dict[str, tuple[np.ndarray, np.ndarray, int, int]] = {}
    for g, gdf in parts.groupby("g", sort=False):
        i0 = np.zeros(nr, np.int64)
        s0 = np.zeros(nr, np.int64)
        r = gdf["_rng"].to_numpy(np.int64)
        cnt = np.zeros(nr, np.int64)
        sm = np.zeros(nr, np.int64)
        cnt[r] = gdf["cnt"].to_numpy(np.int64)
        sm[r] = gdf["sm"].to_numpy(np.int64)
        np.cumsum(cnt[:-1], out=i0[1:])
        np.cumsum(sm[:-1], out=s0[1:])
        state[str(g)] = (i0, s0, int(cnt.sum()), int(sm.sum()))
    state_ref = ray.put(state)

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket",
            pa.array(
                rng_of(np.asarray(t.column("ts_us"), np.int64)).astype(
                    np.int32
                )
            ),
        )

    def finish(grp: pd.DataFrame) -> pd.DataFrame:
        st = cached_get(state_ref)
        rng = int(grp["_bucket"].iloc[0])
        out_g, out_dev, out_i = [], [], []
        for g, gdf in grp.groupby("g", sort=False):
            i0, s0, n_tot, s_tot = st[str(g)]
            gdf = gdf.sort_values(["ts_us", "id"], kind="mergesort")
            c = gdf["cents"].to_numpy(np.int64)
            i = (
                np.arange(1, len(c) + 1, dtype=np.int64) + i0[rng]
            ).astype(object)
            s = (np.cumsum(c) + s0[rng]).astype(object)
            dev = np.abs(n_tot * s - i * s_tot)
            j = int(np.argmax(dev == dev.max()))
            out_g.append(g)
            out_dev.append(int(dev[j]))
            out_i.append(int(i[j]))
        garr = np.asarray(out_g, object)
        return pd.DataFrame(
            {
                "g": garr,
                "max_dev": np.asarray(out_dev, np.int64),
                "at_i": np.asarray(out_i, np.int64),
                # the final combine co-locates by GROUP (a group's
                # per-range partials must all meet), not by range
                "_bucket": (hash64_strs(garr) % np.uint64(nr)).astype(
                    np.int32
                ),
            }
        )

    def combine(g: pd.DataFrame) -> pa.Table:
        st = cached_get(state_ref)
        best = (
            g.sort_values(["g", "max_dev", "at_i"],
                          ascending=[True, False, True], kind="mergesort")
            .groupby("g", sort=False)
            .head(1)
        )
        names = best["g"].tolist()
        return pa.table(
            {
                group_col: pa.array(names, pa.string()),
                "n": pa.array(
                    [st[n][2] for n in names], pa.int64()
                ),
                "total_cents": pa.array(
                    [st[n][3] for n in names], pa.int64()
                ),
                "max_dev": pa.array(
                    best["max_dev"].to_numpy(np.int64)
                ),
                "at_i": pa.array(best["at_i"].to_numpy(np.int64)),
            }
        )

    partial_max = (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )
    # O(R·groups) partial rows remain; per-group max is associative, so a
    # second tiny hash(group)-bucketed combine finishes without a driver
    # collect
    return partial_max.groupby("_bucket").map_groups(
        combine, batch_format="pandas"
    )


def burst_detect(ds, cfg: EngineConfig | None = None, *,
                 window_us: int = 60_000_000, cap: int = 10):
    """Sliding-window burst / rate-limit audit per user: for every event,
    its burst size = count of the SAME user's events with event-time in
    (t − window, t] — tie times all count, matching SQL's RANGE-frame
    peer semantics, so the number is arrival-order independent. Emits
    one row per user whose maximum burst EXCEEDS ``cap``:
    (user_id:int64, n_violations:int64 = events whose burst > cap,
    max_burst:int64). The throttling/abuse screen next to ``debounce``
    (which collapses bursts) and ``late_events`` (which audits order).

    Scale shape: skinny (user, ts) projection, ONE hash(user) exchange,
    per bucket one lexsort then two searchsorted probes per event within
    each user's slice; only violating users are emitted."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    w = np.int64(window_us)

    def project(t: pa.Table) -> pa.Table:
        uid = np.asarray(t.column("user_id"), np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "ts_us": t.column("ts")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "_bucket": pa.array(_user_bucket(uid, nb)),
            }
        )

    def finish(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        t = g["ts_us"].to_numpy(np.int64)
        starts = np.nonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )[0]
        ends = np.concatenate((starts[1:], [len(uid)]))
        out_u, out_n, out_m = [], [], []
        for s, e in zip(starts, ends):
            tu = t[s:e]
            burst = np.searchsorted(tu, tu, side="right") - \
                np.searchsorted(tu, tu - w + 1, side="left")
            mx = int(burst.max())
            if mx > cap:
                out_u.append(int(uid[s]))
                out_n.append(int((burst > cap).sum()))
                out_m.append(mx)
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "n_violations": pa.array(out_n, pa.int64()),
                "max_burst": pa.array(out_m, pa.int64()),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


def streaks(ds, cfg: EngineConfig | None = None):
    """Per-user activity streaks — the engagement-consistency signal the
    cohort ``retention`` table aggregates away: over each user's DISTINCT
    active days (UTC day index = epoch_us // 86 400 000 000), the count
    of active days and the longest run of CONSECUTIVE days:
    (user_id:int64, n_active_days:int64, max_streak:int64).

    Scale shape: map-side day dedup shrinks the exchange to (user, day)
    rows; ONE hash(user) exchange, then a single lexsort + boolean-diff
    + bincount pass finds every user's islands at once (the
    gaps-and-islands kernel on calendar days)."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    DAY = np.int64(86_400_000_000)

    def project(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t.column("user_id"), np.int64)
        day = (
            np.asarray(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            )
            // DAY
        )
        df = pd.DataFrame({"user_id": uid, "day": day}).drop_duplicates()
        df["_bucket"] = _user_bucket(
            df["user_id"].to_numpy(np.int64), nb
        )
        return df

    def finish(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        new_run = new_user | np.concatenate(
            ([True], (day[1:] - day[:-1]) != 1)
        )
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_user = uid[new_run]
        users, uinv = np.unique(run_user, return_inverse=True)
        max_streak = np.zeros(len(users), np.int64)
        np.maximum.at(max_streak, uinv, run_len)
        n_days = np.bincount(
            np.unique(uid, return_inverse=True)[1]
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users),
                "n_active_days": pa.array(n_days),
                "max_streak": pa.array(max_streak),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


def cube_counts(ds, cfg: EngineConfig | None = None, *,
                a_col: str = "event_type", b_col: str = "user_id",
                b_mod: int = 7, total_marker: str = "*"):
    """2-D CUBE aggregation — counts for every grouping set of
    (a, b-class): (a, b), (a, *), (*, b), (*, *), with ``b_mod`` folding
    the second dimension to a small class (user_id % b_mod — a stand-in
    for day-of-week-style classes). The OLAP subtotal primitive next to
    ``rollup_counts``' one-dimension hierarchy. Emits
    (a:string, b:string, n:int64); subtotal rows carry the marker.

    Scale shape: per-batch (a, b) partial counts (bounded by distinct
    combinations), ONE tiny hash(a‖b) exchange; the three subtotal
    levels derive from the SAME partials map-side (each partial row
    re-emits under its subtotal keys), so the corpus is read once."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    from .canonicalize import bucket_of

    def partial(t: pa.Table) -> pd.DataFrame:
        a = t.column(a_col).to_pandas().astype(str)
        # C-style (sign-of-dividend) remainder to match SQL's `%` on
        # negative ids; numpy's `%` is floor-mod and would diverge
        b = np.fmod(
            np.asarray(t.column(b_col), np.int64), np.int64(b_mod)
        ).astype(str)
        base = (
            pd.DataFrame({"a": a.to_numpy(object), "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        star = np.full(len(base), total_marker, object)
        frames = [
            base,
            base.assign(b=star),
            base.assign(a=star),
            base.assign(a=star, b=star),
        ]
        out = (
            pd.concat(frames, ignore_index=True)
            .groupby(["a", "b"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        out["_bucket"] = bucket_of(
            out["a"].astype(str) + "|" + out["b"].astype(str), nb
        )
        return out

    def combine(g: pd.DataFrame) -> pa.Table:
        c = g.groupby(["a", "b"], sort=False)["n"].sum().reset_index()
        return pa.table(
            {
                a_col: pa.array(c["a"].to_numpy(object), pa.string()),
                b_col: pa.array(c["b"].to_numpy(object), pa.string()),
                "n": pa.array(c["n"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def autocorr_counts(ds, cfg: EngineConfig | None = None, *,
                    lags: tuple = (1, 2, 7)):
    """Integer autocorrelation sufficient statistics of the DAILY event
    volume — the seasonality screen (a strong lag-7 product means weekly
    rhythm): with c(d) the event count on UTC day index d,

        (lag:int64, n_pairs:int64 = |{d : c(d)>0 ∧ c(d+lag)>0}|,
         sum_prod:int64 = Σ_d c(d)·c(d+lag))

    — zero days contribute nothing to either number, so the statistics
    are exactly the nonzero-histogram self-join and every ingredient is
    an exact integer (the Pearson autocorrelation needs means/variances
    the existing co-moment ops already provide).

    Scale shape: per-batch day-count partials (bounded by distinct
    days), folded driver-side to the O(days) histogram — the output IS
    O(lags), and a day histogram is tiny at any corpus size."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    DAY = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            np.asarray(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            )
            // DAY
        )
        c = pd.Series(day).value_counts()
        return pd.DataFrame(
            {
                "day": c.index.to_numpy(np.int64),
                "n": c.to_numpy(np.int64),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("day")["n"]
        .sum()
    )
    days = hist.index.to_numpy(np.int64)
    cnt = hist.to_numpy(np.int64)
    order = np.argsort(days)
    days, cnt = days[order], cnt[order]
    rows = []
    for lag in lags:
        pos = np.searchsorted(days, days + np.int64(lag))
        pos_c = np.clip(pos, 0, len(days) - 1)
        hit = (pos < len(days)) & (days[pos_c] == days + np.int64(lag))
        rows.append(
            (
                int(lag),
                int(hit.sum()),
                # Python-int products: day counts at corpus scale make
                # the int64 product sum wrap (trend_concordance rule)
                sum(
                    int(a) * int(b)
                    for a, b in zip(cnt[hit], cnt[pos_c[hit]])
                ),
            )
        )
    return rd.from_arrow(
        pa.table(
            {
                "lag": pa.array([r[0] for r in rows], pa.int64()),
                "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
                "sum_prod": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def regression_outliers(ds, cfg: EngineConfig | None = None, *,
                        k_top: int = 3):
    """Largest-residual events under the per-type OLS trend fit — the
    anomaly surface ``group_regression``'s coefficients exist to enable:
    per event type, the ``k_top`` events with the largest
    |cents − (intercept + slope·hours)|, ties by event_id. The residual
    is a PINNED IEEE expression over the fit's bit-exact coefficients
    (the group_regression contract), so the emitted doubles hash-match
    the SQL twin. Degenerate types (NULL fit) emit nothing. Output
    (event_type, event_id:int64, resid:double, rank:int64 1-based).

    Scale shape: the O(types) coefficient table broadcasts via ray.put;
    the corpus streams through one vectorized residual map with per-
    batch per-type partial top-k; ONE tiny hash(type) exchange folds."""
    import ray

    from ..state.broadcast import cached_get
    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    if k_top < 1:
        raise ValueError(f"k_top must be >= 1, got {k_top}")

    coeffs = group_regression(ds, cfg).to_pandas()
    table = {
        r["event_type"]: (float(r["slope"]), float(r["intercept"]))
        for _, r in coeffs.iterrows()
        if not (pd.isna(r["slope"]) or pd.isna(r["intercept"]))
    }
    ref = ray.put(table)

    def topk_frame(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_a=np.abs(df["resid"].to_numpy(np.float64)))
        out = df.sort_values(
            ["event_type", "_a", "event_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return out.groupby("event_type", sort=False).head(k_top).drop(
            columns="_a"
        )

    def residuals(t: pa.Table) -> pd.DataFrame:
        tab = cached_get(ref)
        et = t.column("event_type").to_pandas().astype(str)
        keep = et.isin(list(tab)).to_numpy()
        if not keep.any():
            return pd.DataFrame(
                {"event_type": pd.Series(dtype=object),
                 "event_id": pd.Series(dtype=np.int64),
                 "resid": pd.Series(dtype=np.float64),
                 "_bucket": pd.Series(dtype=np.int32)}
            )
        et = et[keep]
        y = np.rint(
            np.asarray(t.column("value"), np.float64)[keep] * 100.0
        )
        x = (
            np.asarray(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            )[keep]
            // 3_600_000_000
        ).astype(np.float64)
        slope = np.fromiter(
            (tab[e][0] for e in et), np.float64, len(et)
        )
        inter = np.fromiter(
            (tab[e][1] for e in et), np.float64, len(et)
        )
        res = y - (inter + slope * x)
        df = pd.DataFrame(
            {
                "event_type": et.to_numpy(object),
                "event_id": np.asarray(t.column("event_id"), np.int64)[
                    keep
                ],
                "resid": res,
            }
        )
        top = topk_frame(df)
        top["_bucket"] = bucket_of(top["event_type"], nb)
        return top

    def fold(g: pd.DataFrame) -> pa.Table:
        top = topk_frame(g)
        rank = top.groupby("event_type", sort=False).cumcount() + 1
        return pa.table(
            {
                "event_type": pa.array(
                    top["event_type"].to_numpy(object), pa.string()
                ),
                "event_id": pa.array(top["event_id"].to_numpy(np.int64)),
                "resid": pa.array(top["resid"].to_numpy(np.float64)),
                "rank": pa.array(rank.to_numpy(np.int64)),
            }
        )

    out = ds.map_batches(residuals, batch_format="pyarrow").groupby(
        "_bucket"
    ).map_groups(fold, batch_format="pandas")
    out._reg_pin = ref
    return out


def active_users(ds, cfg: EngineConfig | None = None, *,
                 window_days: int = 7):
    """Exact DAU/WAU — distinct users per day plus distinct users per
    trailing ``window_days`` SLIDING window, the engagement pair every
    product dashboard starts with. Tumbling distinct is easy
    (``window_distinct``); the sliding count can't be summed from
    per-day counts, so each user's presence converts to coverage
    INTERVALS: an active day d covers windows d..d+w−1, a user's merged
    intervals emit ±1 boundary diffs, and the global diff prefix-sum IS
    the sliding distinct count — no per-window distinct pass, no user
    double-counting by construction. Emits (day:int64, dau:int64,
    wau:int64) for every day with ≥ 1 active user (the SQL-twin row
    set).

    Scale shape: map-side (user, day) dedup; ONE hash(user) exchange
    where each user's sorted day list yields O(runs) boundary diffs and
    per-day DAU partials; the O(days) diff/day table folds driver-side
    (a day histogram is tiny at any corpus size)."""
    import ray.data as rd

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    DAY = np.int64(86_400_000_000)
    w = np.int64(window_days)

    def project(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t.column("user_id"), np.int64)
        day = (
            np.asarray(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            )
            // DAY
        )
        df = pd.DataFrame({"u": uid, "d": day}).drop_duplicates()
        df["_bucket"] = _user_bucket(df["u"].to_numpy(np.int64), nb)
        return df

    def diffs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "d"]).sort_values(
            ["u", "d"], kind="mergesort"
        )
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        # per-user DAU partials
        dau = (
            pd.DataFrame({"d": d})
            .groupby("d", sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        dau["kind"] = np.zeros(len(dau), np.int8)
        # merged coverage intervals [d, d+w-1]: a new interval starts
        # when the gap to the previous active day is >= w
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        new_run = new_user | np.concatenate(
            ([True], (d[1:] - d[:-1]) >= w)
        )
        starts = d[new_run]
        run_id = np.cumsum(new_run) - 1
        last = np.zeros(run_id[-1] + 1, np.int64)
        last[run_id] = d  # ascending within run: final write = run max
        ends = last + w  # exclusive end of coverage
        plus = pd.DataFrame(
            {"d": starts, "n": np.ones(len(starts), np.int64)}
        )
        minus = pd.DataFrame(
            {"d": ends, "n": -np.ones(len(ends), np.int64)}
        )
        diff = (
            pd.concat([plus, minus], ignore_index=True)
            .groupby("d", sort=False)["n"]
            .sum()
            .reset_index()
        )
        diff["kind"] = np.ones(len(diff), np.int8)
        return pd.concat([dau, diff], ignore_index=True)

    parts = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(diffs, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "dau": pa.array([], pa.int64()),
                    "wau": pa.array([], pa.int64()),
                }
            )
        )
    dau = (
        parts[parts["kind"] == 0].groupby("d")["n"].sum().sort_index()
    )
    diff = (
        parts[parts["kind"] == 1].groupby("d")["n"].sum().sort_index()
    )
    bdays = diff.index.to_numpy(np.int64)
    cum = np.cumsum(diff.to_numpy(np.int64))
    days = dau.index.to_numpy(np.int64)
    # sliding count at day d = prefix of diffs at the last boundary <= d
    pos = np.searchsorted(bdays, days, side="right") - 1
    wau = np.where(pos >= 0, cum[np.clip(pos, 0, None)], 0)
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(days),
                "dau": pa.array(dau.to_numpy(np.int64)),
                "wau": pa.array(wau.astype(np.int64)),
            }
        )
    )


def type_trigrams(ds, cfg: EngineConfig | None = None, *,
                  min_count: int = 5):
    """Consecutive event-type TRIGRAM counts per user stream — one step
    beyond ``transition_counts``' Markov edges (second-order behavior:
    "view→add→buy" vs "view→add→drop"): triples of consecutive types in
    each user's (ts, event_id) order, counted corpus-wide,
    ≥ ``min_count``. Emits (t1, t2, t3, n:int64).

    Scale shape: ONE hash(user) exchange, per bucket one lexsort + two
    shifts count ALL users' triples at once with a per-bucket pre-reduce
    (partials bounded by distinct type³); tiny second exchange."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    from .canonicalize import bucket_of

    def project(t: pa.Table) -> pd.DataFrame:
        uid = np.asarray(t.column("user_id"), np.int64)
        return pd.DataFrame(
            {
                "u": uid,
                "ts_us": np.asarray(
                    t.column("ts").cast(pa.timestamp("us")).cast(
                        pa.int64()
                    )
                ),
                "id": np.asarray(t.column("event_id"), np.int64),
                "ty": t.column("event_type").to_pandas().astype(str),
                "_bucket": _user_bucket(uid, nb),
            }
        )

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts_us", "id"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        ty = g["ty"].to_numpy(object)
        same2 = u[2:] == u[:-2]
        t1, t2, t3 = ty[:-2][same2], ty[1:-1][same2], ty[2:][same2]
        c = (
            pd.DataFrame({"t1": t1, "t2": t2, "t3": t3})
            .groupby(["t1", "t2", "t3"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        c["_tb"] = bucket_of(
            c["t1"].astype(str) + "|" + c["t2"].astype(str) + "|"
            + c["t3"].astype(str),
            nb,
        )
        return c

    def combine(g: pd.DataFrame) -> pa.Table:
        c = (
            g.groupby(["t1", "t2", "t3"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        c = c[c["n"] >= min_count]
        return pa.table(
            {
                "t1": pa.array(c["t1"].to_numpy(object), pa.string()),
                "t2": pa.array(c["t2"].to_numpy(object), pa.string()),
                "t3": pa.array(c["t3"].to_numpy(object), pa.string()),
                "n": pa.array(c["n"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(partial, batch_format="pandas")
        .groupby("_tb")
        .map_groups(combine, batch_format="pandas")
    )


def peak_load(ds, cfg: EngineConfig | None = None):
    """Global peak concurrency over event intervals — the capacity-
    planning number: with each event active on [ts, ts + round(value·
    100)·10⁴ µs) (the ``interval_coverage`` span convention), the
    maximum number of simultaneously active events and the EARLIEST
    microsecond attaining it. Half-open intervals: an interval ending at
    t and one starting at t never overlap (−1 folds before +1 at equal
    times). ONE row (peak:int64, at_us:int64).

    Scale shape: the shared scan machinery — ±1 boundary diffs route to
    time-RANGE shards (equal times co-shard), ``range_offsets`` with the
    delta as weight gives each shard's entering concurrency, per shard
    one sort + cumsum finds the local max, O(R) partials fold
    driver-side."""
    import ray
    import ray.data as rd

    from ..state.broadcast import cached_get
    from .scan import range_offsets

    cfg = cfg or EngineConfig()
    nr = cfg.num_buckets

    def bounds_rows(t: pa.Table) -> pa.Table:
        s = np.asarray(
            t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        )
        dur = np.rint(
            np.asarray(t.column("value"), np.float64) * 100.0
        ).astype(np.int64) * 10_000
        e = s + dur
        keep = e > s  # zero-length intervals never active
        return pa.table(
            {
                "t": pa.array(np.concatenate([s[keep], e[keep]])),
                "delta": pa.array(
                    np.concatenate(
                        [
                            np.ones(int(keep.sum()), np.int64),
                            -np.ones(int(keep.sum()), np.int64),
                        ]
                    )
                ),
            }
        )

    skinny = ds.map_batches(
        bounds_rows, batch_format="pyarrow"
    ).materialize()
    empty = pa.table(
        {"peak": pa.array([0], pa.int64()),
         "at_us": pa.array([0], pa.int64())}
    )
    if skinny.count() == 0:
        return rd.from_arrow(empty)

    from ray.data.aggregate import Max, Min

    b = skinny.aggregate(Min("t"), Max("t"))
    lo, hi = int(b["min(t)"]), int(b["max(t)"])
    span = float(hi - lo + 1)

    def rng_of(ts: np.ndarray) -> np.ndarray:
        r = ts.astype(np.float64) - float(lo)
        return np.minimum(
            np.maximum((r / span * nr).astype(np.int64), 0),
            np.int64(nr - 1),
        )

    offsets, _ = range_offsets(
        skinny,
        lambda t: rng_of(np.asarray(t.column("t"), np.int64)),
        nr,
        weight_col="delta",
    )
    off_ref = ray.put(offsets)

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket",
            pa.array(
                rng_of(np.asarray(t.column("t"), np.int64)).astype(
                    np.int32
                )
            ),
        )

    def local_max(g: pd.DataFrame) -> pd.DataFrame:
        offs = cached_get(off_ref)
        rng = int(g["_bucket"].iloc[0])
        g = g.sort_values(["t", "delta"], kind="mergesort")
        c = np.cumsum(g["delta"].to_numpy(np.int64)) + offs[rng]
        j = int(np.argmax(c))
        # earliest time attaining this shard's max: the argmax row's t
        # (the running max is hit at the end of a +1 group, whose rows
        # all share t; np.argmax returns the first max)
        return pd.DataFrame(
            {
                "peak": [int(c[j])],
                "at_us": [int(g["t"].to_numpy(np.int64)[j])],
            }
        )

    parts = (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(local_max, batch_format="pandas")
        .to_pandas()
    )
    best = parts.sort_values(
        ["peak", "at_us"], ascending=[False, True]
    ).iloc[0]
    return rd.from_arrow(
        pa.table(
            {
                "peak": pa.array([int(best["peak"])], pa.int64()),
                "at_us": pa.array([int(best["at_us"])], pa.int64()),
            }
        )
    )


def trend_concordance(ds, cfg: EngineConfig | None = None):
    """Exact Kendall concordance counts per event type — the monotone-
    trend strength the OLS slope can't certify (a single outlier flips a
    slope; concordant-vs-discordant pair counts don't): over points
    (t = epoch-hour, v = cents),

        (event_type, n:int64, n_conc:int64 = pairs with t AND v both
         strictly greater, n_disc:int64 = t greater, v smaller)

    — τ-b's tie corrections come from the existing rank machinery;
    these two counts are the hard part, exact by sweeping the distinct
    (t, v) CELL histogram in t order with a cumulative value histogram
    (O(distinct_t · distinct_v) vector work, never O(n²) rows; pair
    counts accumulate in Python ints, output bounded by n² < 2⁶³).

    Scale shape: per-batch cell-count partials (bounded by distinct
    (t, v) combos), ONE hash(type) exchange, per type the t-sweep."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    from .canonicalize import bucket_of

    def partial(t: pa.Table) -> pd.DataFrame:
        ty = t.column("event_type").to_pandas().astype(str)
        hours = (
            np.asarray(
                t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            )
            // 3_600_000_000
        )
        cents = _cents(np.asarray(t.column("value"), np.float64))
        df = (
            pd.DataFrame({"g": ty.to_numpy(object), "t": hours,
                          "v": cents})
            .groupby(["g", "t", "v"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        df["_bucket"] = bucket_of(df["g"], nb)
        return df

    def fold(grp: pd.DataFrame) -> pa.Table:
        out_g, out_n, out_c, out_d = [], [], [], []
        for g, gdf in grp.groupby("g", sort=False):
            cells = (
                gdf.groupby(["t", "v"], sort=False)["c"].sum().reset_index()
            )
            vs = np.unique(cells["v"].to_numpy(np.int64))
            cum = np.zeros(len(vs), dtype=object)
            n_conc, n_disc = 0, 0
            cells = cells.sort_values(["t", "v"], kind="mergesort")
            tvals = cells["t"].to_numpy(np.int64)
            carr = cells["c"].to_numpy(np.int64)
            vidx = np.searchsorted(vs, cells["v"].to_numpy(np.int64))
            starts = np.nonzero(
                np.concatenate(([True], tvals[1:] != tvals[:-1]))
            )[0]
            ends = np.concatenate((starts[1:], [len(cells)]))
            for s, e in zip(starts, ends):
                vi = vidx[s:e]
                cc = carr[s:e]
                # prefix sums of the cumulative value histogram
                pref = np.concatenate(([0], np.cumsum(cum)))
                below = pref[vi]            # strictly smaller v
                above = pref[-1] - pref[vi + 1]
                n_conc += int((cc * below).sum())
                n_disc += int((cc * above).sum())
                np.add.at(cum, vi, cc)
            out_g.append(g)
            out_n.append(int(carr.sum()))
            out_c.append(n_conc)
            out_d.append(n_disc)
        return pa.table(
            {
                "event_type": pa.array(out_g, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "n_conc": pa.array(out_c, pa.int64()),
                "n_disc": pa.array(out_d, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold, batch_format="pandas")
    )
