"""Entity-resolution assignment + match-weight estimation stages.

Post-blocking ER steps the reference stops short of (it emits top-K
candidate pairs, main.py:30-36, and leaves assignment to the caller):

- ``one_to_one_match`` — reciprocal best-match 1:1 assignment: keep a
  pair iff each record is the other's single nearest neighbor. The
  standard symmetric-best filter used before greedy/Hungarian matching.
- ``fs_patterns`` — Fellegi-Sunter agreement-pattern frequency table:
  for every candidate pair within a block, compute per-field agreement
  bits and count pattern frequencies. The sufficient statistic for
  m/u-probability EM estimation — the pairs themselves never leave the
  block task, only the (pattern, count) partials do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from .annsearch import prep_embeddings
from .canonicalize import bucket_of
from .pairing import ExactTopKPairer


def one_to_one_match(
    emb_ds,
    cfg: EngineConfig | None = None,
    id_col: str = "vec_id",
    list_col: str = "embedding",
):
    """Reciprocal best-match 1:1 assignment over an embedding table.

    Each record's exact cosine top-1 neighbor (self excluded; ties broken
    by ascending string id, matching the ``knn_exact`` oracle's rank
    order) is computed with the sharded tiled-GEMM pairer; a pair
    (a, b) survives iff b is a's top-1 AND a is b's top-1. Output:
    (left_id, right_id) with left_id < right_id (string order).

    Scale shape: the index is pinned object-store shards (one sort), the
    query pass is shuffle-free tiled matmuls, and the mutual filter is ONE
    bucketed exchange over the N top-1 edges — each canonical pair lands
    in exactly one bucket, kept iff it arrived from both directions.
    Nothing materializes on the driver.
    """
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    prepped = prep_embeddings(
        emb_ds, id_col=id_col, list_col=list_col
    ).materialize()
    pairer = ExactTopKPairer(k=1, cfg=cfg, exclude_self=True)
    pairer.index(prepped, id_col=id_col)
    # data-sized blocks before the exchange: the query stage emits one
    # fragment per index tile and the groupby pays per fragment
    best = pairer.query(prepped, id_col=id_col).materialize()
    best = best.repartition(
        max(1, -(-best.count() // 2_000_000))
    ).materialize()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        left = df["left_id"].astype(str).to_numpy(object)
        right = df["right_id"].astype(str).to_numpy(object)
        swap = left > right
        lo = np.where(swap, right, left)
        hi = np.where(swap, left, right)
        out = pd.DataFrame({"left_id": lo, "right_id": hi})
        out["_bucket"] = bucket_of(
            out["left_id"] + "\x00" + out["right_id"], nb
        )
        return out

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["left_id", "right_id"], sort=False).size()
        # a record emits exactly one top-1 edge, so a canonical pair
        # arrives at most twice; twice == reciprocal
        keep = c[c == 2].reset_index()
        return pd.DataFrame(
            {
                "left_id": pd.array(
                    keep["left_id"].to_numpy(object), dtype="string"
                ),
                "right_id": pd.array(
                    keep["right_id"].to_numpy(object), dtype="string"
                ),
            }
        )

    return (
        best.map_batches(canon, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(mutual, batch_format="pandas")
    )


def fs_patterns(orders, cfg: EngineConfig | None = None):
    """Fellegi-Sunter agreement-pattern frequencies over within-customer
    order pairs.

    Blocks = o_custkey. For every unordered pair of orders of the same
    customer, three agreement bits: same o_orderstatus (bit 2), same
    o_orderpriority (bit 1), same $50k total-price bucket computed in
    integer cents (bit 0). Output one row per pattern value 0..7 that
    occurs: (pattern:int32, n_pairs:int64).

    Scale shape: rows project map-side to four skinny columns, meet in ONE
    hash(custkey) exchange; per bucket a self-merge on custkey enumerates
    pairs (block size = orders-per-customer, bounded by data semantics,
    not dataset size), and only per-pattern partial COUNTS (≤ 8 rows per
    bucket) flow to the driver-side 8-row combine. The pair set itself is
    never exchanged or materialized.
    """
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def project(t: pa.Table) -> pa.Table:
        key = np.asarray(t.column("o_custkey"), np.int64)
        cents = np.round(
            np.asarray(t.column("o_totalprice"), np.float64) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "k": t.column("o_custkey"),
                "okey": t.column("o_orderkey"),
                "st": t.column("o_orderstatus").cast(pa.string()),
                "pri": t.column("o_orderpriority").cast(pa.string()),
                "pb": pa.array(cents // 5_000_000),
                "_bucket": pa.array((key % nb).astype(np.int32)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "pattern": pd.Series(dtype=np.int32),
                "n_pairs": pd.Series(dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        m = g.merge(g, on="k")
        m = m[m["okey_x"] < m["okey_y"]]
        if len(m) == 0:
            return empty
        pat = (
            (m["st_x"].to_numpy(object) == m["st_y"].to_numpy(object))
            .astype(np.int32)
            * 4
            + (m["pri_x"].to_numpy(object) == m["pri_y"].to_numpy(object))
            .astype(np.int32)
            * 2
            + (m["pb_x"].to_numpy(np.int64) == m["pb_y"].to_numpy(np.int64))
            .astype(np.int32)
        )
        c = np.bincount(pat, minlength=8).astype(np.int64)
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {"pattern": nz.astype(np.int32), "n_pairs": c[nz]}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = (
            df.groupby("pattern", sort=True)["n_pairs"]
            .sum()
            .reset_index()
        )
        return s.astype({"pattern": np.int32, "n_pairs": np.int64})

    partials = (
        orders.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    # ≤ 8 rows per bucket — a single tiny combine task
    return partials.repartition(1).map_batches(
        combine, batch_format="pandas"
    )


def fs_score(
    orders,
    cfg: EngineConfig | None = None,
    *,
    w_agree: tuple[int, int, int] = (30, 20, 10),
    w_disagree: tuple[int, int, int] = (-5, -8, -12),
    threshold: int = 32,
):
    """Fellegi-Sunter DECISION rule — the apply step after ``fs_patterns``
    estimates weights: every within-customer order pair scores
    Σᵢ (agreeᵢ ? w_agreeᵢ : w_disagreeᵢ) over the same three fields
    (status, priority, $50k-cents price bucket), and pairs with
    score ≥ ``threshold`` are emitted as (left_okey, right_okey,
    score:int64), left < right.

    Scale shape: identical to ``fs_patterns`` — skinny projection, ONE
    hash(custkey) exchange, per-bucket self-merge (block size bounded by
    orders-per-customer); qualifying pairs leave the bucket task directly,
    no further exchange."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    wa = tuple(int(x) for x in w_agree)
    wd = tuple(int(x) for x in w_disagree)

    def project(t: pa.Table) -> pa.Table:
        key = np.asarray(t.column("o_custkey"), np.int64)
        cents = np.round(
            np.asarray(t.column("o_totalprice"), np.float64) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "k": t.column("o_custkey"),
                "okey": t.column("o_orderkey"),
                "st": t.column("o_orderstatus").cast(pa.string()),
                "pri": t.column("o_orderpriority").cast(pa.string()),
                "pb": pa.array(cents // 5_000_000),
                "_bucket": pa.array((key % nb).astype(np.int32)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "left_okey": pd.Series(dtype=np.int64),
                "right_okey": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        m = g.merge(g, on="k")
        m = m[m["okey_x"] < m["okey_y"]]
        if len(m) == 0:
            return empty
        score = np.where(
            m["st_x"].to_numpy(object) == m["st_y"].to_numpy(object),
            wa[0],
            wd[0],
        ).astype(np.int64)
        score += np.where(
            m["pri_x"].to_numpy(object) == m["pri_y"].to_numpy(object),
            wa[1],
            wd[1],
        )
        score += np.where(
            m["pb_x"].to_numpy(np.int64) == m["pb_y"].to_numpy(np.int64),
            wa[2],
            wd[2],
        )
        keep = score >= threshold
        return pd.DataFrame(
            {
                "left_okey": m["okey_x"].to_numpy(np.int64)[keep],
                "right_okey": m["okey_y"].to_numpy(np.int64)[keep],
                "score": score[keep],
            }
        )

    return (
        orders.map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def multipass_blocking(docs, cfg: EngineConfig | None = None):
    """Composite multi-pass blocker — the standard ER recall booster:
    UNION the pair sets of independent blockers and keep per-pair
    provenance. Pass 1 = sorted-neighborhood + Jaro-Winkler verify
    (``snm_pairs``, bit 1); pass 2 = word-3-gram meta-blocking with
    Weighted Node Pruning (``meta_blocking``, bit 2). Output one row per
    distinct pair: (left_id, right_id, sources:int64 bitmask 1|2|3).

    Scale shape: each pass keeps its own (already-green) distributed
    shape; the combine is ONE bucketed exchange over the tagged pair
    union — a pair lands in exactly one bucket and its flags sum there.
    Each pass emits a pair at most once (SNM window offsets are unique;
    meta-blocking groups pairs), so the bitmask sum is exact."""
    from .dedup import meta_blocking
    from .neighborhood import snm_pairs

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def tag(flag: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "left_id": df["left_id"].astype(str).to_numpy(object),
                    "right_id": df["right_id"].astype(str).to_numpy(object),
                }
            )
            out["flag"] = np.full(len(out), flag, np.int64)
            out["_bucket"] = bucket_of(
                out["left_id"] + "\x00" + out["right_id"], nb
            )
            return out

        return f

    a = snm_pairs(
        docs, cfg, key_chars=12, window=4, jw_threshold=0.9
    ).map_batches(tag(1), batch_format="pandas")
    b = meta_blocking(docs, cfg=cfg).map_batches(
        tag(2), batch_format="pandas"
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s = (
            g.groupby(["left_id", "right_id"], sort=False)["flag"]
            .sum()
            .rename("sources")
            .reset_index()
        )
        return pd.DataFrame(
            {
                "left_id": pd.array(
                    s["left_id"].to_numpy(object), dtype="string"
                ),
                "right_id": pd.array(
                    s["right_id"].to_numpy(object), dtype="string"
                ),
                "sources": s["sources"].to_numpy(np.int64),
            }
        )

    return (
        a.union(b).groupby("_bucket").map_groups(combine, batch_format="pandas")
    )


def one_to_one_match_2t(
    a_ds,
    b_ds,
    cfg: EngineConfig | None = None,
    id_col: str = "vec_id",
    list_col: str = "embedding",
):
    """Two-table reciprocal best-match — the record-linkage assignment
    step between two sources A and B: keep (a, b) iff b is a's cosine
    top-1 IN B and a is b's top-1 IN A (ties by ascending string id).
    Output (left_id from A, right_id from B). Ids must be unique across
    both tables.

    Scale shape: two pinned indexes (one sort each), two shuffle-free
    tiled-GEMM query passes, then ONE bucketed exchange over the
    |A|+|B| directed best edges — an (a, b) key is kept iff it arrived
    from both directions. Symmetric to ``one_to_one_match`` but with the
    direction known from which pass emitted the edge, so no string-order
    canonicalization is needed."""
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    a_prep = prep_embeddings(a_ds, id_col=id_col, list_col=list_col).materialize()
    b_prep = prep_embeddings(b_ds, id_col=id_col, list_col=list_col).materialize()

    def _flat(ds):
        ds = ds.materialize()
        return ds.repartition(
            max(1, -(-ds.count() // 2_000_000))
        ).materialize()

    p_ab = ExactTopKPairer(k=1, cfg=cfg, exclude_self=False)
    p_ab.index(b_prep, id_col=id_col)
    ab = _flat(p_ab.query(a_prep, id_col=id_col))   # left=a, right=b

    p_ba = ExactTopKPairer(k=1, cfg=cfg, exclude_self=False)
    p_ba.index(a_prep, id_col=id_col)
    ba = _flat(p_ba.query(b_prep, id_col=id_col))   # left=b, right=a

    def orient(a_is_left: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            l = df["left_id"].astype(str).to_numpy(object)
            r = df["right_id"].astype(str).to_numpy(object)
            a, b = (l, r) if a_is_left else (r, l)
            out = pd.DataFrame({"left_id": a, "right_id": b})
            out["_bucket"] = bucket_of(
                out["left_id"] + "\x00" + out["right_id"], nb
            )
            return out

        return f

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["left_id", "right_id"], sort=False).size()
        keep = c[c == 2].reset_index()
        return pd.DataFrame(
            {
                "left_id": pd.array(
                    keep["left_id"].to_numpy(object), dtype="string"
                ),
                "right_id": pd.array(
                    keep["right_id"].to_numpy(object), dtype="string"
                ),
            }
        )

    return (
        ab.map_batches(orient(True), batch_format="pandas")
        .union(ba.map_batches(orient(False), batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(mutual, batch_format="pandas")
    )


def calibration_pairs(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_mod: int = 4,
    rounds: int = 2,
    n_buckets: int = 64,
    bins: int = 20,
    seed: int = 7,
):
    """Match-score calibration sample: a DETERMINISTIC pseudo-random pair
    sample (no n² enumeration) scored with Jaro-Winkler and reduced to an
    integer score histogram — the distribution a practitioner reads to
    place a match threshold. Docs are hash-sampled 1/``doc_mod``; each
    survivor gets ``rounds`` md5 bucket assignments over ``n_buckets``
    buckets; pairs form within a (round, bucket) cell (expected pairs ≈
    rounds·(n/doc_mod)²/(2·n_buckets) — callers scale n_buckets with n);
    a pair colliding in several rounds counts ONCE (same texts → same
    bin, deduped exactly). Output (bin:int64 = floor(jw·bins), n_pairs).

    Scale shape: one (round, bucket) exchange forms pairs and scores them
    in-cell (texts ride the exchange ``rounds`` times — calibration
    samples are sized to make that cheap); distinct (pair, bin) rows
    dedupe in a second pair-hash exchange that emits per-bin partial
    counts; one tiny combine."""
    from ..functions.textsim import jaro_winkler_batch
    from .dedup import hash64_strs

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].astype(str)
        keep = hash64_strs(ids + f"|s{seed}") % np.uint64(doc_mod) == 0
        d = df[keep]
        ids = d[id_col].astype(str).to_numpy(object)
        txt = (
            d[text_col].fillna("").astype(str).to_numpy(object)
            if len(d)
            else np.empty(0, object)
        )
        frames = []
        for r in range(rounds):
            bkt = (
                hash64_strs(pd.Series(ids).astype(str) + f"|{r}|{seed}")
                % np.uint64(n_buckets)
            ).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "id": ids,
                        "t": txt,
                        "cell": bkt + r * n_buckets,
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["_bucket"] = (out["cell"].to_numpy() % nb).astype(np.int32)
        return out

    def score_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "l": pd.Series(dtype=object),
                "r": pd.Series(dtype=object),
                "bin": pd.Series(dtype=np.int64),
                "_bucket2": pd.Series(dtype=np.int32),
            }
        )
        g = g.drop_duplicates(["id", "cell"])
        m = g.merge(g[["id", "t", "cell"]], on="cell")
        m = m[m["id_x"] < m["id_y"]]
        if len(m) == 0:
            return empty
        # a pair meeting in several cells scores identically — keep one
        m = m.drop_duplicates(["id_x", "id_y"])
        jw = jaro_winkler_batch(
            m["t_x"].to_numpy(object), m["t_y"].to_numpy(object)
        )
        b = np.minimum(np.floor(jw * bins).astype(np.int64), bins - 1)
        out = pd.DataFrame(
            {"l": m["id_x"].to_numpy(object),
             "r": m["id_y"].to_numpy(object), "bin": b}
        )
        out["_bucket2"] = bucket_of(out["l"] + "\x00" + out["r"], nb)
        return out

    def dedupe_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l", "r"])
        c = np.bincount(d["bin"].to_numpy(np.int64), minlength=bins)
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {"bin": nz.astype(np.int64), "n_pairs": c[nz].astype(np.int64)}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("bin", sort=True)["n_pairs"].sum().reset_index()
        return s.astype({"bin": np.int64, "n_pairs": np.int64})

    return (
        docs.map_batches(assign, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(score_cell, batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(dedupe_count, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


def blocker_agreement(docs, cfg: EngineConfig | None = None):
    """Inter-blocker agreement statistics from ``multipass_blocking``'s
    provenance bitmask: pair counts per sources value (1 = SNM only,
    2 = meta-blocking only, 3 = both) — the Cohen's-kappa ingredient for
    judging whether a second blocking pass adds recall or only cost.

    Scale shape: the multipass pair stream reduces to per-batch bincount
    partials; one tiny combine."""
    cfg = cfg or EngineConfig()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(df["sources"].to_numpy(np.int64), minlength=4)
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {"sources": nz.astype(np.int64),
             "n_pairs": c[nz].astype(np.int64)}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("sources", sort=True)["n_pairs"].sum().reset_index()
        return s.astype({"sources": np.int64, "n_pairs": np.int64})

    return (
        multipass_blocking(docs, cfg)
        .map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas")
    )


# ------------------------------------------- Monge-Elkan token-set score --


def _me_direction(
    toks_a: list[list[str]], toks_b: list[list[str]]
) -> np.ndarray:
    """Σ_{t∈A (with multiplicity)} max_{u∈B} ⌊JW(t,u)·10⁶⌋ per row pair,
    as exact int64 (empty B ⇒ every max is 0; empty A ⇒ 0). Vectorized:
    distinct (row, t) / (row, u) sets cross-join via repeat/tile index
    arithmetic, then the Jaro-Winkler kernel runs ONCE per distinct
    (t, u) TOKEN pair across the whole batch (vocabulary-bounded — the
    same pre-reduce that makes SIF/surprisal scale), scores fan back via
    inverse indices, segment-max + count-weighted segment-sum."""
    from collections import Counter

    from ..functions.textsim import jaro_winkler_batch

    n = len(toks_a)
    out = np.zeros(n, np.int64)
    # distinct per-row tokens with multiplicities on the A side
    rows_a, tok_a, cnt_a = [], [], []
    rows_b, tok_b = [], []
    for i in range(n):
        if not toks_a[i] or not toks_b[i]:
            continue
        ca = Counter(toks_a[i])
        rows_a.extend([i] * len(ca))
        tok_a.extend(ca.keys())
        cnt_a.extend(ca.values())
        ub = set(toks_b[i])
        rows_b.extend([i] * len(ub))
        tok_b.extend(ub)
    if not rows_a:
        return out
    rows_a = np.asarray(rows_a, np.int64)
    tok_a = np.asarray(tok_a, dtype=object)
    cnt_a = np.asarray(cnt_a, np.int64)
    rows_b = np.asarray(rows_b, np.int64)
    tok_b = np.asarray(tok_b, dtype=object)
    # cross join within each row: A entry i× (all B entries of its row)
    nb_per_row = np.bincount(rows_b, minlength=n)
    b_starts = np.concatenate(([0], np.cumsum(nb_per_row)[:-1]))
    reps = nb_per_row[rows_a]
    ai = np.repeat(np.arange(len(rows_a)), reps)
    # B index: per A entry, the run b_starts[row] .. +nb_per_row[row]
    off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps
    )
    bi = np.repeat(b_starts[rows_a], reps) + off
    # dedupe to distinct TOKEN pairs (vocabulary-bounded JW work)
    ca_codes, ua = pd.factorize(tok_a[ai], sort=False)
    cb_codes, ub = pd.factorize(tok_b[bi], sort=False)
    pair_code = ca_codes.astype(np.int64) * len(ub) + cb_codes
    uniq, first = np.unique(pair_code, return_index=True)
    jw = jaro_winkler_batch(
        list(tok_a[ai[first]]), list(tok_b[bi[first]])
    )
    q = np.floor(jw * 1e6).astype(np.int64)
    score = q[np.searchsorted(uniq, pair_code)]
    # segment max over each A entry's B run, then count-weighted sum
    seg_max = np.maximum.reduceat(
        score, np.concatenate(([0], np.cumsum(reps)[:-1]))
    )
    np.add.at(out, rows_a, cnt_a * seg_max)
    return out


def monge_elkan(pairs_ds, cfg: EngineConfig | None = None, *,
                left_id: str = "left_id", right_id: str = "right_id",
                left_text: str = "left_text", right_text: str = "right_text"):
    """Monge-Elkan token-set similarity over candidate pairs — the hybrid
    string measure for multi-word names/titles where record-level
    Levenshtein/JW miss token reorderings: in each direction,

        me_num = Σ_{t ∈ tokens(x), with multiplicity}
                     max_{u ∈ tokens(y)} ⌊JW(t, u) · 10⁶⌋

    so ME(x→y) = me_num / (10⁶·n) with ONE division left to the consumer.
    Quantizing each token-level JW to an integer BEFORE the sum makes the
    score order-independent and bit-reproducible in SQL (DuckDB's native
    jaro_winkler_similarity computes the identical double — pinned by the
    string_sims oracle — and ⌊·⌋ of the same double is the same int).
    Emits (left_id, right_id, n_left, me_lr, n_right, me_rl): both
    directions, callers symmetrize as (lr+rl)/2 if desired. Empty token
    sets score 0.

    Scale shape: a pure per-batch map over an already-paired dataset (no
    exchange); JW runs once per distinct token pair per batch
    (vocabulary-bounded, same pre-reduce as SIF/surprisal), everything
    else is repeat/reduceat index arithmetic."""
    from ..functions.tokenizer import tokenize_many

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ta = tokenize_many(df[left_text].tolist())
        tb = tokenize_many(df[right_text].tolist())
        return pd.DataFrame(
            {
                left_id: df[left_id].to_numpy(),
                right_id: df[right_id].to_numpy(),
                "n_left": np.fromiter(
                    (len(x) for x in ta), np.int64, len(ta)
                ),
                "me_lr": _me_direction(ta, tb),
                "n_right": np.fromiter(
                    (len(x) for x in tb), np.int64, len(tb)
                ),
                "me_rl": _me_direction(tb, ta),
            }
        )

    return pairs_ds.map_batches(score, batch_format="pandas")


def weighted_jaccard(pairs_ds, cfg: EngineConfig | None = None, *,
                     left_id: str = "left_id", right_id: str = "right_id",
                     left_text: str = "left_text",
                     right_text: str = "right_text"):
    """Weighted (multiset) Jaccard over candidate pairs — the
    frequency-aware similarity plain token-set Jaccard flattens (a doc
    repeating "error" 50× vs once): per pair

        sum_min = Σ_tok min(tf_a, tf_b),  sum_max = Σ_tok max(tf_a, tf_b)

    so J_w = sum_min/sum_max is one division away and both ingredients
    are exact int64. Pairs where both sides tokenize empty are dropped
    (sum_max = 0 leaves the ratio undefined). Output (left_id, right_id,
    sum_min:int64, sum_max:int64).

    Scale shape: a pure per-batch map over an already-paired dataset —
    per-side (pair, token) counts outer-merge and fold with one pandas
    pass; no exchange, work bounded by tokens per pair."""
    from ..functions.tokenizer import tokenize_many

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ta = tokenize_many(df[left_text].tolist())
        tb = tokenize_many(df[right_text].tolist())

        def side_counts(toks):
            rows_i, rows_t = [], []
            for i, x in enumerate(toks):
                rows_i.extend([i] * len(x))
                rows_t.extend(x)
            return (
                pd.DataFrame({"i": rows_i, "tok": rows_t})
                .groupby(["i", "tok"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )

        ca, cb = side_counts(ta), side_counts(tb)
        m = ca.merge(cb, on=["i", "tok"], how="outer",
                     suffixes=("_a", "_b"))
        fa = m["tf_a"].fillna(0).to_numpy(np.int64)
        fb = m["tf_b"].fillna(0).to_numpy(np.int64)
        agg = (
            pd.DataFrame(
                {
                    "i": m["i"].to_numpy(np.int64),
                    "mn": np.minimum(fa, fb),
                    "mx": np.maximum(fa, fb),
                }
            )
            .groupby("i", sort=False)
            .sum()
        )
        keep = agg[agg["mx"] > 0]
        idx = keep.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                left_id: df[left_id].to_numpy()[idx],
                right_id: df[right_id].to_numpy()[idx],
                "sum_min": keep["mn"].to_numpy(np.int64),
                "sum_max": keep["mx"].to_numpy(np.int64),
            }
        )

    return pairs_ds.map_batches(score, batch_format="pandas")


def pair_divergence(pairs_ds, cfg: EngineConfig | None = None, *,
                    left_id: str = "left_id", right_id: str = "right_id",
                    left_text: str = "left_text",
                    right_text: str = "right_text"):
    """Where do near-duplicates start to differ — the explain/debug
    surface for dedup review queues: per pair the exact common-prefix
    length in CODE POINTS plus both lengths, so "same except a suffix
    edit" (lcp ≈ min len) separates from "different from the start"
    (lcp ≈ 0) at a glance. Output (left_id, right_id, lcp:int64,
    len_l:int64, len_r:int64).

    Scale shape: a pure per-batch map; pairs compare through padded
    uint32 code-point matrices processed in FIXED-WIDTH position chunks
    (memory bounded by batch × chunk regardless of one long outlier
    text), pairs dropping out as soon as they diverge."""
    CHUNK = 2048

    def score(df: pd.DataFrame) -> pd.DataFrame:
        la = df[left_text].astype(str).tolist()
        lb = df[right_text].astype(str).tolist()
        n = len(df)
        len_l = np.fromiter((len(s) for s in la), np.int64, n)
        len_r = np.fromiter((len(s) for s in lb), np.int64, n)

        if n == 0:
            return pd.DataFrame(
                {left_id: df[left_id], right_id: df[right_id],
                 "lcp": pd.Series(dtype=np.int64),
                 "len_l": pd.Series(dtype=np.int64),
                 "len_r": pd.Series(dtype=np.int64)}
            )
        minlen = np.minimum(len_l, len_r)
        lcp = np.zeros(n, np.int64)
        active = minlen > 0
        start = 0
        while active.any():
            idx = np.nonzero(active)[0]
            width = min(CHUNK, int(minlen[idx].max()) - start)
            A = np.zeros((len(idx), width), np.uint32)
            B = np.zeros((len(idx), width), np.uint32)
            for k, i in enumerate(idx):
                end = min(start + width, int(minlen[i]))
                if end > start:
                    A[k, : end - start] = np.frombuffer(
                        la[i].encode("utf-32-le"), np.uint32
                    )[start:end]
                    B[k, : end - start] = np.frombuffer(
                        lb[i].encode("utf-32-le"), np.uint32
                    )[start:end]
            inb = (
                np.arange(start, start + width, dtype=np.int64)[None, :]
                < minlen[idx][:, None]
            )
            eq = (A == B) & inb
            run = np.minimum.accumulate(eq, axis=1).sum(axis=1)
            lcp[idx] += run
            # a pair stays active only if its whole chunk matched AND
            # it still has characters left
            full = run == np.minimum(width, minlen[idx] - start)
            start += width
            nxt = np.zeros(n, bool)
            nxt[idx[full & (minlen[idx] > start)]] = True
            active = nxt
        return pd.DataFrame(
            {
                left_id: df[left_id].to_numpy(),
                right_id: df[right_id].to_numpy(),
                "lcp": lcp.astype(np.int64),
                "len_l": len_l,
                "len_r": len_r,
            }
        )

    return pairs_ds.map_batches(score, batch_format="pandas")
