"""Sorted-neighborhood blocking (SNM): rank all records by a blocking key
and pair every two records whose ranks differ by less than ``window``.

The classic non-learned ER blocking method (Hernández & Stolfo's merge/purge
sorted-neighborhood), complementing the reference's embedding-top-K blocking
(vector_pairing_models.py:30-46) — a user switching from DeepBlocker gets
the standard cheap baseline to compare recall/CSSR against, over the same
candidate-pair schema.

Ray-native design — a windowed self-join over a global order WITHOUT a
global sort, built on the shared prefix-scan machinery (stages/scan.py):

1. skinny (id, key) pass; ranges = a non-decreasing function of the key's
   first 8 bytes (byte-lexicographic prefix order == numeric order of the
   big-endian prefix), so ranges PARTITION the global (key, id) order.
2. ``range_offsets`` → exact global start offset per range (O(R) driver
   state), broadcast.
3. ONE bucketed exchange on the range; per range: vectorized sort + arange
   gives every row its exact global rank; in-range pairs are emitted with
   one shifted-slice pass per distance (w-1 vectorized passes, no row loop).
4. Pairs that CROSS a range boundary have both endpoints within window-1 of
   their range's edge (empty ranges hold no rows, so rank adjacency skips
   them) — those boundary rows form a halo of ≤ 2·(window-1) rows per
   range, reduced on the driver (O(ranges × window), same bound as the scan
   state) with a searchsorted windowed pass; only pairs whose endpoints lie
   in DIFFERENT ranges are emitted there, so no pair is double-counted.

Skew note: a hot key prefix bounds ONE range's pair emission (O(range·w)
vectorized compute), never a shuffle blow-up — the same containment
argument as length_batches' hot-length ranges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import EngineConfig

_PAIR_SCHEMA = pa.schema(
    [
        ("left_id", pa.int64()),
        ("right_id", pa.int64()),
        ("dist", pa.int32()),
    ]
)


def _prefix_u64(keys) -> np.ndarray:
    """Big-endian uint64 of each key's first 8 UTF-8 bytes (zero-padded):
    numeric order of the prefix == byte-lexicographic order of the key, so
    any non-decreasing bucketing of it is order-aligned.

    Fast path: numpy's ``S8`` cast truncates/zero-pads in C (ASCII-only);
    non-ASCII keys fall back to a per-row encode — both produce the
    identical big-endian value."""
    if len(keys) == 0:
        return np.empty(0, np.uint64)
    try:
        arr = np.asarray(
            ["" if k is None else str(k) for k in keys], dtype="S8"
        )
        return np.frombuffer(arr.tobytes(), dtype=">u8").astype(np.uint64)
    except UnicodeEncodeError:
        out = np.empty(len(keys), np.uint64)
        for i, k in enumerate(keys):
            b = ("" if k is None else str(k)).encode(
                "utf-8", "surrogatepass"
            )[:8]
            out[i] = int.from_bytes(b.ljust(8, b"\0"), "big")
        return out


def sorted_neighborhood(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    key_col: str = "key",
    window: int = 4,
):
    """Candidate pairs ``(left_id, right_id, dist)`` for all records whose
    positions in the ascending (key, id) order differ by 0 < dist < window
    (left = lower rank). Ids must be unique int64; key is compared as a
    string (codepoint order — DuckDB's binary VARCHAR collation)."""
    cfg = cfg or EngineConfig()
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    nr = cfg.num_buckets
    w = int(window)

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "_id": pc.cast(t.column(id_col), pa.int64()),
                "_key": pc.cast(t.column(key_col), pa.string()),
            }
        )

    skinny = ds.select_columns([id_col, key_col]).map_batches(
        project, batch_format="pyarrow"
    ).materialize()

    def rng_fn(t: pa.Table) -> np.ndarray:
        pre = _prefix_u64(t.column("_key").to_pylist())
        hi = pre >> np.uint64(32)
        return ((hi * np.uint64(nr)) >> np.uint64(32)).astype(np.int64)

    from .scan import range_offsets

    offsets, total = range_offsets(skinny, rng_fn, nr)
    if total == 0:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    off_ref = ray.put(offsets)

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_bucket", pa.array(rng_fn(t).astype(np.int32))
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        off = cached_get(off_ref)
        rng = int(g["_bucket"].iloc[0])
        g = g.sort_values(["_key", "_id"], kind="mergesort")
        ids = g["_id"].to_numpy(np.int64)
        n = len(ids)
        rank = off[rng] + np.arange(n, dtype=np.int64)
        lefts, rights, dists = [], [], []
        for d in range(1, min(w, n)):
            lefts.append(ids[:-d])
            rights.append(ids[d:])
            dists.append(np.full(n - d, d, np.int32))
        pairs = pd.DataFrame(
            {
                "left_id": np.concatenate(lefts) if lefts else
                np.empty(0, np.int64),
                "right_id": np.concatenate(rights) if rights else
                np.empty(0, np.int64),
                "dist": np.concatenate(dists) if dists else
                np.empty(0, np.int32),
                "_halo_rank": np.int64(-1),
                "_halo_rng": np.int64(-1),
            }
        )
        edge = np.zeros(n, bool)
        edge[: w - 1] = True
        edge[max(0, n - (w - 1)):] = True
        halo = pd.DataFrame(
            {
                "left_id": ids[edge],
                "right_id": np.int64(0),
                "dist": np.int32(0),
                "_halo_rank": rank[edge],
                "_halo_rng": np.int64(rng),
            }
        )
        return pd.concat([pairs, halo], ignore_index=True)

    mixed = (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
        .materialize()
    )

    in_range = mixed.filter(expr="_halo_rank < 0").select_columns(
        ["left_id", "right_id", "dist"]
    )

    # halo reduce: O(ranges × window) rows — driver-bounded like the scan
    # state. Windowed searchsorted emit; only cross-range pairs (in-range
    # pairs were already emitted by their own range).
    h = (
        mixed.filter(expr="_halo_rank >= 0")
        .select_columns(["left_id", "_halo_rank", "_halo_rng"])
        .to_pandas()
        .sort_values("_halo_rank")
    )
    hid = h["left_id"].to_numpy(np.int64)
    hrk = h["_halo_rank"].to_numpy(np.int64)
    hrg = h["_halo_rng"].to_numpy(np.int64)
    ends = np.searchsorted(hrk, hrk + w, side="left")
    starts = np.arange(len(hrk)) + 1
    cnt = np.maximum(ends - starts, 0)
    li = np.repeat(np.arange(len(hrk)), cnt)
    ri = (
        np.arange(int(cnt.sum()), dtype=np.int64)
        - np.repeat(np.cumsum(cnt) - cnt, cnt)
        + np.repeat(starts, cnt)
    )
    cross = hrg[li] != hrg[ri]
    cross_pairs = pd.DataFrame(
        {
            "left_id": hid[li[cross]],
            "right_id": hid[ri[cross]],
            "dist": (hrk[ri[cross]] - hrk[li[cross]]).astype(np.int32),
        }
    )
    if len(cross_pairs) == 0:
        return in_range
    # arrow, matching in_range's block format — a pandas/arrow mixed union
    # breaks downstream repartition (Ray reduce asserts on mixed blocks)
    return in_range.union(
        ray.data.from_arrow(
            pa.Table.from_pandas(cross_pairs, schema=_PAIR_SCHEMA)
        )
    )


def snm_pairs(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 12,
    window: int = 4,
    jw_threshold: float = 0.9,
):
    """Sorted-neighborhood VERIFIED pair stage: blocking on a lowercased
    ``key_chars`` text prefix → Jaro-Winkler verify ≥ ``jw_threshold`` on
    the full text. Emits distinct (left_id, right_id) string pairs — the
    reusable middle of ``snm_dedup`` (which adds connected components) and
    one input of ``multipass_blocking``.

    Pair texts are attached via the size-aware broadcast join (hash-join
    fallback past the cap); the verify is the batch-vectorized JW kernel.
    Candidate volume is rows × (window−1) by construction — SNM's defining
    property — so the verify stage is linear in the corpus."""
    import pyarrow.compute as pc

    from ..functions.textsim import jaro_winkler_batch
    from .relational import broadcast_join

    cfg = cfg or EngineConfig()

    def key(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column(text_col), pa.string())
        k = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.fill_null(txt, ""), 0, key_chars)
        )
        return pa.table({id_col: t.column(id_col), "key": k})

    # repartition the SKINNY (24-byte) candidate rows BEFORE the texts
    # attach: the string kernels downstream cost ~1.3 core-ms/pair and the
    # candidate stage emits few blocks, so without the spread the whole
    # verify/feature stage runs at 1-2x parallelism; repartitioning after
    # the joins would ship 2x candidate text through an all-to-all instead
    # of 24-byte rows (the broadcast joins are map-side, so block spread
    # survives them)
    # materialize the repartitioned skinny pairs: a live AllToAll feeding
    # the kernel maps in one streaming execution trips the shuffle resource
    # reservation throttle (the repo-wide documented hazard) — the seam is
    # 24 bytes/pair
    cand = sorted_neighborhood(
        docs.map_batches(key, batch_format="pyarrow"),
        cfg, id_col=id_col, key_col="key", window=window,
    ).repartition(cfg.num_buckets).materialize()

    def side(suffix: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_tid" + suffix: pc.cast(t.column(id_col), pa.int64()),
                    "_txt" + suffix: pc.cast(
                        pc.fill_null(t.column(text_col), ""), pa.string()
                    ),
                }
            )

        return docs.map_batches(f, batch_format="pyarrow")

    j = broadcast_join(
        cand, side("_l"), big_key="left_id", small_key="_tid_l",
        payload_cols=["_txt_l"], cfg=cfg,
    )
    j = broadcast_join(
        j, side("_r"), big_key="right_id", small_key="_tid_r",
        payload_cols=["_txt_r"], cfg=cfg,
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"left_id": pd.Series(dtype=object),
                 "right_id": pd.Series(dtype=object)}
            )
        jw = jaro_winkler_batch(
            g["_txt_l"].to_numpy(object), g["_txt_r"].to_numpy(object)
        )
        keep = jw >= jw_threshold
        return pd.DataFrame(
            {
                "left_id": g["left_id"].astype(str).to_numpy()[keep],
                "right_id": g["right_id"].astype(str).to_numpy()[keep],
            }
        )

    return j.map_batches(verify, batch_format="pandas")


def snm_dedup(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 12,
    window: int = 4,
    jw_threshold: float = 0.9,
):
    """Classic merge/purge dedup end-to-end: ``snm_pairs`` (sorted-
    neighborhood blocking + Jaro-Winkler verify) → connected components.
    Output (doc_id, cluster_id, is_duplicate) — the same contract as the
    minhash/simhash dedup family, as the non-learned, embedding-free
    baseline next to them."""
    from .dedup import _components_output

    cfg = cfg or EngineConfig()
    verified = snm_pairs(
        docs, cfg, id_col=id_col, text_col=text_col, key_chars=key_chars,
        window=window, jw_threshold=jw_threshold,
    )
    return _components_output(docs, verified, cfg, id_col)


def fuzzy_join(
    left,
    right,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 8,
    jw_threshold: float = 0.85,
    hot_key_pairs: int = 100_000,
):
    """Blocked fuzzy string join — the classic record-linkage matcher over
    two tables: block on exact equality of the lowercased ``key_chars``
    text prefix, verify candidates with the batch Jaro-Winkler kernel,
    keep the BEST right match per left row (max jw, ties → min right_id).
    Output (left_id, right_id, jw); left rows with no match ≥ threshold
    are absent (inner semantics).

    Scale shape: both sides exchange ONCE on the hash-bucketed blocking
    key. A left row's key is single-valued, so all its candidates land in
    one bucket and best-per-left resolves locally — no second exchange.
    Prefix keys are assumed selective; per-bucket candidate volume is
    Σ_k |L_k|·|R_k| — a degenerate hot key (boilerplate prefix) past
    ``hot_key_pairs`` logs a worker-side warning naming the key, never
    silently (driver-side stats can't propagate from map_groups)."""
    import pyarrow.compute as pc

    from ..functions.textsim import jaro_winkler_batch
    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    if key_chars < 1:
        raise ValueError(f"key_chars must be >= 1, got {key_chars}")

    def side(tag: int):
        def f(t: pa.Table) -> pa.Table:
            txt = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
            return pa.table(
                {
                    "_id": pc.cast(t.column(id_col), pa.string()),
                    "_txt": txt,
                    "_key": pc.utf8_lower(
                        pc.utf8_slice_codeunits(txt, 0, key_chars)
                    ),
                    "_side": pa.array(
                        np.full(len(t), tag, np.int8)
                    ),
                }
            )

        return f

    u = left.map_batches(side(0), batch_format="pyarrow").union(
        right.map_batches(side(1), batch_format="pyarrow")
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = bucket_of(df["_key"], nb)
        return df

    empty = pa.table(
        {
            "left_id": pa.array([], pa.string()),
            "right_id": pa.array([], pa.string()),
            "jw": pa.array([], pa.float64()),
        }
    )

    def match(g: pd.DataFrame) -> pd.DataFrame:
        ls = g[g["_side"] == 0]
        rs = g[g["_side"] == 1]
        if len(ls) == 0 or len(rs) == 0:
            return empty
        m = ls.merge(rs, on="_key", suffixes=("_l", "_r"))
        if len(m) == 0:
            return empty
        per_key = m.groupby("_key", sort=False).size()
        if int(per_key.max()) > hot_key_pairs:
            import logging

            logging.getLogger(__name__).warning(
                "fuzzy_join: hot blocking key %r yields %d candidate "
                "pairs (> %d) — consider a longer key_chars",
                per_key.idxmax(), int(per_key.max()), hot_key_pairs,
            )
        jw = jaro_winkler_batch(
            m["_txt_l"].to_numpy(object), m["_txt_r"].to_numpy(object)
        )
        keep = jw >= jw_threshold
        out = pd.DataFrame(
            {
                "left_id": pd.array(
                    m["_id_l"].to_numpy(object)[keep], dtype="string"
                ),
                "right_id": pd.array(
                    m["_id_r"].to_numpy(object)[keep], dtype="string"
                ),
                "jw": jw[keep],
            }
        )
        if len(out) == 0:
            return empty
        out = out.sort_values(
            ["left_id", "jw", "right_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return out.drop_duplicates("left_id", keep="first")

    return (
        u.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(match, batch_format="pandas")
    )


def pair_features(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 12,
    window: int = 4,
):
    """Candidate-pair FEATURE TABLE — the input a downstream match
    classifier (logistic regression, gradient trees, active labeling)
    trains on: for every sorted-neighborhood candidate pair, the standard
    ER feature vector

        (left_id, right_id, jw, lev, len_l, len_r, token_jaccard)

    jw = Jaro-Winkler on full text, lev = raw edit distance, len_* =
    code-point lengths, token_jaccard = |A∩B| / |A∪B| over DISTINCT
    basic-english tokens (0.0 when the union is empty). NULL text is ''
    throughout. This factors the scoring half of ``snm_dedup`` out as a
    reusable surface: same blocking, features instead of a threshold.

    Scale shape: SNM candidates via the shared prefix-scan blocking
    (O(rows·window) pairs, no global sort), texts attached by the
    size-aware broadcast join, then one vectorized pass per batch — the
    bit-parallel JW/Levenshtein batch kernels; the Jaccard intersects two
    SORTED small int-code arrays per pair (the only per-pair loop, O(tokens)
    each, same bound the lang_id/quality scans carry).
    """
    import pyarrow.compute as pc

    from ..functions.textsim import jaro_winkler_batch, levenshtein_batch
    from ..functions.tokenizer import tokenize_many
    from .relational import broadcast_join

    cfg = cfg or EngineConfig()

    def key(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column(text_col), pa.string())
        k = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.fill_null(txt, ""), 0, key_chars)
        )
        return pa.table({id_col: t.column(id_col), "key": k})

    # repartition the SKINNY (24-byte) candidate rows BEFORE the texts
    # attach: the string kernels downstream cost ~1.3 core-ms/pair and the
    # candidate stage emits few blocks, so without the spread the whole
    # verify/feature stage runs at 1-2x parallelism; repartitioning after
    # the joins would ship 2x candidate text through an all-to-all instead
    # of 24-byte rows (the broadcast joins are map-side, so block spread
    # survives them)
    # materialize the repartitioned skinny pairs: a live AllToAll feeding
    # the kernel maps in one streaming execution trips the shuffle resource
    # reservation throttle (the repo-wide documented hazard) — the seam is
    # 24 bytes/pair
    cand = sorted_neighborhood(
        docs.map_batches(key, batch_format="pyarrow"),
        cfg, id_col=id_col, key_col="key", window=window,
    ).repartition(cfg.num_buckets).materialize()

    def side(suffix: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "_tid" + suffix: pc.cast(t.column(id_col), pa.int64()),
                    "_txt" + suffix: pc.cast(
                        pc.fill_null(t.column(text_col), ""), pa.string()
                    ),
                }
            )

        return docs.map_batches(f, batch_format="pyarrow")

    j = broadcast_join(
        cand, side("_l"), big_key="left_id", small_key="_tid_l",
        payload_cols=["_txt_l"], cfg=cfg,
    )
    j = broadcast_join(
        j, side("_r"), big_key="right_id", small_key="_tid_r",
        payload_cols=["_txt_r"], cfg=cfg,
    )

    def feats(t: pa.Table) -> pa.Table:
        la = t.column("_txt_l").to_pylist()
        rb = t.column("_txt_r").to_pylist()
        n = len(la)
        if n == 0:
            return pa.table(
                {
                    "left_id": pa.array([], pa.int64()),
                    "right_id": pa.array([], pa.int64()),
                    "jw": pa.array([], pa.float64()),
                    "lev": pa.array([], pa.int64()),
                    "len_l": pa.array([], pa.int64()),
                    "len_r": pa.array([], pa.int64()),
                    "token_jaccard": pa.array([], pa.float64()),
                }
            )
        jw = jaro_winkler_batch(la, rb)
        lev = levenshtein_batch(la, rb)
        len_l = np.fromiter((len(s) for s in la), np.int64, n)
        len_r = np.fromiter((len(s) for s in rb), np.int64, n)
        toks_l = tokenize_many(la)
        toks_r = tokenize_many(rb)
        jac = np.zeros(n, np.float64)
        # int codes shared across both sides; per-pair set ops collapse to
        # THREE global sorted passes (unique-left, unique-right, one
        # intersect) + bincounts — no per-pair loop
        from itertools import chain

        allt = np.fromiter(
            chain(chain.from_iterable(toks_l), chain.from_iterable(toks_r)),
            object,
        )
        if len(allt):
            codes, uniq_tokens = pd.factorize(allt, sort=False)
            u = np.int64(len(uniq_tokens))
            counts_l = np.fromiter((len(x) for x in toks_l), np.int64, n)
            counts_r = np.fromiter((len(x) for x in toks_r), np.int64, n)
            split = int(counts_l.sum())
            cl, cr = codes[:split], codes[split:]
            pl = np.repeat(np.arange(n, dtype=np.int64), counts_l)
            pr = np.repeat(np.arange(n, dtype=np.int64), counts_r)
            keys_l = np.unique(pl * u + cl)
            keys_r = np.unique(pr * u + cr)
            inter_keys = np.intersect1d(keys_l, keys_r, assume_unique=True)
            na = np.bincount(keys_l // u, minlength=n)
            nb_ = np.bincount(keys_r // u, minlength=n)
            ni = np.bincount(inter_keys // u, minlength=n)
            union = na + nb_ - ni
            nz = union > 0
            jac[nz] = ni[nz] / union[nz]
        return pa.table(
            {
                "left_id": t.column("left_id").cast(pa.int64()),
                "right_id": t.column("right_id").cast(pa.int64()),
                "jw": pa.array(jw),
                "lev": pa.array(lev.astype(np.int64)),
                "len_l": pa.array(len_l),
                "len_r": pa.array(len_r),
                "token_jaccard": pa.array(jac),
            }
        )

    return j.map_batches(feats, batch_format="pyarrow")


def block_skew(
    docs,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_chars: int = 12,
    min_size: int = 2,
):
    """Blocking-key skew report — the diagnosis every blocking strategy
    needs BEFORE running: per blocking key (lowercased ``key_chars`` text
    prefix, the same key snm_dedup blocks on), the block size and the
    all-pairs cost C(n,2) it would induce. Emits (key, block_size:int64,
    n_pairs:int64) for blocks of at least ``min_size``, the hot-key list
    that decides salting thresholds.

    Map-side (key, count) partials (one value_counts per batch), ONE
    bucketed exchange on hash(key), O(distinct keys) combine — the
    documents never move.
    """
    import pyarrow.compute as pc

    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets
    if min_size < 1:
        raise ValueError(f"min_size must be >= 1, got {min_size}")

    def partial(t: pa.Table) -> pd.DataFrame:
        txt = pc.cast(t.column(text_col), pa.string())
        k = pc.utf8_lower(
            pc.utf8_slice_codeunits(pc.fill_null(txt, ""), 0, key_chars)
        ).to_numpy(zero_copy_only=False)
        vc = pd.Series(k).value_counts(sort=False)
        g = pd.DataFrame(
            {
                "key": vc.index.to_numpy(object),
                "n": vc.to_numpy(np.int64),
            }
        )
        g["_bucket"] = bucket_of(g["key"], nb)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype=object),
                    "block_size": pd.Series(dtype=np.int64),
                    "n_pairs": pd.Series(dtype=np.int64),
                }
            )
        g = df.groupby("key", sort=False)["n"].sum()
        g = g[g >= min_size]
        n = g.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "key": g.index.to_numpy(object),
                "block_size": n,
                "n_pairs": n * (n - 1) // 2,
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def suffix_blocking(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str,
    key_col: str,
    min_len: int = 3,
    max_block: int = 50,
):
    """Suffix blocking (Aizawa-Oyama): two records are candidates when
    their blocking keys share ANY suffix of length ≥ ``min_len`` whose
    block holds ≤ ``max_block`` records (oversized suffix blocks are
    purged — common trailing tokens carry no signal). Emits DISTINCT
    (left_id, right_id) with left < right as strings — the classic
    typo-robust blocking baseline next to prefix ``fuzzy_join`` and
    ``sorted_neighborhood``.

    Scale shape: suffixes are emitted map-side with one code-point slice
    kernel per length (a key of length L yields L−min_len+1 skinny rows,
    bounded by key length, never corpus size); ONE hash(suffix) exchange
    co-locates each block, whose pairs are bounded by max_block² BY
    CONSTRUCTION (purge before pairing — no salting needed); a second
    pair-hash exchange dedupes pairs that arise from nested suffixes.
    Code-point slicing == DuckDB substr, so the twin holds for non-ASCII
    keys."""
    import pyarrow.compute as pc

    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def emit(t: pa.Table) -> pd.DataFrame:
        keys = pc.fill_null(pc.cast(t.column(key_col), pa.string()), "")
        ids = t.column(id_col).cast(pa.string()).to_pandas().astype(str)
        lens = np.asarray(pc.utf8_length(keys), np.int64)
        max_len = int(lens.max()) if len(lens) else 0
        sufs, out_ids = [], []
        for k in range(min_len, max_len + 1):
            mask = lens >= k
            if not mask.any():
                continue
            suf = pc.utf8_slice_codeunits(keys, start=-k)
            sub = pd.Series(np.asarray(suf, object)[mask])
            sufs.append(sub)
            out_ids.append(ids[mask])
        if not sufs:
            return pd.DataFrame(
                {
                    "suf": pd.Series(dtype=object),
                    "id": pd.Series(dtype=object),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        df = pd.DataFrame(
            {
                "suf": pd.concat(sufs, ignore_index=True),
                "id": pd.concat(
                    [s.reset_index(drop=True) for s in out_ids],
                    ignore_index=True,
                ),
            }
        )
        df["_bucket"] = bucket_of(df["suf"], nb)
        return df

    def pair_block(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["suf", "id"])
        sizes = g.groupby("suf", sort=False)["id"].transform("size")
        g = g[(sizes >= 2) & (sizes <= max_block)]
        if len(g) == 0:
            out = pd.DataFrame({"left_id": [], "right_id": []})
            pb = np.array([], np.int32)
        else:
            m = g.merge(g, on="suf")
            m = m[m["id_x"] < m["id_y"]]
            out = m[["id_x", "id_y"]].drop_duplicates()
            out = out.rename(columns={"id_x": "left_id", "id_y": "right_id"})
            pb = bucket_of(
                out["left_id"].astype(str) + "|"
                + out["right_id"].astype(str),
                nb,
            )
        return pa.table(
            {
                "left_id": pa.array(
                    out["left_id"].to_numpy(object), pa.string()
                ),
                "right_id": pa.array(
                    out["right_id"].to_numpy(object), pa.string()
                ),
                "_pb": pa.array(pb),
            }
        )

    def dedupe(g: pd.DataFrame) -> pa.Table:
        # the sentinel row (null ids) exists only to keep the final
        # exchange non-empty so a zero-pair corpus still yields a TYPED
        # empty result (an all-empty groupby loses the schema)
        g = g[g["left_id"].notna()]
        d = g.drop_duplicates(["left_id", "right_id"])
        return pa.table(
            {
                "left_id": pa.array(
                    d["left_id"].to_numpy(object), pa.string()
                ),
                "right_id": pa.array(
                    d["right_id"].to_numpy(object), pa.string()
                ),
            }
        )

    import ray.data as rd

    sentinel = rd.from_arrow(
        pa.table(
            {
                "left_id": pa.array([None], pa.string()),
                "right_id": pa.array([None], pa.string()),
                "_pb": pa.array([np.int32(0)]),
            }
        )
    )
    return (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pair_block, batch_format="pandas")
        .union(sentinel)
        .groupby("_pb")
        .map_groups(dedupe, batch_format="pandas")
    )


def block_cleaning(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str,
    key_col: str,
    purge_cap: int = 260,
    keep_per_record: int = 2,
):
    """JedAI-style block PURGING + FILTERING over schema-agnostic token
    blocking: blocks are the lowercased whitespace tokens of ``key_col``;
    blocks larger than ``purge_cap`` are dropped entirely (stop-word
    blocks), then each record keeps only its ``keep_per_record`` SMALLEST
    surviving blocks (ties by block key asc) — the standard cleaning pass
    before meta-blocking prunes edges. Emits (bkey, id:int64,
    block_size:int64).

    Scale shape: distinct (token, id) pairs map-side; ONE hash(token)
    exchange computes exact block sizes and purges oversized blocks in
    place; ONE hash(id) exchange ranks each record's surviving blocks by
    a single lexsort + segment index arithmetic. Both exchanges carry only
    skinny token/id rows."""
    import pyarrow.compute as pc

    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def tokens(t: pa.Table) -> pd.DataFrame:
        txt = pc.utf8_lower(
            pc.fill_null(pc.cast(t.column(key_col), pa.string()), "")
        )
        toks = pc.split_pattern(txt, " ")
        flat = toks.combine_chunks() if hasattr(toks, "combine_chunks") else toks
        offs = np.asarray(flat.offsets)
        ids = np.asarray(t.column(id_col), np.int64)
        rep = np.diff(offs)
        df = pd.DataFrame(
            {
                "bkey": np.asarray(flat.flatten(), object),
                "id": np.repeat(ids, rep),
            }
        )
        df = df[df["bkey"] != ""].drop_duplicates(["bkey", "id"])
        df["_bucket"] = bucket_of(df["bkey"], nb)
        return df

    def size_purge(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["bkey", "id"])
        sizes = g.groupby("bkey", sort=False)["id"].transform("size")
        g = g[sizes <= purge_cap]
        ids = g["id"].to_numpy(np.int64)
        ib = (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(33)
        ) % np.uint64(nb)
        # explicit Arrow types: 0-row object outputs confuse block sizing
        return pa.table(
            {
                "bkey": pa.array(g["bkey"].to_numpy(object), pa.string()),
                "id": pa.array(ids),
                "block_size": pa.array(
                    sizes[sizes <= purge_cap].to_numpy(np.int64)
                ),
                "_ib": pa.array(ib.astype(np.int32)),
            }
        )

    def keep_smallest(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["id", "block_size", "bkey"], kind="mergesort"
        )
        ids = g["id"].to_numpy(np.int64)
        starts = np.nonzero(
            np.concatenate(([True], ids[1:] != ids[:-1]))
        )[0]
        intra = np.arange(len(ids)) - np.repeat(starts, np.diff(
            np.concatenate((starts, [len(ids)]))
        ))
        keep = intra < keep_per_record
        return pa.table(
            {
                "bkey": pa.array(
                    g["bkey"].to_numpy(object)[keep], pa.string()
                ),
                "id": pa.array(ids[keep]),
                "block_size": pa.array(
                    g["block_size"].to_numpy(np.int64)[keep]
                ),
            }
        )

    return (
        ds.map_batches(tokens, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(size_purge, batch_format="pandas")
        .groupby("_ib")
        .map_groups(keep_smallest, batch_format="pandas")
    )
