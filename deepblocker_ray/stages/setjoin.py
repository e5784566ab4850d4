"""Exact threshold set-similarity self-join (AllPairs / PPJoin family).

``set_similarity_join`` emits every document pair whose token-set Jaccard
meets a rational threshold ``tau_num/tau_den`` — the classic prefix-filtered
similarity join (Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07; Xiao et al., PPJoin). The reference blocks with embeddings only
(blocking_utils.py) and has no lexical join; this is the deterministic,
exactly-SQL-twinnable counterpart of ``embedding_neardup`` at the pair level.

Exactness of the prefix filter (a guarantee, not a heuristic): order all
tokens by a global total order (document frequency ASC, token hash ASC =
rarest first). For a qualifying pair, J >= t implies the overlap O satisfies
O >= t*(|x|+|y|)/(1+t) >= t*|s| for EACH side s (using |other| >= t*|s|),
so O >= ceil(t*|s|). The earliest shared token therefore sits at position
<= |s| - O + 1 <= |s| - ceil(t*|s|) + 1 in BOTH sides' sorted lists — each
doc keys only that prefix and every qualifying pair shares a prefix key.

Scale shape (same discipline as stages/dedup.py):
  - tokenize + per-doc distinct hashing is one vectorized pass per batch
    (hash once per distinct token per batch via pd.factorize);
  - document frequencies come from ONE token-bucket exchange that ships
    only (doc_id, uint64) metadata and annotates each row in place;
  - one doc-bucket exchange packs, per doc, the value-sorted token set
    (verify payload) and the rarest-first prefix — no driver-side state;
  - candidates run through the shared hot-key salting machinery
    (``_pairs_from_keys``) so a degenerate prefix key (e.g. an all-identical
    corpus) still yields bounded per-task work with an EXACT pair set
    (``hard_mult`` is set high so the lossy subsample never engages;
    lower it explicitly to trade exactness for junk-resistance);
  - verify attaches payloads via the shared byte-capped plasma lookup or
    hash-join fallback and keeps pairs by integer cross-multiplication
    (``tau_den * inter >= tau_num * union``) — no float thresholds.

Twin caveat (shared with every hashed-token twin in this repo): tokens are
compared by 64-bit md5 hash, so a hash collision could merge two distinct
tokens; at realistic vocabulary sizes P(any collision) is ~n²/2⁶⁵.
Docs with ZERO tokens emit no rows and join nothing — identical to the
brute-force SQL twin, where empty token lists produce no join rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig
from ..functions.tokenizer import tokenize
from .canonicalize import bucket_of
from .dedup import _dedup_pairs, _pairs_from_keys, _verify_pairs, hash64_strs


def _empty_toks() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "bkey": pa.array([], pa.uint64()),
        }
    )


def _tok_explode(id_col: str, text_col: str):
    """batch → (doc_id, bkey) rows, one per DISTINCT token per doc."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.string()).to_pylist()
        texts = t.column(text_col).to_pylist()
        doc_idx: list[int] = []
        toks: list[str] = []
        for i, txt in enumerate(texts):
            if txt is None:
                continue
            ts = set(tokenize(txt))
            doc_idx.extend([i] * len(ts))
            toks.extend(ts)
        if not toks:
            return _empty_toks()
        codes, uniq = pd.factorize(
            pd.Series(toks, dtype=object), sort=False
        )
        hs = hash64_strs(uniq)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(ids, object)[np.asarray(doc_idx)], pa.string()
                ),
                "bkey": pa.array(hs[codes]),
            }
        )

    return fn


def _setjoin_verify_fn(tau_num: int, tau_den: int, sim: str = "jaccard"):
    """pair_fn: exact |∩| plus set sizes over sorted-unique uint64 token
    sets; the threshold is decided by integer cross-multiplication for
    every similarity family — jaccard: inter·den ≥ num·union; dice:
    2·inter·den ≥ num·(na+nb); cosine: inter²·den² ≥ num²·na·nb (squares
    stay far under 2⁶³ for any realistic token-set size). Null payloads
    (id missing from the token side, i.e. an empty doc) drop the pair —
    the twin has no rows for empty docs either."""

    def fn(ls, rs, lp, rp) -> pa.Table:
        import pyarrow.compute as pc

        from .dedup import (
            _pairwise_intersect_indexed,
            _uniquify_pair_payloads,
        )

        valid = (
            pc.and_(pc.is_valid(lp), pc.is_valid(rp))
            .to_numpy(zero_copy_only=False)
        )
        pool, li, ri = _uniquify_pair_payloads(ls, rs, lp, rp)
        inter, na, nb = _pairwise_intersect_indexed(pool, li, ri)
        union = na + nb - inter
        if sim == "jaccard":
            ok = (inter * tau_den >= tau_num * union) & (union > 0)
        elif sim == "dice":
            ok = (2 * inter * tau_den >= tau_num * (na + nb)) & (
                na + nb > 0
            )
        else:  # cosine
            ok = (
                inter * inter * (tau_den * tau_den)
                >= (tau_num * tau_num) * na * nb
            ) & (na > 0) & (nb > 0)
        keep = np.nonzero(valid & ok)[0]
        ls = np.asarray(ls, object)
        rs = np.asarray(rs, object)
        cols = {
            "left_id": pa.array(ls[keep], pa.string()),
            "right_id": pa.array(rs[keep], pa.string()),
            "n_inter": pa.array(inter[keep]),
        }
        if sim == "jaccard":
            cols["n_union"] = pa.array(union[keep])
        else:
            cols["n_left"] = pa.array(na[keep])
            cols["n_right"] = pa.array(nb[keep])
        return pa.table(cols)

    return fn


def set_similarity_join(
    ds,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    tau_num: int = 3,
    tau_den: int = 5,
    max_bucket: int = 64,
    hard_mult: int = 1 << 16,
    stats_out: dict | None = None,
    sim: str = "jaccard",
):
    """All pairs with token-set similarity >= tau_num/tau_den under
    ``sim`` ∈ {"jaccard", "dice", "cosine"} (Dice = 2|∩|/(|x|+|y|),
    set-cosine = |∩|/√(|x|·|y|)).

    Output: (left_id, right_id, n_inter, n_union) for jaccard /
    (left_id, right_id, n_inter, n_left, n_right) for dice & cosine,
    with left_id < right_id as STRINGS (ids are stringified; the SQL twin
    must orient pairs with a VARCHAR compare). The similarity itself is
    recoverable from the integer columns; it is deliberately not emitted
    so the output stays integer-exact.

    The prefix filter stays a PROOF for all three families via an
    effective rational bound eff_num/eff_den on the per-side minimum
    overlap (sim ≥ t ⇒ O ≥ ns·eff): jaccard eff = t (O ≥ t·ns); dice
    eff = t/(2−t) (2O ≥ t(ns+no), no ≥ O ⇒ O(2−t) ≥ t·ns); cosine
    eff = t² (O ≥ t√(ns·no), no ≥ O ⇒ O ≥ t²·ns). The same effective
    ratio drives the PPJoin length filter (|small| ≥ eff·|large|).

    ``max_bucket`` bounds per-task all-pairs work on hot prefix keys via
    exact salting; ``hard_mult`` defaults high enough that the lossy
    degenerate-key subsample never engages (exactness first).
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"need 0 < tau_num <= tau_den, got {tau_num}/{tau_den}")
    if sim == "jaccard":
        eff_num, eff_den = tau_num, tau_den
    elif sim == "dice":
        eff_num, eff_den = tau_num, 2 * tau_den - tau_num
    elif sim == "cosine":
        eff_num, eff_den = tau_num * tau_num, tau_den * tau_den
    else:
        raise KeyError(f"unknown sim {sim!r}")

    from ..config import parallel_blocks

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    ds = parallel_blocks(ds).materialize()
    toks = ds.map_batches(
        _tok_explode(id_col, text_col),
        batch_format="pyarrow",
        batch_size=cfg.embed_batch_size,
    )

    def add_tok_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "bkey": df["bkey"],
                "_bucket": (
                    df["bkey"].to_numpy().astype(np.uint64) % np.uint64(nb)
                ).astype(np.int32),
            }
        )

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        # every row of a token lands in this one bucket (bucket = hash % nb),
        # so within-group size IS the global document frequency
        sz = g.groupby("bkey", sort=False)["doc_id"].transform("size")
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "bkey": g["bkey"],
                "df": sz.to_numpy(np.int64),
            }
        )

    ann = (
        toks.map_batches(add_tok_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(annotate_df, batch_format="pandas")
    )

    def add_doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = bucket_of(df["doc_id"], nb)
        return df

    def pack_doc(g: pd.DataFrame) -> pa.Table:
        # rarest-first global order inside each doc: (df ASC, bkey ASC)
        g = g.sort_values(["doc_id", "df", "bkey"], kind="mergesort")
        ids = g["doc_id"].to_numpy(object)
        bk = g["bkey"].to_numpy().astype(np.uint64)
        starts = np.nonzero(
            np.concatenate(([True], ids[1:] != ids[:-1]))
        )[0]
        counts = np.diff(np.concatenate((starts, [len(ids)])))
        need = (eff_num * counts + eff_den - 1) // eff_den  # ceil(eff*n)
        plen = counts - need + 1
        pos = np.arange(len(ids), dtype=np.int64) - np.repeat(starts, counts)
        pmask = pos < np.repeat(plen, counts)
        pref_off = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(plen, out=pref_off[1:])
        # verify payload: value-sorted within each doc (searchsorted merge)
        ord2 = np.lexsort(
            (bk, np.repeat(np.arange(len(starts), dtype=np.int64), counts))
        )
        pay_off = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(counts, out=pay_off[1:])
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.string()),
                "toks": pa.LargeListArray.from_arrays(
                    pa.array(pay_off), pa.array(bk[ord2])
                ),
                "prefix": pa.LargeListArray.from_arrays(
                    pa.array(pref_off), pa.array(bk[pmask])
                ),
                "n_toks": pa.array(counts.astype(np.int64)),
            }
        )

    docs = (
        ann.map_batches(add_doc_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pack_doc, batch_format="pandas")
        .materialize()
    )

    def explode_prefix(t: pa.Table) -> pa.Table:
        lst = t.column("prefix").combine_chunks()
        cnt = np.diff(np.asarray(lst.offsets))
        take = pa.array(np.repeat(np.arange(len(t), dtype=np.int64), cnt))
        return pa.table(
            {
                "doc_id": t.column("doc_id").combine_chunks().take(take),
                "bkey": lst.flatten(),
                # set size rides along for the PPJoin length filter
                "n_toks": t.column("n_toks").combine_chunks().take(take),
            }
        )

    # skinny (doc_id, bkey) rows; _pairs_from_keys reads them twice.
    # Data-size the blocks: the bucket exchange's output partition count
    # follows the INPUT block count, and the upstream doc-bucket groupby
    # can collapse to a handful of blocks — which would serialize the two
    # heavy stages (pair fan-out, payload verify) regardless of bucket
    # count (measured at sf0.1: 3 pair tasks / 8 verify tasks on 32 CPUs,
    # 15.8 s wall → 64/64 tasks, 4.3 s)
    from ..config import parallel_blocks_sized

    keys = parallel_blocks_sized(
        docs.map_batches(
            explode_prefix, batch_format="pyarrow"
        ).materialize()
    )
    cand = _pairs_from_keys(
        keys, "doc_id", max_bucket, cfg, hard_mult=hard_mult,
        stats_out=stats_out,
        size_col="n_toks", size_tau=(eff_num, eff_den),
    )
    # a pair can surface under several shared prefix tokens and, unlike the
    # dedup family, there is no connected-components step downstream to
    # absorb duplicates — dedup pairs BEFORE the payload verify
    cand = _dedup_pairs(cand, cfg)
    return _verify_pairs(
        cand, docs, "doc_id", "toks", cfg,
        _setjoin_verify_fn(tau_num, tau_den, sim),
    )
