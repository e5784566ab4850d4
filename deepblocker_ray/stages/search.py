"""TF-IDF keyword retrieval — top-k documents per query under an
integer-exact inverted-index score.

The reference's only retrieval surface is embedding top-K
(vector_pairing_models.py:30-46, handled by stages/pairing.py); a
training-data engine also needs LEXICAL retrieval — "find the corpus
documents matching these probe queries" — for eval-set mining, targeted
decontamination, and more-like-this corpus exploration.

Score(q, d) = Σ over distinct query terms t present in d of
tf(d, t) · (n_docs // df(t)) — the same integer idf surrogate as
``stages/dedup.py:tfidf_dedup`` (rare shared terms dominate; BIGINT
arithmetic on both sides so the SQL twin hash-matches bit-for-bit,
unlike float tf·ln(N/df)). Ranking is the house total order
(score desc, doc_id asc) via ``stages/topk.py:group_topk``, so ``rank``
equals SQL ``row_number()``.

Scale shape: the query side is SMALL by contract (probe sets are
10²-10⁵ rows — the decontaminate asymmetry). Its distinct term hashes +
CSR postings (term → query slots) are built once on the driver and
``ray.put`` once. The corpus then streams through exactly two
vectorized map passes with NO corpus shuffle:

1. document frequency, restricted to query terms: per batch, per-doc
   DISTINCT matched terms → partial df per term SLOT (doc_ids are unique
   per row so per-batch partials are disjoint and exact); only
   (slot, df) int rows — O(query vocab) — ride one bucketed exchange.
2. scoring: per doc, tf over the batch's flat token stream (factorize +
   unique, no per-doc loop), searchsorted membership against the
   broadcast term hashes, postings expansion by np.repeat, and one
   sorted reduceat per batch for the (query, doc) partial sums. A doc's
   tokens live in one batch, so batch-local (query, doc) scores are
   final — no combine stage.

Only the ≤ |matches| skinny (query_id, doc_id, score) rows reach the
top-k exchange, which is itself map-side-partial (top-k is associative).
Term identity is the md5-lower64 HASH of the token (collision
probability ~n²/2⁶⁴ — the same convention, with the same caveat, as
tfidf_dedup's gram hashing); the SQL twin uses the term string.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import EngineConfig


def _repeat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], starts[i]+counts[i]) index ranges without a
    Python loop: arange over the total length, rebased per segment."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    seg = np.repeat(np.arange(len(counts)), counts)
    prior = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.repeat(starts, counts) + (np.arange(total) - prior[seg])


def _query_state(queries, query_id_col: str, query_text_col: str,
                 max_queries: int):
    """Collect the small query side into (query ids, sorted distinct term
    hashes, CSR postings term-slot → query indices)."""
    from ..functions.tokenizer import tokenize_many
    from .dedup import hash64_strs

    qids: list[str] = []
    pairs_q: list[np.ndarray] = []  # query index per (query, term) pair
    pairs_h: list[np.ndarray] = []  # term hash per pair
    for b in queries.select_columns(
        [query_id_col, query_text_col]
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        ids = b.column(query_id_col).to_pylist()
        toks = tokenize_many(b.column(query_text_col).to_pylist())
        base = len(qids)
        qids.extend(str(i) for i in ids)
        for j, ts in enumerate(toks):
            if not ts:
                continue
            uniq = pd.unique(np.asarray(ts, object))
            pairs_q.append(np.full(len(uniq), base + j, np.int64))
            pairs_h.append(hash64_strs(uniq))
        if len(qids) > max_queries:
            raise ValueError(
                f"query side has > {max_queries} rows — tfidf_search "
                "broadcasts it; pass a smaller probe set or raise "
                "cfg.broadcast_rows_max"
            )
    if not pairs_q:
        return qids, np.empty(0, np.uint64), np.zeros(1, np.int64), \
            np.empty(0, np.int64)
    q_idx = np.concatenate(pairs_q)
    h = np.concatenate(pairs_h)
    # CSR over distinct term hashes: postings sorted by (term, query)
    order = np.lexsort((q_idx, h))
    h, q_idx = h[order], q_idx[order]
    terms, starts, counts = np.unique(
        h, return_index=True, return_counts=True
    )
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    postings = q_idx  # already grouped by term in sorted order
    _ = starts
    return qids, terms, offsets, postings


def tfidf_search(
    docs,
    queries,
    cfg: EngineConfig | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k: int = 10,
    stats_out: dict | None = None,
):
    """Top-``k`` corpus documents per probe query under the integer-exact
    TF-IDF score. Emits (query_id:string, rank:int64, doc_id, score:int64)
    with ``rank`` 1-based within the query under (score desc, doc_id asc);
    documents sharing no term with a query (or scoring 0) are absent.
    Queries with no tokens return no rows."""
    import ray

    from ..config import parallel_blocks
    from ..functions.tokenizer import tokenize_many
    from .dedup import hash64_strs
    from .topk import group_topk

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    qids, terms, offsets, postings = _query_state(
        queries, query_id_col, query_text_col, cfg.broadcast_rows_max
    )
    if stats_out is not None:
        stats_out["n_queries"] = len(qids)
        stats_out["n_query_terms"] = len(terms)
    # two passes over (id, text) only; prune before streaming
    docs = parallel_blocks(
        docs.select_columns([id_col, text_col])
    ).materialize()
    if len(terms) == 0 or docs.count() == 0:
        sch = docs.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        if not isinstance(id_type, pa.DataType):  # pandas-block schema
            id_type = pa.from_numpy_dtype(np.dtype(id_type))
        return ray.data.from_arrow(
            pa.table(
                {
                    query_id_col: pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    id_col: pa.array([], id_type),
                    "score": pa.array([], pa.int64()),
                }
            )
        )
    n_docs = docs.count()
    terms_ref = ray.put(terms)

    def _batch_tf(batch: pa.Table):
        """(p_doc, p_slot, tf): per-(doc, matched query term) term
        frequencies for one batch, slot-indexed into the broadcast terms."""
        from ..state.broadcast import cached_get

        t = cached_get(terms_ref)
        toks = tokenize_many(batch.column(text_col).to_pylist())
        counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        total = int(counts.sum())
        if total == 0:
            z = np.empty(0, np.int64)
            return z, z, z
        flat = np.empty(total, object)
        p = 0
        for ts in toks:
            flat[p : p + len(ts)] = ts
            p += len(ts)
        codes, uniq = pd.factorize(flat, sort=False)
        uh = hash64_strs(uniq)
        pos = np.searchsorted(t, uh)
        pos[pos >= len(t)] = 0
        slot = np.where(t[pos] == uh, pos, -1).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), counts)
        u = len(uniq)
        pair, tf = np.unique(doc_idx * u + codes, return_counts=True)
        p_doc = pair // u
        p_slot = slot[pair % u]
        m = p_slot >= 0
        return p_doc[m], p_slot[m], tf[m].astype(np.int64)

    # ---- pass 1: df per query-term slot (distinct docs; exact partials) --
    def df_partial(batch: pa.Table) -> pa.Table:
        p_doc, p_slot, _tf = _batch_tf(batch)
        _ = p_doc  # (doc, term) rows are already distinct pairs
        dfc = np.bincount(p_slot, minlength=len(terms)) if len(p_slot) \
            else np.zeros(len(terms), np.int64)
        nz = np.flatnonzero(dfc)
        return pa.table(
            {
                "slot": pa.array(nz.astype(np.int64)),
                "df": pa.array(dfc[nz].astype(np.int64)),
                "_bucket": pa.array((nz % nb).astype(np.int32)),
            }
        )

    def df_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("slot", sort=False, observed=True)["df"].sum()
        return g.reset_index()

    df_tbl = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(df_combine, batch_format="pandas")
        .to_pandas()
    )
    weights = np.zeros(len(terms), np.int64)
    if len(df_tbl):
        weights[df_tbl["slot"].to_numpy(np.int64)] = (
            n_docs // df_tbl["df"].to_numpy(np.int64)
        )
    bcast_ref = ray.put((weights, offsets, postings, np.asarray(qids, object)))

    # ---- pass 2: map-side (query, doc) scores; batch-local = final -------
    def score(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import cached_get

        w, off, post, qid_arr = cached_get(bcast_ref)
        p_doc, p_slot, tf = _batch_tf(batch)
        out_empty = pa.table(
            {
                query_id_col: pa.array([], pa.string()),
                id_col: pa.array([], batch.column(id_col).type),
                "score": pa.array([], pa.int64()),
            }
        )
        if len(p_slot) == 0:
            return out_empty
        contrib = tf * w[p_slot]
        keep = contrib > 0
        p_doc, p_slot, contrib = p_doc[keep], p_slot[keep], contrib[keep]
        if len(p_slot) == 0:
            return out_empty
        b = len(batch)
        nq = len(qid_arr)
        nt = len(w)
        # GEMM path: with a compact query vocabulary the (doc × term) and
        # (term × query) grids are small — one sgemm replaces the postings
        # expansion (which materializes Σ cnt rows, ~18× the final cells on
        # word-soup corpora). float64 accumulation is exact while the
        # batch's total contribution stays below 2^53 (bounds every cell).
        if (
            b * nt <= (1 << 24)
            and nt * nq <= (1 << 24)
            and b * nq <= (1 << 24)
            and int(contrib.sum()) < (1 << 53)
        ):
            docterm = np.zeros((b, nt), np.float64)
            docterm[p_doc, p_slot] = contrib
            termq = np.zeros((nt, nq), np.float64)
            post_slot = np.repeat(
                np.arange(nt, dtype=np.int64), np.diff(off)
            )
            termq[post_slot, post] = 1.0
            s = docterm @ termq
            r_doc2, r_q2 = np.nonzero(s)  # row-major, deterministic
            sums = s[r_doc2, r_q2].astype(np.int64)
            uk = r_q2 * b + r_doc2
            ids = batch.column(id_col).take(pa.array(uk % b))
            return pa.table(
                {
                    query_id_col: pa.array(
                        list(qid_arr[uk // b]), pa.string()
                    ),
                    id_col: ids,
                    "score": pa.array(sums),
                }
            )
        starts = off[p_slot]
        cnt = off[p_slot + 1] - starts
        idx = _repeat_ranges(starts, cnt)
        r_q = post[idx]
        r_doc = np.repeat(p_doc, cnt)
        r_c = np.repeat(contrib, cnt)
        if len(r_q) == 0:
            return out_empty
        key = r_q * b + r_doc
        # dense bincount beats the O(n log n) sort when the (query, doc)
        # grid fits; float64 weight sums are exact while the batch's total
        # contribution stays below 2^53 (each cell sum is bounded by it)
        if nq * b <= (1 << 22) and int(contrib.sum()) < (1 << 53):
            dense = np.bincount(
                key, weights=r_c.astype(np.float64), minlength=nq * b
            )
            uk = np.flatnonzero(dense)
            sums = dense[uk].astype(np.int64)
        else:
            order = np.argsort(key, kind="stable")
            ks = key[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(np.diff(ks)) + 1)
            )
            sums = np.add.reduceat(r_c[order], bounds)
            uk = ks[bounds]
        ids = batch.column(id_col).take(pa.array(uk % b))
        return pa.table(
            {
                query_id_col: pa.array(
                    list(qid_arr[uk // b]), pa.string()
                ),
                id_col: ids,
                "score": pa.array(sums.astype(np.int64)),
            }
        )

    scores = docs.map_batches(
        score, batch_format="pyarrow", batch_size=cfg.embed_batch_size
    )
    return group_topk(
        scores, cfg, order_col="score", id_col=id_col, k=k,
        group_col=query_id_col,
    )


def inverted_index(docs, cfg=None, *, id_col: str = "doc_id",
                   text_col: str = "text", df_cap: int | None = None):
    """Materialize the inverted index itself as a table: one row per
    token — (token, df:int64, postings: comma-joined doc ids in ascending
    STRING order). The artifact behind token blocking / lexical search,
    exposed as an output a downstream engine can load. ``df_cap`` (if
    given) drops stop tokens with df > cap — block purging at the index,
    where it is one comparison instead of a posting-list explosion later.

    Scale shape: per batch, tokenize + per-doc distinct → skinny
    (token, doc) pairs; ONE hash(token) bucket exchange; per bucket a
    vectorized groupby builds each posting list. Posting lists for
    stop-like tokens are the classic skew hazard — cap them with
    ``df_cap`` (the cap is exact, applied after the full df is known in
    the token's single bucket)."""
    import pandas as pd

    from ..config import EngineConfig
    from ..functions.tokenizer import tokenize_many
    from .canonicalize import bucket_of

    cfg = cfg or EngineConfig()
    nb = cfg.num_buckets

    def pairs(t: pa.Table) -> pd.DataFrame:
        ids = t.column(id_col).cast(pa.string()).to_pandas().to_numpy(object)
        texts = (
            t.column(text_col)
            .cast(pa.string())
            .fill_null("")
            .to_pandas()
            .to_numpy(object)
        )
        toks = tokenize_many(texts)
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        doc = np.repeat(ids, lens)
        tok = np.concatenate([np.asarray(x, object) for x in toks]) \
            if lens.sum() else np.empty(0, object)
        df = pd.DataFrame({"token": tok, "doc_id": doc}).drop_duplicates()
        df["_bucket"] = bucket_of(df["token"], nb)
        return df

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["token", "doc_id"])
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        grouped = g.groupby("token", sort=False)["doc_id"]
        df_counts = grouped.size()
        if df_cap is not None:
            keep = df_counts[df_counts <= df_cap].index
            g = g[g["token"].isin(set(keep))]
            grouped = g.groupby("token", sort=False)["doc_id"]
            df_counts = grouped.size()
        postings = grouped.agg(",".join)
        return pd.DataFrame(
            {
                "token": df_counts.index.to_numpy(object),
                "df": df_counts.to_numpy(np.int64),
                "postings": postings.to_numpy(object),
            }
        )

    return (
        docs.map_batches(pairs, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(build, batch_format="pandas")
    )
