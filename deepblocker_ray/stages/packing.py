"""Training-sequence packing (concat-and-chunk) — the LLM-training data op
the blocking/dedup family feeds into: documents are concatenated in a
deterministic global order and chunked into fixed-length training sequences,
and every document is told which token span / sequence range it occupies.
No reference counterpart (the reference ends at blocking); this is the
"pack the deduped corpus" step of a 100-TB training-data pipeline.

The core is an EXACT distributed prefix scan over (doc_id asc) without a
global sort:

1. skinny map: (id, n_tok) — token counts via one vectorized RE2 kernel
   (``\\S+`` run count, the same rule as the ``n_ws_tokens`` SQL twin);
2. two scalar aggregates (min/max id) define R RANGE partitions
   deterministically; map-side (range, sum) partials collapse each batch to
   ≤R tiny rows, the driver turns them into R range offsets (O(R) state)
   and broadcasts;
3. ONE bucketed exchange keyed on the range id co-locates each range; per
   range one lexsort + cumsum (vectorized over the whole range) plus the
   broadcast offset yields every doc's absolute start token.

Range (not hash) partitioning is what makes the scan order-preserving.
Uniform ids give even ranges; heavily clustered ids skew them — the
partitioning assumption is documented here per the engine's custom-operator
rule. The corpus text never rides any exchange (only (id, n_tok) moves).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig


def sequence_pack(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_seq: int = 2048,
):
    """GPT-style packing layout: concatenating all documents in ascending
    ``id_col`` order into one token stream chunked every ``tokens_per_seq``
    tokens, emit per document

        (doc_id, n_tokens, start_tok, first_seq, last_seq)

    where ``start_tok`` is the document's absolute offset in the stream and
    ``first_seq``/``last_seq`` the 0-based training sequences it spans
    (documents may straddle a boundary — that is the concat-and-chunk
    contract). Zero-token documents sit at their offset with
    ``last_seq == first_seq``. Token rule: number of ``\\S+`` runs (exact
    SQL twin: ``len(regexp_extract_all(text, '\\S+'))`` + a window sum);
    NULL text counts as zero tokens on both sides.

    Precondition: ``id_col`` values are UNIQUE — the concat order is
    "ascending id", which is only a total order for distinct ids. With
    duplicate ids the relative offsets of the duplicates are tie-broken by
    shuffle arrival order (nondeterministic), exactly as the SQL twin's
    ``ORDER BY doc_id`` window leaves them engine-defined."""
    cfg = cfg or EngineConfig()
    if tokens_per_seq < 1:
        raise ValueError(f"tokens_per_seq must be >= 1, got {tokens_per_seq}")
    nr = cfg.num_buckets
    cap = np.int64(tokens_per_seq)

    def counts(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column(text_col), pa.string())
        n = pc.count_substring_regex(pc.fill_null(txt, ""), r"\S+")
        return pa.table(
            {
                "_id": pc.cast(t.column(id_col), pa.int64()),
                "_n": pc.cast(n, pa.int64()),
            }
        )

    skinny = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pyarrow"
    ).materialize()

    import ray
    from ray.data.aggregate import Max, Min

    bounds = skinny.aggregate(Min("_id"), Max("_id"))
    if bounds is None or bounds.get("min(_id)") is None:
        return ray.data.from_arrow(_EMPTY_PACK)  # empty input, typed
    lo = np.int64(bounds["min(_id)"])
    hi = np.int64(bounds["max(_id)"])
    span = np.int64(int(hi) - int(lo) + 1)

    def rng_of(ids: np.ndarray) -> np.ndarray:
        # deterministic range partition over [lo, hi]; int128-free because
        # (id - lo) * nr stays well under 2^63 for any realistic id span
        return ((ids - lo) * np.int64(nr) // span).astype(np.int64)

    from .scan import range_offsets

    offsets, _total = range_offsets(
        skinny,
        lambda t: rng_of(np.asarray(t.column("_id"))),
        nr,
        weight_col="_n",
    )
    off_ref = ray.put(offsets)

    def bucketed(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("_id"))
        return t.append_column(
            "_bucket", pa.array(rng_of(ids).astype(np.int32))
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        offs = cached_get(off_ref)
        g = g.sort_values("_id", kind="mergesort")
        ids = g["_id"].to_numpy(np.int64)
        n = g["_n"].to_numpy(np.int64)
        start = offs[int(g["_bucket"].iloc[0])] + np.cumsum(n) - n
        first = start // cap
        last = np.where(n > 0, (start + n - 1) // cap, first)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": n,
                "start_tok": start,
                "first_seq": first,
                "last_seq": last,
            }
        )

    return (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(pack, batch_format="pandas")
    )


_EMPTY_PACK = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "start_tok": pa.array([], pa.int64()),
        "first_seq": pa.array([], pa.int64()),
        "last_seq": pa.array([], pa.int64()),
    }
)


def length_batches(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_docs: int = 32,
):
    """Length-bucketed batching layout: rank every document in ascending
    (n_tokens, doc_id) order and cut the ranked stream every ``batch_docs``
    documents — the padding-efficiency layout for batched inference /
    training (each batch holds near-equal-length docs, so per-batch padding
    to the batch max wastes the least compute). Emits
    ``(doc_id, n_tokens, batch_id)``; same unique-id precondition and
    ``\\S+`` token rule (NULL → 0) as ``sequence_pack``.

    Dense global rank without a global sort — the shared ``scan`` machinery
    with token-count RANGE partitions: equal counts land in one range by
    construction, so ranges partition the total order. Token counts are
    skewed (many docs share a length); a single hot length value bounds one
    range's size — the per-range finish is a vectorized sort + arange, so a
    hot range costs O(range · log) compute, not a shuffle blow-up. The
    corpus text never rides an exchange."""
    cfg = cfg or EngineConfig()
    if batch_docs < 1:
        raise ValueError(f"batch_docs must be >= 1, got {batch_docs}")
    nr = cfg.num_buckets

    def counts(t: pa.Table) -> pa.Table:
        txt = pc.cast(t.column(text_col), pa.string())
        n = pc.count_substring_regex(pc.fill_null(txt, ""), r"\S+")
        return pa.table(
            {
                "_id": pc.cast(t.column(id_col), pa.int64()),
                "_n": pc.cast(n, pa.int64()),
            }
        )

    skinny = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pyarrow"
    ).materialize()

    import ray
    from ray.data.aggregate import Max, Min

    bounds = skinny.aggregate(Min("_n"), Max("_n"))
    if bounds is None or bounds.get("min(_n)") is None:
        return ray.data.from_arrow(_EMPTY_BATCHES)
    lo = np.int64(bounds["min(_n)"])
    hi = np.int64(bounds["max(_n)"])
    span = np.int64(int(hi) - int(lo) + 1)

    def rng_of(n: np.ndarray) -> np.ndarray:
        return ((n - lo) * np.int64(nr) // span).astype(np.int64)

    from .scan import range_offsets

    offsets, _total = range_offsets(
        skinny, lambda t: rng_of(np.asarray(t.column("_n"))), nr
    )
    off_ref = ray.put(offsets)
    cap = np.int64(batch_docs)

    def bucketed(t: pa.Table) -> pa.Table:
        n = np.asarray(t.column("_n"))
        return t.append_column(
            "_bucket", pa.array(rng_of(n).astype(np.int32))
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import cached_get

        offs = cached_get(off_ref)
        g = g.sort_values(["_n", "_id"], kind="mergesort")
        pos = offs[int(g["_bucket"].iloc[0])] + np.arange(
            len(g), dtype=np.int64
        )
        return pd.DataFrame(
            {
                "doc_id": g["_id"].to_numpy(np.int64),
                "n_tokens": g["_n"].to_numpy(np.int64),
                "batch_id": pos // cap,
            }
        )

    return (
        skinny.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank, batch_format="pandas")
    )


_EMPTY_BATCHES = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "batch_id": pa.array([], pa.int64()),
    }
)


# --------------------------------------------------------------- chunking --


def chunk_documents(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
):
    """Split documents into overlapping character windows — the retrieval /
    embedding chunking layout (stride = chunk_chars − overlap; the last
    chunk may be shorter; empty/NULL text yields one empty chunk so every
    document appears in the output).

    Emits (doc_id, chunk_idx:int64, start_char:int64, chunk_text) with
    1-BASED start_char (DuckDB substr convention — the twin is
    ``substr(text, x, chunk_chars)`` over a strided generate_series).

    Pure row expansion — NO shuffle, no per-row Python: chunk k of every
    doc in a batch is sliced by ONE ``utf8_slice_codeunits`` kernel call
    (scalar offsets), so per-batch work is max_chunks kernel passes over
    progressively fewer rows. Slicing is by CODE POINTS on both sides
    (Arrow "codeunits" == DuckDB character semantics), so the twin holds
    for non-ASCII text too."""
    import pyarrow.compute as pc

    cfg = cfg or EngineConfig()
    if overlap < 0 or chunk_chars < 1 or overlap >= chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got {overlap}/{chunk_chars}"
        )
    stride = chunk_chars - overlap

    def expand(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        # chunk starts: 0, stride, 2·stride, … while start < max(len−overlap, 1)
        stops = np.maximum(lens - overlap, 1)
        n_chunks = ((stops - 1) // stride + 1).astype(np.int64)
        ids = t.column(id_col)
        out_ids, out_idx, out_start, out_text = [], [], [], []
        k = 0
        alive = np.arange(len(lens))
        while True:
            alive = alive[n_chunks[alive] > k]
            if len(alive) == 0:
                break
            sel = pa.array(alive, pa.int64())
            sliced = pc.utf8_slice_codeunits(
                pc.take(txt, sel), k * stride, k * stride + chunk_chars
            )
            out_ids.append(pc.take(ids, sel))
            out_idx.append(pa.array(np.full(len(alive), k, np.int64)))
            out_start.append(
                pa.array(np.full(len(alive), k * stride + 1, np.int64))
            )
            out_text.append(sliced)
            k += 1
        if not out_ids:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "chunk_idx": pa.array([], pa.int64()),
                    "start_char": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_ids]
                ),
                "chunk_idx": pa.concat_arrays(out_idx),
                "start_char": pa.concat_arrays(out_start),
                "chunk_text": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_text]
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        expand, batch_format="pyarrow"
    )


def reassemble_chunks(
    ds,
    cfg: EngineConfig | None = None,
    *,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    text_col: str = "chunk_text",
    overlap: int = 0,
):
    """Inverse of :func:`chunk_documents` — stitch chunk rows back into one
    row per document: ``text = chunk_0 ++ suffix(chunk_k, overlap)`` for
    k ≥ 1 in ``idx_col`` order. With the same ``overlap`` the chunker used,
    ``reassemble_chunks(chunk_documents(ds)) == ds`` exactly (NULL source
    text comes back as ``''`` — the chunker's fill rule), which is this
    operator's oracle. Emits (``id_col``, text).

    Scale shape: the overlap prefix is stripped MAP-SIDE (one
    ``utf8_slice_codeunits`` kernel per batch — code-point semantics, so
    non-ASCII overlap strips correctly), then ONE bucketed exchange on
    hash(id) co-locates each document's chunks; the per-bucket kernel is a
    single lexsort + a C-level per-doc join. Chunk order is carried by
    ``idx_col``, not arrival order, so the exchange may reorder freely.
    Precondition: (id, chunk_idx) pairs are unique (chunk_documents emits
    them that way); duplicate indices would concatenate twice.
    """
    from .events import _user_bucket

    cfg = cfg or EngineConfig()
    if overlap < 0:
        raise ValueError(f"overlap must be >= 0, got {overlap}")
    nb = cfg.num_buckets

    def project(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), np.int64)
        idx = t.column(idx_col).cast(pa.int64())
        txt = pc.fill_null(pc.cast(t.column(text_col), pa.string()), "")
        if overlap:
            tail = pc.utf8_slice_codeunits(txt, overlap, np.iinfo(np.int32).max)
            first = pc.equal(idx, pa.scalar(0, pa.int64()))
            txt = pc.if_else(first, txt, tail)
        return pa.table(
            {
                id_col: t.column(id_col),
                idx_col: idx,
                "_piece": txt,
                "_bucket": pa.array(_user_bucket(ids, nb)),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    "text": pd.Series(dtype=object),
                }
            )
        df = df.sort_values([id_col, idx_col], kind="stable")
        joined = df.groupby(id_col, sort=True)["_piece"].agg("".join)
        return pd.DataFrame(
            {id_col: joined.index.to_numpy(np.int64), "text": joined.to_numpy()}
        )

    return (
        ds.select_columns([id_col, idx_col, text_col])
        .map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
