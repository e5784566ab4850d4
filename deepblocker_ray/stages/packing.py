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

    # map-side partials: each batch collapses to ≤nr (range, sum) rows
    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("_id"))
        n = np.asarray(t.column("_n"))
        r = rng_of(ids)
        sums = np.zeros(nr, np.int64)
        np.add.at(sums, r, n)  # exact int64 (bincount weights are float)
        nz = np.nonzero(sums)[0]
        return pa.table(
            {
                "_rng": pa.array(nz.astype(np.int64)),
                "_sum": pa.array(sums[nz].astype(np.int64)),
            }
        )

    part_df = skinny.map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # O(nr × batches) tiny rows — driver state stays O(nr)
    range_sums = np.zeros(nr, np.int64)
    if len(part_df):
        np.add.at(
            range_sums,
            part_df["_rng"].to_numpy(np.int64),
            part_df["_sum"].to_numpy(np.int64),
        )
    offsets = np.zeros(nr, np.int64)
    np.cumsum(range_sums[:-1], out=offsets[1:])
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
