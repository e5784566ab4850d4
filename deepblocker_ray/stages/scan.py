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
