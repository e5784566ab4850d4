"""Worker-side broadcast lookup over materialized Arrow block refs.

Generalizes the TurnLookup pattern (stages/scoring.py): the small side of a
pair-attachment is materialized ONCE into the object store; every worker
zero-copy-reads the blocks, builds a sorted-id index once per process
(memoized via state/broadcast.cached_compute), and answers batched lookups
with vectorized searchsorted + Arrow take. Nothing round-trips through the
driver — the anti-pattern this replaces was a driver-built Python dict of the
whole table (multi-GB pickle at millions of rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class ColumnLookup:
    """id → payload-column lookup built from plasma block refs.

    ``take(keys)`` returns a pa.Array aligned with ``keys``; missing ids come
    back as nulls. Works for any payload type (scalars, lists, structs).
    """

    def __init__(self, refs, id_col: str, payload_col: str):
        tbls = ray.get(list(refs))
        # empty blocks can carry degenerate schemas (null-typed columns from
        # a pandas conversion) that break concat — drop them
        nonempty = [t for t in tbls if len(t) > 0]
        tbl = pa.concat_tables(
            nonempty if nonempty else tbls[:1], promote_options="permissive"
        ).combine_chunks()
        ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=object)
        order = np.argsort(ids)
        self.ids = ids[order]
        self.payload = tbl.column(payload_col).combine_chunks().take(
            pa.array(order)
        )

    def take(self, keys) -> pa.Array:
        keys = np.asarray(list(keys), dtype=object)
        if len(self.ids) == 0:
            return pa.nulls(len(keys), self.payload.type)
        pos = np.searchsorted(self.ids, keys)
        pos = np.clip(pos, 0, len(self.ids) - 1)
        found = self.ids[pos] == keys
        idx = pa.array(np.where(found, pos, None))
        return self.payload.take(idx)


def np_lists(arr) -> list[np.ndarray]:
    """(Large)List pa array → list of numpy views (nulls → empty arrays)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = np.asarray(arr.values)
    offs = np.asarray(arr.offsets)
    isnull = arr.is_null().to_numpy(zero_copy_only=False)
    empty = vals[:0]
    return [
        empty if isnull[i] else vals[offs[i] : offs[i + 1]]
        for i in range(len(arr))
    ]


_EMPTY_U64 = np.empty(0, np.uint64)


def np_u64_lists(arr) -> list[np.ndarray]:
    """uint64 set column → list of numpy arrays. Accepts either the
    (large_)list<uint64> form or the packed large_binary form used across
    hash joins (np.frombuffer is zero-copy on the bytes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_binary(arr.type) or pa.types.is_binary(arr.type):
        return [
            _EMPTY_U64 if b is None else np.frombuffer(b, np.uint64)
            for b in arr.to_pylist()
        ]
    return np_lists(arr)
