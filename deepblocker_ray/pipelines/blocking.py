"""Two-table blocking pipeline — the reference's primary flow
(/root/reference/deep_blocker.py:48-74, main.py:12-22) rebuilt Dataset-first.

``DeepBlockerRay`` mirrors the reference's composition root (constructor
injection of a tuple-embedding model and a vector-pairing model,
deep_blocker.py:8-10) but operates on Datasets keyed by an explicit id column
— never positional row indices (the reference's candidate ids are row
positions, blocking_utils.py:9, which are meaningless under parallel reads).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, parallel_blocks
from ..stages.pairing import ExactTopKPairer


def preprocess_flat(ds, cols_to_block: list[str], id_col: str = "id"):
    """deep_blocker.py:29-45 as one vectorized Arrow batch transform:
    project → fill_null(' ') → cast(string) → ' '-join → (id, _merged_text).

    Column-presence validation (deep_blocker.py:12-26) happens driver-side
    against the Dataset schema with a typed error."""
    cols = list(cols_to_block)
    if id_col in cols:
        cols.remove(id_col)
    schema_names = ds.schema().names
    missing = [c for c in cols + [id_col] if c not in schema_names]
    if missing:
        raise KeyError(
            f"cols_to_block not present in dataset: {missing} "
            f"(have: {schema_names})"
        )
    ds = ds.select_columns([id_col] + cols)

    def merge(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = batch.column(c)
            # pandas astype(str) renders floats like '7.5'; Arrow's cast of
            # float64 appends no trailing zeros either. Nulls become ' '
            # BEFORE stringify, matching fillna-then-astype order
            # (deep_blocker.py:33-37).
            if pa.types.is_floating(col.type):
                col = pc.cast(pc.cast(col, pa.float64()), pa.string())
                # pandas str(float) renders integral floats with a '.0'
                # suffix ('774.0'); Arrow renders '774' — append it where no
                # '.', exponent, or nan/inf marker is present
                plain_int = pc.invert(
                    pc.match_substring_regex(col, r"[.eEn]")
                )
                col = pc.if_else(
                    plain_int,
                    pc.binary_join_element_wise(col, ".0", ""),
                    col,
                )
            else:
                col = pc.cast(col, pa.string())
            col = pc.fill_null(col, " ")
            parts.append(col)
        merged = pc.binary_join_element_wise(*parts, " ") if parts else pa.array(
            [""] * len(batch), pa.string()
        )
        return pa.table(
            {
                "id": pc.cast(batch.column(id_col), pa.string()),
                "tuple_text": merged,
            }
        )

    return ds.map_batches(merge, batch_format="pyarrow")


class DeepBlockerRay:
    """deep_blocker.DeepBlocker reimagined: Dataset-in / Dataset-out."""

    def __init__(self, tuple_embedding_model, vector_pairing_model):
        self.embedder = tuple_embedding_model
        self.pairer = vector_pairing_model

    def block_datasets(self, left_ds, right_ds, cols_to_block: list[str]):
        """Returns the candidate Dataset (left_id, right_id, rank, cosine).

        Trace of deep_blocker.py:48-74: preprocess both sides → fit embedder
        on the union corpus → embed left and right → index right → query
        left → melt (done inside the pairing stage).
        """
        from ..config import parallel_blocks_sized

        left = parallel_blocks_sized(
            preprocess_flat(left_ds, cols_to_block).materialize()
        )
        right = parallel_blocks_sized(
            preprocess_flat(right_ds, cols_to_block).materialize()
        )
        corpus = left.union(right)
        self.embedder.fit(corpus, text_col="tuple_text")
        left_emb = self.embedder.transform(
            left, id_col="id", text_col="tuple_text"
        )
        right_emb = self.embedder.transform(
            right, id_col="id", text_col="tuple_text"
        )
        self.pairer.index(right_emb, id_col="id")
        return self.pairer.query(left_emb, id_col="id")
