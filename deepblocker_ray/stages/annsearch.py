"""Similarity search over an embedding column (training-data-pipeline op).

Brute-force exact cosine top-k is the baseline (the reference's
ExactTopKVectorPairing semantics, vector_pairing_models.py:21-46, applied to a
generic embedding table); the IVF variant is the scale path. Both reuse the
pairing stage — broadcast-sharded matmuls, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from .embed import numpy_to_emb
from .pairing import ExactTopKPairer, IVFTopKPairer


def prep_embeddings(ds, id_col: str = "vec_id", list_col: str = "embedding"):
    """(vec_id, list<float>) → (vec_id:string, emb:fixed_size_list<float32,D>).

    Zero-copy flatten: the list column's value buffer is viewed as one numpy
    array and reshaped (no per-row Python lists). Ragged rows are rejected —
    an embedding column must be fixed-width."""

    def prep(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col).combine_chunks()
        if pa.types.is_fixed_size_list(col.type):
            width = col.type.list_size
            flat = np.asarray(col.flatten())
        else:
            offs = np.asarray(col.offsets)
            widths = np.diff(offs)
            if len(widths) and (widths != widths[0]).any():
                raise ValueError(
                    f"ragged {list_col!r} column: lengths "
                    f"{np.unique(widths)[:5]}..."
                )
            width = int(widths[0]) if len(widths) else 0
            flat = np.asarray(col.flatten())
        mat = flat.astype(np.float32, copy=False).reshape(len(col), width)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.string()),
                "emb": numpy_to_emb(mat),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def knn(
    emb_ds,
    n_queries: int = 10,
    k: int = 10,
    cfg: EngineConfig | None = None,
    id_col: str = "vec_id",
    list_col: str = "embedding",
    mode: str = "exact",
    nprobe: int | None = None,
):
    """Top-k cosine neighbors of the first ``n_queries`` ids (self excluded).
    Returns (query_id, neighbor_id, rank, cosine). ``nprobe`` overrides
    cfg.ivf_nprobe for IVF mode; nprobe == cfg.ivf_cells probes everything,
    which makes IVF bit-identical to exact (the knn_ivf driver oracle)."""
    import dataclasses

    cfg = cfg or EngineConfig()
    if nprobe is not None:
        cfg = dataclasses.replace(cfg, ivf_nprobe=nprobe)
    prepped = prep_embeddings(ds=emb_ds, id_col=id_col, list_col=list_col).materialize()
    queries = emb_ds.filter(expr=f"{id_col} < {n_queries}")
    queries = prep_embeddings(queries, id_col=id_col, list_col=list_col)
    if mode == "exact":
        pairer = ExactTopKPairer(k=k, cfg=cfg, exclude_self=True)
    else:
        pairer = IVFTopKPairer(k=k, cfg=cfg, exclude_self=True)
    pairer.index(prepped, id_col=id_col)
    out = pairer.query(queries, id_col=id_col)
    return out.map_batches(
        lambda t: pa.table(
            {
                "query_id": t.column("left_id"),
                "neighbor_id": t.column("right_id"),
                "rank": t.column("rank"),
                "cosine": t.column("cosine"),
            }
        ),
        batch_format="pyarrow",
    )
