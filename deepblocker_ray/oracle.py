"""Single-process numpy re-implementation of the reference semantics.

The reference (/root/reference) depends on torch / fasttext / torchtext /
sklearn-SVD, none of which matter to its *semantics*: tokenize → (weighted)
mean of fixed word vectors → optional rank-1 PC removal → dense all-pair
cosine → per-row top-K (tuple_embedding_models.py:39-145,
vector_pairing_models.py:21-46, deep_blocker.py:29-74, blocking_utils.py:3-33).

This module replays those semantics verbatim in a single process, using the
same deterministic HashEmbedding word table as the distributed engine, so
tests can assert the Ray pipeline is numerically conformant (SIF matrices to
1e-6, identical candidate sets modulo cosine ties) without the reference's
heavyweight deps. It is a test oracle only — never used in pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import SIF_MIN_FREQ, SIF_WEIGHTING_PARAM
from .functions.hash_embedding import HashEmbedding
from .functions.tokenizer import tokenize


def preprocess_flat(df: pd.DataFrame, cols_to_block: list[str]) -> pd.DataFrame:
    """deep_blocker.py:29-45: project, fillna(' '), astype(str), space-join
    non-id columns into _merged_text."""
    cols = list(cols_to_block)
    if "id" not in cols:
        cols.append("id")
    non_id = [c for c in cols if c != "id"]
    out = df[cols].copy()
    out = out.fillna(" ").astype(str)
    out["_merged_text"] = out[non_id].agg(" ".join, axis=1)
    return out.drop(columns=non_id)


def sif_weights(
    texts,
    a: float = SIF_WEIGHTING_PARAM,
    min_freq: int = SIF_MIN_FREQ,
) -> tuple[dict[str, float], int]:
    """tuple_embedding_models.py:106-119."""
    from collections import Counter

    freq: Counter[str] = Counter()
    for t in texts:
        freq.update(tokenize(t))
    total = sum(freq.values())
    weights = {
        w: (a / (a + f / total) if f >= min_freq else 1.0)
        for w, f in freq.items()
    }
    return weights, total


def average_embed(texts, table: HashEmbedding) -> np.ndarray:
    """tuple_embedding_models.py:65 (NaN rows for empty token lists become
    zero rows here — engine-defined behavior, see hash_embedding)."""
    rows = []
    for t in texts:
        toks = tokenize(t)
        if not toks:
            rows.append(np.zeros(table.dim))
            continue
        rows.append(
            np.mean(np.array([table.get_word_vector(w) for w in toks]), axis=0)
        )
    return np.array(rows)


def sif_embed(
    texts,
    table: HashEmbedding,
    weights: dict[str, float],
    remove_pc: bool = True,
) -> np.ndarray:
    """tuple_embedding_models.py:124-145: weighted mean then rank-1 PC
    removal (TruncatedSVD without centering ≡ top eigenvector of XᵀX)."""
    n = len(texts)
    emb = np.zeros((n, table.dim))
    for i, t in enumerate(texts):
        toks = tokenize(t)
        if not toks:
            continue
        emb[i] = np.mean(
            np.array(
                [table.get_word_vector(w) * weights.get(w, 1.0) for w in toks]
            ),
            axis=0,
        )
    if remove_pc:
        pc = top_principal_component(emb)
        emb = emb - np.outer(emb @ pc, pc)
    return emb


def top_principal_component(x: np.ndarray) -> np.ndarray:
    """Exact equivalent of TruncatedSVD(n_components=1) on uncentered data
    (tuple_embedding_models.py:134-139): top eigenvector of XᵀX."""
    gram = x.T @ x
    vals, vecs = np.linalg.eigh(gram)
    pc = vecs[:, -1]
    # deterministic sign (projection x−(x·pc)pc is sign-invariant anyway)
    idx = int(np.argmax(np.abs(pc)))
    if pc[idx] < 0:
        pc = -pc
    return pc


def topk_cosine(
    query: np.ndarray, index: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """vector_pairing_models.py:40-46 with deterministic tie-break: returns
    (indices [n,k], cosines [n,k]) sorted by (−cosine, index)."""
    qn = np.linalg.norm(query, axis=1, keepdims=True)
    xn = np.linalg.norm(index, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    xn[xn == 0] = 1.0
    sims = (query / qn) @ (index / xn).T
    k = min(k, index.shape[0])
    # lexsort: primary −sim, secondary column index → deterministic ties
    order = np.lexsort(
        (np.broadcast_to(np.arange(index.shape[0]), sims.shape), -sims), axis=1
    )
    idx = order[:, :k]
    return idx, np.take_along_axis(sims, idx, axis=1)


def melt_topk(topk_indices: np.ndarray) -> pd.DataFrame:
    """blocking_utils.py:3-13 (positional melt)."""
    n, k = topk_indices.shape
    return pd.DataFrame(
        {
            "ltable_id": np.repeat(np.arange(n), k),
            "rtable_id": topk_indices.reshape(-1),
        }
    )


def blocking_statistics(
    candidate_df: pd.DataFrame,
    golden_df: pd.DataFrame,
    n_left: int,
    n_right: int,
) -> dict:
    """blocking_utils.py:19-33."""
    merged = candidate_df.merge(golden_df, on=["ltable_id", "rtable_id"])
    return {
        "left_num_tuples": n_left,
        "right_num_tuples": n_right,
        "recall": len(merged) / len(golden_df),
        "cssr": len(candidate_df) / (n_left * n_right),
    }
