"""Deterministic hash-seeded word-embedding table.

The reference loads an 8 GB pre-trained fastText binary once per process
(/root/reference/tuple_embedding_models.py:44,86; configurations.py:1). That
artifact is unavailable here and would be the wrong pattern anyway at cluster
scale. We substitute a *deterministic* table: token → blake2b(token, seed) →
seeded Gaussian D-vector. Same semantics the pipeline relies on (a fixed
per-token dense vector, identical across processes/nodes/retries), zero
external data, O(1) memory via per-actor caching.

Lookups are cached per instance; each map_batches actor builds its working
vocabulary once and reuses it across batches.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..config import EMB_DIMENSION_SIZE


def _token_seed(token: str, seed: int) -> int:
    h = hashlib.blake2b(
        token.encode("utf-8", "surrogatepass"),
        digest_size=8,
        key=seed.to_bytes(8, "little", signed=False),
    )
    return int.from_bytes(h.digest(), "little")


class HashEmbedding:
    """token → fixed D-dim float32 vector; deterministic in (token, seed)."""

    def __init__(self, dim: int = EMB_DIMENSION_SIZE, seed: int = 1234):
        self.dim = dim
        self.seed = seed
        self._ids: dict[str, int] = {}
        self._rows: list[np.ndarray] = []

    def _make_vector(self, token: str) -> np.ndarray:
        rng = np.random.default_rng(_token_seed(token, self.seed))
        # scale mimics word2vec-style init; magnitude is irrelevant to cosine
        return rng.standard_normal(self.dim, dtype=np.float32) * 0.1

    def token_id(self, token: str) -> int:
        tid = self._ids.get(token)
        if tid is None:
            tid = len(self._rows)
            self._ids[token] = tid
            self._rows.append(self._make_vector(token))
        return tid

    def get_word_vector(self, token: str) -> np.ndarray:
        """Reference-API parity: fasttext's ``get_word_vector``
        (tuple_embedding_models.py:65)."""
        return self._rows[self.token_id(token)]

    def matrix(self) -> np.ndarray:
        return (
            np.stack(self._rows)
            if self._rows
            else np.zeros((0, self.dim), np.float32)
        )


def mean_pool_embed(
    token_lists: list[list[str]],
    table: HashEmbedding,
    weights: dict[str, float] | None = None,
    oov_weight: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (weighted) mean of token vectors per tuple.

    Replicates AverageEmbedding / SIFEmbedding aggregation
    (tuple_embedding_models.py:65,130): mean over token *occurrences*
    (duplicates count), each vector optionally scaled by its SIF weight.

    Reference edge cases handled explicitly:
      - empty token list → the reference's np.mean over an empty array yields
        a NaN row + RuntimeWarning (tuple_embedding_models.py:65); we emit a
        zero vector and report it via the returned ``empty_mask``.
      - OOV token under SIF → the reference KeyErrors
        (tuple_embedding_models.py:130); we use ``oov_weight`` (1.0, matching
        the min_freq fallback spirit of :118-119).

    Returns (embeddings float64 [n, D], empty_mask bool [n]).
    """
    n = len(token_lists)
    dim = table.dim
    out = np.zeros((n, dim), np.float64)
    counts = np.fromiter((len(t) for t in token_lists), np.int64, n)
    empty_mask = counts == 0
    total = int(counts.sum())
    if total == 0:
        return out, empty_mask

    flat_ids = np.empty(total, np.int64)
    w = np.empty(total, np.float64)
    pos = 0
    tid = table.token_id
    if weights is None:
        for toks in token_lists:
            for t in toks:
                flat_ids[pos] = tid(t)
                pos += 1
        w.fill(1.0)
    else:
        get_w = weights.get
        for toks in token_lists:
            for t in toks:
                flat_ids[pos] = tid(t)
                w[pos] = get_w(t, oov_weight)
                pos += 1

    vecs = table.matrix()[flat_ids].astype(np.float64) * w[:, None]
    # tokens are laid out grouped by tuple → segment-sum via reduceat
    offsets = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    nonempty = ~empty_mask
    seg_starts = offsets[nonempty]
    if seg_starts.size:
        sums = np.add.reduceat(vecs, seg_starts, axis=0)
        out[nonempty] = sums / counts[nonempty, None]
    return out, empty_mask
