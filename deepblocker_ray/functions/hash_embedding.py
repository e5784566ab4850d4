"""Deterministic hash-seeded word-embedding table.

The reference loads an 8 GB pre-trained fastText binary once per process
(/root/reference/tuple_embedding_models.py:44,86; configurations.py:1). That
artifact is unavailable here and would be the wrong pattern anyway at cluster
scale. We substitute a *deterministic* table with the same semantics the
pipeline relies on (a fixed per-token dense vector, identical across
processes / nodes / retries), zero external data, O(1) memory.

Construction (vectorized — per-token RNG construction is ~80 µs/token and
dominated the embed stage at ~1 M-token vocabularies): a single seeded
Gaussian pool matrix ``P`` of shape (2^POOL_BITS, dim) is generated once per
instance; a token's vector is the signed sum of ``K_GATHERS`` pool rows whose
indices and signs come from blake2b(token, key=seed). Distinct tokens get
near-orthogonal Gaussian vectors (two tokens share a pool row with
probability ~K²/2^POOL_BITS ≈ 1e-3, contributing ≤1/K correlation), which is
all the cosine-blocking pipeline needs from fastText-like vectors.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..config import EMB_DIMENSION_SIZE

POOL_BITS = 14          # 16384 pool rows
K_GATHERS = 4           # pool rows summed per token


class HashEmbedding:
    """token → fixed D-dim float32 vector; deterministic in (token, seed)."""

    def __init__(self, dim: int = EMB_DIMENSION_SIZE, seed: int = 1234):
        self.dim = dim
        self.seed = seed
        self._key = seed.to_bytes(8, "little", signed=False)
        rng = np.random.default_rng(seed)
        # scale mimics word2vec-style init; magnitude is irrelevant to cosine
        self._pool = rng.standard_normal(
            (1 << POOL_BITS, dim), dtype=np.float32
        ) * (0.1 / np.sqrt(K_GATHERS))

    def _digests(self, tokens) -> np.ndarray:
        """(n, K_GATHERS) uint32 blake2b words per token."""
        n = len(tokens)
        out = np.empty((n, K_GATHERS), np.uint32)
        key = self._key
        for j, t in enumerate(tokens):
            d = hashlib.blake2b(
                t.encode("utf-8", "surrogatepass"), digest_size=4 * K_GATHERS,
                key=key,
            ).digest()
            out[j] = np.frombuffer(d, np.uint32)
        return out

    def vectors(self, tokens) -> np.ndarray:
        """Vectorized lookup: sequence of tokens → (n, dim) float32."""
        if len(tokens) == 0:
            return np.zeros((0, self.dim), np.float32)
        words = self._digests(tokens)
        idx = words & np.uint32((1 << POOL_BITS) - 1)
        # sign bit taken from the high bit — independent of the index bits
        signs = np.where(words >> np.uint32(31), np.float32(1), np.float32(-1))
        pool = self._pool
        out = pool[idx[:, 0]] * signs[:, 0:1]
        for k in range(1, K_GATHERS):
            out += pool[idx[:, k]] * signs[:, k : k + 1]
        return out

    def get_word_vector(self, token: str) -> np.ndarray:
        """Reference-API parity: fasttext's ``get_word_vector``
        (tuple_embedding_models.py:65)."""
        return self.vectors([token])[0]


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
    Token vectors are computed once per *unique* token in the batch
    (np.unique), then gathered per occurrence — vocabulary-sized work, not
    corpus-sized.

    Reference edge cases handled explicitly:
      - empty token list → the reference's np.mean over an empty array yields
        a NaN row + RuntimeWarning (tuple_embedding_models.py:65); we emit a
        zero vector and report it via the returned ``empty_mask``.
      - OOV token under SIF → the reference KeyErrors
        (tuple_embedding_models.py:130); we use ``oov_weight`` (1.0, matching
        the min_freq fallback spirit of :118-119).

    Because the weight depends only on the token, the weighted sum per tuple
    factorizes as ``C @ (w ⊙ U)`` where ``U`` is the unique-token vector
    matrix and ``C`` the per-tuple occurrence-count matrix — a BLAS matmul
    instead of materializing one vector per token occurrence. ``C`` is built
    chunk-wise (bincount over ``row·V+token`` keys) so its dense footprint
    stays bounded regardless of batch size.

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

    flat = np.empty(total, object)
    pos = 0
    for toks in token_lists:
        flat[pos : pos + len(toks)] = toks
        pos += len(toks)
    # hash-based factorize beats sort-based np.unique ~10× on string arrays
    import pandas as pd

    inv, uniq = pd.factorize(flat, sort=False)
    nu = len(uniq)
    uvecs = table.vectors(uniq).astype(np.float64)
    if weights is not None:
        if hasattr(weights, "get_many"):  # state/lookup.HashedWeights
            uw = weights.get_many(uniq, oov_weight)
        else:
            get_w = weights.get
            uw = np.fromiter(
                (get_w(t, oov_weight) for t in uniq), np.float64, nu
            )
        uvecs *= uw[:, None]

    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    # cap the dense count-matrix chunk at ~64 MB
    chunk_rows = max(256, (64 << 20) // (8 * max(nu, 1)))
    for r0 in range(0, n, chunk_rows):
        r1 = min(r0 + chunk_rows, n)
        lo, hi = offsets[r0], offsets[r1]
        if lo == hi:
            continue
        key = (rows[lo:hi] - r0) * nu + inv[lo:hi]
        c = np.bincount(key, minlength=(r1 - r0) * nu).reshape(r1 - r0, nu)
        out[r0:r1] = c @ uvecs
    nonempty = ~empty_mask
    out[nonempty] /= counts[nonempty, None]
    return out, empty_mask
