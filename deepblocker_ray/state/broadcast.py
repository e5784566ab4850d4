"""Broadcast state for map_batches task pools.

Pattern: the driver ``ray.put``s a lookup structure ONCE; map tasks fetch it
via ``cached_get`` which memoizes the deserialized value per worker process.
Ray task workers are long-lived, so this gives actor-pool state amortization
WITHOUT per-execution actor spawning (each ActorPoolMapOperator execution
forks fresh Python processes — ~2s import cost per stage, which dominated
short stages). Dedicated actor pools remain the right choice for heavyweight
per-worker state (GPU models, pinned gigabyte indexes); EngineConfig's
``*_concurrency`` switches stages back to actor mode.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import ray

_CACHE: OrderedDict[str, Any] = OrderedDict()
_CACHE_MAX = 8


def cached_get(ref) -> Any:
    """ray.get with per-process memoization (small LRU)."""
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = ray.get(ref)
    _CACHE[key] = val
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return val


def cached_compute(key: str, fn) -> Any:
    """Memoize an arbitrary derived structure (e.g. parsed index shards) per
    worker process, same LRU as cached_get."""
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = fn()
    _CACHE[key] = val
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return val


_TABLES: dict[tuple[int, int], Any] = {}


def process_embedding_table(dim: int, seed: int):
    """Per-process HashEmbedding cache (the Gaussian pool matrix is built
    once per worker and shared by every task in this process)."""
    from ..functions.hash_embedding import HashEmbedding

    key = (dim, seed)
    table = _TABLES.get(key)
    if table is None:
        table = HashEmbedding(dim=dim, seed=seed)
        _TABLES[key] = table
    return table
