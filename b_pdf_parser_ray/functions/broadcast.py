"""Broadcast-side helpers for map-side joins.

``ray.put`` ships a small side once to the object store; plain ``ray.get``
inside ``map_batches`` then *deserializes it again for every batch* (only
zero-copy types dodge that).  ``get_cached`` memoizes the deserialized
value per worker process, so each worker pays one deserialization per
broadcast object regardless of batch count — the practical broadcast-join
pattern for dict/ndarray sides.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

# Bounded LRU: long-lived reused workers would otherwise accumulate every
# broadcast side ever shipped (one per query across a whole catalog run).
# 8 entries comfortably covers the sides live within any one query.
_CACHE: "OrderedDict[str, Any]" = OrderedDict()
_CACHE_CAP = 8


def get_cached(ref) -> Any:
    """ray.get(ref), memoized per worker process by object id (bounded LRU)."""
    import ray

    key = ref.hex()
    val = _CACHE.get(key)
    if val is None:
        val = _CACHE[key] = ray.get(ref)
        while len(_CACHE) > _CACHE_CAP:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(key)
    return val
