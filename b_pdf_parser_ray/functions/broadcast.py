"""Broadcast-side helpers for map-side joins.

``ray.put`` ships a small side once to the object store; plain ``ray.get``
inside ``map_batches`` then *deserializes it again for every batch* (only
zero-copy types dodge that).  ``get_cached`` memoizes the deserialized
value per worker process, so each worker pays one deserialization per
broadcast object regardless of batch count — the practical broadcast-join
pattern for dict/ndarray sides.
"""

from __future__ import annotations

from typing import Any, Dict

_CACHE: Dict[str, Any] = {}


def get_cached(ref) -> Any:
    """ray.get(ref), memoized per worker process by object id."""
    import ray

    key = ref.hex()
    val = _CACHE.get(key)
    if val is None:
        val = _CACHE[key] = ray.get(ref)
    return val
