"""Worker-side cache for ``ray.put`` broadcast objects.

The canonical small-side broadcast is: ``ray.put`` once on the driver,
read the ref inside the stage. For ZERO-COPY payloads (numpy arrays)
``ray.get`` per batch is a free plasma hit, but for Python objects
(dicts, models) every ``ray.get`` re-deserializes — which is why these
stages were actor pools (deserialize once in ``__init__``). Measured on
this host, though, a short autoscaling actor-pool stage pays ~3 s of
actor startup per query (NOTES.md), dwarfing the deserialization it
saves. ``cached_get`` gives task-pool stages the same amortization:
worker processes are reused across tasks, so each worker deserializes a
given ref once and every later task in that worker hits the module
cache. The cache is keyed by ref id and capped: at most a handful of
distinct broadcasts live per worker.
"""

from __future__ import annotations

from typing import Any, Dict

_CACHE: Dict[str, Any] = {}
_MAX_ENTRIES = 16


def cached_get(ref) -> Any:
    """``ray.get(ref)`` memoized per worker process."""
    import ray

    key = ref.hex()
    if key not in _CACHE:
        if len(_CACHE) >= _MAX_ENTRIES:
            # evict the LEAST-RECENTLY-USED entry (hits below re-insert
            # at the tail) — clearing the whole cache would force every
            # hot broadcast on this worker to re-deserialize on its
            # next batch just because a 17th distinct ref showed up
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    else:
        _CACHE[key] = _CACHE.pop(key)
    return _CACHE[key]
