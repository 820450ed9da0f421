"""Per-worker-process caches for broadcast objects and derived state.

Broadcast objects (``ray.put`` once, read in every task) are fetched
from the LOCAL object store the first time a worker process sees the
ref and cached here — never deserialized per batch. Derived state
(scorers, bucketers built FROM a broadcast) is cached the same way,
keyed by its construction arguments.

Both caches are small LRUs: a pipeline can legitimately have a few
broadcasts live at once (e.g. the MinHash verify's candidate-id array
and its text lookup), so a one-entry clear-on-miss cache would thrash;
an unbounded dict would leak one full copy per run in long-lived
workers. Eviction only drops the local handle — the object store copy
is unaffected.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import ray

MAX_ENTRIES = 4

_FETCHED: OrderedDict[str, object] = OrderedDict()
_BUILT: OrderedDict[tuple, object] = OrderedDict()


def _lru_put(cache: OrderedDict, key, val):
    cache[key] = val
    while len(cache) > MAX_ENTRIES:
        cache.popitem(last=False)


def cached_get(ref):
    """ray.get(ref), memoized per worker process."""
    key = ref.hex()
    val = _FETCHED.get(key)
    if val is None:
        val = ray.get(ref)
        _lru_put(_FETCHED, key, val)
    else:
        _FETCHED.move_to_end(key)
    return val


def cached_build(key: tuple, factory: Callable[[], object]):
    """factory(), memoized per worker process under ``key`` (use for
    state derived from a broadcast — include the ref hex in the key)."""
    val = _BUILT.get(key)
    if val is None:
        val = factory()
        _lru_put(_BUILT, key, val)
    else:
        _BUILT.move_to_end(key)
    return val
