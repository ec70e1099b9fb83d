"""Process-cached task-pool stages — the cheap-state alternative to an
actor pool.

An actor-pool stage (`map_batches(Cls, concurrency=(1, N))`) pays an
autoscaling ramp: actors start one by one (process fork + imports +
``__init__``) while blocks queue. That is the right trade when state is
expensive (a model load measured in seconds). The flagship stages'
state is NOT expensive — measured at sf0.1: alias trie 0.07 s, KGIndex
0.18 s — so the ramp dominated: the linker stage cost ~2.5 s of pure
pool spin-up per execution while its actual compute was ~0.5 s.

``process_cached(cls, **kwargs)`` instead returns a plain FUNCTION for
``map_batches``: Ray schedules it as ordinary tasks on the session's
already-warm worker processes (no new actors, no ramp, no
min-concurrency deadlock constraint), and the stage instance is built
ONCE PER WORKER PROCESS on first use, then reused — the same
setup-amortization an actor gives, keyed by (class, kwargs identity) so
different corpora/profiles in one session coexist. Broadcast object
refs still arrive via ``ray.get`` zero-copy inside the worker.

Measured (sf0.1, 32 CPUs, warm session): linked_documents 4.5 s → 2.4 s
with bit-identical output. Use actor pools when ``__init__`` is truly
heavy; use this when state is dimension-sized.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}
_CACHE_CAP = 16  # corpora × stage classes alive per worker, bounded


def _key_part(v: Any) -> str:
    # ObjectRef.hex() is stable across processes; everything else the
    # call sites pass is a value type with a stable repr (ints, strs,
    # dataclass profiles)
    return v.hex() if hasattr(v, "hex") else repr(v)


def process_cached(cls: type, **kwargs: Any) -> Callable:
    """A ``map_batches``-ready function running ``cls(**kwargs)``
    built once per worker process (see module doc)."""
    key = (
        cls.__module__,
        cls.__qualname__,
        tuple(sorted((k, _key_part(v)) for k, v in kwargs.items())),
    )

    def run(batch):
        # resolve the cache through a call-time import, NOT the module
        # global: `run` is a nested function, so cloudpickle serializes
        # any referenced globals BY VALUE — capturing _CACHE directly
        # would ship every instance the driver's cache happens to hold
        # (and fail outright if one isn't importable on workers)
        from kire_ray.stages import taskpool as _tp

        cache = _tp._CACHE
        inst = cache.get(key)
        if inst is None:
            if len(cache) >= _CACHE_CAP:
                cache.clear()
            inst = cache[key] = cls(**kwargs)
        return inst(batch)

    run.__name__ = f"{cls.__name__}Task"
    run.__qualname__ = run.__name__
    return run
