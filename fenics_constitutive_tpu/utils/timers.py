"""Named timers + profiler scopes.

The reference uses dolfinx's timer registry via ``@df.common.timed("name")``
decorators around form/law evaluation and the submesh maps (SURVEY §5.1).
Equivalent here: ``timed("name")`` records wall-clock into a global registry
AND opens a ``jax.profiler.TraceAnnotation`` so the scopes show up in TPU
traces (`jax.profiler.trace`).

Note: wall timers around *traced* code measure dispatch, not device time —
call with ``block=True`` (block_until_ready on the result) when the number
matters, or read the device trace.
"""

from __future__ import annotations

import collections
import contextlib
import functools
import time

import jax

__all__ = ["timed", "timing", "get_timings", "reset_timings"]

_REGISTRY: dict[str, list] = collections.defaultdict(lambda: [0, 0.0])


@contextlib.contextmanager
def timing(name: str):
    """Context manager: profiler annotation + wall-clock registry entry."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            entry = _REGISTRY[name]
            entry[0] += 1
            entry[1] += time.perf_counter() - t0


def timed(name: str, block: bool = False):
    """Decorator version (the analog of @df.common.timed)."""

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            with timing(name):
                out = fn(*args, **kwargs)
                if block:
                    out = jax.block_until_ready(out)
                return out

        return inner

    return wrap


def get_timings() -> dict[str, tuple[int, float]]:
    """{name: (n_calls, total_seconds)} (dolfinx list_timings analog)."""
    return {k: (v[0], v[1]) for k, v in _REGISTRY.items()}


def reset_timings() -> None:
    _REGISTRY.clear()
