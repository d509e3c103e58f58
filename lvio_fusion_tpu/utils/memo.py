"""Process-level memoization of jitted-program builders.

Re-tracing — not XLA compilation — dominates cold-start: the persistent
compilation cache removes the compile, but `jax.jit` tracing is pure
Python and is re-done for every NEW jit wrapper object. Builders like
``make_frontend``/``make_window_ba`` close their static configuration
into fresh ``@jax.jit`` functions, so every Estimator/Backend instance
used to re-trace the whole program set (~tens of seconds of host time
per instance; the reference pays an analogous one-off cost in Ceres
problem construction per solve, backend.cpp:118-205, but its C++ build
is ~ms — ours must be amortized instead).

``builder_memo`` memoizes a builder on the VALUES of its arguments:
scalars/strings hash directly, arrays (and pytrees containing arrays,
e.g. the flax-struct Camera) by shape/dtype/bytes, and anything else
hashable (flax Module defs, Mesh, functions) by its own hash. Any
number of instances with the same static configuration then share one
traced program set per process. Caches are unbounded but keyed by
configuration, which is small and finite in practice.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def _freeze(leaf):
    if isinstance(leaf, (int, float, bool, str, bytes, type(None))):
        return leaf
    if isinstance(leaf, (np.ndarray, jax.Array)):
        arr = np.asarray(leaf)
        return (arr.shape, str(arr.dtype), arr.tobytes())
    # anything else must be hashable (raises TypeError otherwise, which
    # builder_memo treats as "don't memoize")
    hash(leaf)
    return leaf


def freeze(tree):
    """Hashable key for an arbitrary pytree of arrays/scalars."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return (treedef, tuple(_freeze(l) for l in leaves))


def builder_memo(build):
    """Memoize a jitted-program builder on its argument values."""
    cache = {}

    @functools.wraps(build)
    def wrapped(*args, **kwargs):
        try:
            key = freeze((args, kwargs))
        except TypeError:
            return build(*args, **kwargs)
        hit = cache.get(key)
        if hit is None:
            hit = cache[key] = build(*args, **kwargs)
        return hit

    wrapped.cache = cache
    return wrapped
