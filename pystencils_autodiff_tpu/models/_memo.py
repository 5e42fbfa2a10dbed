"""Memoization for model factories.

Constructing an ``AutoDiffOp`` costs real symbolic work (sympy expression
building; the derived backward and compiled programs are cached lazily on
the instance), and callers routinely rebuild identical model ops — every
test, every cell of a sweep, every reconstruction inside a training loop.
Ops are immutable after construction (consumers never mutate them; the
lazily derived backward is itself cached on the instance and identical
either way), so factory results with hashable arguments are shared.

Unhashable arguments (e.g. an explicit anisotropy matrix) fall back to a
fresh construction.
"""

from __future__ import annotations

import functools

__all__ = ["memoize_model"]


def memoize_model(fn):
    cache = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            key = (args, tuple(sorted(kwargs.items())))
            hash(key)
        except TypeError:
            return fn(*args, **kwargs)
        if key not in cache:
            cache[key] = fn(*args, **kwargs)
        return cache[key]

    wrapper.cache_clear = cache.clear
    return wrapper
