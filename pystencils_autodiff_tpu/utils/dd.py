"""Double-word ("double-double") emulated high precision on TPU.

TPUs have no native float64 (SURVEY.md §7 hard-part #1); the framework's
correctness story is CPU f64 oracles + TPU f32 kernels.  This module closes
the remaining gap for accuracy-critical reductions: error-free transforms
(Knuth TwoSum, FMA-based TwoProd) represent a value as an unevaluated pair
``hi + lo`` of f32s, giving ~49 bits of effective mantissa on-device —
enough to prove that the residual f32 error of a kernel (e.g. the 27-term
anisotropic-stencil adjoint accumulation, BENCH_NOTES) is pure ulp
accumulation and not an algorithmic defect.

All functions are jit/vmap/grad-compatible elementwise jnp ops (pairs are
plain arrays, usable inside Pallas kernels too).  ``dd_sum`` reduces along
an axis with a compensated (Neumaier-style dd) accumulator.

References: Dekker 1971; Knuth TAOCP v2; Hida/Li/Bailey QD library —
public algorithms, reimplemented here for jnp.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["two_sum", "two_prod", "dd", "dd_add", "dd_add_dd", "dd_mul",
           "dd_sum", "dd_to", "dd_dot"]

Pair = Tuple[jax.Array, jax.Array]


def two_sum(a, b) -> Pair:
    """Error-free sum: a + b = s + e exactly (Knuth; no branch)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def two_prod(a, b) -> Pair:
    """Error-free product: a*b = p + e exactly (Dekker/Veltkamp splitting —
    exact in any IEEE round-to-nearest arithmetic, no fma required)."""
    p = a * b
    return p, _dekker_prod_err(a, b, p)


def _dekker_prod_err(a, b, p):
    """Error of a*b - already-rounded p, via Veltkamp splitting (exact in
    any IEEE round-to-nearest arithmetic; no fma needed)."""
    dt = jnp.asarray(a).dtype
    split = jnp.asarray(4097.0 if dt == jnp.float32 else 134217729.0, dt)
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    return ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo


def dd(x) -> Pair:
    """Promote an array to a dd pair (exact)."""
    x = jnp.asarray(x)
    return x, jnp.zeros_like(x)


def dd_to(p: Pair):
    """Round a dd pair back to working precision."""
    return p[0] + p[1]


def dd_add(p: Pair, x) -> Pair:
    """dd += scalar/array (Neumaier-compensated, exact transform)."""
    s, e = two_sum(p[0], x)
    return s, p[1] + e


def dd_add_dd(p: Pair, q: Pair) -> Pair:
    s, e = two_sum(p[0], q[0])
    e = e + (p[1] + q[1])
    s2, e2 = two_sum(s, e)
    return s2, e2


def dd_mul(p: Pair, q: Pair) -> Pair:
    h = p[0] * q[0]
    e = _dekker_prod_err(p[0], q[0], h)
    e = e + (p[0] * q[1] + p[1] * q[0])
    s, e2 = two_sum(h, e)
    return s, e2


def dd_sum(x, axis=None) -> Pair:
    """Reduce with a dd accumulator: ~2^-49-accurate sums in f32.

    Uses a sequential fori-style fold along the axis so every partial is
    compensated (jnp.sum would re-associate).
    """
    x = jnp.asarray(x)
    if axis is None:
        x = x.reshape(-1)
        axis = 0
    x = jnp.moveaxis(x, axis, 0)

    def body(carry, xi):
        return dd_add(carry, xi), None

    init = (jnp.zeros(x.shape[1:], x.dtype), jnp.zeros(x.shape[1:], x.dtype))
    (s, e), _ = jax.lax.scan(body, init, x)
    return s, e


def dd_dot(a, b) -> Pair:
    """Compensated dot product: Σ a_i b_i with error-free products."""
    a = jnp.asarray(a).reshape(-1)
    b = jnp.asarray(b).reshape(-1)

    def body(carry, ab):
        ai, bi = ab
        h = ai * bi
        e = _dekker_prod_err(ai, bi, h)
        c = dd_add(carry, h)
        return (c[0], c[1] + e), None

    init = (jnp.zeros((), a.dtype), jnp.zeros((), a.dtype))
    (s, e), _ = jax.lax.scan(body, init, (a, b))
    return s, e
