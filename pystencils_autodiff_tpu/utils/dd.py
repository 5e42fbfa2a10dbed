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
    exact in any IEEE round-to-nearest arithmetic, no fma required).

    ``p`` is barrier-pinned: downstream EFT sums like ``two_sum(c, p)``
    assume p is a ROUNDED value; letting the compiler contract
    ``c + a*b`` into an fma would make the pair (s, e) wrong by ~ulp."""
    p = _round_barrier(a * b)
    return p, _dekker_prod_err(a, b, p)


_BARRIER_BITS = {jnp.dtype(jnp.float32): jnp.uint32,
                 jnp.dtype(jnp.float64): jnp.uint64,
                 jnp.dtype(jnp.bfloat16): jnp.uint16,
                 jnp.dtype(jnp.float16): jnp.uint16}


def _round_barrier(x):
    """Force ``x`` to be a ROUNDED value the compiler cannot re-derive.

    Veltkamp splitting computes ``ca = split*a; ahi = ca - (ca - a)`` and
    is EXACT only if both occurrences of ``ca`` are the same rounded f32.
    Mosaic's FMA contraction may instead fuse the inner subtraction into
    ``fma(split, a, -a)`` — the unrounded product — which corrupts the
    split halves and costs the whole compensation (~1 ulp instead of
    ~2^-49; measured 1.25e-7 on the round-3 hardware dd test,
    BENCH_NOTES).  Same-width bitcast round-trips are value-exact,
    break the mul→add pattern the contractor matches, and lower in every
    backend INCLUDING Mosaic kernels (``lax.optimization_barrier`` does
    not: "Unimplemented primitive in Pallas TPU lowering", probed on the
    v5e).  Contraction in the REMAINDER of the error expression is
    harmless because the split halves make every product exactly
    representable."""
    x = jnp.asarray(x)
    bits = _BARRIER_BITS.get(jnp.dtype(x.dtype))
    if bits is None or x.ndim == 0:
        # 0-d: Mosaic's tpu.bitcast needs vectors.  Scalars only arise
        # from constant·constant dd products (folded at trace time when
        # concrete; on the scalar core otherwise) — leave them unpinned.
        return x
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, bits), x.dtype)


def _dekker_prod_err(a, b, p):
    """Error of a*b - already-rounded p, via Veltkamp splitting (exact in
    any IEEE round-to-nearest arithmetic; no fma needed — and immune to
    compiler FMA contraction, see ``_round_barrier``)."""
    dt = jnp.asarray(a).dtype
    split = jnp.asarray(4097.0 if dt == jnp.float32 else 134217729.0, dt)
    ca = _round_barrier(split * a)
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = _round_barrier(split * b)
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
    h = _round_barrier(p[0] * q[0])
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
        h = _round_barrier(ai * bi)
        e = _dekker_prod_err(ai, bi, h)
        c = dd_add(carry, h)
        return (c[0], c[1] + e), None

    init = (jnp.zeros((), a.dtype), jnp.zeros((), a.dtype))
    (s, e), _ = jax.lax.scan(body, init, (a, b))
    return s, e
