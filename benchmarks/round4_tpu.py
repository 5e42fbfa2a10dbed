#!/usr/bin/env python
"""Round-4 TPU measurement session (VERDICT round-3 items #2/#4).

Sections:

  prims    in-VMEM primitive costs: misaligned sublane slice (relayout),
           sublane/lane rotate, iota-masked rotate, FMA — grounds the
           aniso27 cost model before any restructure (item #4)
  wave     config #3 north star: two-phase fused vjp chain k sweep at
           8192^2 with tuned tiles (item #2); target >=655 GB/s eff
  aniso    aniso27 fwd current kernel vs measured primitive roofline

Honest relay timing throughout: two-point slope over chained in-jit
calls (utils.slope_timed), host-fetch forced completion.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_calls(f, iters):
    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x, None, length=iters, unroll=4)[0]
    return g


def timed_per_iter(f, x, iters):
    from pystencils_autodiff_tpu.utils import slope_timed
    n1 = max(1, iters)
    t = slope_timed(lambda n: chain_calls(f, n), x, n1, 2 * n1)
    return max(t, 1e-9)


_R = 32  # reps per kernel: >64 chained tpu.dynamic_rotate stalls the
         # remote Mosaic compiler for 25+ min (observed 2026-08-19);
         # launch overhead is amortized by chaining more kernel calls


def _ladder_kernel(per_rep, n0, n1, pad, label, base_ps=0.0):
    """Time ``acc = per_rep(acc, x_full, i)`` chained _R times inside one
    pallas kernel.  ``acc`` is (n0, n1) and data-depends on the previous
    rep (no op merging); ``x_full`` is the (n0+pad, n1) source tile.
    Reports ps/elem per rep, minus ``base_ps`` (e.g. the fma baseline)."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = jax.lax.slice_in_dim(x, 0, n0, axis=0)
        for i in range(_R):
            acc = per_rep(acc, x, i)
        o_ref[...] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n0, n1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    x = jnp.full((n0 + pad, n1), 0.5, jnp.float32)
    # chain over a same-shape carry: feed acc back through a kept pad tail
    g = jax.jit(lambda xx: jnp.concatenate(
        [f(xx), jax.lax.slice_in_dim(xx, n0, n0 + pad, axis=0)], axis=0)
        if pad else f(xx))
    t = timed_per_iter(g, x, 192) / _R
    per = t / (n0 * n1) * 1e12
    extra = f" (raw {per:.3f})" if base_ps else ""
    print(f"prim {label}: {per - base_ps:.3f} ps/elem{extra}", flush=True)
    return per


def sec_prims():
    """Primitive cost ladder on a 2048x512 VMEM tile (4 MiB): what does a
    read-shift cost relative to an FMA?  Grounds the chain-kernel cost
    model (VERDICT round-3 weak #2).  Every rep data-depends on the last
    (acc chains through); offsets alternate so identical ops can't CSE."""
    n0, n1 = 2048, 512
    a = 1.0000001  # python float: weak-typed, no captured traced const

    base = _ladder_kernel(
        lambda acc, x, i: acc * a + 1e-7,
        n0, n1, 0, "fma (baseline)")
    _ladder_kernel(
        lambda acc, x, i: pltpu.roll(acc, 1 + (i % 2), 1) * a,
        n0, n1, 0, "lane rotate + mul", base)
    _ladder_kernel(
        lambda acc, x, i: pltpu.roll(acc, 1 + (i % 2), 0) * a,
        n0, n1, 0, "sublane rotate + mul", base)
    _ladder_kernel(
        lambda acc, x, i: pltpu.roll(acc, 8 * (1 + i % 2), 0) * a,
        n0, n1, 0, "sublane rotate x8 + mul", base)
    _ladder_kernel(
        lambda acc, x, i: acc * a + jax.lax.slice_in_dim(
            x, 1 + (i % 7), 1 + (i % 7) + n0, axis=0),
        n0, n1, 8, "misaligned slice + fma", base)
    _ladder_kernel(
        lambda acc, x, i: acc * a + jax.lax.slice_in_dim(
            x, 8 * (i % 2), 8 * (i % 2) + n0, axis=0),
        n0, n1, 8, "aligned slice + fma", base)

    def masked_rot(acc, x, i):
        r = pltpu.roll(acc, 1 + (i % 2), 1)
        ids = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        return jnp.where(ids < n1 - 1, r, 0) * a
    _ladder_kernel(masked_rot, n0, n1, 0, "masked lane rotate + mul", base)


def sec_wave():
    """Config #3 two-phase vjp chain k sweep (the gradient-bearing north
    star).  n=8192; target 655 GB/s effective (0.8 x STREAM)."""
    from pystencils_autodiff_tpu.models import wave_step_op
    from pystencils_autodiff_tpu.utils.autotune import autotune_chain

    n = 8192
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (n, n), jnp.float32)
    c2 = 2.0 + jnp.zeros((n, n), jnp.float32)
    state = {"u_curr": x2, "u_prev": x2, "c": c2}
    op = wave_step_op()
    res = autotune_chain(op, {"u_curr": "u_next", "u_prev": "u_curr"},
                         state, k_candidates=(2, 4, 8),
                         vjp=True, periodic=True, calls=2, repeats=3)
    ab = x2.size * 4
    print(f"wave two-phase vjp sweep table: "
          f"{ {k: round(v*1e3, 3) for k, v in res.table.items()} }")
    t = res.per_step_s
    print(f"wave chain k={res.k} fwd+adj 8192^2 (c-grad live): "
          f"{t*1e3:.3f} ms/step, {8*ab/t/1e9:.0f} GB/s eff "
          f"(target 655; frac819 {8*ab/t/1e9/819:.2f})", flush=True)


def sec_aniso():
    from pystencils_autodiff_tpu.models import anisotropic27_op

    n = 384
    op = anisotropic27_op(dtype="float32")
    f = op.jax_function(lowering="pallas")
    u = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    ab = u.size * 4
    t = timed_per_iter(lambda x: f(u=x), u, 8)
    print(f"aniso27 fwd {n}^3: {t*1e3:.3f} ms, {2*ab/t/1e9:.0f} GB/s "
          f"(frac819 {2*ab/t/1e9/819:.2f}), {t/u.size*1e12:.1f} ps/cell",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    args, _ = ap.parse_known_args()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    if args.section in ("all", "prims"):
        sec_prims()
    if args.section in ("all", "aniso"):
        sec_aniso()
    if args.section in ("all", "wave"):
        sec_wave()


if __name__ == "__main__":
    main()
