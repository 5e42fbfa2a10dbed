#!/usr/bin/env python
"""Round-3 TPU measurement session (VERDICT round-2 items #2/#4/#5 bench).

Sections (run individually with --section; each is independent):

  vpu      VPU f32 FMA roofline microbenchmark (VMEM-resident chained FMAs)
  aniso27  config #4: flops/cell, fwd / fwd+adj / fused chain, roofline frac
  diff3d   config #2: plane chains with coefficient hoisting, 256/384^3
  cavity   fused-cavity GLUPS uplift (bounce-back inside the chain)
  d3q19    D3Q19 chain GLUPS (128^3); 192^3 attempts live in a separate
           timeout-wrapped invocation (see --section d3q19_192)

Honest relay timing: host-fetch forced completion, RTT subtracted,
in-jit dependency chains, unroll=4 (see benchmarks/run_all.py).
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
    """Per-iteration time by the two-point slope method (see run_all.py):
    constant per-call overhead (relay RTT, dispatch, fetch) cancels in the
    difference, where min-of-N + RTT subtraction under-times short rows
    whose total device work sits in the RTT noise floor."""
    from pystencils_autodiff_tpu.utils import slope_timed
    n1 = max(1, iters)
    t = slope_timed(lambda n: chain_calls(f, n), x, n1, 2 * n1)
    return max(t, 1e-9)


def sec_vpu():
    """Sustained f32 elementwise-FMA rate: 256 chained a*x+b per element on
    VMEM-resident tiles — an upper bound for what stencil arithmetic can
    do, to quantify compute-bound kernels (VERDICT round-2 next #2)."""
    R = 256
    n0, n1 = 2048, 512

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)
        for _ in range(R):
            x = x * a + b
        o_ref[...] = x

    f = pl.pallas_call(
        kernel,
        grid=(n0 // 256,),
        in_specs=[pl.BlockSpec((256, n1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, n1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1), jnp.float32),
    )
    x = jnp.ones((n0, n1), jnp.float32)
    t = timed_per_iter(f, x, 20)
    flops = 2 * R * n0 * n1
    print(f"VPU roofline: {flops / t / 1e12:.3f} Tflop/s f32 "
          f"(256 chained FMAs on {n0}x{n1} VMEM tiles, {t*1e3:.3f} ms/call)")
    return flops / t


def _flops_per_cell(op):
    import sympy as sp
    from pystencils_autodiff_tpu.ops import forward_program
    prog = forward_program(op)
    return sum(int(sp.count_ops(s.rhs)) for s in prog.steps)


def sec_aniso27(vpu_flops=None):
    from pystencils_autodiff_tpu.models import anisotropic27_op
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
    from pystencils_autodiff_tpu.utils import roofline_gbps

    n = 384
    op = anisotropic27_op(dtype="float32")
    fpc = _flops_per_cell(op)
    print(f"aniso27 flops/cell (forward, sympy count_ops): {fpc}")
    f = op.jax_function(lowering="pallas")
    u = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    ab = u.size * 4

    t = timed_per_iter(lambda x: f(u=x), u, 8)
    gc = u.size / t / 1e9
    vline = (f", VPU-frac {gc * 1e9 * fpc / vpu_flops:.2f}"
             if vpu_flops else "")
    print(f"aniso27 fwd {n}^3: {t*1e3:.3f} ms, {gc:.1f} Gcell/s, "
          f"{2*ab/t/1e9:.0f} GB/s (frac819 {2*ab/t/1e9/819:.2f}){vline}")

    # fwd+adjoint: carry BOTH primal and cotangent through jax.vjp so the
    # (constant, since the op is linear) gradient cannot be hoisted out of
    # the timing loop by XLA
    def vjp_step(c):
        y, pull = jax.vjp(lambda x: f(u=x), c[0])
        (gx,) = pull(c[1])
        return (y, gx)

    t2 = timed_per_iter(vjp_step, (u, u), 6)
    print(f"aniso27 fwd+adj {n}^3: {t2*1e3:.3f} ms, {u.size/t2/1e9:.1f} "
          f"Gcell/s, {4*ab/t2/1e9:.0f} GB/s eff (frac {4*ab/t2/1e9/819:.2f})")

    # fused chain: linear op -> twin chains (value + transposed cotangent)
    for k in (2, 4):
        try:
            g = fused_chain_vjp(op, k, {"u": "y"}, periodic=True)

            def step(c, _g=g):
                st, cot = _g({"u": c[0]}, {"u": c[1]})
                return (st["u"], cot["u"])

            t3 = timed_per_iter(lambda c: step(c), (u, u), 4) / k
            print(f"aniso27 chain k={k} fwd+adj {n}^3: {t3*1e3:.3f} ms/step, "
                  f"{u.size/t3/1e9:.1f} Gcell/s, {4*ab/t3/1e9:.0f} GB/s eff "
                  f"(frac {4*ab/t3/1e9/819:.2f})")
        except Exception as e:
            print(f"aniso27 chain k={k}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


def sec_diff3d():
    from pystencils_autodiff_tpu.models import diffusion3d_op
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp

    op = diffusion3d_op(dt=0.05, dtype="float32")
    fpc = _flops_per_cell(op)
    print(f"diff3d flops/cell (forward): {fpc}")
    for n, ks in ((384, (2, 4)), (256, (2,))):
        u = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
        kap = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                            (n, n, n), jnp.float32) ** 2
        ab = u.size * 4
        it = 8 if n >= 384 else 40  # sub-ms kernels need many iters vs RTT
        f = op.jax_function(lowering="pallas")
        t = timed_per_iter(lambda x: f(u=x, kappa=kap), u, it)
        print(f"diff3d fwd {n}^3: {t*1e3:.3f} ms, {u.size/t/1e9:.1f} Gcell/s,"
              f" {3*ab/t/1e9:.0f} GB/s (frac {3*ab/t/1e9/819:.2f})")
        for k in ks:
            try:
                ch = fused_time_chain(op, k, {"u": "u_next"}, periodic=True)

                def step(c, _ch=ch):
                    st = _ch({"u": c, "kappa": kap})
                    return st["u"]

                t2 = timed_per_iter(lambda c: step(c), u,
                                    4 if n >= 384 else 24) / k
                print(f"diff3d chain k={k} fwd {n}^3 (hoisted face "
                      f"coeffs): {t2*1e3:.3f} ms/step, {u.size/t2/1e9:.1f} "
                      f"Gcell/s, {3*ab/t2/1e9:.0f} GB/s eff "
                      f"(frac {3*ab/t2/1e9/819:.2f})")
            except Exception as e:
                print(f"diff3d chain k={k} {n}^3: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")
        # fwd+adj chain (nonlinear: bounded-domain two-phase kernel, or the
        # guard's sequential fallback at >=300^3 — periodic 3D nonlinear
        # chains are unsupported by design)
        try:
            k = 2
            g = fused_chain_vjp(op, k, {"u": "u_next"}, periodic=False)

            def stepg(c, _g=g):
                st, cot = _g({"u": c[0], "kappa": kap},
                             {"u": c[1], "kappa": jnp.zeros_like(kap)})
                return (st["u"], cot["u"])

            t3 = timed_per_iter(lambda c: stepg(c), (u, u),
                                3 if n >= 384 else 16) / k
            print(f"diff3d chain k={k} fwd+adj {n}^3: {t3*1e3:.3f} ms/step, "
                  f"{u.size/t3/1e9:.1f} Gcell/s, {6*ab/t3/1e9:.0f} GB/s eff")
        except Exception as e:
            print(f"diff3d adj chain {n}^3: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")


def sec_cavity():
    from pystencils_autodiff_tpu.boundary import bounce_back
    from pystencils_autodiff_tpu.models.lbm import d2q9_bgk_op
    from pystencils_autodiff_tpu.ops import fused_stage_chain
    from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper

    n, k = 2048, 4
    for layout in ("aos", "soa"):
        op = d2q9_bgk_op(omega=1.7, layout=layout)
        solid = np.zeros((n, n), np.float32)
        solid[0, :] = solid[-1, :] = solid[:, 0] = solid[:, -1] = 1.0
        solid = jnp.asarray(solid)
        lid = jnp.zeros((n, n), jnp.float32).at[0, :].set(0.1)
        shape = (9, n, n) if layout == "soa" else (n, n, 9)
        f0 = jnp.ones(shape, jnp.float32) / 9

        step = stage_stepper(op, {"f": "f_out"}, lowering="pallas")

        def seq_step(f):
            fb = bounce_back(jnp.moveaxis(f, 0, -1) if layout == "soa"
                             else f, solid != 0,
                             u_wall=(jnp.zeros((n, n), jnp.float32), lid))
            if layout == "soa":
                fb = jnp.moveaxis(fb, -1, 0)
            return step({"f": fb})["f"]

        t_seq = timed_per_iter(seq_step, f0, 6)

        chain = fused_stage_chain(
            [(op, {"f": "f_out"})], k,
            boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))})
        state0 = {"solid": solid, "uw0": jnp.zeros((n, n), jnp.float32),
                  "uw1": lid}

        def fused_step(f):
            return chain({**state0, "f": f})["f"]

        try:
            t_f = timed_per_iter(fused_step, f0, 4) / k
            print(f"cavity {layout} {n}^2: sequential {t_seq*1e3:.3f} ms/step"
                  f" ({n*n/t_seq/1e9:.2f} GLUPS) -> fused k={k} "
                  f"{t_f*1e3:.3f} ms/step ({n*n/t_f/1e9:.2f} GLUPS, "
                  f"{t_seq/t_f:.2f}x)")
        except Exception as e:
            print(f"cavity {layout} fused: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")

        if layout != "aos":
            continue
        # value+gradient in ONE kernel: the two-phase adjoint with fused
        # BC transposes (round-3 session 2) vs sequential-recompute bwd.
        # The monolithic 9-plane two-phase TU at k=4/2048^2 is a recorded
        # Mosaic pathology (guard pre-seed stage_vjp_wide); since round 4
        # the guard routes that straight to the SEGMENTED fused backward
        # (two checkpointed k=2 two-phase kernels), so the k=4 row is
        # live again — the k=2-vs-k=4 comparison is an interleaved A/B
        # (paired deltas; sub-ms dispatch jitter is common-mode).
        fused_fns = {}
        for fb, kg in ((False, k), (True, 2), (True, 4)):
            try:
                ch_g = fused_stage_chain(
                    [(op, {"f": "f_out"})], kg, fused_bwd=fb,
                    boundary={"f": ("bounce_back", "solid",
                                    ("uw0", "uw1"))})

                def vjp_step(c, _ch=ch_g):
                    out, pull = jax.vjp(
                        lambda fv, uv: _ch({**state0, "f": fv,
                                            "uw1": uv})["f"],
                        c[0], c[1])
                    _, gu = pull(c[0])
                    return (out, gu)

                t_g = timed_per_iter(lambda c: vjp_step(c),
                                     (f0, lid), 3) / kg
                print(f"cavity {layout} {n}^2 value+u_lid-grad "
                      f"({'fused' if fb else 'seq'} bwd, k={kg}): "
                      f"{t_g*1e3:.3f} ms/step "
                      f"({n*n/t_g/1e9:.2f} GLUPS)", flush=True)
                if fb:
                    fused_fns[kg] = vjp_step
            except Exception as e:
                print(f"cavity grad ({'fused' if fb else 'seq'}, k={kg}): "
                      f"FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
        if len(fused_fns) == 2:
            from pystencils_autodiff_tpu.utils import ab_timed

            k_lo, k_hi = sorted(fused_fns)
            a = chain_calls(fused_fns[k_lo], 4)
            b = chain_calls(fused_fns[k_hi], 4)
            ta, tb, d = ab_timed(a, b, (f0, lid))
            # per-STEP: a runs 4·k_lo steps per call, b runs 4·k_hi
            print(f"cavity fused-bwd A/B k={k_lo} vs k={k_hi}: "
                  f"{ta/4/k_lo*1e3:.3f} vs {tb/4/k_hi*1e3:.3f} ms/step "
                  f"(paired delta {d*1e3:+.2f} ms/call)", flush=True)


def sec_d3q19():
    from pystencils_autodiff_tpu.models.lbm import d3q19_bgk_op
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
    from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper

    n = 128
    for layout in ("soa", "aos"):
        op = d3q19_bgk_op(omega=1.7, layout=layout)
        shape = (19, n, n, n) if layout == "soa" else (n, n, n, 19)
        f0 = jnp.ones(shape, jnp.float32) / 19
        step = stage_stepper(op, {"f": "f_out"}, lowering="pallas",
                             periodic=True)
        t = timed_per_iter(lambda f: step({"f": f})["f"], f0, 4)
        print(f"d3q19 {layout} {n}^3 sequential: {t*1e3:.3f} ms/step, "
              f"{n**3/t/1e9:.2f} GLUPS")
        for k in (2,):
            try:
                ch = fused_time_chain(op, k, {"f": "f_out"},
                                      periodic=True)
                t2 = timed_per_iter(lambda f: ch({"f": f})["f"], f0, 3) / k
                print(f"d3q19 {layout} {n}^3 fused k={k}: "
                      f"{t2*1e3:.3f} ms/step, {n**3/t2/1e9:.2f} GLUPS "
                      f"({t/t2:.2f}x)")
            except Exception as e:
                print(f"d3q19 {layout} chain: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")


def sec_d3q19_192():
    """192^3 attempts — run under `timeout` from the shell; a >10-min
    Mosaic compile was recorded in round 2 for SoA."""
    from pystencils_autodiff_tpu.models.lbm import d3q19_bgk_op
    from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper

    layout = sys.argv[sys.argv.index("--layout") + 1] \
        if "--layout" in sys.argv else "soa"
    tile = None
    if "--tile" in sys.argv:
        tile = int(sys.argv[sys.argv.index("--tile") + 1])
    n = 192
    op = d3q19_bgk_op(omega=1.7, layout=layout)
    shape = (19, n, n, n) if layout == "soa" else (n, n, n, 19)
    f0 = jnp.ones(shape, jnp.float32) / 19
    kwargs = {"tile_rows": tile} if tile else {}
    step = stage_stepper(op, {"f": "f_out"}, lowering="pallas",
                         periodic=True, **kwargs)
    t = timed_per_iter(lambda f: step({"f": f})["f"], f0, 3)
    print(f"d3q19 {layout} {n}^3 tile={tile}: {t*1e3:.3f} ms/step, "
          f"{n**3/t/1e9:.2f} GLUPS")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    ap.add_argument("--layout", default="soa")
    ap.add_argument("--tile", type=int, default=0)
    args, _ = ap.parse_known_args()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    vpu = None
    if args.section in ("all", "vpu"):
        vpu = sec_vpu()
    if args.section in ("all", "aniso27"):
        sec_aniso27(vpu)
    if args.section in ("all", "diff3d"):
        sec_diff3d()
    if args.section in ("all", "cavity"):
        sec_cavity()
    if args.section in ("all", "d3q19"):
        sec_d3q19()
    if args.section == "d3q19_192":
        sec_d3q19_192()


if __name__ == "__main__":
    main()
