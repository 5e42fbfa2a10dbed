#!/usr/bin/env python
"""Full benchmark harness: the five BASELINE configs, fwd and fwd+adjoint,
grid-points/s and GB/s vs the HBM roofline (SURVEY.md §5.1 rebuild plan).

Usage:  python benchmarks/run_all.py [--small]

Prints a markdown table; honest timing on the relay TPU (host-fetch forced
completion, RTT subtracted, in-jit dependency chains).  ``--small`` runs
CPU-sized problems for smoke-testing the harness itself.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(f, iters):
    """Iterate f with data dependencies, unrolled x4.

    Direct iteration (no per-step combiner: the old ``f(c)*0.999+c*0.001``
    damping added a full extra read+read+write pass — ~1.2 ms at 8192²f32 —
    and understated every kernel by ~2x).  Unstable operators grow ~8^k
    per step but 10 iters stay far below f32 overflow, and timing is
    magnitude-independent.  ``unroll=4`` amortises XLA's while-loop carry
    copy of custom-call outputs (device-traced: 1.74 -> 0.93 ms/step on
    the 8192² heat kernel whose device time is 0.82 ms)."""
    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        return jax.lax.scan(body, x, None, length=iters, unroll=4)[0]
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (hermetic smoke test; "
                    "does not touch the TPU relay)")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pystencils_autodiff_tpu.models import (
        anisotropic27_op, diffusion3d_op, laplacian_op, wave_step_op)
    from pystencils_autodiff_tpu.utils import roofline_gbps, slope_timed

    on_tpu = jax.devices()[0].platform == "tpu"
    small = args.small or not on_tpu
    # small mode smoke-tests the harness itself; interpret-mode fused
    # chains cost ~grid-points x k python ops, so keep it tiny
    n2 = 256 if small else 8192
    # 384^3 keeps each array well above VMEM while the chained-scan module
    # stays under the remote-compile HTTP size limit (512^3 chains exceed it)
    n3 = 32 if small else 384
    iters = 2 if small else min(args.iters, 10)
    dtype = jnp.float32
    lowering = "pallas" if on_tpu else "jnp"
    peak = roofline_gbps()

    rows = []

    def bench(name, f, x, n_arrays):
        # two-point slope over chain length — RTT subtraction published
        # physically impossible rows (lap3d fwd 1222 GB/s = 1.49x the
        # roofline, BENCH_NOTES r4s3) because 3.7 ms of device work sits
        # inside relay jitter; the slope cancels every per-call constant
        # and auto-escalates call counts when the difference underflows
        try:
            t = slope_timed(lambda n: chain(f, n), x, iters, 3 * iters)
        except Exception as e:  # keep the table going past one bad config
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            rows.append((name, float('nan'), 0.0, 0.0, 0.0))
            return
        t = max(t, 1e-9)
        ab = x.size * x.dtype.itemsize
        gbps = n_arrays * ab / t / 1e9
        pts = x.size / t
        rows.append((name, t * 1e3, pts / 1e9, gbps, gbps / peak))

    key = jax.random.PRNGKey(0)

    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp

    def bench_chain(name, op, carry, state, k, n_arrays, periodic=True,
                    calls=4):
        """Fused value+gradient chain: k steps per kernel, `calls` chained
        kernels per timed call; GB/s counts the SEQUENTIAL algorithm's
        minimum traffic (the standard temporal-blocking accounting)."""
        try:
            ch = fused_chain_vjp(op, k, carry, periodic=periodic,
                                 interpret=not on_tpu)
            names = list(state)
            cots = {n: jnp.ones_like(state[n]) for n in names}

            def make(nc):
                @jax.jit
                def f(st):
                    def body(c, _):
                        new_state, cot0 = ch(c[0], c[1])
                        # feed cotangents forward: calls are data-dependent
                        return (new_state, {n: cot0.get(n, c[1][n])
                                            for n in names}), None
                    (st2, ct2), _ = jax.lax.scan(body, (st, cots), None,
                                                 length=nc, unroll=nc)
                    # BOTH chains must be live outputs: returning only the
                    # state lets XLA's while-loop simplifier dead-code the
                    # entire cotangent twin chain for linear ops (its carry
                    # feeds nothing live) — silently halving the work
                    # timed.  unroll=nc: zero scan-carry copies.
                    return st2[names[0]], ct2[names[0]]
                return f

            # two-point slope: constant per-call overhead (relay RTT,
            # dispatch, fetch) cancels in the difference — rtt-subtraction
            # biases rows whose total compute is near the RTT noise floor
            # (min-of-N picks the luckiest RTT: the 256³ diff3d chain row
            # once read 0.55 ms/step against a 1.24 ms device truth).
            # slope_timed auto-escalates call counts when the difference
            # underflows the jitter floor (the heat3d twin row once
            # printed 0.000 from t2<t1 within jitter)
            t = slope_timed(make, dict(state), calls, 2 * calls) / k
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  file=sys.stderr)
            rows.append((name, float("nan"), 0.0, 0.0, 0.0))
            return
        t = max(t, 1e-9)
        x0 = state[list(state)[0]]
        ab = x0.size * x0.dtype.itemsize
        gbps = n_arrays * ab / t / 1e9
        rows.append((name, t * 1e3, x0.size / t / 1e9, gbps, gbps / peak))

    # config 1: 2D Laplacian
    op = laplacian_op()
    f = op.jax_function(lowering=lowering)
    x2 = jax.random.normal(key, (n2, n2), dtype)
    bench("1 lap2d fwd", lambda a: f(a), x2, 2)
    bench("1 lap2d fwd+adj", lambda a: jax.grad(
        lambda b: jnp.sum(f(b) * b))(a), x2, 4)

    from pystencils_autodiff_tpu.models import heat_step_op
    hop = heat_step_op(dt=0.1)
    bench_chain("1 heat chain k=8 fwd+adj (headline)", hop, {"u": "u_next"},
                {"u": x2}, k=8, n_arrays=4)

    # config 1b: plain 3D Laplacian — the north star names it explicitly
    # ("2D/3D Laplacian ... forward+adjoint at >=80% of HBM STREAM")
    from pystencils_autodiff_tpu.models import heat_step3d_op, laplacian3d_op
    x3 = jax.random.normal(key, (n3, n3, n3), dtype)
    op = laplacian3d_op()
    f = op.jax_function(lowering=lowering)
    bench("1b lap3d fwd", lambda a: f(a), x3, 2)
    bench("1b lap3d fwd+adj", lambda a: jax.grad(
        lambda b: jnp.sum(f(b) * b))(a), x3, 4)
    h3 = heat_step3d_op(dt=0.1)
    # linear + periodic -> twin chains over the plane-blocked geometry;
    # bounded -> the plane-blocked two-phase kernel (rolling state)
    bench_chain("1b heat3d chain k=2 fwd+adj (periodic twin)", h3,
                {"u": "u_next"}, {"u": x3}, k=2, n_arrays=4,
                periodic=True, calls=2)
    # the tuned-best depth for the 3D north-star row (round-5 final
    # sweep: k=4 tile=16 — 809 GB/s eff honest, vs 491 at k=2/default)
    bench_chain("1b heat3d chain k=4 fwd+adj (periodic twin)", h3,
                {"u": "u_next"}, {"u": x3}, k=4, n_arrays=4,
                periodic=True, calls=2)
    bench_chain("1b heat3d chain k=2 fwd+adj (bounded two-phase)", h3,
                {"u": "u_next"}, {"u": x3}, k=2, n_arrays=4,
                periodic=False, calls=2)

    # config 2: 3D variable-kappa diffusion
    op = diffusion3d_op()
    f = op.jax_function(lowering=lowering)
    k3 = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (n3, n3, n3), dtype) ** 2
    bench("2 diff3d fwd", lambda a: f(kappa=k3, u=a), x3, 3)
    bench("2 diff3d fwd+adj", lambda a: jax.grad(
        lambda b: jnp.sum(f(kappa=k3, u=b) * b))(a), x3, 6)
    # diffusion is state-linear with invariant κ, so its value+κ-gradient
    # chains ride the plane twin-accum kernel (round 5: halo k·reach per
    # block, κ-gradient accumulated per stage on owned planes — compiles
    # at 384³ where the two-phase kernel OOM'd scoped VMEM); 256³ row
    # kept for session-over-session comparison
    nc = min(n3, 256)
    xc = x3[:nc, :nc, :nc]
    kc = k3[:nc, :nc, :nc]
    bench_chain("2 diff3d chain k=2 fwd+adj (256^3)", diffusion3d_op(dt=0.05),
                {"u": "u_next"}, {"u": xc, "kappa": kc}, k=2, n_arrays=6,
                periodic=False, calls=2)
    if n3 > nc:
        bench_chain(f"2 diff3d chain k=2 fwd+adj ({n3}^3 twin-accum)",
                    diffusion3d_op(dt=0.05), {"u": "u_next"},
                    {"u": x3, "kappa": k3}, k=2, n_arrays=6,
                    periodic=False, calls=2)
        bench_chain(f"2 diff3d chain k=4 fwd+adj ({n3}^3 twin-accum)",
                    diffusion3d_op(dt=0.05), {"u": "u_next"},
                    {"u": x3, "kappa": k3}, k=4, n_arrays=6,
                    periodic=False, calls=2)

    # config 3: wave step (the FWI kernel)
    op = wave_step_op()
    f = op.jax_function(lowering=lowering)
    c2 = 2.0 + jnp.zeros((n2, n2), dtype)
    bench("3 wave fwd", lambda a: f(c=c2, u_curr=a, u_prev=a), x2, 4)
    bench("3 wave fwd+adj", lambda a: jax.grad(
        lambda b: jnp.sum(f(c=c2, u_curr=b, u_prev=b) * b))(a), x2, 8)
    bench_chain("3 wave chain k=4 fwd+adj", wave_step_op(),
                {"u_curr": "u_next", "u_prev": "u_curr"},
                {"u_curr": x2, "u_prev": x2, "c": c2}, k=4, n_arrays=8)
    # frozen velocity: linear-in-state -> twin-chain fast path (adjoint
    # state w.r.t. wavefields only; FWI keeps the default two-phase row)
    bench_chain("3 wave chain k=4 fwd+adj (frozen c, twin)",
                wave_step_op(grad_c=False),
                {"u_curr": "u_next", "u_prev": "u_curr"},
                {"u_curr": x2, "u_prev": x2, "c": c2}, k=4, n_arrays=8,
                periodic=True, calls=2)

    # config 4: anisotropic 27-point
    op = anisotropic27_op()
    f = op.jax_function(lowering=lowering)
    bench("4 aniso27 fwd", lambda a: f(a), x3, 2)
    bench("4 aniso27 fwd+adj", lambda a: jax.grad(
        lambda b: jnp.sum(f(b) * b))(a), x3, 4)
    # fast path: 3D periodic LINEAR ops take twin chains over the
    # plane-blocked geometry (docs/performance.md lever #1)
    bench_chain("4 aniso27 chain k=2 fwd+adj", anisotropic27_op(),
                {"u": "y"}, {"u": x3}, k=2, n_arrays=4, periodic=True,
                calls=2)

    # config 5: domain decomposition — the comm-avoiding sharded fused
    # chain over the devices actually present (one chip on this relay;
    # the 8-virtual-device CPU suite covers multi-shard exactness).  At
    # parity with the unsharded headline row, the shard plumbing
    # (deep-halo exchange + global-coordinate masks) costs ~nothing.
    def bench_sharded_chain(name, op_, carry, state, k, n_arrays, calls=2):
        from jax.sharding import Mesh
        from pystencils_autodiff_tpu.parallel import ShardedChain
        try:
            mesh = Mesh(np.asarray(jax.devices()), ("x",))
            ch = ShardedChain(op_, k, mesh, {0: "x"}, carry_map=carry,
                              periodic=True, fused_bwd=True,
                              interpret=not on_tpu)
            names = list(state)
            cots = {n: jnp.ones_like(v) for n, v in state.items()}

            def make(nc):
                @jax.jit
                def g(st):
                    def body(c, _):
                        out, pull = jax.vjp(ch, c[0])
                        grads = pull(c[1])[0]
                        return (out, {n: grads.get(n, c[1][n])
                                      for n in names}), None
                    (st2, ct2), _ = jax.lax.scan(body, (st, cots), None,
                                                 length=nc, unroll=nc)
                    return st2[names[0]], ct2[names[0]]
                return g

            t = slope_timed(make, dict(state), calls, 2 * calls) / k
        except Exception as e:
            print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  file=sys.stderr)
            rows.append((name, float("nan"), 0.0, 0.0, 0.0))
            return
        x0 = state[list(state)[0]]
        ab = x0.size * x0.dtype.itemsize
        gbps = n_arrays * ab / t / 1e9
        rows.append((name, t * 1e3, x0.size / t / 1e9, gbps, gbps / peak))

    bench_sharded_chain(
        f"5 heat sharded chain k=8 fwd+adj ({len(jax.devices())}-dev mesh)",
        heat_step_op(dt=0.1), {"u": "u_next"}, {"u": x2}, k=8, n_arrays=4)

    dev = jax.devices()[0].device_kind
    print(f"\n### Benchmarks ({dev}, {'small' if small else 'full'} sizes, "
          f"lowering={lowering}, peak={peak:.0f} GB/s)\n")
    print("| config | ms/iter | Gpts/s | GB/s | frac peak |")
    print("|---|---|---|---|---|")
    for name, ms, gpts, gbps, frac in rows:
        print(f"| {name} | {ms:.3f} | {gpts:.2f} | {gbps:.0f} | {frac:.2f} |")


if __name__ == "__main__":
    main()
