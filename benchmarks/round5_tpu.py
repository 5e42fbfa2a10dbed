#!/usr/bin/env python
"""Round-5 hardware session: (k, tile) autotune sweeps for the gradient-
bearing chains (VERDICT r4 next #2/#4/#8), and the plane-twin k=4/384³
pre-seed probe (next #5a).

The analysis behind the tile sweeps: the conservative ``n_live`` VMEM
estimates make ``pick_plane_tile``/``pick_chain_tile`` choose small tiles
(aniso27 384³: t=4 planes against a 4-plane halo → ~25 % redundant
compute + full-volume rotates on an 8-plane block), so the measured
0.54-of-VPU efficiency is mostly halo-overlap amortisation, which a
larger measured tile removes.  Sweeps persist winners in the tune cache;
the chain builders consult them at default dispatch (per-k tiles, twin
path included since round 5).

Usage: python benchmarks/round5_tpu.py [--section sweeps|probe|all]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sweep(tag, op, carry, state, k_cands, tile_cands, **kw):
    from pystencils_autodiff_tpu.utils import autotune_chain

    t0 = time.monotonic()
    try:
        res = autotune_chain(op, carry, state, k_candidates=k_cands,
                             tile_candidates=tile_cands, vjp=True,
                             periodic=kw.pop("periodic", True),
                             calls=kw.pop("calls", 2), repeats=2, **kw)
    except Exception as e:
        print(f"{tag}: sweep FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    rows = "  ".join(f"(k={k},t={t}): {v*1e3:.3f}ms"
                     for (k, t), v in sorted(res.table.items()))
    print(f"{tag}: best k={res.best['k']} tile={res.best['tile_rows']} "
          f"{(res.per_step_s or 0)*1e3:.3f} ms/step "
          f"({'cache' if res.cached else f'{time.monotonic()-t0:.0f}s sweep'})"
          f"\n  table: {rows}", flush=True)


def sec_sweeps():
    from pystencils_autodiff_tpu.models import (anisotropic27_op,
                                                diffusion3d_op,
                                                heat_step3d_op, wave_step_op)

    key = jax.random.PRNGKey(0)
    n2 = 8192
    x2 = jax.random.normal(key, (n2, n2), jnp.float32)
    c2 = 2.0 + jnp.zeros((n2, n2), jnp.float32)

    # config #3: wave value+gradient (c-gradient) — the open north star.
    # Routed through the round-5 twin-accum kernel (halo k·r per block
    # instead of k·2r shared); force=True because earlier sweeps measured
    # the superseded two-phase kernel under the same key
    sweep("wave twin-accum vjp 8192^2", wave_step_op(),
          {"u_curr": "u_next", "u_prev": "u_curr"},
          {"u_curr": x2, "u_prev": x2, "c": c2},
          k_cands=(2, 4, 8), tile_cands=(None, 16, 32, 64, 128),
          force=True)

    n3 = 384
    x3 = jax.random.normal(key, (n3, n3, n3), jnp.float32)

    # config #4: aniso27 twin — tile sweep targets the halo-overlap loss
    sweep("aniso27 twin vjp 384^3", anisotropic27_op(), {"u": "y"},
          {"u": x3}, k_cands=(2, 4), tile_cands=(None, 8, 16, 32, 48, 96))

    # config #2: diff3d plane two-phase (bounded)
    k3 = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                       (n3, n3, n3), jnp.float32) ** 2
    sweep("diff3d plane two-phase vjp 384^3", diffusion3d_op(dt=0.05),
          {"u": "u_next"}, {"u": x3, "kappa": k3},
          k_cands=(2,), tile_cands=(None, 8, 16, 24), periodic=False)

    # config #1b: heat3d bounded two-phase
    sweep("heat3d plane two-phase vjp 384^3", heat_step3d_op(dt=0.1),
          {"u": "u_next"}, {"u": x3},
          k_cands=(2, 4), tile_cands=(None, 8, 16, 32), periodic=False)


def sec_probe():
    """Direct AOT probe of the plane-blocked chain kernel at the
    pre-seeded pathology point (27-point twin, k=4, 384³): is the
    round-3 HTTP 500 still a real Mosaic limit, or stale?  Bypasses the
    guard heuristics on purpose; records the actual error text."""
    from pystencils_autodiff_tpu.models import anisotropic27_op
    from pystencils_autodiff_tpu.ops.common import forward_program
    from pystencils_autodiff_tpu.ops.plane_chain import (
        make_plane_chain_kernel_fn)

    op = anisotropic27_op()
    prog = forward_program(op)
    n = 384
    abstract = {"u": jax.ShapeDtypeStruct((n, n, n), jnp.float32)}
    for tile in (None, 16, 8):
        t0 = time.monotonic()
        try:
            kern = make_plane_chain_kernel_fn(
                prog, 4, {"u": "y"}, (n, n, n), jnp.float32,
                False, True, tile_planes=tile)
            jax.jit(kern).lower(abstract).compile()
            print(f"plane twin k=4 384^3 tile={tile}: COMPILES "
                  f"({time.monotonic()-t0:.0f}s) — pre-seed is stale",
                  flush=True)
            return
        except Exception as e:
            print(f"plane twin k=4 384^3 tile={tile}: FAILED after "
                  f"{time.monotonic()-t0:.0f}s — {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def sec_sweeps_trim():
    """Trimmed sweeps for a short session: outer-jit compiles on the
    relay cost ~10 min per candidate at 8192², so sweep only the
    highest-value axes (wave k=4 tiles; aniso27 twin tiles at k=2)."""
    from pystencils_autodiff_tpu.models import anisotropic27_op, wave_step_op

    key = jax.random.PRNGKey(0)
    n2 = 8192
    x2 = jax.random.normal(key, (n2, n2), jnp.float32)
    c2 = 2.0 + jnp.zeros((n2, n2), jnp.float32)
    sweep("wave twin-accum vjp k=4 tiles", wave_step_op(),
          {"u_curr": "u_next", "u_prev": "u_curr"},
          {"u_curr": x2, "u_prev": x2, "c": c2},
          k_cands=(4,), tile_cands=(None, 16, 32, 64))
    n3 = 384
    x3 = jax.random.normal(key, (n3, n3, n3), jnp.float32)
    sweep("aniso27 twin vjp k=2 tiles 384^3", anisotropic27_op(),
          {"u": "y"}, {"u": x3}, k_cands=(2,),
          tile_cands=(None, 8, 16, 32, 48))


def sec_sweeps_3d():
    """Session-4 sweeps: the three OPEN 3D configs (#1b 491, #2 276,
    #4 219 eff).  The default ``pick_plane_tile`` lands on t=6 planes at
    384³ (the conservative ``n_live`` estimate), i.e. a 2-plane halo on
    a 6-plane tile — 33 % redundant compute plus 64 grid blocks of
    per-block concat; none of these shapes ever had a hardware tile
    sweep (sessions 1–3 truncated on outer-jit relay cost).  Candidate
    lists are LEAN: a candidate costs ~5–7 min of relay compiles even
    with the prune timer, so each sweep carries the two tiles the VMEM
    arithmetic says should bracket the optimum.  The 2D headline sweep
    runs FIRST (exact bench.py candidate sets, so the driver's
    end-of-round run cache-hits instead of cold-sweeping — the tune
    cache is per-container and this container started empty)."""
    from pystencils_autodiff_tpu.models import (anisotropic27_op,
                                                diffusion3d_op,
                                                heat_step3d_op,
                                                heat_step_op)

    key = jax.random.PRNGKey(0)
    n2 = 8192
    x2 = jax.random.normal(key, (n2, n2), jnp.float32)
    sweep("heat2d headline vjp 8192^2", heat_step_op(dt=0.1),
          {"u": "u_next"}, {"u": x2}, k_cands=(2, 4, 8),
          tile_cands=(None,), calls=4)

    n3 = 384
    x3 = jax.random.normal(key, (n3, n3, n3), jnp.float32)

    # config #1b: heat3d periodic twin (the 3D-Laplacian north star row).
    # tv2 prune data: t=16 compiled and ran 0.944 ms/step fwd-chain-only
    # vs the default t=6 row's 1.846 honest — t in {8,16} brackets it
    sweep("heat3d periodic twin vjp 384^3", heat_step3d_op(dt=0.1),
          {"u": "u_next"}, {"u": x3},
          k_cands=(2, 4), tile_cands=(8, 16))

    # config #4: aniso27 periodic twin (tv2 prune: t=8 beat t=6 by 20 %)
    sweep("aniso27 twin vjp 384^3", anisotropic27_op(), {"u": "y"},
          {"u": x3}, k_cands=(2,), tile_cands=(8, 16))

    # config #2: diff3d bounded twin-accum (many live volumes: modest
    # tiles only; k=4 OOM'd at the default tile in the r5s3 table)
    k3 = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                       (n3, n3, n3), jnp.float32) ** 2
    sweep("diff3d twin-accum vjp 384^3", diffusion3d_op(dt=0.05),
          {"u": "u_next"}, {"u": x3, "kappa": k3},
          k_cands=(2,), tile_cands=(8, 16), periodic=False)


def main():
    import logging

    logging.basicConfig(level=logging.INFO)  # autotune progress lines
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all")
    args, _ = ap.parse_known_args()
    assert jax.devices()[0].platform == "tpu", "run on the TPU"
    if args.section in ("all", "probe"):
        sec_probe()
    if args.section in ("all", "sweeps"):
        sec_sweeps()
    if args.section == "sweeps2":
        sec_sweeps_trim()
    if args.section == "sweeps3d":
        sec_sweeps_3d()


if __name__ == "__main__":
    main()
