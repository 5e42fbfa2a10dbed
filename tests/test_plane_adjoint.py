"""Plane-blocked ("2.5D") two-phase fused adjoint chains
(ops/plane_adjoint.py) must match sequential jax.vjp bit-for-bit —
VERDICT round-3 next #1 (the flagship fused value+gradient capability at
large-3D scale; the flattened kernel's halo explodes there).

Oracles: f64 sequential stepping through the per-op custom_vjp steps
(bounded) / the jnp roll-based lowering (periodic), pulled back with
jax.vjp — the same oracle contract as test_chain3d / test_adjoint_chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models import anisotropic27_op, diffusion3d_op
from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
from pystencils_autodiff_tpu.ops.plane_adjoint import make_plane_chain_vjp_fn
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12
SHAPE = (12, 10, 16)
CARRY = {"u": "u_next"}


def _state(key=0):
    u = jax.random.normal(jax.random.PRNGKey(key), SHAPE, jnp.float64)
    kap = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(key + 1), SHAPE,
                                        jnp.float64) ** 2
    return {"u": u, "kappa": kap}


def _cots(state, key=7):
    return {n: jax.random.normal(jax.random.PRNGKey(key + i), SHAPE,
                                 jnp.float64)
            for i, n in enumerate(state)}


def _oracle(op, carry, state, cots, k, periodic, names):
    step = make_time_stepper(op, carry,
                             lowering="jnp" if periodic else "pallas",
                             periodic=periodic,
                             **({} if periodic else {"interpret": True}))

    def run(st):
        for _ in range(k):
            st = step(st)
        return {n: st[n] for n in names}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    return ref_state, ref_cot


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("k", [1, 2])
def test_diffusion3d_plane_two_phase(periodic, k):
    """Nonlinear (primal-saving) two-phase: variable-κ diffusion, bounded
    AND fully-periodic (all three dims — new in round 4)."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    fn = make_plane_chain_vjp_fn(op, k, CARRY, SHAPE, jnp.float64,
                                 interpret=True, periodic=periodic)
    state, cots = _state(), _cots(_state())
    new_state, cot0 = fn(state, cots)
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, k, periodic,
                                 ("u", "kappa"))
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"cot {n}")


@pytest.mark.parametrize("periodic", [False, True])
def test_aniso27_plane_two_phase(periodic):
    """27-point operand: corner offsets exercise the two-level lateral
    rotate cache in BOTH phases (9 recurring (o1,o2) pairs)."""
    op = anisotropic27_op(dtype="float64")
    carry = {"u": "y"}
    k = 2
    fn = make_plane_chain_vjp_fn(op, k, carry, SHAPE, jnp.float64,
                                 interpret=True, periodic=periodic)
    u = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float64)
    ct = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float64)
    new_state, cot0 = fn({"u": u}, {"u": ct})
    ref_state, ref_cot = _oracle(op, carry, {"u": u}, {"u": ct}, k,
                                 periodic, ("u",))
    np.testing.assert_allclose(new_state["u"], ref_state["u"],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["u"], ref_cot["u"],
                               rtol=1e-11, atol=1e-11)


def test_wave3d_two_field_carry():
    """Two-field carry (u_prev ← u, u ← u_next) with a coefficient field:
    exercises pass-through + output-fed cotangent routing and primal
    saving of (u, c) in a 3-input op."""
    import sympy as sp

    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, Field

    u = Field("u", 3, dtype="float64")
    up = Field("u_prev", 3, dtype="float64")
    c = Field("c", 3, dtype="float64")
    out = Field("u_next", 3, dtype="float64")
    lap = sum(u.neighbor(d, 1) + u.neighbor(d, -1) for d in range(3)) \
        - 6 * u.center
    op = AutoDiffOp(
        [Assignment(out.center,
                    2 * u.center - up.center
                    + sp.Rational(1, 100) * c.center ** 2 * lap)],
        op_name="wave3d")
    carry = {"u_prev": "u", "u": "u_next"}
    k = 2
    fn = make_plane_chain_vjp_fn(op, k, carry, SHAPE, jnp.float64,
                                 interpret=True, periodic=False)
    state = {
        "u": jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float64),
        "u_prev": jax.random.normal(jax.random.PRNGKey(1), SHAPE,
                                    jnp.float64),
        "c": 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), SHAPE,
                                           jnp.float64) ** 2,
    }
    cots = _cots(state, key=11)
    new_state, cot0 = fn(state, cots)
    ref_state, ref_cot = _oracle(op, carry, state, cots, k, False,
                                 ("u", "u_prev", "c"))
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"cot {n}")


def test_linear_rolling_state_path():
    """Constant-coefficient 3D Laplacian chain: the backward program reads
    no primals, so phase 1 keeps only rolling state (the saved list stays
    empty) — bounded domains don't qualify for the twin path, so this IS
    the production bounded-linear route."""
    import sympy as sp

    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, Field

    u = Field("u", 3, dtype="float64")
    out = Field("u_next", 3, dtype="float64")
    lap = sum(u.neighbor(d, 1) + u.neighbor(d, -1) for d in range(3)) \
        - 6 * u.center
    op = AutoDiffOp(
        [Assignment(out.center, u.center + sp.Rational(1, 10) * lap)],
        op_name="lap3d_step")
    carry = {"u": "u_next"}
    k = 3
    fn = make_plane_chain_vjp_fn(op, k, carry, SHAPE, jnp.float64,
                                 interpret=True, periodic=False)
    uu = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float64)
    ct = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float64)
    new_state, cot0 = fn({"u": uu}, {"u": ct})
    ref_state, ref_cot = _oracle(op, carry, {"u": uu}, {"u": ct}, k,
                                 False, ("u",))
    np.testing.assert_allclose(new_state["u"], ref_state["u"],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["u"], ref_cot["u"],
                               rtol=1e-11, atol=1e-11)


def test_uneven_plane_tile():
    """Plane counts without multiple-of-8 divisors tile fine (the plane
    axis has no alignment requirement): 14 = 2·7 planes, tile 7."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    shape = (14, 10, 16)
    fn = make_plane_chain_vjp_fn(op, 1, CARRY, shape, jnp.float64,
                                 interpret=True, periodic=False,
                                 tile_planes=7)
    u = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float64)
    kap = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), shape,
                                        jnp.float64) ** 2
    state = {"u": u, "kappa": kap}
    cots = {n: jax.random.normal(jax.random.PRNGKey(8 + i), shape,
                                 jnp.float64)
            for i, n in enumerate(state)}
    new_state, cot0 = fn(state, cots)
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, 1, False,
                                 ("u", "kappa"))
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=1e-11, atol=1e-11)


def test_fused_chain_vjp_routes_3d_to_plane():
    """fused_chain_vjp's public entry uses the plane kernel for 3D (no
    probes) — the guard ladder's first variant on hardware, the direct
    build in interpret mode."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    chain = fused_chain_vjp(op, 2, CARRY, periodic=True, interpret=True)
    state, cots = _state(), _cots(_state())
    new_state, cot0 = chain(state, cots)
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, 2, True,
                                 ("u", "kappa"))
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=1e-11, atol=1e-11)


# ---- sharded / lateral-chunked plane adjoint (round 5) ----------------------

def _chunked(op, carry, k, periodic, state, cots, B, H1, names):
    """Reference composition of the round-5 lateral-chunk fallback: pad
    dim 1 (wrap/edge/zero), run the plane vjp kernel per chunk with a
    ShardSpec whose bases make every mask test global coordinates,
    stitch the cores."""
    from pystencils_autodiff_tpu.ops.flatten import ShardSpec

    n0, n1, n2 = state[names[0]].shape
    c = n1 // B
    kern = make_plane_chain_vjp_fn(
        op, k, carry, (n0, c + 2 * H1, n2), jnp.float64, True, periodic,
        shard=ShardSpec(global_spatial=(n0, n1, n2), sharded_dims=(1,)))

    def pad1(a, zero):
        mode = "wrap" if periodic else ("constant" if zero else "edge")
        return jnp.pad(a, ((0, 0), (H1, H1), (0, 0)), mode=mode)

    sp = {n: pad1(state[n], False) for n in names}
    cp = {n: pad1(cots[n], True) for n in names}
    s_parts, c_parts = [], []
    for b in range(B):
        cut = {n: jax.lax.slice_in_dim(sp[n], b * c, b * c + c + 2 * H1,
                                       axis=1) for n in names}
        ccut = {n: jax.lax.slice_in_dim(cp[n], b * c, b * c + c + 2 * H1,
                                        axis=1) for n in names}
        st_b, ct_b = kern(cut, ccut, jnp.array([0, b * c - H1, 0],
                                               jnp.int32))
        s_parts.append({n: st_b[n][:, H1:H1 + c] for n in names})
        c_parts.append({n: ct_b[n][:, H1:H1 + c] for n in names})
    stitch = lambda ps: {n: jnp.concatenate([p[n] for p in ps], axis=1)
                         for n in names}
    return stitch(s_parts), stitch(c_parts)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("B", [2, 5])
def test_plane_adjoint_lateral_chunks_exact(periodic, B):
    """The lateral-chunk decomposition (the VMEM-OOM fallback for fat
    planes, adjoint_chain 'plane_two_phase_lat/B') must be bit-exact vs
    the unchunked kernel AND the sequential oracle — masks test global
    coordinates through the ShardSpec bases."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    names = ["kappa", "u"]
    k = 2
    shape = (12, 20, 16)
    state = {"u": jax.random.normal(jax.random.PRNGKey(0), shape,
                                    jnp.float64),
             "kappa": 1.0 + 0.1 * jax.random.normal(
                 jax.random.PRNGKey(1), shape, jnp.float64) ** 2}
    cots = {n: jax.random.normal(jax.random.PRNGKey(7 + i), shape,
                                 jnp.float64)
            for i, n in enumerate(names)}
    # per-step dim-1 reach of diffusion fwd+bwd = 1+1
    st_c, ct_c = _chunked(op, CARRY, k, periodic, state, cots, B, k * 2,
                          names)
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, k, periodic, names)
    for n in names:
        np.testing.assert_allclose(np.asarray(st_c[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(np.asarray(ct_c[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL)


def test_plane_adjoint_sharded_dim0_exact():
    """ShardSpec with dim 0 sharded: the kernel on a plane-halo-extended
    block with base offsets matches the oracle on the owned core — the
    contract ShardedChain's plane routing relies on."""
    from pystencils_autodiff_tpu.ops.flatten import ShardSpec

    op = diffusion3d_op(dt=0.05, dtype="float64")
    names = ["kappa", "u"]
    k = 2
    H0 = k * 2  # fwd+bwd plane reach per step = 1+1
    n0, n1, n2 = 16, 10, 16
    state = {"u": jax.random.normal(jax.random.PRNGKey(3), (n0, n1, n2),
                                    jnp.float64),
             "kappa": 1.0 + 0.1 * jax.random.normal(
                 jax.random.PRNGKey(4), (n0, n1, n2), jnp.float64) ** 2}
    cots = {n: jax.random.normal(jax.random.PRNGKey(11 + i), (n0, n1, n2),
                                 jnp.float64)
            for i, n in enumerate(names)}
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, k, False, names)

    kern = make_plane_chain_vjp_fn(
        op, k, CARRY, (n0 // 2 + 2 * H0, n1, n2), jnp.float64, True,
        False, shard=ShardSpec(global_spatial=(n0, n1, n2),
                               sharded_dims=(0,)))
    for b in range(2):
        lo = b * (n0 // 2) - H0
        cut_s = {n: jnp.pad(state[n], ((H0, H0), (0, 0), (0, 0)),
                            mode="edge")[lo + H0:lo + H0 + n0 // 2 + 2 * H0]
                 for n in names}
        cut_c = {n: jnp.pad(cots[n], ((H0, H0), (0, 0), (0, 0)))[
                     lo + H0:lo + H0 + n0 // 2 + 2 * H0]
                 for n in names}
        st_b, ct_b = kern(cut_s, cut_c, jnp.array([lo, 0, 0], jnp.int32))
        for n in names:
            np.testing.assert_allclose(
                np.asarray(st_b[n][H0:H0 + n0 // 2]),
                np.asarray(ref_state[n][b * (n0 // 2):(b + 1) * (n0 // 2)]),
                rtol=RTOL, atol=ATOL)
            np.testing.assert_allclose(
                np.asarray(ct_b[n][H0:H0 + n0 // 2]),
                np.asarray(ref_cot[n][b * (n0 // 2):(b + 1) * (n0 // 2)]),
                rtol=RTOL, atol=ATOL)


def test_guard_routes_vmem_oom_to_lateral_chunks(monkeypatch, tmp_path,
                                                 caplog):
    """When the monolithic plane two-phase kernel OOMs scoped VMEM (fat
    planes — measured at diff3d 384³ k=2), the guard ladder falls through
    to the lateral-chunk variant BEFORE sequential recompute; cotangents
    stay exact."""
    import logging

    from pystencils_autodiff_tpu.ops import pallas_kernel, plane_adjoint

    monkeypatch.setenv("PYSTENCILS_ADTPU_GUARD_CACHE",
                       str(tmp_path / "guard.json"))
    monkeypatch.setattr(pallas_kernel, "_on_tpu", lambda: True)
    real = plane_adjoint.make_plane_chain_vjp_fn

    def fake(op, k, carry, spatial, dtype, interp, periodic, **kw):
        if kw.get("shard") is None:
            def boom(*a, **k2):
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: scoped vmem limit exceeded")
            return boom
        return real(op, k, carry, spatial, dtype, True, periodic,
                    **{k_: v for k_, v in kw.items()
                       if k_ != "vmem_limit_bytes"})

    import pystencils_autodiff_tpu.ops.adjoint_chain as ac
    monkeypatch.setattr(plane_adjoint, "make_plane_chain_vjp_fn", fake)

    op = diffusion3d_op(dt=0.05, dtype="float64")
    names = ["kappa", "u"]
    # k=4: the lat variants are only offered for k >= 4 (at shallow k the
    # fixed chunk plumbing loses to sequential recompute — measured r5)
    shape = (24, 20, 16)
    state = {"u": jax.random.normal(jax.random.PRNGKey(0), shape,
                                    jnp.float64),
             "kappa": 1.0 + 0.1 * jax.random.normal(
                 jax.random.PRNGKey(1), shape, jnp.float64) ** 2}
    cots = {n: jnp.ones(shape, jnp.float64) for n in names}
    ch = fused_chain_vjp(op, 4, CARRY, periodic=False)
    with caplog.at_level(logging.WARNING,
                         logger="pystencils_autodiff_tpu.guard"):
        st, ct = ch(dict(state), dict(cots))
    assert any("plane_two_phase failed" in r.message
               for r in caplog.records)
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, 4, False, names)
    for n in names:
        np.testing.assert_allclose(np.asarray(st[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(np.asarray(ct[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL)
