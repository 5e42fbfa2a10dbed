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
