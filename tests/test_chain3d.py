"""3D fused time/adjoint chains (flattened-row kernels) must match
sequential stepping / sequential jax.vjp — VERDICT round-1 item #2
(BASELINE config #2 through the temporal-blocking path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.diffusion import diffusion3d_op
from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12
SHAPE = (12, 10, 16)
CARRY = {"u": "u_next"}


def _state():
    u = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float64)
    kap = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), SHAPE,
                                        jnp.float64) ** 2
    return {"u": u, "kappa": kap}


def _seq(op, state, k):
    step = make_time_stepper(op, CARRY, lowering="pallas", interpret=True)
    for _ in range(k):
        state = step(state)
    return {n: state[n] for n in ("u", "kappa")}


@pytest.mark.parametrize("k", [2, 3])
def test_diffusion3d_forward_chain(k):
    op = diffusion3d_op(dt=0.05, dtype="float64")
    chain = fused_time_chain(op, k, CARRY, periodic=False, interpret=True)
    state = _state()
    out = chain(state)
    ref = _seq(op, state, k)
    for n in ref:
        np.testing.assert_allclose(out[n], ref[n], rtol=RTOL, atol=ATOL,
                                   err_msg=n)


@pytest.mark.parametrize("k", [1, 2])
def test_diffusion3d_adjoint_chain(k):
    op = diffusion3d_op(dt=0.05, dtype="float64")
    chain = fused_chain_vjp(op, k, CARRY, periodic=False, interpret=True)
    state = _state()
    cots = {n: jax.random.normal(jax.random.PRNGKey(7 + i), SHAPE,
                                 jnp.float64)
            for i, n in enumerate(state)}
    new_state, cot0 = chain(state, cots)

    def run(st):
        return _seq(op, st, k)

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


def test_diffusion3d_chain_fused_bwd_grad():
    """End-to-end: jax.grad through fused_time_chain(fused_bwd=True) in 3D
    equals jax.grad through sequential stepping."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    k = 2
    chain = fused_time_chain(op, k, CARRY, periodic=False, interpret=True,
                             fused_bwd=True)
    state = _state()
    tgt = jax.random.normal(jax.random.PRNGKey(9), SHAPE, jnp.float64)

    def loss_fused(kap):
        out = chain({"u": state["u"], "kappa": kap})
        return jnp.sum((out["u"] - tgt) ** 2)

    def loss_seq(kap):
        out = _seq(op, {"u": state["u"], "kappa": kap}, k)
        return jnp.sum((out["u"] - tgt) ** 2)

    g_fused = jax.grad(loss_fused)(state["kappa"])
    g_seq = jax.grad(loss_seq)(state["kappa"])
    np.testing.assert_allclose(g_fused, g_seq, rtol=1e-11, atol=1e-11)


def test_periodic_3d_nonlinear_two_phase():
    """Periodic 3D NONLINEAR fused value+gradient chains run through the
    plane-blocked two-phase kernel (round-3 this raised: the flattened
    kernel's periodic wrap is 2D-only)."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    k = 2
    chain = fused_chain_vjp(op, k, CARRY, periodic=True, interpret=True)
    state = _state()
    cots = {n: jax.random.normal(jax.random.PRNGKey(7 + i), SHAPE,
                                 jnp.float64)
            for i, n in enumerate(state)}
    new_state, cot0 = chain(state, cots)

    step = make_time_stepper(op, CARRY, lowering="jnp", periodic=True)

    def run(st):
        for _ in range(k):
            st = step(st)
        return {n: st[n] for n in ("u", "kappa")}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=1e-11, atol=1e-11,
                                   err_msg=f"cot {n}")


def test_periodic_4d_still_raises():
    # 4D+ periodic nonlinear ops have neither kernel (flattened wrap is
    # 2D-only, the plane kernel is 3D-only)
    import sympy as sp

    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, Field

    u = Field("u", 4, dtype="float64")
    out = Field("u_next", 4, dtype="float64")
    rhs = u.center + 0.1 * (u.neighbor(0, 1) * u.center - u.neighbor(3, -1))
    op = AutoDiffOp([Assignment(out.center, rhs)], op_name="nl4d")
    with pytest.raises(ValueError, match="2D"):
        fused_chain_vjp(op, 2, {"u": "u_next"}, periodic=True,
                        interpret=True)


def test_aniso27_periodic_3d_linear_twin_chain():
    """Linear 3D ops DO get periodic fused value+gradient chains: the
    twin-chain path ((A^T)^k as a second forward chain) rides the
    plane-blocked geometry — VERDICT round-2 next #2 (config #4 chain
    row).  27-point corner offsets exercise lateral shifts on shifted
    planes."""
    from pystencils_autodiff_tpu.models import anisotropic27_op

    op = anisotropic27_op(dtype="float64")
    k, carry = 2, {"u": "y"}
    shape = (12, 10, 16)
    u = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float64)
    ct = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float64)

    step = make_time_stepper(op, carry, lowering="jnp", periodic=True)

    def seqk(x):
        s = {"u": x}
        for _ in range(k):
            s = step(s)
        return s["u"]

    ref = seqk(u)
    _, pull = jax.vjp(seqk, u)
    (ref_ct,) = pull(ct)

    chain = fused_chain_vjp(op, k, carry, periodic=True, interpret=True)
    st, cot0 = chain({"u": u}, {"u": ct})
    np.testing.assert_allclose(st["u"], ref, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["u"], ref_ct, rtol=1e-11, atol=1e-11)


def test_diffusion3d_periodic_plane_chain():
    """Plane-blocked 3D chains support FULL periodic wrap (all three dims)
    — the flattened-row geometry's periodic mode is 2D-only."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    k = 2
    chain = fused_time_chain(op, k, CARRY, periodic=True, interpret=True)
    state = _state()
    out = chain(state)

    step = make_time_stepper(op, CARRY, lowering="jnp", periodic=True)
    ref = dict(state)
    for _ in range(k):
        ref = step(ref)
    np.testing.assert_allclose(out["u"], ref["u"], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(out["kappa"], ref["kappa"],
                               rtol=RTOL, atol=ATOL)


def test_plane_chain_uneven_plane_tile():
    """Plane counts that aren't multiples of 8 tile fine (the plane axis
    has no alignment requirement)."""
    op = diffusion3d_op(dt=0.05, dtype="float64")
    chain = fused_time_chain(op, 2, CARRY, periodic=False, interpret=True,
                             tile_rows=7)  # 7 planes/block of the 14 below
    u = jax.random.normal(jax.random.PRNGKey(3), (14, 10, 16), jnp.float64)
    kap = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (14, 10, 16),
                                        jnp.float64) ** 2
    state = {"u": u, "kappa": kap}
    out = chain(state)
    ref = _seq(op, state, 2)
    np.testing.assert_allclose(out["u"], ref["u"], rtol=RTOL, atol=ATOL)
