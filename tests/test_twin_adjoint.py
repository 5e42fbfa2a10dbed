"""Twin-with-coefficient-accumulation fused adjoint chains
(ops/twin_adjoint.py): for state-linear ops with a differentiable
chain-invariant coefficient (the wave/FWI kernel), the k-step VJP must
match sequential jax.vjp bit-for-bit — state outputs, state cotangents,
AND the accumulated coefficient gradient (round 5; the kernel halves the
two-phase chain halo for the wave north-star row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.models import wave_step_op
from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
from pystencils_autodiff_tpu.ops.twin_adjoint import state_coeff_twin
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12
CARRY = {"u_curr": "u_next", "u_prev": "u_curr"}


def _oracle(op, carry, state, cots, k, names):
    step = make_time_stepper(op, carry, lowering="jnp", periodic=True)

    def run(st):
        for _ in range(k):
            st = step(st)
        return {n: st[n] for n in names}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    return ref_state, ref_cot


def _wave_state(n=32, key=0):
    u = jax.random.normal(jax.random.PRNGKey(key), (n, n), jnp.float64)
    c = 2.0 + 0.3 * jax.random.normal(jax.random.PRNGKey(key + 1), (n, n),
                                      jnp.float64) ** 2
    return {"u_curr": u, "u_prev": 0.9 * u, "c": c}


def test_wave_detection():
    op = wave_step_op(dt=0.01, dtype="float64")
    pieces = state_coeff_twin(op, CARRY)
    assert pieces is not None
    assert pieces["coeff_names"] == ["c"]
    assert pieces["saved_names"] == ["u_curr"]
    assert set(pieces["name_of"]) == {"u_curr", "u_prev"}


def test_nonlinear_state_op_rejected():
    """Truly state-nonlinear ops must not match (they need the general
    two-phase kernel)."""
    u, un = fields("u, u_next", 2)
    op = AutoDiffOp([Assignment(
        un[0, 0], u[0, 0] ** 2 + 0.1 * (u[1, 0] + u[-1, 0]))],
        op_name="nl2d_twinacc")
    assert state_coeff_twin(op, {"u": "u_next"}) is None


@pytest.mark.parametrize("k", [1, 2, 4])
def test_wave_fused_vjp_exact(k):
    """fused_chain_vjp for the FWI wave op (periodic) routes through the
    twin-accum kernel in interpret mode and matches sequential jax.vjp:
    state, wavefield cotangents, and the velocity-model gradient."""
    op = wave_step_op(dt=0.01, dtype="float64")
    names = ["c", "u_curr", "u_prev"]
    state = _wave_state()
    cots = {n: jax.random.normal(jax.random.PRNGKey(7 + i), (32, 32),
                                 jnp.float64)
            for i, n in enumerate(names)}
    ch = fused_chain_vjp(op, k, CARRY, periodic=True, interpret=True)
    st, ct = ch(dict(state), dict(cots))
    ref_state, ref_cot = _oracle(op, CARRY, state, cots, k, names)
    for n in names:
        np.testing.assert_allclose(np.asarray(st[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(np.asarray(ct[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


def test_wave_chain_under_grad():
    """End-to-end: jax.grad of a loss through fused_time_chain(fused_bwd)
    w.r.t. the velocity model equals the sequential gradient (the FWI
    use-case)."""
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain

    op = wave_step_op(dt=0.01, dtype="float64")
    k = 2
    state = _wave_state(24, key=3)
    chain = fused_time_chain(op, k, CARRY, periodic=True, interpret=True,
                             fused_bwd=True)
    step = make_time_stepper(op, CARRY, lowering="jnp", periodic=True)

    def loss_f(c, run):
        st = {**state, "c": c}
        out = run(st)
        return jnp.sum(jnp.sin(out["u_curr"])) + jnp.sum(out["u_prev"] ** 2)

    def seq_run(st):
        for _ in range(k):
            st = step(st)
        return st

    g_f = jax.grad(lambda c: loss_f(c, chain))(state["c"])
    g_s = jax.grad(lambda c: loss_f(c, seq_run))(state["c"])
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=RTOL, atol=ATOL)


def test_variable_coeff_diffusion_2d_exact():
    """A second op family: 2D variable-κ diffusion (nonlinear in κ via
    face averages is NOT required — plain center-κ form is state-linear
    with κ invariant)."""
    u, un, kap = fields("u, u_next, kappa", 2)
    op = AutoDiffOp([Assignment(
        un[0, 0], u[0, 0] + 0.1 * kap[0, 0] * (
            u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1] - 4 * u[0, 0]))],
        op_name="vkdiff2d_twinacc")
    carry = {"u": "u_next"}
    pieces = state_coeff_twin(op, carry)
    assert pieces is not None and pieces["coeff_names"] == ["kappa"]
    names = ["kappa", "u"]
    k = 3
    state = {"u": jax.random.normal(jax.random.PRNGKey(0), (24, 24),
                                    jnp.float64),
             "kappa": 1.0 + 0.1 * jax.random.normal(
                 jax.random.PRNGKey(1), (24, 24), jnp.float64) ** 2}
    cots = {n: jax.random.normal(jax.random.PRNGKey(5 + i), (24, 24),
                                 jnp.float64)
            for i, n in enumerate(names)}
    ch = fused_chain_vjp(op, k, carry, periodic=True, interpret=True)
    st, ct = ch(dict(state), dict(cots))
    ref_state, ref_cot = _oracle(op, carry, state, cots, k, names)
    for n in names:
        np.testing.assert_allclose(np.asarray(st[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(np.asarray(ct[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


# ---- 3D plane twin-accum (config #2's structure) ---------------------------

@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("k", [1, 2])
def test_diffusion3d_plane_twin_accum_exact(periodic, k):
    """Variable-κ 3D diffusion — state-linear with invariant κ — routes
    through the plane twin-accum kernel for BOTH periodic and bounded
    domains (bounded: adjoint-mapped reads ride the mask⊙cot view) and
    matches sequential jax.vjp exactly, κ-gradient included."""
    from pystencils_autodiff_tpu.models import diffusion3d_op

    op = diffusion3d_op(dt=0.05, dtype="float64")
    carry = {"u": "u_next"}
    assert state_coeff_twin(op, carry) is not None
    names = ["kappa", "u"]
    shape = (12, 10, 16)
    state = {"u": jax.random.normal(jax.random.PRNGKey(0), shape,
                                    jnp.float64),
             "kappa": 1.0 + 0.1 * jax.random.normal(
                 jax.random.PRNGKey(1), shape, jnp.float64) ** 2}
    cots = {n: jax.random.normal(jax.random.PRNGKey(9 + i), shape,
                                 jnp.float64)
            for i, n in enumerate(names)}
    ch = fused_chain_vjp(op, k, carry, periodic=periodic, interpret=True)
    st, ct = ch(dict(state), dict(cots))

    step = make_time_stepper(op, carry,
                             lowering="jnp" if periodic else "pallas",
                             periodic=periodic,
                             **({} if periodic else {"interpret": True}))

    def run(s0):
        for _ in range(k):
            s0 = step(s0)
        return {n: s0[n] for n in names}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    for n in names:
        np.testing.assert_allclose(np.asarray(st[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(np.asarray(ct[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


@pytest.mark.parametrize("periodic", [False, True])
def test_wave3d_like_plane_twin_accum(periodic):
    """A 3D wave-like op with pass-through carry (u_prev <- u_curr):
    the bounded mask must hit only adjoint-mapped cotangent reads, not
    the pass-through term — the mcot/cot view split."""
    u, up, c, un = fields("u3, up3, c3, un3", 3)
    lap = (u[1, 0, 0] + u[-1, 0, 0] + u[0, 1, 0] + u[0, -1, 0]
           + u[0, 0, 1] + u[0, 0, -1] - 6 * u[0, 0, 0])
    op = AutoDiffOp([Assignment(
        un[0, 0, 0], 2 * u[0, 0, 0] - up[0, 0, 0]
        + (0.01 * c[0, 0, 0]) ** 2 * lap)], op_name="wave3d_twinacc",
        time_constant_fields=[c])
    carry = {"u3": "un3", "up3": "u3"}
    pieces = state_coeff_twin(op, carry)
    assert pieces is not None and pieces["coeff_names"] == ["c3"]
    names = ["c3", "u3", "up3"]
    k = 2
    shape = (12, 10, 16)
    uv = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float64)
    state = {"u3": uv, "up3": 0.9 * uv,
             "c3": 2.0 + 0.3 * jax.random.normal(
                 jax.random.PRNGKey(3), shape, jnp.float64) ** 2}
    cots = {n: jax.random.normal(jax.random.PRNGKey(13 + i), shape,
                                 jnp.float64)
            for i, n in enumerate(names)}
    ch = fused_chain_vjp(op, k, carry, periodic=periodic, interpret=True)
    st, ct = ch(dict(state), dict(cots))
    step = make_time_stepper(op, carry,
                             lowering="jnp" if periodic else "pallas",
                             periodic=periodic,
                             **({} if periodic else {"interpret": True}))

    def run(s0):
        for _ in range(k):
            s0 = step(s0)
        return {n: s0[n] for n in names}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    for n in names:
        np.testing.assert_allclose(np.asarray(st[n]),
                                   np.asarray(ref_state[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(np.asarray(ct[n]),
                                   np.asarray(ref_cot[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


def test_heat3d_bounded_twin_exact():
    """Pure-linear bounded 3D (no coefficient): the 'bounded twin' —
    forward chain + masked transposed cotangent chain with separate
    halos — must match sequential jax.vjp exactly."""
    u, un = fields("uh3, uh3_next", 3)
    op = AutoDiffOp([Assignment(
        un[0, 0, 0], u[0, 0, 0] + 0.1 * (
            u[1, 0, 0] + u[-1, 0, 0] + u[0, 1, 0] + u[0, -1, 0]
            + u[0, 0, 1] + u[0, 0, -1] - 6 * u[0, 0, 0]))],
        op_name="heat3d_btwin")
    carry = {"uh3": "uh3_next"}
    pieces = state_coeff_twin(op, carry, allow_no_coeff=True)
    assert pieces is not None and pieces["grad_prog"] is None
    k = 2
    shape = (12, 10, 16)
    state = {"uh3": jax.random.normal(jax.random.PRNGKey(0), shape,
                                      jnp.float64)}
    cots = {"uh3": jax.random.normal(jax.random.PRNGKey(1), shape,
                                     jnp.float64)}
    ch = fused_chain_vjp(op, k, carry, periodic=False, interpret=True)
    st, ct = ch(dict(state), dict(cots))
    step = make_time_stepper(op, carry, lowering="pallas", periodic=False,
                             interpret=True)

    def run(s0):
        for _ in range(k):
            s0 = step(s0)
        return {"uh3": s0["uh3"]}

    ref_state, pull = jax.vjp(run, state)
    (ref_cot,) = pull(cots)
    np.testing.assert_allclose(np.asarray(st["uh3"]),
                               np.asarray(ref_state["uh3"]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ct["uh3"]),
                               np.asarray(ref_cot["uh3"]),
                               rtol=RTOL, atol=ATOL)
