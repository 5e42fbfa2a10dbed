"""Temporal blocking tests: the fused k-step kernel must match k sequential
steps exactly (values and gradients), periodic and ghost-frame semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.models.wave import wave_step_op
from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("k", [1, 3])
def test_fused_heat_chain_matches_sequential(periodic, k):
    op = heat_step_op(dt=0.1, dtype="float64")
    chain = fused_time_chain(op, k, {"u": "u_next"}, periodic=periodic,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(op, {"u": "u_next"}, periodic=periodic)
    u0 = rand(0, (48, 32))
    state = {"u": u0}
    out_fused = chain(state)["u"]
    seq = dict(state)
    for _ in range(k):
        seq = step(seq)
    np.testing.assert_allclose(out_fused, seq["u"], rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("periodic", [False, True])
def test_fused_wave_chain_with_carried_constant(periodic):
    """Leapfrog: two carried state fields + a constant field, k=4."""
    op = wave_step_op(dt=0.2, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = fused_time_chain(op, 4, carry, periodic=periodic,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(op, carry, periodic=periodic)
    u0 = rand(1, (48, 32)) * 0.1
    c = 1.0 + 0.1 * rand(2, (48, 32)) ** 2
    state = {"u_curr": u0, "u_prev": u0, "c": c}
    fused = chain(state)
    seq = dict(state)
    for _ in range(4):
        seq = step(seq)
    for n in ("u_curr", "u_prev", "c"):
        np.testing.assert_allclose(fused[n], seq[n], rtol=RTOL, atol=ATOL,
                                   err_msg=n)


def test_fused_chain_gradients_exact():
    """Grad through the fused chain (recompute-based bwd) == sequential."""
    op = wave_step_op(dt=0.2, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = fused_time_chain(op, 3, carry, periodic=True,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(op, carry, periodic=True)
    u0 = rand(3, (32, 32)) * 0.1
    c0 = 2.0 + jnp.zeros((32, 32), jnp.float64)

    def loss_fused(c):
        out = chain({"u_curr": u0, "u_prev": u0, "c": c})
        return jnp.sum(out["u_curr"] ** 2)

    def loss_seq(c):
        s = {"u_curr": u0, "u_prev": u0, "c": c}
        for _ in range(3):
            s = step(s)
        return jnp.sum(s["u_curr"] ** 2)

    np.testing.assert_allclose(loss_fused(c0), loss_seq(c0),
                               rtol=RTOL, atol=ATOL)
    g_f = jax.grad(loss_fused)(c0)
    g_s = jax.grad(loss_seq)(c0)
    np.testing.assert_allclose(g_f, g_s, rtol=RTOL, atol=ATOL)


def test_fused_chain_in_scan():
    """The fused chain composes with lax.scan for long loops."""
    op = heat_step_op(dt=0.05, dtype="float64")
    chain = fused_time_chain(op, 2, {"u": "u_next"}, periodic=True,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(op, {"u": "u_next"}, periodic=True)
    u0 = rand(4, (32, 32))

    @jax.jit
    def run_fused(u):
        def body(s, _):
            return chain(s), None
        return jax.lax.scan(body, {"u": u}, None, length=5)[0]["u"]

    seq = {"u": u0}
    for _ in range(10):
        seq = step(seq)
    np.testing.assert_allclose(run_fused(u0), seq["u"], rtol=RTOL, atol=ATOL)


def test_fused_lbm_chain():
    """Temporal blocking over the 9-component LBM distribution field."""
    from pystencils_autodiff_tpu.models.lbm import d2q9_bgk_op

    op = d2q9_bgk_op(omega=1.5)
    chain = fused_time_chain(op, 3, {"f": "f_out"}, periodic=True,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(op, {"f": "f_out"}, periodic=True)
    f0 = 0.1 + 0.01 * jax.random.uniform(jax.random.PRNGKey(5), (32, 32, 9),
                                         dtype=jnp.float64)
    fused = chain({"f": f0})["f"]
    seq = {"f": f0}
    for _ in range(3):
        seq = step(seq)
    np.testing.assert_allclose(fused, seq["f"], rtol=RTOL, atol=ATOL)
    # mass conservation through the fused chain
    np.testing.assert_allclose(float(jnp.sum(fused)), float(jnp.sum(f0)),
                               rtol=1e-12)


def test_wave_simulate_fused_k():
    from pystencils_autodiff_tpu.models.wave import wave_simulate

    c = 2.0 + jnp.zeros((32, 32), jnp.float64)
    u0 = jnp.zeros((32, 32), jnp.float64).at[16, 16].set(1.0)
    seq = wave_simulate(c, u0, 8, dt=0.2, checkpoint="none",
                        lowering="pallas", interpret=True)
    fused = wave_simulate(c, u0, 8, dt=0.2, checkpoint="none",
                          fused_k=4, interpret=True, tile_rows=16)
    np.testing.assert_allclose(fused["u_curr"], seq["u_curr"],
                               rtol=RTOL, atol=ATOL)
    with pytest.raises(ValueError):
        wave_simulate(c, u0, 7, fused_k=4)
    with pytest.raises(ValueError):
        wave_simulate(c, u0, 8, fused_k=4, record=lambda s: s["u_curr"][0])


def test_fused_op_composes_with_time_chain():
    """Sweep fusion (Simulation.fused_op) + temporal blocking compose: the
    elastic velocity→stress pair fuses to one op, then k steps of it fuse
    into one kernel."""
    from pystencils_autodiff_tpu.models.elastic import (
        elastic_stress_op, elastic_velocity_op)
    from pystencils_autodiff_tpu.simulation import Simulation

    sim = Simulation()
    sim.add_sweep(elastic_velocity_op(dtype="float64"),
                  {"vx": "vx_next", "vy": "vy_next"})
    sim.add_sweep(elastic_stress_op(dtype="float64"),
                  {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"})
    fused = sim.fused_op("elastic_step")
    carry = fused._fused_carry

    chain = fused_time_chain(fused, 3, carry, periodic=True,
                             interpret=True, tile_rows=16)
    step = make_time_stepper(fused, carry, periodic=True)

    state = {n: rand(90 + i, (32, 32)) * 0.01
             for i, n in enumerate(["vx", "vy", "sxx", "syy", "sxy"])}
    out_fused = chain(state)
    seq = dict(state)
    for _ in range(3):
        seq = step(seq)
    for n in state:
        np.testing.assert_allclose(out_fused[n], seq[n], rtol=RTOL, atol=ATOL,
                                   err_msg=n)


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_bwd_chain_gradients(periodic):
    """fused_bwd=True: BOTH directions temporally blocked, grads exact."""
    op = wave_step_op(dt=0.2, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = fused_time_chain(op, 3, carry, periodic=periodic,
                             interpret=True, tile_rows=16, fused_bwd=True)
    step = make_time_stepper(op, carry, periodic=periodic)
    u0 = rand(30, (32, 32)) * 0.1
    c0 = 2.0 + 0.1 * rand(31, (32, 32)) ** 2

    def loss_fused(c):
        out = chain({"u_curr": u0, "u_prev": u0, "c": c})
        return jnp.sum(out["u_curr"] ** 2) + jnp.sum(jnp.sin(out["u_prev"]))

    def loss_seq(c):
        s = {"u_curr": u0, "u_prev": u0, "c": c}
        for _ in range(3):
            s = step(s)
        return jnp.sum(s["u_curr"] ** 2) + jnp.sum(jnp.sin(s["u_prev"]))

    np.testing.assert_allclose(loss_fused(c0), loss_seq(c0),
                               rtol=RTOL, atol=ATOL)
    g_f = jax.grad(loss_fused)(c0)
    g_s = jax.grad(loss_seq)(c0)
    np.testing.assert_allclose(g_f, g_s, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("k", [1, 3])
def test_roll_reads_heat_matches_sequential(periodic, k):
    """reads='roll': every in-kernel access is a cyclic sublane roll of
    the full extended tile instead of a misaligned row slice (wrapped
    rows land outside the shrinking validity band).  Values must match
    sequential stepping; tolerance is a few ulp because XLA may fuse /
    contract the two read graphs differently."""
    op = heat_step_op(dt=0.1, dtype="float64")
    chain = fused_time_chain(op, k, {"u": "u_next"}, periodic=periodic,
                             interpret=True, tile_rows=16, reads="roll")
    step = make_time_stepper(op, {"u": "u_next"}, periodic=periodic)
    u0 = rand(40, (48, 32))
    out = chain({"u": u0})["u"]
    seq = {"u": u0}
    for _ in range(k):
        seq = step(seq)
    np.testing.assert_allclose(out, seq["u"], rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("periodic", [False, True])
def test_roll_reads_wave_and_gradients(periodic):
    """roll mode through multi-field carries + grads (recompute bwd)."""
    op = wave_step_op(dt=0.2, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = fused_time_chain(op, 4, carry, periodic=periodic,
                             interpret=True, tile_rows=16, reads="roll")
    step = make_time_stepper(op, carry, periodic=periodic)
    u0 = rand(41, (48, 32)) * 0.1
    c = 1.0 + 0.1 * rand(42, (48, 32)) ** 2

    def loss_fused(cv):
        out = chain({"u_curr": u0, "u_prev": u0, "c": cv})
        return jnp.sum(out["u_curr"] ** 2)

    def loss_seq(cv):
        s = {"u_curr": u0, "u_prev": u0, "c": cv}
        for _ in range(4):
            s = step(s)
        return jnp.sum(s["u_curr"] ** 2)

    np.testing.assert_allclose(loss_fused(c), loss_seq(c),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(jax.grad(loss_fused)(c),
                               jax.grad(loss_seq)(c),
                               rtol=1e-11, atol=1e-11)


def test_roll_reads_hoisted_coefficients():
    """roll mode composes with chain-invariant coefficient hoisting
    (variable-kappa 2D diffusion: face averages hoisted once per tile)."""
    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields

    u2, un, kap = fields("u2, un, kap", 2)
    op = AutoDiffOp([Assignment(un[0, 0], u2[0, 0] + 0.1 * (
        (kap[1, 0] + kap[0, 0]) * (u2[1, 0] - u2[0, 0])
        - (kap[0, 0] + kap[-1, 0]) * (u2[0, 0] - u2[-1, 0])
        + (kap[0, 1] + kap[0, 0]) * (u2[0, 1] - u2[0, 0])
        - (kap[0, 0] + kap[0, -1]) * (u2[0, 0] - u2[0, -1])))],
        op_name="vkdiff2d_rolltest", constant_fields=[kap])
    u0 = rand(43, (48, 32))
    kv = 1.0 + 0.1 * rand(44, (48, 32)) ** 2
    for periodic in (False, True):
        a = fused_time_chain(op, 4, {"u2": "un"}, periodic=periodic,
                             interpret=True, tile_rows=16)(
            {"u2": u0, "kap": kv})["u2"]
        b = fused_time_chain(op, 4, {"u2": "un"}, periodic=periodic,
                             interpret=True, tile_rows=16, reads="roll")(
            {"u2": u0, "kap": kv})["u2"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-13, atol=1e-13)


def test_roll_reads_twin_vjp_matches_slice():
    """reads='roll' threads through the linear twin-chain vjp path."""
    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp

    op = wave_step_op(grad_c=False, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    u0 = rand(45, (48, 32)) * 0.1
    c = 2.0 + jnp.zeros((48, 32), jnp.float64)
    st = {"u_curr": u0, "u_prev": u0 * 0.5, "c": c}
    ct = {"u_curr": jnp.ones_like(u0), "u_prev": jnp.ones_like(u0),
          "c": jnp.zeros_like(c)}
    ga = fused_chain_vjp(op, 4, carry, periodic=True, interpret=True,
                         tile_rows=16)(st, ct)
    gb = fused_chain_vjp(op, 4, carry, periodic=True, interpret=True,
                         tile_rows=16, reads="roll")(st, ct)
    for n in ("u_curr", "u_prev"):
        np.testing.assert_allclose(np.asarray(ga[0][n]),
                                   np.asarray(gb[0][n]),
                                   rtol=1e-13, atol=1e-13, err_msg=n)
        np.testing.assert_allclose(np.asarray(ga[1][n]),
                                   np.asarray(gb[1][n]),
                                   rtol=1e-13, atol=1e-13, err_msg=n)
