"""Fused adjoint chains: k steps of value+gradient in one kernel must match
sequential jax.vjp exactly (periodic domains)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.models.wave import wave_step_op
from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def _seq_vjp(op, carry, state, cots, k, periodic=True):
    step = make_time_stepper(op, carry, periodic=periodic)
    names = list(state)

    def run(st):
        for _ in range(k):
            st = step(st)
        return {n: st[n] for n in names}

    out, pull = jax.vjp(run, state)
    (grads,) = pull(cots)
    return out, grads


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 3])
def test_heat_adjoint_chain(k, periodic):
    op = heat_step_op(dt=0.1, kappa_field=True, dtype="float64")
    carry = {"u": "u_next"}
    chain = fused_chain_vjp(op, k, carry, periodic=periodic,
                            interpret=True, tile_rows=16)
    state = {"u": rand(0, (48, 32)), "kappa": 1.0 + 0.1 * rand(1, (48, 32)) ** 2}
    cots = {"u": rand(2, (48, 32)), "kappa": rand(3, (48, 32))}

    new_state, cot0 = chain(state, cots)
    ref_state, ref_cot = _seq_vjp(op, carry, state, cots, k, periodic)
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 4])
def test_wave_adjoint_chain(k, periodic):
    """Leapfrog: two carried fields + time-constant c — the cotangent
    recursion must accumulate c's gradient across the fused stages."""
    op = wave_step_op(dt=0.2, dtype="float64")
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = fused_chain_vjp(op, k, carry, periodic=periodic,
                            interpret=True, tile_rows=16)
    u0 = rand(4, (48, 32)) * 0.1
    state = {"u_curr": u0, "u_prev": rand(5, (48, 32)) * 0.1,
             "c": 2.0 + 0.1 * rand(6, (48, 32)) ** 2}
    cots = {n: rand(10 + i, (48, 32)) for i, n in enumerate(state)}

    new_state, cot0 = chain(state, cots)
    ref_state, ref_cot = _seq_vjp(op, carry, state, cots, k, periodic)
    for n in state:
        np.testing.assert_allclose(new_state[n], ref_state[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(cot0[n], ref_cot[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"cot {n}")


@pytest.mark.parametrize("k,periodic", [
    pytest.param(2, True, marks=pytest.mark.slow), (1, False)])
def test_lbm_adjoint_chain(k, periodic):
    """Differentiable LBM temporal blocking: 9-component planes through the
    fused value+gradient kernel.  (Bounded-domain canary always runs; the
    periodic variant is slow-marked — interpret-mode D2Q9 adjoints are the
    most expensive kernels in the suite.)"""
    from pystencils_autodiff_tpu.models.lbm import d2q9_bgk_op

    op = d2q9_bgk_op(omega=1.5)
    carry = {"f": "f_out"}
    chain = fused_chain_vjp(op, k, carry, periodic=periodic,
                            interpret=True, tile_rows=16)
    f0 = 0.1 + 0.01 * jax.random.uniform(jax.random.PRNGKey(8), (16, 16, 9),
                                         dtype=jnp.float64)
    cots = {"f": rand(9, (16, 16, 9))}
    new_state, cot0 = chain({"f": f0}, cots)
    ref_state, ref_cot = _seq_vjp(op, carry, {"f": f0}, cots, k, periodic)
    np.testing.assert_allclose(new_state["f"], ref_state["f"],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["f"], ref_cot["f"],
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 4])
def test_linear_op_fast_path(k, periodic):
    """Constant-coefficient heat: the backward program reads only adjoint
    fields, so the chain takes the rolling-stage (linear) fast path — must
    stay exact vs sequential jax.vjp."""
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    carry = {"u": "u_next"}
    chain = fused_chain_vjp(op, k, carry, periodic=periodic,
                            interpret=True, tile_rows=16)
    state = {"u": rand(20, (48, 32))}
    cots = {"u": rand(21, (48, 32))}
    new_state, cot0 = chain(state, cots)
    ref_state, ref_cot = _seq_vjp(op, carry, state, cots, k, periodic)
    np.testing.assert_allclose(new_state["u"], ref_state["u"],
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["u"], ref_cot["u"],
                               rtol=RTOL, atol=ATOL)
