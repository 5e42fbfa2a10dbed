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


def test_wave_frozen_c_takes_twin_path_and_matches_sequential():
    """wave with grad_c=False is linear IN STATE despite the variable
    velocity coefficient: transposed_linear_op now qualifies
    constant_fields coefficients, so the periodic value+gradient chain
    runs as twin forward chains (the coefficient arrays ride the
    cotangent chain unchanged).  Values and state cotangents must match
    sequential jax.vjp; the frozen coefficient gets zero cotangent."""
    from pystencils_autodiff_tpu.ops.adjoint_chain import transposed_linear_op

    op = wave_step_op(dt=0.02, dtype="float64", grad_c=False)
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    assert transposed_linear_op(op, carry) is not None
    # the default (grad_c=True, time-constant c) must NOT qualify
    op_fwi = wave_step_op(dt=0.02, dtype="float64")
    assert transposed_linear_op(op_fwi, carry) is None

    k = 3
    shape = (24, 16)
    c = 1.0 + 0.3 * jax.random.uniform(jax.random.PRNGKey(5), shape,
                                       jnp.float64)
    state = {"u_curr": rand(0, shape), "u_prev": rand(1, shape), "c": c}
    cots = {"u_curr": rand(2, shape), "u_prev": rand(3, shape)}

    step = make_time_stepper(op, carry, periodic=True)

    def run(st2):
        st = {**st2, "c": c}
        for _ in range(k):
            st = step(st)
        return {"u_curr": st["u_curr"], "u_prev": st["u_prev"]}

    ref_out, pull = jax.vjp(run, {n: state[n] for n in cots})
    (ref_ct,) = pull(cots)

    chain = fused_chain_vjp(op, k, carry, periodic=True, interpret=True)
    st, cot0 = chain(state, cots)
    for n in ("u_curr", "u_prev"):
        np.testing.assert_allclose(st[n], ref_out[n], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(cot0[n], ref_ct[n], rtol=1e-11,
                                   atol=1e-11, err_msg=n)
    np.testing.assert_array_equal(cot0["c"], jnp.zeros_like(c))


def test_diffusion3d_frozen_kappa_periodic_twin_chain():
    """3D variable-κ diffusion with grad_kappa=False: linear in u, so the
    PERIODIC 3D value+gradient chain is available through the twin path
    (the two-phase kernel is 2D-only) — closes the BASELINE config #2
    periodic-adjoint gap for frozen-coefficient runs."""
    from pystencils_autodiff_tpu.models.diffusion import diffusion3d_op

    op = diffusion3d_op(dt=0.05, dtype="float64", grad_kappa=False)
    carry = {"u": "u_next"}
    k = 2
    shape = (8, 10, 16)
    kap = 1.0 + 0.2 * jax.random.uniform(jax.random.PRNGKey(7), shape,
                                         jnp.float64)
    u = rand(8, shape)
    ct = rand(9, shape)

    step = make_time_stepper(op, carry, periodic=True)

    def run(x):
        st = {"u": x, "kappa": kap}
        for _ in range(k):
            st = step(st)
        return st["u"]

    ref, pull = jax.vjp(run, u)
    (ref_ct,) = pull(ct)

    chain = fused_chain_vjp(op, k, carry, periodic=True, interpret=True)
    st, cot0 = chain({"u": u, "kappa": kap}, {"u": ct})
    np.testing.assert_allclose(st["u"], ref, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(cot0["u"], ref_ct, rtol=1e-11, atol=1e-11)
    np.testing.assert_array_equal(cot0["kappa"], jnp.zeros_like(kap))


def test_frozen_coefficient_passthrough_cotangent():
    """The chain's forward RETURNS the frozen coefficient unchanged, so
    its VJP must keep the identity pass-through term — the twin path once
    returned zeros (code-review confirmed repro: grad of sum(chain['c'])
    was 0.0 fused vs 1.0 sequential)."""
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain

    op = wave_step_op(dt=0.02, dtype="float64", grad_c=False)
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    shape = (12, 16)
    state = {"u_curr": rand(0, shape), "u_prev": rand(1, shape),
             "c": 1.0 + 0.1 * jax.random.uniform(jax.random.PRNGKey(2),
                                                 shape, jnp.float64)}

    for fused_bwd in (True, False):
        chain = fused_time_chain(op, 2, carry, periodic=True,
                                 interpret=True, fused_bwd=fused_bwd)
        g = jax.grad(lambda s: jnp.sum(chain(s)["c"]))(state)
        np.testing.assert_array_equal(
            g["c"], jnp.ones(shape, jnp.float64),
            err_msg=f"fused_bwd={fused_bwd}")
