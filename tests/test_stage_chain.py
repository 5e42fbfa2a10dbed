"""Heterogeneous fused chains (ops.fused_stage_chain): k cycles of a
sequence of different ops in one kernel must match sequential per-op
stepping bit-exactly — state AND gradients (VERDICT round 1, next #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.advection import weno5_rk3_stages
from pystencils_autodiff_tpu.models.elastic import (elastic_stress_op,
                                                    elastic_velocity_op)
from pystencils_autodiff_tpu.ops.stage_chain import (fused_stage_chain,
                                                     stage_stepper)

RTOL, ATOL = 1e-12, 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def _sequential(stages, state, k, periodic):
    steps = [stage_stepper(op, carry, periodic=periodic)
             for op, carry in stages]

    def run(st):
        for _ in range(k):
            for step in steps:
                st = step(st)
        return {n: st[n] for n in state}

    return run


def elastic_stages(dtype="float64"):
    vel = elastic_velocity_op(dt=0.01, dtype=dtype)
    stress = elastic_stress_op(dt=0.01, dtype=dtype)
    return [
        (vel, {"vx": "vx_next", "vy": "vy_next"}),
        (stress, {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"}),
    ]


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 3])
def test_elastic_two_sweep_chain(k, periodic):
    """Velocity then stress sweep, k cycles fused: bit-exact state."""
    stages = elastic_stages()
    chain = fused_stage_chain(stages, k, periodic=periodic,
                              interpret=True, tile_rows=16)
    state = {n: rand(i, (48, 32))
             for i, n in enumerate(["vx", "vy", "sxx", "syy", "sxy"])}
    out = chain(state)
    ref = _sequential(stages, state, k, periodic)(state)
    for n in state:
        np.testing.assert_allclose(out[n], ref[n], rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")


@pytest.mark.parametrize("periodic", [True, False])
def test_elastic_chain_gradients_exact(periodic):
    """Cotangents through the fused chain == sequential jax.vjp."""
    stages = elastic_stages()
    k = 2
    chain = fused_stage_chain(stages, k, periodic=periodic,
                              interpret=True, tile_rows=16)
    state = {n: rand(10 + i, (32, 32))
             for i, n in enumerate(["vx", "vy", "sxx", "syy", "sxy"])}
    cots = {n: rand(20 + i, (32, 32))
            for i, n in enumerate(["vx", "vy", "sxx", "syy", "sxy"])}

    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, k, periodic)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in state:
        np.testing.assert_allclose(out[n], ref_out[n], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(grads[n], ref_grads[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"grad {n}")


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 2])
def test_weno5_rk3_chain(k, periodic):
    """Three SSP-RK3 WENO5 stages per cycle (nonlinear, ghost width 3):
    fused k cycles bit-exact vs sequential, including RK intermediates."""
    stages, names = weno5_rk3_stages(a=1.0, dt=0.3, dx=1.0, ndim=2)
    chain = fused_stage_chain(stages, k, periodic=periodic,
                              interpret=True, tile_rows=16)
    u0 = jnp.sin(2 * jnp.pi * jnp.arange(32) / 32)[None, :] * jnp.ones((16, 1))
    u0 = u0 + 0.1 * rand(0, (16, 32))
    state = {"u": u0, "u_s1": jnp.zeros_like(u0), "u_s2": jnp.zeros_like(u0)}
    out = chain(state)
    ref = _sequential(stages, state, k, periodic)(state)
    for n in names:
        np.testing.assert_allclose(out[n], ref[n], rtol=1e-11, atol=1e-11,
                                   err_msg=f"state {n}")


def test_weno5_rk3_gradient():
    """Gradient of a loss on the advected field w.r.t. the initial
    condition through the fused RK3 chain == sequential jax.grad."""
    stages, names = weno5_rk3_stages(a=1.0, dt=0.3, dx=1.0, ndim=2)
    k = 1
    chain = fused_stage_chain(stages, k, periodic=True,
                              interpret=True, tile_rows=16)
    u0 = 0.3 * rand(5, (16, 32))
    zeros = jnp.zeros_like(u0)

    def loss_fused(u):
        out = chain({"u": u, "u_s1": zeros, "u_s2": zeros})
        return jnp.sum(out["u"] ** 2)

    seq = _sequential(stages, {"u": u0, "u_s1": zeros, "u_s2": zeros},
                      k, True)

    def loss_seq(u):
        return jnp.sum(seq({"u": u, "u_s1": zeros, "u_s2": zeros})["u"] ** 2)

    g_f = jax.grad(loss_fused)(u0)
    g_s = jax.grad(loss_seq)(u0)
    np.testing.assert_allclose(g_f, g_s, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("shape", [(45, 33), (66, 66)])
def test_awkward_shapes_pad_on_bounded_domains(shape):
    """Row counts with no multiple-of-8 divisor run via row padding on the
    bounded (non-periodic) path — values AND gradients exact."""
    stages = elastic_stages()
    k = 2
    chain = fused_stage_chain(stages, k, periodic=False, interpret=True)
    names = ["vx", "vy", "sxx", "syy", "sxy"]
    state = {n: rand(i, shape) for i, n in enumerate(names)}
    cots = {n: rand(30 + i, shape) for i, n in enumerate(names)}
    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, k, False)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in names:
        np.testing.assert_allclose(out[n], ref_out[n], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(grads[n], ref_grads[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"grad {n}")


@pytest.mark.parametrize("shape", [(45, 33), (66, 66)])
def test_awkward_shape_periodic_wrap_extend(shape):
    """Periodic chains at non-divisible row counts run via the wrap-extend
    fallback (round-2 verdict weak #4) — values AND gradients exact."""
    stages = elastic_stages()
    k = 2
    chain = fused_stage_chain(stages, k, periodic=True, interpret=True)
    names = ["vx", "vy", "sxx", "syy", "sxy"]
    state = {n: rand(i, shape) for i, n in enumerate(names)}
    cots = {n: rand(30 + i, shape) for i, n in enumerate(names)}
    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, k, True)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in names:
        np.testing.assert_allclose(out[n], ref_out[n], rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(grads[n], ref_grads[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"grad {n}")


def test_awkward_shape_periodic_time_chain():
    """fused_time_chain reroutes awkward periodic shapes through the stage
    kernel's wrap-extend path."""
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
    from pystencils_autodiff_tpu.timeloop import make_time_stepper

    op = elastic_stages()[0][0]  # any 2D op; use the velocity sweep
    carry = {"vx": "vx_next", "vy": "vy_next"}
    k = 2
    chain = fused_time_chain(op, k, carry, periodic=True, interpret=True)
    step = make_time_stepper(op, carry, periodic=True)
    names = [f.name for f in op.forward_input_fields]
    state = {n: rand(i, (45, 33)) for i, n in enumerate(names)}
    out = chain(state)
    ref = dict(state)
    for _ in range(k):
        ref = step(ref)
    for n in names:
        np.testing.assert_allclose(out[n], ref[n], rtol=RTOL, atol=ATOL,
                                   err_msg=n)


def test_stage_chain_validation():
    stages = elastic_stages()
    with pytest.raises(ValueError, match="carry source"):
        fused_stage_chain([(stages[0][0], {"vx": "nope"})], 1, interpret=True)
    with pytest.raises(ValueError, match="carry target"):
        fused_stage_chain([(stages[0][0], {"zz": "vx_next"})], 1,
                          interpret=True)
    with pytest.raises(ValueError, match="no stages"):
        fused_stage_chain([], 1)


def _collision_stages():
    """Stage 1 writes an output field literally named like the state field
    ``mu`` but the carry map does NOT pick it up — sequential semantics say
    the state entry passes through unchanged (advisor finding, round 2)."""
    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields

    c, mu, c_next = fields("c, mu, c_next", 2)
    op1 = AutoDiffOp([Assignment(
        mu[0, 0], c[1, 0] + c[-1, 0] + c[0, 1] + c[0, -1] - 4 * c[0, 0])],
        op_name="mu_sweep")
    op2 = AutoDiffOp([Assignment(
        c_next[0, 0], c[0, 0] + 0.1 * mu[0, 0] + 0.01 * (mu[1, 0] + mu[-1, 0]))],
        op_name="c_sweep")
    return op1, op2


def test_unmapped_state_stage_output_name_collision():
    """A state field whose name equals a stage output must pass through
    unchanged when the carry does not map it — fused == sequential."""
    op1, op2 = _collision_stages()
    stages = [(op1, {}), (op2, {"c": "c_next"})]   # note: mu NOT carried
    chain = fused_stage_chain(stages, 2, periodic=False, interpret=True,
                              tile_rows=16)
    state = {"c": rand(0, (32, 32)), "mu": rand(1, (32, 32))}
    out = chain(state)
    ref = _sequential(stages, state, 2, False)(state)
    for n in ("c", "mu"):
        np.testing.assert_allclose(out[n], ref[n], rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
    # and the VJP (which recomputes sequentially) agrees with the forward
    cots = {"c": rand(2, (32, 32)), "mu": rand(3, (32, 32))}
    _, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    _, ref_pull = jax.vjp(_sequential(stages, state, 2, False), state)
    (ref_grads,) = ref_pull(cots)
    for n in ("c", "mu"):
        np.testing.assert_allclose(grads[n], ref_grads[n],
                                   rtol=RTOL, atol=ATOL, err_msg=f"grad {n}")


def test_intermediate_misorder_raises_at_build_time():
    """Declaring a field as a pure intermediate that is read before any
    carry writes it must raise (VERDICT round 2 weak #6 / next #10)."""
    op1, op2 = _collision_stages()
    good = [(op1, {"mu": "mu"}), (op2, {"c": "c_next"})]
    chain = fused_stage_chain(good, 1, interpret=True, intermediates=("mu",))
    assert "mu" not in chain.initial_read_fields
    assert "c" in chain.initial_read_fields

    # misordered: c-sweep (which reads mu) before the mu-producing sweep
    bad = [(op2, {"c": "c_next"}), (op1, {"mu": "mu"})]
    with pytest.raises(ValueError, match="misordered"):
        fused_stage_chain(bad, 1, interpret=True, intermediates=("mu",))
    with pytest.raises(ValueError, match="not state fields"):
        fused_stage_chain(good, 1, interpret=True, intermediates=("zz",))


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("k", [1, 2])
def test_fused_backward_elastic(k, periodic):
    """fused_bwd=True: ONE kernel for k cycles of value+gradient of the
    elastic 2-sweep cycle — cotangents bit-exact vs sequential jax.vjp
    (VERDICT round 2, next #3)."""
    stages = elastic_stages()
    chain = fused_stage_chain(stages, k, periodic=periodic, interpret=True,
                              tile_rows=16, fused_bwd=True)
    names = ["vx", "vy", "sxx", "syy", "sxy"]
    state = {n: rand(i, (48, 32)) for i, n in enumerate(names)}
    cots = {n: rand(60 + i, (48, 32)) for i, n in enumerate(names)}
    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, k, periodic)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in names:
        np.testing.assert_allclose(out[n], ref_out[n], rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(grads[n], ref_grads[n], rtol=RTOL,
                                   atol=ATOL, err_msg=f"grad {n}")


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_backward_nonlinear_two_sweep(periodic):
    """A nonlinear two-sweep cycle (cubic chemical potential feeding a
    diffusive update — Cahn–Hilliard-shaped): the fused backward must
    recompute primal stages in-kernel and still match sequential jax.vjp."""
    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields

    c, mu, mu_out, c_next = fields("c, mu, mu_out, c_next", 2)
    op1 = AutoDiffOp([Assignment(
        mu_out[0, 0],
        c[0, 0] ** 3 - c[0, 0]
        - 0.5 * (c[1, 0] + c[-1, 0] + c[0, 1] + c[0, -1] - 4 * c[0, 0]))],
        op_name="mu_sweep")
    op2 = AutoDiffOp([Assignment(
        c_next[0, 0],
        c[0, 0] + 0.05 * (mu[1, 0] + mu[-1, 0] + mu[0, 1] + mu[0, -1]
                          - 4 * mu[0, 0]))],
        op_name="ch_sweep")
    stages = [(op1, {"mu": "mu_out"}), (op2, {"c": "c_next"})]
    k = 2
    chain = fused_stage_chain(stages, k, periodic=periodic, interpret=True,
                              tile_rows=16, fused_bwd=True,
                              intermediates=("mu",))
    state = {"c": 0.3 * rand(0, (48, 32)), "mu": jnp.zeros((48, 32))}
    cots = {"c": rand(1, (48, 32)), "mu": rand(2, (48, 32))}
    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, k, periodic)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in ("c", "mu"):
        np.testing.assert_allclose(out[n], ref_out[n], rtol=RTOL, atol=ATOL,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(grads[n], ref_grads[n], rtol=RTOL,
                                   atol=ATOL, err_msg=f"grad {n}")


def test_fused_backward_weno5_rk3():
    """The heaviest cycle: 3 SSP-RK3 stages of WENO5 (reach 3, strongly
    nonlinear) — fused value+gradient matches sequential jax.vjp."""
    stages, names = weno5_rk3_stages(a=1.0, dt=0.2, dx=1.0, ndim=2)
    chain = fused_stage_chain(stages, 1, periodic=True, interpret=True,
                              tile_rows=24, fused_bwd=True)
    names = list(chain.input_names)
    state = {n: rand(i, (48, 32)) for i, n in enumerate(names)}
    cots = {n: rand(20 + i, (48, 32)) for i, n in enumerate(names)}
    out, pull = jax.vjp(chain, state)
    (grads,) = pull(cots)
    ref_run = _sequential(stages, state, 1, True)
    ref_out, ref_pull = jax.vjp(ref_run, state)
    (ref_grads,) = ref_pull(cots)
    for n in names:
        np.testing.assert_allclose(out[n], ref_out[n], rtol=1e-11, atol=1e-11,
                                   err_msg=f"state {n}")
        np.testing.assert_allclose(grads[n], ref_grads[n], rtol=1e-11,
                                   atol=1e-11, err_msg=f"grad {n}")
