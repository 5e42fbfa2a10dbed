"""Time loop, boundary handling, and checkpointed-adjoint tests
(BASELINE config #3 capabilities; reference parity for
time_constant_fields accumulation, SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.boundary import BoundaryHandling, dirichlet, neumann, periodic
from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.models.wave import fwi_gradient, wave_simulate
from pystencils_autodiff_tpu.timeloop import make_time_stepper, run_timeloop

RTOL, ATOL = 1e-11, 1e-11


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def test_boundary_fills():
    g = ((1, 1), (2, 1))
    a = jnp.arange(5.0 * 6).reshape(5, 6)
    d = dirichlet(a, g, 7.0)
    assert float(d[0, 3]) == 7.0 and float(d[2, 0]) == 7.0 and float(d[2, 2]) != 7.0
    n = neumann(a, g)
    assert float(n[0, 3]) == float(a[1, 3])
    assert float(n[2, 0]) == float(a[2, 2]) and float(n[2, 1]) == float(a[2, 2])
    p = periodic(a, ((1, 1), (0, 0)))
    assert float(p[0, 3]) == float(a[3, 3]) and float(p[4, 3]) == float(a[1, 3])


def test_heat_timeloop_matches_manual():
    op = heat_step_op(dt=0.1, dtype="float64")
    step = make_time_stepper(op, {"u": "u_next"})
    u0 = rand(0, (16, 16))
    final = run_timeloop(step, {"u": u0}, 5)["u"]

    f = op.jax_function()
    u = u0
    for _ in range(5):
        u = f(u)
    np.testing.assert_allclose(final, u, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("checkpoint", ["none", "step", "sqrt"])
def test_checkpoint_schedules_same_value_and_grad(checkpoint):
    """All checkpointing schedules must give identical values+grads."""
    op = heat_step_op(dt=0.05, kappa_field=True, dtype="float64")
    step = make_time_stepper(op, {"u": "u_next"})
    u0, k0 = rand(1, (12, 12)), 1.0 + 0.1 * rand(2, (12, 12)) ** 2

    def loss(k):
        out = run_timeloop(step, {"u": u0, "kappa": k}, 7,
                           checkpoint=checkpoint)
        return jnp.sum(out["u"] ** 2)

    val, grad = jax.value_and_grad(loss)(k0)
    key = "ckpt_results"
    store = test_checkpoint_schedules_same_value_and_grad.__dict__.setdefault(key, {})
    store[checkpoint] = (val, grad)
    if "none" in store and checkpoint != "none":
        v0, g0 = store["none"]
        np.testing.assert_allclose(val, v0, rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(grad, g0, rtol=RTOL, atol=ATOL)


def test_time_constant_gradient_accumulates_across_steps():
    """∂loss/∂κ through an n-step loop = sum of per-step contributions —
    the reference's time_constant_fields semantics via scan transpose."""
    op = heat_step_op(dt=0.05, kappa_field=True, dtype="float64")
    step = make_time_stepper(op, {"u": "u_next"})
    u0, k0 = rand(3, (10, 10)), jnp.ones((10, 10), jnp.float64)

    def loss_n(k, n):
        return jnp.sum(run_timeloop(step, {"u": u0, "kappa": k}, n)["u"] ** 2)

    g1 = jax.grad(lambda k: loss_n(k, 1))(k0)
    g3 = jax.grad(lambda k: loss_n(k, 3))(k0)
    assert float(jnp.abs(g3).sum()) > float(jnp.abs(g1).sum())
    # finite-difference check of the 3-step gradient at one interior cell
    eps = 1e-6
    kp = k0.at[5, 5].add(eps)
    km = k0.at[5, 5].add(-eps)
    fd = (loss_n(kp, 3) - loss_n(km, 3)) / (2 * eps)
    np.testing.assert_allclose(float(g3[5, 5]), float(fd), rtol=1e-5)


def test_boundary_in_timeloop():
    op = heat_step_op(dt=0.1, dtype="float64")
    bh = BoundaryHandling(op, {"u": "neumann"})
    step = make_time_stepper(op, {"u": "u_next"}, boundary=bh)
    u0 = rand(4, (12, 12))
    out = run_timeloop(step, {"u": u0}, 3)["u"]
    assert out.shape == (12, 12)
    assert not bool(jnp.isnan(out).any())


def test_record_seismogram_shapes():
    c = 2.0 + jnp.zeros((20, 20), jnp.float64)
    u0 = jnp.zeros((20, 20), jnp.float64).at[10, 10].set(1.0)
    final, seis = wave_simulate(c, u0, 9, dt=0.01, checkpoint="sqrt",
                                record=lambda s: s["u_curr"][4, :])
    assert seis.shape == (9, 20)
    assert final["u_curr"].shape == (20, 20)


def test_fwi_gradient_end_to_end():
    """Config #3: gradient of the FWI misfit w.r.t. the velocity model,
    checkpointed adjoint vs full-tape — identical; and finite-difference
    spot check."""
    n = 16
    steps = 12
    c_true = 2.0 + 0.3 * jax.nn.sigmoid(rand(5, (n, n)))
    c0 = 2.0 + jnp.zeros((n, n), jnp.float64)
    u0 = jnp.zeros((n, n), jnp.float64).at[n // 2, n // 2].set(1.0)

    _, observed = wave_simulate(c_true, u0, steps, dt=0.01, checkpoint="none",
                                record=lambda s: s["u_curr"][3, :])

    val_s, grad_s = fwi_gradient(c0, u0, observed, 3, steps, dt=0.01,
                                 checkpoint="sqrt")
    val_n, grad_n = fwi_gradient(c0, u0, observed, 3, steps, dt=0.01,
                                 checkpoint="none")
    np.testing.assert_allclose(val_s, val_n, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(grad_s, grad_n, rtol=RTOL, atol=ATOL)
    assert float(jnp.abs(grad_s).max()) > 0

    # finite differences on the misfit
    def misfit(c):
        _, seis = wave_simulate(c, u0, steps, dt=0.01, checkpoint="none",
                                record=lambda s: s["u_curr"][3, :])
        return 0.5 * jnp.sum((seis - observed) ** 2)

    eps = 1e-6
    i, j = n // 2, n // 2 + 1
    fd = (misfit(c0.at[i, j].add(eps)) - misfit(c0.at[i, j].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(grad_s[i, j]), float(fd), rtol=1e-5, atol=1e-9)
