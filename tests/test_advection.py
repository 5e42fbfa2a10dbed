"""Advection model tests: upwind exactness, WENO5 order/shape-preservation
sanity, and gradient exactness through the heavily nonlinear WENO weights
(the classic hard case for adjoint codegen)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.advection import upwind1_op, weno5_op
from pystencils_autodiff_tpu.ops import forward_program
from pystencils_autodiff_tpu.ops.jnp_ref import make_jnp_stencil


def test_upwind_transports():
    op = upwind1_op(a=1.0, dt=1.0, dx=1.0)  # CFL=1: exact shift
    f = op.jax_function(periodic=True)
    u0 = jnp.asarray(np.sin(np.linspace(0, 2 * np.pi, 64, endpoint=False)))
    u1 = f(u0)
    np.testing.assert_allclose(u1, jnp.roll(u0, 1), rtol=1e-12, atol=1e-12)


def test_weno5_ghost_width():
    op = weno5_op()
    gl = forward_program(op).ghost
    assert gl == ((3, 2),)


def test_weno5_preserves_smooth_profile():
    """One period of periodic advection returns a smooth profile nearly
    unchanged (WENO5 space + SSP-RK3 time, built from the Euler-step op —
    the standard convex-combination construction)."""
    n, cfl = 128, 0.4
    op = weno5_op(a=1.0, dt=cfl, dx=1.0)
    euler = op.jax_function(periodic=True)

    @jax.jit
    def rk3(u):
        u1 = euler(u)
        u2 = 0.75 * u + 0.25 * euler(u1)
        return u / 3.0 + 2.0 / 3.0 * euler(u2)

    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    u = jnp.asarray(np.sin(x))
    steps = int(round(n / cfl))
    for _ in range(steps):
        u = rk3(u)
    err = float(jnp.abs(u - jnp.asarray(np.sin(x))).max())
    assert err < 2e-3, err


def test_weno5_gradients_match_oracle():
    """Adjoint through the WENO weights (rational powers of smoothness
    indicators) vs jax.grad of the raw lowering."""
    op = weno5_op()
    f = op.jax_function()
    raw = make_jnp_stencil(forward_program(op))
    u0 = jnp.asarray(np.random.default_rng(0).standard_normal(32))

    def loss_c(u):
        return jnp.sum(jnp.sin(f(u)))

    def loss_r(u):
        return jnp.sum(jnp.sin(raw({"u": u})["u_next"]))

    np.testing.assert_allclose(loss_c(u0), loss_r(u0), rtol=1e-12)
    g_c = jax.grad(loss_c)(u0)
    g_r = jax.grad(loss_r)(u0)
    np.testing.assert_allclose(g_c, g_r, rtol=1e-9, atol=1e-10)
    assert op.saved_fields  # nonlinear: primal must be saved


def test_weno5_periodic_gradcheck_fd():
    op = weno5_op()
    f = op.jax_function(periodic=True)
    u0 = jnp.asarray(1.0 + 0.3 * np.sin(np.linspace(0, 2 * np.pi, 24,
                                                    endpoint=False)))

    def loss(u):
        return jnp.sum(f(u) ** 2)

    g = jax.grad(loss)(u0)
    eps = 1e-6
    for i in (0, 7, 23):
        fd = (loss(u0.at[i].add(eps)) - loss(u0.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)
