"""D3Q19 lattice Boltzmann: the 3D LBM family member built on the generic
``bgk_op`` — fixed point, conservation, oracle exactness and gradients
through the flattened-row 3D lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.lbm import (D3Q19_VELOCITIES,
                                                D3Q19_WEIGHTS, d3q19_bgk_op,
                                                macroscopic)
from pystencils_autodiff_tpu.timeloop import make_time_stepper


def _feq(n, ux=0.0):
    ws = np.array([float(w) for w in D3Q19_WEIGHTS])
    comps = []
    for (cx, cy, cz), w in zip(D3Q19_VELOCITIES, ws):
        cu = cx * ux
        comps.append(w * (1 + 3 * cu + 4.5 * cu ** 2 - 1.5 * ux ** 2)
                     * np.ones((n, n, n)))
    return jnp.asarray(np.stack(comps, -1))


def test_weights_and_lattice_consistency():
    assert len(D3Q19_VELOCITIES) == 19
    assert float(sum(D3Q19_WEIGHTS)) == 1.0
    # lattice isotropy: sum w c_a c_b = (1/3) delta_ab
    for a in range(3):
        for b in range(3):
            s = float(sum(w * c[a] * c[b]
                          for w, c in zip(D3Q19_WEIGHTS, D3Q19_VELOCITIES)))
            assert abs(s - (1 / 3 if a == b else 0.0)) < 1e-14


def test_equilibrium_is_fixed_point_3d():
    n = 8
    op = d3q19_bgk_op(omega=1.6)
    step = make_time_stepper(op, {"f": "f_out"}, periodic=True)
    f0 = _feq(n)
    f = step({"f": f0})["f"]
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0),
                               rtol=1e-13, atol=1e-13)


def test_mass_momentum_conserved_3d():
    n = 8
    op = d3q19_bgk_op(omega=1.8)
    step = make_time_stepper(op, {"f": "f_out"}, periodic=True)
    f = _feq(n) * (1 + 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                                (n, n, n, 19),
                                                dtype=jnp.float64) ** 2)
    rho0 = float(jnp.sum(f))
    mom0 = [float(sum(c[d] * jnp.sum(f[..., i])
                      for i, c in enumerate(D3Q19_VELOCITIES)))
            for d in range(3)]
    for _ in range(3):
        f = step({"f": f})["f"]
    assert abs(float(jnp.sum(f)) - rho0) < 1e-10 * rho0
    for d in range(3):
        mom = float(sum(c[d] * jnp.sum(f[..., i])
                        for i, c in enumerate(D3Q19_VELOCITIES)))
        assert abs(mom - mom0[d]) < 1e-10 * max(abs(mom0[d]), 1.0)


def test_macroscopic_3d():
    f = _feq(6, ux=0.05)
    rho, u0, u1, u2 = macroscopic(f, velocities=D3Q19_VELOCITIES)
    np.testing.assert_allclose(np.asarray(rho), 1.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u0), 0.05, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(u1), 0.0, atol=1e-12)


@pytest.mark.slow
def test_d3q19_gradients_match_oracle():
    """Symbolic adjoint of the 19-component nonlinear collide through the
    flattened-3D blocked path == jax.grad of the jnp lowering."""
    op = d3q19_bgk_op(omega=1.5)
    fp = op.jax_function(lowering="pallas", interpret=True)
    fj = op.jax_function(lowering="jnp")
    f0 = _feq(8) * (1 + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (8, 8, 8, 19), dtype=jnp.float64) ** 2)
    g_p = jax.grad(lambda a: jnp.sum(jnp.sin(fp(a))))(f0)
    g_j = jax.grad(lambda a: jnp.sum(jnp.sin(fj(a))))(f0)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j),
                               rtol=1e-11, atol=1e-11)


def test_d3q19_jnp_gradient_finite():
    """Fast canary: gradient through the jnp lowering is finite/nonzero."""
    op = d3q19_bgk_op(omega=1.5)
    fj = op.jax_function(lowering="jnp")
    f0 = _feq(6)
    g = jax.grad(lambda a: jnp.sum(fj(a)[2:-2, 2:-2, 2:-2] ** 2))(f0)
    arr = np.asarray(g)
    assert np.all(np.isfinite(arr)) and np.abs(arr).max() > 0
