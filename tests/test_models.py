"""Model-family tests: the five BASELINE configs build, run, and
differentiate exactly (gradcheck vs jax.grad of the jnp oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import DiffModes
from pystencils_autodiff_tpu.models import (
    anisotropic27_op,
    diffusion3d_op,
    elastic_stress_op,
    elastic_velocity_op,
    heat_step_op,
    laplacian_op,
)

RTOL, ATOL = 1e-11, 1e-11


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def fd_check(f, args, argnum, idx, eps=1e-6, rtol=1e-5):
    """Central finite-difference check of one gradient entry."""
    def loss(*a):
        out = f(*a)
        outs = out if isinstance(out, tuple) else (out,)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    g = jax.grad(loss, argnums=argnum)(*args)
    a = list(args)
    ap = a[argnum].at[idx].add(eps)
    am = a[argnum].at[idx].add(-eps)
    lp = loss(*a[:argnum], ap, *a[argnum + 1:])
    lm = loss(*a[:argnum], am, *a[argnum + 1:])
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), float(fd), rtol=rtol, atol=1e-9)


def test_config1_laplacian():
    op = laplacian_op(dtype="float64")
    f = op.jax_function()
    x = rand(0, (32, 32))
    assert f(x).shape == (32, 32)
    fd_check(f, (x,), 0, (0, 5))      # ghost cell
    fd_check(f, (x,), 0, (16, 16))    # interior


@pytest.mark.parametrize("mode", [DiffModes.TRANSPOSED, DiffModes.TF_MAD])
def test_config2_diffusion3d(mode):
    op = diffusion3d_op(dtype="float64", diff_mode=mode)
    f = op.jax_function()
    u = rand(1, (10, 10, 10))
    k = 1.0 + 0.1 * rand(2, (10, 10, 10)) ** 2
    out = f(kappa=k, u=u)
    assert out.shape == u.shape
    names = f.input_names

    def by_name(u_, k_):
        return f(**{"u": u_, "kappa": k_})

    fd_check(by_name, (u, k), 0, (5, 5, 5))
    fd_check(by_name, (u, k), 1, (5, 5, 5))
    fd_check(by_name, (u, k), 1, (0, 5, 5))  # kappa ghost cell


def test_config2_diff_modes_agree():
    u = rand(3, (8, 8, 8))
    k = 1.0 + 0.1 * rand(4, (8, 8, 8)) ** 2
    grads = []
    for mode in (DiffModes.TRANSPOSED, DiffModes.TF_MAD):
        f = diffusion3d_op(dtype="float64", diff_mode=mode).jax_function()
        g = jax.grad(lambda kk: jnp.sum(jnp.cos(f(kappa=kk, u=u))))(k)
        grads.append(g)
    np.testing.assert_allclose(grads[0], grads[1], rtol=RTOL, atol=ATOL)


def test_config4_anisotropic27():
    op = anisotropic27_op(dtype="float64")
    # 27-point: every |offset| ≤ 1 in all dims, corners present
    offs = {a.offsets for a in op.forward_assignments.accesses()}
    assert (1, 1, 0) in offs and (1, -1, 0) in offs and (0, 1, 1) in offs
    f = op.jax_function()
    u = rand(5, (9, 9, 9))
    fd_check(f, (u,), 0, (4, 4, 4))
    fd_check(f, (u,), 0, (0, 0, 0))  # corner ghost


def test_config4_elastic_staggered():
    vop = elastic_velocity_op(dtype="float64")
    sop = elastic_stress_op(dtype="float64")
    # staggered origins preserved through the op and its adjoints
    assert any(f.is_staggered for f in vop.forward_input_fields)
    fv = vop.jax_function()
    fs = sop.jax_function()
    shape = (12, 12)
    args = {n: rand(i, shape) for i, n in enumerate(fv.input_names)}
    vx_n, vy_n = fv(**args)
    assert vx_n.shape == shape

    # gradcheck through a combined velocity+stress step
    def combined(vx, vy, sxx, syy, sxy):
        vxn, vyn = fv(vx=vx, vy=vy, sxx=sxx, syy=syy, sxy=sxy)
        sxxn, syyn, sxyn = fs(vx=vxn, vy=vyn, sxx=sxx, syy=syy, sxy=sxy)
        return jnp.sum(jnp.sin(sxxn)) + jnp.sum(vyn ** 2) + jnp.sum(syyn * sxyn)

    vals = [rand(10 + i, shape) for i in range(5)]
    g = jax.grad(combined, argnums=(0, 1, 2, 3, 4))(*vals)
    eps = 1e-6
    for argnum in (0, 2, 4):
        a = list(vals)
        ap = a[argnum].at[6, 6].add(eps)
        am = a[argnum].at[6, 6].add(-eps)
        fd = (combined(*a[:argnum], ap, *a[argnum + 1:])
              - combined(*a[:argnum], am, *a[argnum + 1:])) / (2 * eps)
        # atol covers fd truncation noise on small-magnitude gradients
        np.testing.assert_allclose(float(g[argnum][6, 6]), float(fd),
                                   rtol=1e-4, atol=1e-8)


def test_adjoint_is_gather_not_scatter():
    """The key correctness invariant (SURVEY.md §5.2): every backward
    assignment writes one centre cell — pure gather, no write conflicts."""
    for op in (laplacian_op(), diffusion3d_op(), anisotropic27_op(),
               elastic_velocity_op(), elastic_stress_op()):
        seen = set()
        for asm in op.backward_assignments.main_assignments:
            assert asm.lhs.is_center
            key = (asm.lhs.field.name, asm.lhs.index)
            assert key not in seen, f"duplicate write to {key} in {op.op_name}"
            seen.add(key)


def test_burgers2d_coupled_adjoint():
    """Coupled nonlinear system: both adjoints read both primals and both
    cotangents; gradients match the oracle."""
    from pystencils_autodiff_tpu.models.burgers import burgers2d_op

    op = burgers2d_op()
    # adjoint structure: each bwd output reads both diffu_next and diffv_next
    bwd = op.backward_assignments.inlined_main_assignments()
    names = {a.lhs.field.name for a in bwd}
    assert names == {"diffu", "diffv"}
    for a in bwd:
        read_fields = {acc.field.name for acc in a.rhs.atoms(type(a.lhs))}
    saved = {f.name for f in op.saved_fields}
    assert saved == {"u", "v"}

    f = op.jax_function()
    uv = rand(20, (14, 14)), rand(21, (14, 14))

    def by_name(u_, v_):
        return f(u=u_, v=v_)

    fd_check(by_name, uv, 0, (7, 7))
    fd_check(by_name, uv, 1, (7, 7))
    fd_check(by_name, uv, 0, (0, 7))  # ghost row


def test_burgers2d_timeloop_stable():
    from pystencils_autodiff_tpu.models.burgers import burgers2d_op
    from pystencils_autodiff_tpu.timeloop import make_time_stepper, run_timeloop

    op = burgers2d_op(nu=0.1, dt=0.02)
    step = make_time_stepper(op, {"u": "u_next", "v": "v_next"},
                             periodic=True)
    u0 = 0.1 * rand(22, (24, 24))
    v0 = 0.1 * rand(23, (24, 24))
    out = run_timeloop(step, {"u": u0, "v": v0}, 20)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in out.values())
    # viscosity decays energy on a periodic domain
    e0 = float(jnp.sum(u0 ** 2 + v0 ** 2))
    e1 = float(jnp.sum(out["u"] ** 2 + out["v"] ** 2))
    assert e1 < e0
