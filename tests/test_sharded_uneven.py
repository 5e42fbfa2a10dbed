"""Uneven sharded domains (global shapes not divisible by the mesh axes)
run pad-and-mask: pads are edge copies, masked as global ghost by
TRUE-extent tests, sliced off — bit-exact vs single-device, gradients
included.  VERDICT round-3 missing #5 / next #10 (the waLBerla reference's
block forests handle ragged domains natively, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.models import heat_step_op
from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper
from pystencils_autodiff_tpu.parallel import (ShardedChain, ShardedStencil,
                                              make_mesh)
from pystencils_autodiff_tpu.timeloop import make_time_stepper

RTOL, ATOL = 1e-12, 1e-12
needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float64)


def _varcoeff_op():
    u, kap, out = fields("u, kap, out", 2)
    lap = u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1] - 4 * u[0, 0]
    return AutoDiffOp(
        [Assignment(out.center, u.center + 0.1 * kap.center ** 2 * lap)],
        op_name="heat_vk_uneven")


@needs_8
def test_sharded_stencil_uneven_2d():
    """45x33 over a (4,2) mesh: 45%4=1, 33%2=1 — both dims pad."""
    op = _varcoeff_op()
    f_ref = op.jax_function(lowering="jnp")
    mesh = make_mesh((4, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"})
    u, kap = rand(0, (45, 33)), 1.0 + 0.1 * rand(1, (45, 33)) ** 2
    out = jax.jit(lambda a, b: sharded(u=a, kap=b))(u, kap)
    ref = f_ref(u=u, kap=kap)
    assert out.shape == ref.shape == (45, 33)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_stencil_uneven_gradients():
    op = _varcoeff_op()
    f_ref = op.jax_function(lowering="jnp")
    mesh = make_mesh((4, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"})
    u, kap = rand(2, (45, 33)), 1.0 + 0.1 * rand(3, (45, 33)) ** 2
    tgt = rand(4, (45, 33))

    g_sh = jax.grad(lambda kk: jnp.sum((sharded(u=u, kap=kk) - tgt) ** 2))(kap)
    g_ref = jax.grad(lambda kk: jnp.sum((f_ref(u=u, kap=kk) - tgt) ** 2))(kap)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_stencil_uneven_periodic_raises():
    op = _varcoeff_op()
    mesh = make_mesh((4,), ("x",))
    sharded = ShardedStencil(op, mesh, {0: "x"}, periodic=True)
    with pytest.raises(ValueError, match="divide the mesh evenly"):
        jax.jit(lambda a, b: sharded(u=a, kap=b))(rand(0, (45, 32)), rand(1, (45, 32)))


@needs_8
@pytest.mark.parametrize("k", [1, 2])
def test_sharded_chain_uneven(k):
    """45x33 fused chain over a (4,2) mesh, bit-exact vs sequential."""
    op = heat_step_op(dt=0.1, dtype="float64")
    mesh = make_mesh((4, 2), ("x", "y"))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True)
    u = rand(5, (45, 33))
    out = jax.jit(chain)({"u": u})
    step = make_time_stepper(op, {"u": "u_next"}, lowering="pallas",
                             interpret=True)
    ref = {"u": u}
    for _ in range(k):
        ref = step(ref)
    assert out["u"].shape == (45, 33)
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_chain_uneven_gradients():
    """Gradients through the uneven sharded chain (sequential-recompute
    backward over the padded state) match single-device exactly."""
    op = heat_step_op(dt=0.1, kappa_field=True, dtype="float64")
    mesh = make_mesh((4, 2), ("x", "y"))
    k = 2
    chain = ShardedChain(op, k, mesh, {0: "x"},
                         carry_map={"u": "u_next"}, interpret=True)
    u, kap = rand(6, (45, 33)), 1.0 + 0.1 * rand(7, (45, 33)) ** 2
    tgt = rand(8, (45, 33))

    def loss_sh(kk):
        out = chain({"u": u, "kappa": kk})
        return jnp.sum((out["u"] - tgt) ** 2)

    step = stage_stepper(op, {"u": "u_next"}, lowering="pallas",
                         interpret=True)

    def loss_ref(kk):
        st = {"u": u, "kappa": kk}
        for _ in range(k):
            st = step(st)
        return jnp.sum((st["u"] - tgt) ** 2)

    g_sh = jax.grad(loss_sh)(kap)
    g_ref = jax.grad(loss_ref)(kap)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_chain_uneven_fused_bwd():
    """fused_bwd=True composes with pad-and-mask: the two-phase kernel's
    global-coordinate masks test the TRUE extents."""
    op = heat_step_op(dt=0.1, kappa_field=True, dtype="float64")
    mesh = make_mesh((4,), ("x",))
    k = 2
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True, fused_bwd=True)
    u, kap = rand(9, (45, 32)), 1.0 + 0.1 * rand(10, (45, 32)) ** 2
    tgt = rand(11, (45, 32))

    def loss_sh(kk):
        out = chain({"u": u, "kappa": kk})
        return jnp.sum((out["u"] - tgt) ** 2)

    step = stage_stepper(op, {"u": "u_next"}, lowering="pallas",
                         interpret=True)

    def loss_ref(kk):
        st = {"u": u, "kappa": kk}
        for _ in range(k):
            st = step(st)
        return jnp.sum((st["u"] - tgt) ** 2)

    g_sh = jax.grad(loss_sh)(kap)
    g_ref = jax.grad(loss_ref)(kap)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_chain_uneven_periodic_raises():
    op = heat_step_op(dt=0.1, dtype="float64")
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, 2, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=True, interpret=True)
    with pytest.raises(ValueError, match="divide the mesh evenly"):
        chain({"u": rand(12, (45, 32))})
