"""Sharded stencil tests on a virtual 8-device CPU mesh — the "multi-node
without a cluster" pattern the reference never had (SURVEY.md §4 rebuild
plan): sharded results and gradients must match the single-device op
exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.parallel import ShardedStencil, make_mesh, shard_array

RTOL, ATOL = 1e-12, 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def _laplacian_op():
    x, y = fields("x, y", 2)
    return AutoDiffOp(
        [Assignment(y.center, x[1, 0] + x[-1, 0] + x[0, 1] + x[0, -1] - 4 * x[0, 0])],
        op_name="lap2d")


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_1d_decomposition_matches_single_device():
    op = _laplacian_op()
    mesh = make_mesh((4,), ("x",))
    sharded = ShardedStencil(op, mesh, {0: "x"})
    single = op.jax_function()
    x = rand(0, (64, 32))
    xs = shard_array(x, mesh, sharded.partition_spec(op.forward_input_fields[0]))
    np.testing.assert_allclose(np.asarray(jax.jit(sharded)(xs)), np.asarray(single(x)),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_2d_decomposition_matches_single_device():
    op = _laplacian_op()
    mesh = make_mesh((4, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"})
    single = op.jax_function()
    x = rand(1, (32, 16))
    np.testing.assert_allclose(np.asarray(jax.jit(sharded)(x)), np.asarray(single(x)),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_gradients_match_single_device():
    """The adjoint of the halo exchange (reverse ppermute + edge accumulate)
    must compose with the symbolic backward kernel to the exact gradient
    (SURVEY.md §7 hard-part #5)."""
    op = _laplacian_op()
    mesh = make_mesh((4,), ("x",))
    sharded = ShardedStencil(op, mesh, {0: "x"})
    single = op.jax_function()
    x = rand(2, (64, 32))

    g_sh = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(sharded(a)))))(x)
    g_si = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(single(a)))))(x)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_si),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_varcoeff_gradients():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp(
        [Assignment(y.center, k[0, 0] * (x[1, 0] + x[-1, 0] - 2 * x[0, 0])
                    + x[0, 1] ** 2)], op_name="vc")
    mesh = make_mesh((2, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"})
    single = op.jax_function()
    xv, kv = rand(3, (16, 16)), rand(4, (16, 16))

    def loss(f):
        return lambda a, b: jnp.sum(jnp.cos(f(k=b, x=a)))

    g_sh = jax.jit(jax.grad(loss(sharded), argnums=(0, 1)))(xv, kv)
    g_si = jax.grad(loss(single), argnums=(0, 1))(xv, kv)
    for a, b in zip(g_sh, g_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=RTOL, atol=ATOL)


@needs_8
def test_periodic_decomposition():
    """Periodic halos wrap: compare against a jnp.roll oracle."""
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] - x[-1, 0])], op_name="per")
    mesh = make_mesh((4,), ("x",))
    sharded = ShardedStencil(op, mesh, {0: "x"}, periodic=True)
    xv = rand(5, (32, 16))

    def oracle(a):
        # periodic in dim0 (the sharded dim); dim1 has no offsets
        return jnp.roll(a, -1, 0) - jnp.roll(a, 1, 0)

    np.testing.assert_allclose(np.asarray(jax.jit(sharded)(xv)), np.asarray(oracle(xv)),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_3d_sharded_pallas_interpret():
    """Sharded + Pallas(interpret) compose: config #5 shape (CPU-scale)."""
    x, y, k = fields("x, y, k", 3)
    op = AutoDiffOp([Assignment(
        y.center,
        k[0, 0, 0] * (x[1, 0, 0] + x[-1, 0, 0] + x[0, 1, 0] + x[0, -1, 0]
                      + x[0, 0, 1] + x[0, 0, -1] - 6 * x[0, 0, 0]))],
        op_name="d3s")
    mesh = make_mesh((2, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"},
                             lowering="pallas", interpret=True,
                             strategy="whole")
    single = op.jax_function()
    arrs = {"x": rand(6, (16, 16, 8)), "k": rand(7, (16, 16, 8))}
    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda **a: sharded(**a))(**arrs)),
        np.asarray(single(**arrs)),
        rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_corner_halos_27point():
    """Diagonal (corner) offsets exercise the multi-dim exchange ordering:
    later dims must transport earlier dims' halos (SURVEY.md §5.7)."""
    from pystencils_autodiff_tpu.models import anisotropic27_op

    op = anisotropic27_op(dtype="float64")
    mesh = make_mesh((2, 2, 2), ("x", "y", "z"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y", 2: "z"})
    single = op.jax_function()
    u = rand(40, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(jax.jit(sharded)(u)),
                               np.asarray(single(u)),
                               rtol=RTOL, atol=ATOL)
    g_sh = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(sharded(a)))))(u)
    g_si = jax.grad(lambda a: jnp.sum(jnp.sin(single(a))))(u)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_si),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_sharded_staggered_elastic():
    """Staggered multi-output op decomposed over a mesh."""
    from pystencils_autodiff_tpu.models.elastic import elastic_velocity_op

    op = elastic_velocity_op(dtype="float64")
    mesh = make_mesh((2, 2), ("x", "y"))
    sharded = ShardedStencil(op, mesh, {0: "x", 1: "y"})
    single = op.jax_function()
    args = {n: rand(50 + i, (16, 16))
            for i, n in enumerate(f.name for f in op.forward_input_fields)}
    out_sh = jax.jit(lambda **a: sharded(**a))(**args)
    out_si = single(**args)
    for a, b in zip(out_sh, out_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=RTOL, atol=ATOL)


@needs_8
@pytest.mark.parametrize("mesh_shape,axes,dims", [
    pytest.param((4,), ("x",), {0: "x"}, marks=pytest.mark.slow),
    ((2, 2), ("x", "y"), {0: "x", 1: "y"}),
])
def test_overlap_mode_matches_exactly(mesh_shape, axes, dims):
    """overlap=True (comm/compute-overlapped edge-strip recompute) must be
    bit-identical to the plain path and the single device op, grads incl."""
    x, y, k = fields("xo, yo, ko", 2)
    op = AutoDiffOp(
        [Assignment(y.center, ko_acc := k[0, 0] * (x[1, 0] + x[-1, 0]
                                                   - 2 * x[0, 0]) + x[0, 1] ** 2)],
        op_name="ovl")
    mesh = make_mesh(mesh_shape, axes)
    plain = ShardedStencil(op, mesh, dims)
    ovl = ShardedStencil(op, mesh, dims, overlap=True)
    single = op.jax_function()
    xv, kv = rand(80, (32, 16)), rand(81, (32, 16))

    o_plain = jax.jit(lambda a, b: plain(xo=a, ko=b))(xv, kv)
    o_ovl = jax.jit(lambda a, b: ovl(xo=a, ko=b))(xv, kv)
    o_single = single(xo=xv, ko=kv)
    np.testing.assert_allclose(np.asarray(o_ovl), np.asarray(o_single),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(o_ovl), np.asarray(o_plain),
                               rtol=RTOL, atol=ATOL)

    g_o = jax.jit(jax.grad(lambda a, b: jnp.sum(jnp.sin(ovl(xo=a, ko=b))),
                   argnums=(0, 1)))(xv, kv)
    g_s = jax.grad(lambda a, b: jnp.sum(jnp.sin(single(xo=a, ko=b))),
                   argnums=(0, 1))(xv, kv)
    for a, b in zip(g_o, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=RTOL, atol=ATOL)
