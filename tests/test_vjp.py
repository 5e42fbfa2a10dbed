"""End-to-end gradient checks — the analog of the reference's
``torch.autograd.gradcheck`` / ``tf.test.compute_gradient`` tests in
``test_tfmad.py`` (SURVEY.md §4), but exact-to-roundoff: the oracle is
``jax.grad`` of a hand-written jnp shifted-slice implementation in float64,
and our symbolically derived backward kernel must match it everywhere,
*including ghost/boundary cells* (SURVEY.md §7 hard-part #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, DiffModes, fields

RTOL = 1e-12
ATOL = 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def check_gradients(op, hand_fwd, arrays, lowering="jnp", rtol=RTOL, atol=ATOL,
                    reduce=lambda out: jnp.sum(jnp.sin(out))):
    """Compare op.jax_function value+grads against a hand-written jnp fwd."""
    f = op.jax_function(lowering=lowering)
    names = f.input_names

    out_ours = f(*[arrays[n] for n in names])
    out_ref = hand_fwd(**arrays)
    if isinstance(out_ours, tuple):
        for a, b in zip(out_ours, out_ref):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
    else:
        np.testing.assert_allclose(out_ours, out_ref, rtol=rtol, atol=atol)

    def loss_ours(args):
        out = f(*args)
        outs = out if isinstance(out, tuple) else (out,)
        return sum(reduce(o) for o in outs)

    def loss_ref(args):
        out = hand_fwd(**dict(zip(names, args)))
        outs = out if isinstance(out, tuple) else (out,)
        return sum(reduce(o) for o in outs)

    args = tuple(arrays[n] for n in names)
    g_ours = jax.grad(loss_ours)(args)
    g_ref = jax.grad(loss_ref)(args)
    for n, a, b in zip(names, g_ours, g_ref):
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                   err_msg=f"grad mismatch for {n}")
    return g_ours


def test_laplacian_2d_gradcheck():
    x, y = fields("x, y", 2)
    op = AutoDiffOp(
        [Assignment(y.center, x[1, 0] + x[-1, 0] + x[0, 1] + x[0, -1] - 4 * x[0, 0])],
        op_name="lap2d")

    def hand(x):
        out = jnp.zeros_like(x)
        inner = (x[2:, 1:-1] + x[:-2, 1:-1] + x[1:-1, 2:] + x[1:-1, :-2]
                 - 4 * x[1:-1, 1:-1])
        return out.at[1:-1, 1:-1].set(inner)

    check_gradients(op, hand, {"x": rand(0, (16, 20))})


def test_boundary_gradients_nonzero_and_exact():
    """Gradients must land in ghost cells (interior reads touch them)."""
    x, y = fields("x, y", 1)
    op = AutoDiffOp([Assignment(y.center, x[1] - x[-1])], op_name="cdiff")

    def hand(x):
        out = jnp.zeros_like(x)
        return out.at[1:-1].set(x[2:] - x[:-2])

    xv = rand(1, (12,))
    (g,) = check_gradients(op, hand, {"x": xv})
    assert abs(float(g[0])) > 0  # ghost cell receives a gradient


def test_asymmetric_ghost_layers():
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[2, 0] + x[-1, 1] - x[0, 0])],
                    op_name="asym")

    # per-dim asymmetric ghost layers (pystencils auto-detection semantics):
    # dim0 offsets {2,-1,0} → (lo,hi)=(1,2); dim1 offsets {0,1} → (0,1)
    def hand(x):
        out = jnp.zeros_like(x)
        inner = x[3:, :-1] + x[:-3, 1:] - x[1:-2, :-1]
        return out.at[1:-2, :-1].set(inner)

    check_gradients(op, hand, {"x": rand(2, (17, 13))})


def test_nonlinear_stencil():
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] ** 2 * x[0, 0] + sp.exp(x[0, 1]))],
                    op_name="nl")

    # ghost layers: dim0 (0,1), dim1 (0,1) → interior [:-1, :-1]
    def hand(x):
        out = jnp.zeros_like(x)
        inner = x[1:, :-1] ** 2 * x[:-1, :-1] + jnp.exp(x[:-1, 1:])
        return out.at[:-1, :-1].set(inner)

    check_gradients(op, hand, {"x": rand(3, (14, 14))})


def test_variable_coefficient_diffusion():
    """Both x and κ get exact gradients (var-coeff transposition)."""
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp(
        [Assignment(y.center, k[0, 0] * (x[1, 0] + x[-1, 0] - 2 * x[0, 0]))],
        op_name="vdiff")

    # only dim0 has offsets → ghost ((1,1), (0,0)); dim1 interior is full
    def hand(x, k):
        out = jnp.zeros_like(x)
        inner = k[1:-1, :] * (x[2:, :] + x[:-2, :] - 2 * x[1:-1, :])
        return out.at[1:-1, :].set(inner)

    check_gradients(op, hand, {"x": rand(4, (15, 15)),
                               "k": 1.0 + 0.1 * rand(5, (15, 15)) ** 2})


def test_constant_fields_zero_cotangent():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp([Assignment(y.center, k[0, 0] * x[0, 0])],
                    op_name="constk", constant_fields=[k])
    f = op.jax_function()
    xv, kv = rand(6, (8, 8)), rand(7, (8, 8))

    g = jax.grad(lambda x, k: jnp.sum(f(x=x, k=k) ** 2), argnums=(0, 1))(xv, kv)
    assert float(jnp.abs(g[1]).max()) == 0.0
    assert float(jnp.abs(g[0]).max()) > 0.0


def test_multi_input_multi_output():
    a, b, u, v = fields("a, b, u, v", 2)
    op = AutoDiffOp([
        Assignment(u.center, a[1, 0] * b[0, 0] + a[0, 0]),
        Assignment(v.center, b[0, 1] - a[0, 0] ** 2),
    ], op_name="mimo")

    # ghost layers: dim0 (0,1), dim1 (0,1) → interior [:-1, :-1]
    def hand(a, b):
        u = jnp.zeros_like(a)
        v = jnp.zeros_like(a)
        u = u.at[:-1, :-1].set(a[1:, :-1] * b[:-1, :-1] + a[:-1, :-1])
        v = v.at[:-1, :-1].set(b[:-1, 1:] - a[:-1, :-1] ** 2)
        return u, v

    check_gradients(op, hand, {"a": rand(8, (12, 12)), "b": rand(9, (12, 12))})


def test_vector_field_index_dims():
    """Vector (index-dimension) fields: divergence of a 2-vector field."""
    vel = fields("vel(2)", 2)
    div = fields("div", 2)
    op = AutoDiffOp([
        Assignment(div.center,
                   vel[1, 0](0) - vel[-1, 0](0) + vel[0, 1](1) - vel[0, -1](1)),
    ], op_name="diverg")

    def hand(vel):
        out = jnp.zeros(vel.shape[:2], vel.dtype)
        inner = (vel[2:, 1:-1, 0] - vel[:-2, 1:-1, 0]
                 + vel[1:-1, 2:, 1] - vel[1:-1, :-2, 1])
        return out.at[1:-1, 1:-1].set(inner)

    check_gradients(op, hand, {"vel": rand(10, (10, 11, 2))})


def test_3d_stencil():
    x, y = fields("x, y", 3)
    op = AutoDiffOp([Assignment(
        y.center,
        x[1, 0, 0] + x[-1, 0, 0] + x[0, 1, 0] + x[0, -1, 0]
        + x[0, 0, 1] + x[0, 0, -1] - 6 * x[0, 0, 0])], op_name="lap3d")

    def hand(x):
        out = jnp.zeros_like(x)
        c = x[1:-1, 1:-1, 1:-1]
        inner = (x[2:, 1:-1, 1:-1] + x[:-2, 1:-1, 1:-1]
                 + x[1:-1, 2:, 1:-1] + x[1:-1, :-2, 1:-1]
                 + x[1:-1, 1:-1, 2:] + x[1:-1, 1:-1, :-2] - 6 * c)
        return out.at[1:-1, 1:-1, 1:-1].set(inner)

    check_gradients(op, hand, {"x": rand(11, (9, 10, 11))})


@pytest.mark.parametrize("mode", [DiffModes.TRANSPOSED, DiffModes.TF_MAD])
def test_modes_execute_identically(mode):
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp(
        [Assignment(y.center, k[1, 0] * x[1, 0] + k[-1, 0] * x[-1, 0] * x[0, 0])],
        op_name=f"mode_{mode.name}", diff_mode=mode)
    f = op.jax_function()
    xv, kv = rand(12, (13, 13)), rand(13, (13, 13))
    g = jax.grad(lambda x, k: jnp.sum(jnp.cos(f(x=x, k=k))), argnums=(0, 1))(xv, kv)
    # store for cross-mode comparison via function attribute
    test_modes_execute_identically.results[mode] = g


test_modes_execute_identically.results = {}


def test_modes_agree():
    res = test_modes_execute_identically.results
    if len(res) == 2:
        a, b = res.values()
        for ga, gb in zip(a, b):
            np.testing.assert_allclose(ga, gb, rtol=RTOL, atol=ATOL)


def test_second_order_grad():
    """grad-of-grad through the custom_vjp (linear bwd is jnp-differentiable)."""
    x, y = fields("x, y", 1)
    op = AutoDiffOp([Assignment(y.center, x[0] ** 3 + x[1])], op_name="hess")
    f = op.jax_function()

    def hand(x):  # ghost layers (0, 1) → interior [:-1]
        return jnp.zeros_like(x).at[:-1].set(x[:-1] ** 3 + x[1:])

    xv = rand(14, (10,))
    g2_ours = jax.grad(lambda x: jnp.sum(jax.grad(
        lambda z: jnp.sum(f(z) ** 2))(x) ** 2))(xv)
    g2_ref = jax.grad(lambda x: jnp.sum(jax.grad(
        lambda z: jnp.sum(hand(z) ** 2))(x) ** 2))(xv)
    np.testing.assert_allclose(g2_ours, g2_ref, rtol=1e-10, atol=1e-10)


def test_jit_and_vmap_compose():
    """The custom_vjp op must be jit- and vmap-compatible (the reference's
    batched-field tests exercise batching via an extra dim; SURVEY.md §2.3 DP)."""
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] - 2 * x[0, 0] + x[-1, 0])],
                    op_name="batched")
    f = jax.jit(op.jax_function())
    xb = rand(15, (4, 8, 8))  # batch of 4
    out = jax.vmap(f)(xb)
    assert out.shape == (4, 8, 8)
    g = jax.vmap(jax.grad(lambda x: jnp.sum(f(x) ** 2)))(xb)
    assert g.shape == (4, 8, 8)


def test_periodic_3d_wrap_directional_oracle():
    """Directional 3D stencil vs a jnp.roll oracle in BOTH lowerings:
    conservation tests alone cannot catch a wrong wrap (any spatial
    permutation conserves the moments), so this pins the torus semantics
    per dimension with distinct prime weights."""
    import jax

    u, out = fields("u3w, out3w", 3)
    op = AutoDiffOp([Assignment(out.center,
                                2 * u[1, 0, 0] + 3 * u[0, 1, 0]
                                + 5 * u[0, 0, 1] + 7 * u[-1, 0, 0])],
                    op_name="dir3")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 10, 16))
    ref = (2 * jnp.roll(x, -1, 0) + 3 * jnp.roll(x, -1, 1)
           + 5 * jnp.roll(x, -1, 2) + 7 * jnp.roll(x, 1, 0))
    for kw in ({"lowering": "jnp"},
               {"lowering": "pallas", "interpret": True}):
        f = op.jax_function(periodic=True, **kw)
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(ref),
                                   rtol=1e-13, atol=1e-13,
                                   err_msg=str(kw))
