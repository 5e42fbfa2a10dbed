"""End-to-end reverse-mode AD checks through the ML-framework backends —
the rebuild of the reference's largest suite, ``tests/test_tfmad.py``
(SURVEY.md §4): build op → wrap in torch/TF → compare against the
frameworks' own gradient checkers and the float64 oracle; multi-input,
multi-output, variable-coefficient, vector-field and batched cases; both
diff modes end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, DiffModes, fields

RTOL, ATOL = 1e-10, 1e-10


def _rng_arrays(op, key=0, shape=(10, 12)):
    rng = np.random.default_rng(key)
    return {f.name: rng.standard_normal(shape) for f in op.forward_input_fields}


@pytest.mark.parametrize("mode", [DiffModes.TRANSPOSED, DiffModes.TF_MAD])
def test_torch_gradcheck_both_modes(mode):
    torch = pytest.importorskip("torch")
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp(
        [Assignment(y.center, k[1, 0] * x[1, 0] + k[-1, 0] * x[-1, 0] * x[0, 0])],
        op_name=f"tfmad_{mode.name.lower()}", diff_mode=mode)
    apply = op.create_pytorch_op(native=True)
    rng = np.random.default_rng(3)
    tensors = [torch.tensor(rng.standard_normal((6, 6)), requires_grad=True)
               for _ in apply.input_names]
    assert torch.autograd.gradcheck(lambda *t: apply(*t), tuple(tensors),
                                    eps=1e-6, atol=1e-7)


def test_tfmad_two_outputs():
    """Multi-output op through torch autograd (upstream test name)."""
    torch = pytest.importorskip("torch")
    a, u, v = fields("a, u, v", 2)
    op = AutoDiffOp([
        Assignment(u.center, a[1, 0] - a[-1, 0]),
        Assignment(v.center, a[0, 1] * a[0, 0]),
    ], op_name="two_out")
    apply = op.create_pytorch_op()
    t = torch.tensor(np.random.default_rng(4).standard_normal((8, 8)),
                     requires_grad=True)
    out_u, out_v = apply(t)
    loss = out_u.pow(2).sum() + out_v.sin().sum()
    loss.backward()

    f = op.jax_function()
    def jloss(av):
        ou, ov = f(av)
        return jnp.sum(ou ** 2) + jnp.sum(jnp.sin(ov))
    g_ref = jax.grad(jloss)(jnp.asarray(t.detach().numpy()))
    np.testing.assert_allclose(t.grad.numpy(), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


def test_tf_compute_gradient_error():
    """tf.test.compute_gradient against our symbolic adjoint (the upstream
    oracle for the TF backends)."""
    tf = pytest.importorskip("tensorflow")
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] ** 2 - x[0, 1])],
                    op_name="tfgrad")
    tf_fn = op.create_tensorflow_op()
    xv = tf.constant(np.random.default_rng(5).standard_normal((6, 6)))
    theoretical, numerical = tf.test.compute_gradient(
        lambda t: tf_fn(t), [xv], delta=1e-4)
    np.testing.assert_allclose(theoretical[0], numerical[0], rtol=1e-4,
                               atol=1e-6)


def test_batched_fields_via_vmap():
    """The upstream exercises batching via an extra field dimension; here
    vmap over the custom_vjp op (SURVEY.md §2.3 DP row)."""
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] + x[0, 1] - 2 * x[0, 0])],
                    op_name="batch")
    f = op.jax_function()
    xb = jax.random.normal(jax.random.PRNGKey(6), (3, 8, 8), jnp.float64)
    gb = jax.vmap(jax.grad(lambda a: jnp.sum(jnp.sin(f(a)))))(xb)
    for i in range(3):
        gi = jax.grad(lambda a: jnp.sum(jnp.sin(f(a))))(xb[i])
        np.testing.assert_allclose(gb[i], gi, rtol=RTOL, atol=ATOL)


def test_vector_field_backend_roundtrip():
    torch = pytest.importorskip("torch")
    vel = fields("vel(2)", 2)
    div = fields("div", 2)
    op = AutoDiffOp([Assignment(
        div.center, vel[1, 0](0) - vel[-1, 0](0) + vel[0, 1](1) - vel[0, -1](1))],
        op_name="divb")
    apply = op.create_pytorch_op()
    t = torch.tensor(np.random.default_rng(7).standard_normal((7, 7, 2)),
                     requires_grad=True)
    out = apply(t)
    out.pow(2).sum().backward()
    assert t.grad.shape == (7, 7, 2)
    f = op.jax_function()
    g_ref = jax.grad(lambda v: jnp.sum(f(v) ** 2))(jnp.asarray(t.detach().numpy()))
    np.testing.assert_allclose(t.grad.numpy(), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


def test_modes_agree_through_torch():
    torch = pytest.importorskip("torch")
    grads = []
    for mode in (DiffModes.TRANSPOSED, DiffModes.TF_MAD):
        x, y, k = fields("x, y, k", 2)
        op = AutoDiffOp(
            [Assignment(y.center, k[0, 0] * (x[1, 0] - x[-1, 0]) + x[0, 0] ** 3)],
            op_name=f"magree_{mode.name.lower()}", diff_mode=mode)
        apply = op.create_pytorch_op(native=True)
        rng = np.random.default_rng(8)
        ts = [torch.tensor(rng.standard_normal((9, 9)), requires_grad=True)
              for _ in apply.input_names]
        apply(*ts).sin().sum().backward()
        grads.append([t.grad.numpy().copy() for t in ts])
    for ga, gb in zip(*grads):
        np.testing.assert_allclose(ga, gb, rtol=RTOL, atol=ATOL)
