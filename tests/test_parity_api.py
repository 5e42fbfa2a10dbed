"""API-parity smoke tests: reference surface names exist and behave
(SURVEY.md §2.1 symbol inventory)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pystencils_autodiff_tpu import (
    AdjointField,
    Assignment,
    AssignmentCollection,
    AutoDiffKernelPair,
    AutoDiffOp,
    DiffModes,
    create_backward_assignments,
    fields,
    get_jacobian_of_assignments,
)


def _op():
    x, y = fields("x, y", 2)
    return AutoDiffOp(
        [Assignment(y.center, x[1, 0] + x[-1, 0] - 2 * x[0, 0])], op_name="par")


def test_available_backends_list():
    from pystencils_autodiff_tpu.backends import AVAILABLE_BACKENDS

    assert set(AVAILABLE_BACKENDS) >= {"torch", "torch_native",
                                       "tensorflow", "tensorflow_native"}


def test_kernel_accessors():
    op = _op()
    x = np.random.default_rng(0).standard_normal((10, 12))
    cpu_out = op.forward_kernel_cpu({"x": x})["y"]
    jax_out = op.jax_function()(jnp.asarray(x))
    np.testing.assert_allclose(cpu_out, np.asarray(jax_out), rtol=1e-12)
    tpu_fn = op.forward_kernel_tpu  # pallas (interpret off-TPU)
    out = tpu_fn({"x": jnp.asarray(x)})["y"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax_out), rtol=1e-12)
    assert AutoDiffOp.forward_kernel_gpu is AutoDiffOp.forward_kernel_tpu


def test_kernel_pair_call():
    op = _op()
    pair = op.kernel_pair()
    assert isinstance(pair, AutoDiffKernelPair)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8)))
    out = pair(x=x)
    assert out.shape == (8, 8)
    bwd = pair.backward(diffy=out)
    assert bwd.shape == (8, 8)


def test_torch_dtype_helpers():
    torch = pytest.importorskip("torch")
    from pystencils_autodiff_tpu.backends._torch import (
        numpy_dtype_to_torch, torch_dtype_to_numpy)

    assert torch_dtype_to_numpy(torch.float64) == np.float64
    assert numpy_dtype_to_torch(np.float32) is torch.float32


def test_bfloat16_lowering():
    op = _op()
    f = op.jax_function(lowering="pallas", interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16)).astype(jnp.bfloat16)
    out = f(x)
    assert out.dtype == jnp.bfloat16


def test_jnp_fallback_for_unviable_pallas_shapes():
    """Huge-ish array with a row count not divisible by 8 and unaligned
    lanes: pallas auto-lowering must fall back to jnp, not fail."""
    x, y = fields("fx, fy", 2)
    op = AutoDiffOp([Assignment(y.center, x[1, 0] - x[0, 0])], op_name="fb")
    f = op.jax_function(lowering="pallas", interpret=True)
    # 700*701*8B*2 ≈ 7.8MB > whole-array limit; 701 not divisible by 8
    xv = jax.random.normal(jax.random.PRNGKey(1), (701, 700), jnp.float64)
    ref = op.jax_function(lowering="jnp")(xv)
    np.testing.assert_allclose(np.asarray(f(xv)), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_diffmodes_are_string_enum():
    assert DiffModes("transposed") is DiffModes.TRANSPOSED
    assert DiffModes("transposed-forward") is DiffModes.TF_MAD
    assert DiffModes.TRANSPOSED == "transposed"


def test_backend_selector_parity():
    """op.create_*_op(backend=...) accepts the reference's backend names."""
    op = _op()
    torch = pytest.importorskip("torch")
    a1 = op.create_pytorch_op(backend="torch")
    a2 = op.create_pytorch_op(backend="torch_native")
    t = torch.randn(8, 8, dtype=torch.float64, requires_grad=True)
    o1, o2 = a1(t), a2(t)
    np.testing.assert_allclose(o1.detach().numpy(), o2.detach().numpy(),
                               rtol=1e-12)
    with pytest.raises(ValueError):
        op.create_pytorch_op(backend="cuda")
    tf = pytest.importorskip("tensorflow")
    f1 = op.create_tensorflow_op(backend="tensorflow")
    f2 = op.create_tensorflow_op(backend="tensorflow_native")
    xv = tf.constant(np.random.default_rng(0).standard_normal((8, 8)))
    np.testing.assert_allclose(f1(xv).numpy(), f2(xv).numpy(), rtol=1e-12)
