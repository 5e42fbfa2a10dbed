"""AoT export/serving tests: serialized artifacts reload and reproduce the
op (and its gradient) without the symbolic layer."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.serving import export_op, load_exported, save_exported


def _op():
    x, y, k = fields("x, y, k", 2)
    return AutoDiffOp(
        [Assignment(y.center,
                    k[0, 0] * (x[1, 0] + x[-1, 0] - 2 * x[0, 0]) + x[0, 1] ** 2)],
        op_name="srv")


def test_export_roundtrip_values_and_grads():
    op = _op()
    shape = (16, 16)
    exp = export_op(op, shape, dtype=jnp.float32)
    with tempfile.NamedTemporaryFile(suffix=".shlo", delete=False) as fh:
        path = fh.name
    save_exported(exp, path)
    fn, vjp_fn = load_exported(path)
    assert vjp_fn is not None

    f_ref = op.jax_function()
    rng = np.random.default_rng(0)
    names = f_ref.input_names
    args = tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                 for _ in names)
    out_loaded = fn(*args)
    out_ref = f_ref(*args)
    np.testing.assert_allclose(np.asarray(out_loaded), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)

    cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    grads_loaded = vjp_fn(*args, cot)
    _, pullback = jax.vjp(lambda *a: f_ref(*a), *args)
    grads_ref = pullback(cot)
    for a, b in zip(grads_loaded, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
