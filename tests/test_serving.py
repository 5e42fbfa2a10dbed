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


def test_export_whole_program_roundtrip():
    """A recorded GraphDataHandling program exports to a StableHLO
    artifact (values + gradients) that reloads and reproduces the replay
    without the symbolic layer — the deployable whole-simulation analog of
    the reference's generated app (SURVEY.md §2.1 #15)."""
    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    from pystencils_autodiff_tpu.serving import export_program

    n, steps = 20, 4
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n)))
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.boundary({"u": "neumann"})
        loop.sweep(op, {"u": "u_next"})
    run = dh.compile()

    exp = export_program(run, dh.state(), steps)
    with tempfile.NamedTemporaryFile(suffix=".shlo", delete=False) as fh:
        path = fh.name
    save_exported(exp, path)
    fn, vjp_fn = load_exported(path)

    u0 = dh.state()["u"]
    (out_loaded,) = fn(u0)
    out_ref = run({"u": u0}, steps)["u"]
    np.testing.assert_allclose(np.asarray(out_loaded), np.asarray(out_ref),
                               rtol=1e-14, atol=1e-14)

    cot = jnp.ones_like(u0)
    (g_loaded,) = vjp_fn(u0, cot)
    g_ref = jax.grad(lambda a: jnp.sum(run({"u": a}, steps)["u"]))(u0)
    np.testing.assert_allclose(np.asarray(g_loaded), np.asarray(g_ref),
                               rtol=1e-13, atol=1e-13)
