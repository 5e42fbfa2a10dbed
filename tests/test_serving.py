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


def test_shape_polymorphic_export():
    """One artifact serves multiple grid sizes: symbolic spatial dims in
    export_op (round-2 verdict missing #5)."""
    op = _op()
    exp = export_op(op, ("n", "m"), dtype=jnp.float32)
    with tempfile.NamedTemporaryFile(suffix=".shlo", delete=False) as fh:
        path = fh.name
    save_exported(exp, path)
    fn, vjp_fn = load_exported(path)

    f_ref = op.jax_function()
    rng = np.random.default_rng(1)
    for shape in [(16, 16), (24, 40)]:
        args = tuple(jnp.asarray(rng.standard_normal(shape), jnp.float32)
                     for _ in f_ref.input_names)
        np.testing.assert_allclose(np.asarray(fn(*args)),
                                   np.asarray(f_ref(*args)),
                                   rtol=1e-6, atol=1e-6)
        cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        grads_loaded = vjp_fn(*args, cot)
        _, pullback = jax.vjp(lambda *a: f_ref(*a), *args)
        for a, b in zip(grads_loaded, pullback(cot)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=str(shape))


def test_step_count_polymorphic_program_export():
    """n_steps=None exports a runtime-step-count artifact driven by
    run.step; one artifact serves any step count (and, with
    symbolic_spatial, any grid size)."""
    import pytest

    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    from pystencils_autodiff_tpu.serving import export_program

    def build(n):
        dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                               default_dtype=jnp.float32)
        dh.add_field("u", init=0.0)
        dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n),
                                            jnp.float32))
        hop = heat_step_op(dt=0.1, kappa_field=False, dtype="float32")
        with dh.timeloop() as loop:
            loop.sweep(hop, {"u": "u_next"})
        return dh, dh.compile()

    dh, run = build(20)
    state = dh.state()
    exp = export_program(run, state, n_steps=None, with_gradient=False,
                         symbolic_spatial=("n", "m"))
    with tempfile.NamedTemporaryFile(suffix=".shlo", delete=False) as fh:
        path = fh.name
    save_exported(exp, path)
    fn, _ = load_exported(path)

    for steps in (3, 7):
        out = fn(jnp.int32(steps), state["u"])
        ref = run(state, steps)["u"]
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    # same artifact, different grid size
    dh2, run2 = build(28)
    st2 = dh2.state()
    out2 = fn(jnp.int32(5), st2["u"])
    ref2 = run2(st2, 5)["u"]
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(ref2),
                               rtol=1e-6, atol=1e-6)

    with pytest.raises(ValueError, match="forward-only"):
        export_program(run, state, n_steps=None, with_gradient=True)


def test_dynamic_export_scales_fused_chain_steps():
    """A step-count-polymorphic artifact built from a fuse='stages' run
    (k physical steps per step() call) must interpret its runtime
    argument as PHYSICAL steps (code-review finding: it once ran n*k)."""
    import numpy as np
    import pytest

    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    from pystencils_autodiff_tpu.serving import export_program

    n, k = 16, 2
    hop = heat_step_op(dt=0.1, kappa_field=False, dtype="float32")

    def build(fuse):
        dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                               default_dtype=jnp.float32)
        dh.add_field("u", init=0.0)
        dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n),
                                            jnp.float32))
        with dh.timeloop() as loop:
            loop.sweep(hop, {"u": "u_next"})
        if fuse == "stages":
            return dh, dh.compile(fuse="stages", k=k, interpret=True)
        return dh, dh.compile()

    dh_s, run_s = build("stages")
    dh_n, run_n = build("none")
    state = dh_s.state()

    exp = export_program(run_s, state, n_steps=None, with_gradient=False)
    assert exp.steps_per_call == k
    out_dyn = exp(jnp.int32(4), state["u"])[0]
    out_ref = run_n({"u": state["u"]}, 4)["u"]
    np.testing.assert_allclose(np.asarray(out_dyn), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="multiple"):
        exp(3, state["u"])


def test_saved_dynamic_artifact_keeps_step_guard(tmp_path):
    """save/load round trip preserves the multiple-of-chain-depth check,
    and numpy/jnp integer step counts are validated too (code-review
    findings: both silently rounded down before)."""
    import pytest

    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    from pystencils_autodiff_tpu.serving import (export_program,
                                                 load_exported,
                                                 save_exported)

    n, k = 16, 2
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float32)
    dh.add_field("u", init=0.0)
    hop = heat_step_op(dt=0.1, kappa_field=False, dtype="float32")
    with dh.timeloop() as loop:
        loop.sweep(hop, {"u": "u_next"})
    run = dh.compile(fuse="stages", k=k, interpret=True)
    exp = export_program(run, dh.state(), n_steps=None, with_gradient=False)

    u = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
    with pytest.raises(ValueError, match="multiple"):
        exp(jnp.int32(3), u)  # non-int scalar must be validated too

    path = str(tmp_path / "prog.bin")
    save_exported(exp, path)
    fn, _ = load_exported(path)
    out = fn(jnp.int32(4), u)
    assert out[0].shape == (n, n)
    with pytest.raises(ValueError, match="multiple"):
        fn(3, u)
