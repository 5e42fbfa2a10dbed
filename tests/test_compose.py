"""Operator composition (stencil fusion) tests: the fused op must equal
sequential application on the valid (doubly-shrunk) interior, and its
symbolically derived adjoint must match jax.grad of the sequential
composition there."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.compose import compose_ops, fuse_sweeps
from pystencils_autodiff_tpu.models.elastic import elastic_stress_op, elastic_velocity_op
from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.ops import forward_program

RTOL, ATOL = 1e-11, 1e-11


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def test_two_heat_steps_fuse():
    op = heat_step_op(dt=0.1, dtype="float64")
    # second step reads the first step's output field u_next
    un = fields("u_next", 2)
    lap = un[1, 0] + un[-1, 0] + un[0, 1] + un[0, -1] - 4 * un[0, 0]
    op2 = AutoDiffOp([Assignment(fields("u_next2", 2).center,
                                 un[0, 0] + 0.1 * lap)], op_name="h2b")
    fused = compose_ops(op, op2)
    assert [f.name for f in fused.forward_input_fields] == ["u"]
    # ghost layers compose: 1 + 1 = 2 per side
    gl = forward_program(fused).ghost
    assert gl == ((2, 2), (2, 2))

    f1 = op.jax_function()
    f2 = op2.jax_function()
    ff = fused.jax_function()
    x = rand(0, (20, 20))
    seq = f2(f1(x))
    fus = ff(x)
    # agree on the doubly-shrunk interior (sequential zeroes ghost between
    # steps; fused reads through): compare [2:-2, 2:-2]
    np.testing.assert_allclose(fus[2:-2, 2:-2], seq[2:-2, 2:-2],
                               rtol=RTOL, atol=ATOL)

    # gradients on an interior-supported loss
    mask = jnp.zeros_like(x).at[4:-4, 4:-4].set(1.0)
    g_f = jax.grad(lambda a: jnp.sum(jnp.sin(ff(a)) * mask))(x)
    g_s = jax.grad(lambda a: jnp.sum(jnp.sin(f2(f1(a))) * mask))(x)
    np.testing.assert_allclose(g_f, g_s, rtol=RTOL, atol=ATOL)


def test_fuse_elastic_velocity_into_stress():
    vop = elastic_velocity_op(dtype="float64")
    sop = elastic_stress_op(dtype="float64")
    # stress op reads vx, vy; velocity op outputs vx_next, vy_next. Rewire
    # stress to read the *_next fields so composition inlines them.
    from pystencils_autodiff_tpu import Field
    from pystencils_autodiff_tpu.assignment import AssignmentCollection
    vxn = Field("vx_next", 2, dtype="float64", origin=(0.5, 0.0))
    vyn = Field("vy_next", 2, dtype="float64", origin=(0.0, 0.5))
    sub = {}
    for a in sop.forward_assignments.main_assignments:
        for acc in a.rhs.atoms(Field.Access):
            if acc.field.name == "vx":
                sub[acc] = Field.Access(vxn, acc.offsets, acc.index)
            elif acc.field.name == "vy":
                sub[acc] = Field.Access(vyn, acc.offsets, acc.index)
    sop2 = AutoDiffOp(
        AssignmentCollection([Assignment(a.lhs, a.rhs.xreplace(sub))
                              for a in sop.forward_assignments.main_assignments]),
        op_name="stress_on_next")
    fused = compose_ops(vop, sop2, op_name="elastic_full_step")
    ins = {f.name for f in fused.forward_input_fields}
    assert ins == {"vx", "vy", "sxx", "syy", "sxy"}
    outs = [f.name for f in fused.forward_output_fields]
    assert set(outs) == {"sxx_next", "syy_next", "sxy_next"}

    fv, fs, ff = vop.jax_function(), sop2.jax_function(), fused.jax_function()
    shape = (18, 18)
    args = {n: rand(10 + i, shape) for i, n in enumerate(sorted(ins))}
    vx_n, vy_n = fv(**{k: args[k] for k in ["vx", "vy", "sxx", "syy", "sxy"]})
    seq = fs(vx_next=vx_n, vy_next=vy_n, sxx=args["sxx"], syy=args["syy"],
             sxy=args["sxy"])
    fus = ff(**args)
    for a, b in zip(fus, seq):
        np.testing.assert_allclose(a[2:-2, 2:-2], b[2:-2, 2:-2],
                                   rtol=RTOL, atol=ATOL)


def test_fuse_sweeps_three_steps():
    u = fields("u", 1)
    mids = fields("m1, m2, m3", 1)
    ops = []
    prev = u
    for i, m in enumerate(mids):
        ops.append(AutoDiffOp(
            [Assignment(m.center, prev[1] - 2 * prev[0] + prev[-1])],
            op_name=f"s{i}"))
        prev = m
    fused = fuse_sweeps(ops, op_name="tri")
    assert [f.name for f in fused.forward_input_fields] == ["u"]
    assert forward_program(fused).ghost == ((3, 3),)
    x = rand(3, (16,))
    f0, f1, f2 = (o.jax_function() for o in ops)
    seq = f2(f1(f0(x)))
    fus = fused.jax_function()(x)
    np.testing.assert_allclose(fus[3:-3], seq[3:-3], rtol=RTOL, atol=ATOL)


def test_fused_pallas_blocked():
    op = heat_step_op(dt=0.05, dtype="float64")
    un = fields("u_next", 2)
    lap = un[1, 0] + un[-1, 0] + un[0, 1] + un[0, -1] - 4 * un[0, 0]
    op2 = AutoDiffOp([Assignment(fields("u_out", 2).center,
                                 un[0, 0] + 0.05 * lap)], op_name="fh2")
    fused = compose_ops(op, op2)
    f_pal = fused.jax_function(lowering="pallas", interpret=True,
                               strategy="blocked", tile_rows=8)
    f_ref = fused.jax_function(lowering="jnp")
    x = rand(4, (24, 16))
    np.testing.assert_allclose(f_pal(x), f_ref(x), rtol=RTOL, atol=ATOL)
    g_p = jax.grad(lambda a: jnp.sum(f_pal(a) ** 2))(x)
    g_r = jax.grad(lambda a: jnp.sum(f_ref(a) ** 2))(x)
    np.testing.assert_allclose(g_p, g_r, rtol=RTOL, atol=ATOL)


def test_simulation_fused_op_heat_chain():
    """Simulation.fused_op rewires carry chains automatically."""
    from pystencils_autodiff_tpu.simulation import Simulation
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    op = heat_step_op(dt=0.1, dtype="float64")
    sim = Simulation()
    sim.add_sweep(op, {"u": "u_next"})
    # second identical sweep reads "u" — which the first sweep updated
    op2 = heat_step_op(dt=0.1, dtype="float64")
    op2.op_name = "heat2"
    sim.add_sweep(op2, {"u": "u_next"})
    fused = sim.fused_op()
    assert [f.name for f in fused.forward_input_fields] == ["u"]
    assert fused._fused_carry == {"u": "u_next"}

    f1 = op.jax_function()
    ff = fused.jax_function()
    x = rand(6, (20, 20))
    seq = f1(f1(x))
    fus = ff(x)
    np.testing.assert_allclose(fus[2:-2, 2:-2], seq[2:-2, 2:-2],
                               rtol=RTOL, atol=ATOL)


def test_simulation_fused_elastic_full_step():
    from pystencils_autodiff_tpu.simulation import Simulation

    vop = elastic_velocity_op(dtype="float64")
    sop = elastic_stress_op(dtype="float64")
    sim = Simulation()
    sim.add_sweep(vop, {"vx": "vx_next", "vy": "vy_next"})
    sim.add_sweep(sop, {"sxx": "sxx_next", "syy": "syy_next",
                        "sxy": "sxy_next"})
    fused = sim.fused_op("elastic_fused")
    ins = {f.name for f in fused.forward_input_fields}
    assert ins == {"vx", "vy", "sxx", "syy", "sxy"}

    # compare against the sequential (unfused) step on the deep interior
    seq_step = sim.step_fn()
    state = {n: rand(60 + i, (18, 18)) for i, n in enumerate(sorted(ins))}
    seq = seq_step(state)
    ff = fused.jax_function()
    fus = ff(**{n: state[n] for n in ins})
    fus_d = dict(zip([f.name for f in fused.forward_output_fields], fus))
    for name in ("sxx_next", "syy_next", "sxy_next"):
        carried = {"sxx_next": "sxx", "syy_next": "syy", "sxy_next": "sxy"}[name]
        np.testing.assert_allclose(fus_d[name][2:-2, 2:-2],
                                   seq[carried][2:-2, 2:-2],
                                   rtol=RTOL, atol=ATOL, err_msg=name)
