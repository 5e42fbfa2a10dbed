"""Recorded call-graph datahandling (VERDICT round 1, missing #4): the
graph must capture allocations/boundaries/sweeps/comm/timeloops, replay to
the same results as hand-written stepping, and drive whole-program fusion.

Reference anchor: graph_datahandling.py recording a pystencils DataHandling
call graph for whole-program codegen (SURVEY.md §2.1 #14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.graph_datahandling import (AllocNode,
                                                        GraphDataHandling,
                                                        SweepNode,
                                                        TimeloopNode)
from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.models.elastic import (elastic_stress_op,
                                                    elastic_velocity_op)
from pystencils_autodiff_tpu.timeloop import make_time_stepper


def build_heat_graph(n=24):
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n)))
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.boundary({"u": "neumann"})
        loop.communicate("u")
        loop.sweep(op, {"u": "u_next"})
    return dh, op


def test_graph_records_nodes():
    dh, op = build_heat_graph()
    kinds = [type(n).__name__ for n in dh.graph.nodes]
    assert kinds == ["AllocNode", "TimeloopNode"]
    body = [type(n).__name__ for n in dh.graph.nodes[1].body]
    assert body == ["BoundaryNode", "CommNode", "SweepNode"]
    text = dh.graph.describe()
    assert "alloc u" in text and "sweep heat" in text
    assert "neumann" in text and "communicate" in text
    spec = dh.graph.to_dict()
    assert spec["nodes"][1]["kind"] == "timeloop"
    sweep_spec = spec["nodes"][1]["body"][2]
    assert sweep_spec["reads"] == ["u"] and sweep_spec["carry"] == {"u": "u_next"}
    # JSON-serialisable (the "generated program" artifact)
    import json
    json.loads(dh.graph.to_json())


def test_graph_replay_matches_manual_stepping():
    dh, op = build_heat_graph()
    run = dh.compile()
    out = run(dh.state(), 5)["u"]

    from pystencils_autodiff_tpu.boundary import BoundaryHandling
    bh = BoundaryHandling(op, {"u": "neumann"})
    step = make_time_stepper(op, {"u": "u_next"}, boundary=bh)
    st = dh.state()
    for _ in range(5):
        st = step(st)
    np.testing.assert_allclose(out, st["u"], rtol=1e-14, atol=1e-14)


def test_graph_replay_differentiable():
    dh, op = build_heat_graph()
    run = dh.compile(checkpoint="sqrt")
    u0 = dh.state()["u"]
    g = jax.grad(lambda u: jnp.sum(run({"u": u}, 4)["u"] ** 2))(u0)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).max()) > 0


def test_graph_stage_fusion_matches_replay():
    """fuse='stages': the recorded multi-sweep timeloop runs as one fused
    heterogeneous chain, bit-exact vs node-by-node replay."""
    n = 32
    dh = GraphDataHandling((n, n), ghost_layers=0, default_dtype=jnp.float64)
    for name in ["vx", "vy", "sxx", "syy", "sxy"]:
        dh.add_field(name, init=0.0)
        dh.set_array(name, 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(name) % 100), (n, n)))
    vel = elastic_velocity_op(dt=0.01, dtype="float64")
    stress = elastic_stress_op(dt=0.01, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(vel, {"vx": "vx_next", "vy": "vy_next"})
        loop.sweep(stress, {"sxx": "sxx_next", "syy": "syy_next",
                            "sxy": "sxy_next"})
    replay = dh.compile(lowering="jnp", periodic=True)
    fused = dh.compile(fuse="stages", k=2, periodic=True, interpret=True,
                       tile_rows=16)
    st = dh.state()
    out_r = replay(st, 4)
    out_f = fused(st, 4)
    for name in st:
        np.testing.assert_allclose(out_f[name], out_r[name],
                                   rtol=1e-12, atol=1e-12, err_msg=name)


def test_graph_symbolic_fusion_matches_replay():
    dh, op = build_heat_graph()
    replay = dh.compile()
    fused = dh.compile(fuse="symbolic")
    st = dh.state()
    np.testing.assert_allclose(fused(st, 3)["u"], replay(st, 3)["u"],
                               rtol=1e-13, atol=1e-13)


def test_graph_validation():
    dh = GraphDataHandling((8, 8), ghost_layers=1)
    dh.add_field("u")
    with pytest.raises(ValueError, match="exactly one recorded timeloop"):
        dh.compile()
    with pytest.raises(ValueError, match="unknown fuse mode"):
        build_heat_graph()[0].compile(fuse="bogus")


def test_graph_stage_fusion_boundary_node_rules():
    """Recorded boundary nodes fold into fused stage chains (round 3);
    combinations that would silently change the program still raise:
    frame BCs on periodic domains, and a trailing boundary node with no
    following sweep to attach to."""
    dh, op = build_heat_graph()
    with pytest.raises(ValueError, match="meaningless on"):
        dh.compile(fuse="stages", k=2, periodic=True)
    # bounded: the recorded neumann BC fuses and matches replay
    run_f = dh.compile(fuse="stages", k=2, interpret=True, tile_rows=16)
    run_r = dh.compile()
    st = dh.state()
    np.testing.assert_allclose(np.asarray(run_f(st, 2)["u"]),
                               np.asarray(run_r(st, 2)["u"]),
                               rtol=1e-13, atol=1e-13)

    dh2, op2 = build_heat_graph()
    dh2.graph.nodes[-1].body.append(
        dh2.graph.nodes[-1].body[0])  # boundary AFTER the last sweep
    with pytest.raises(ValueError, match="after the last"):
        dh2.compile(fuse="stages", k=2, interpret=True)


def test_graph_stage_fusion_passes_extra_fields_through():
    """State fields no sweep touches ride along unchanged, matching
    fuse='none' semantics (review finding: carry-pytree mismatch)."""
    n = 32
    dh = GraphDataHandling((n, n), ghost_layers=0, default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.add_field("scratch", init=3.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n)))
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(op, {"u": "u_next"})
    run = dh.compile(fuse="stages", k=2, periodic=True, interpret=True,
                     tile_rows=16)
    out = run(dh.state(), 4)
    assert np.all(np.asarray(out["scratch"]) == 3.0)


def test_graph_symbolic_fusion_rejects_interleaved_boundary():
    """A boundary node BETWEEN sweeps cannot be preserved by symbolic
    fusion — reordering it would change the program (review finding)."""
    n = 16
    dh = GraphDataHandling((n, n), ghost_layers=1, default_dtype=jnp.float64)
    for name in ["vx", "vy", "sxx", "syy", "sxy"]:
        dh.add_field(name, init=0.0)
    vel = elastic_velocity_op(dt=0.01, dtype="float64")
    stress = elastic_stress_op(dt=0.01, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(vel, {"vx": "vx_next", "vy": "vy_next"})
        loop.boundary({"vx": "neumann"})
        loop.sweep(stress, {"sxx": "sxx_next", "syy": "syy_next",
                            "sxy": "sxy_next"})
    with pytest.raises(ValueError, match="contiguous"):
        dh.compile(fuse="symbolic")


def test_graph_symbolic_fusion_preserves_trailing_boundary_order():
    """Recorded [sweep, boundary] keeps BC application AFTER the (fused)
    sweep — round-1 code hoisted all boundaries to the front."""
    dh = GraphDataHandling((22, 22), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(1), (24, 24)))
    from pystencils_autodiff_tpu.models.heat import heat_step_op
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(op, {"u": "u_next"})
        loop.boundary({"u": ("dirichlet", 7.0)})
    out_n = dh.compile()(dh.state(), 3)["u"]
    out_s = dh.compile(fuse="symbolic")(dh.state(), 3)["u"]
    np.testing.assert_allclose(out_s, out_n, rtol=1e-13, atol=1e-13)
    # the trailing dirichlet is visible in the final state
    assert np.all(np.asarray(out_n)[0, :] == 7.0)


def test_graph_compiles_to_sharded_execution():
    """compile(mesh=...) runs every recorded sweep mesh-decomposed
    (shard_map + ppermute halos) — bit-exact vs single-device replay,
    gradients included."""
    from pystencils_autodiff_tpu.parallel import make_mesh

    n = 32
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (n, n)))
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(op, {"u": "u_next"})
    mesh = make_mesh((4,), ("x",))
    run_sh = dh.compile(mesh=mesh, dim_axes={0: "x"})
    run_1d = dh.compile()
    st = dh.state()
    out_sh = run_sh(st, 5)["u"]
    out_1d = run_1d(st, 5)["u"]
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_1d),
                               rtol=1e-14, atol=1e-14)
    g_sh = jax.grad(lambda a: jnp.sum(run_sh({"u": a}, 3)["u"] ** 2))(st["u"])
    g_1d = jax.grad(lambda a: jnp.sum(run_1d({"u": a}, 3)["u"] ** 2))(st["u"])
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_1d),
                               rtol=1e-13, atol=1e-13)
    # fuse='stages' + mesh is supported since round 3 (ShardedChain);
    # only symbolic fusion remains per-device
    with pytest.raises(ValueError, match="fuse='none' and fuse='stages'"):
        dh.compile(fuse="symbolic", mesh=mesh)


def test_add_field_array_init_records_placeholder():
    """Array-valued init is accepted and recorded as a shape placeholder in
    the alloc node (advisor finding, round 2)."""
    import numpy as np

    dh = GraphDataHandling((8, 8), ghost_layers=1, default_dtype=jnp.float64)
    arr = np.arange(100, dtype=np.float64).reshape(10, 10)
    dh.add_field("u", init=arr)
    np.testing.assert_allclose(np.asarray(dh.arrays["u"]), arr)
    alloc = dh.graph.nodes[0]
    assert alloc.init == "array(10, 10)"
    dh.graph.to_json()  # artifact stays serialisable


def test_graph_stages_mesh_boundary_fused_bwd_compose():
    """The OUTERMOST composition in one artifact: a recorded timeloop
    with boundary nodes, compiled mesh-decomposed with fuse='stages' AND
    fused_bwd=True — the comm-avoiding fused chain runs the BC (and its
    transpose) inside the per-shard kernel.  Bit-exact vs the unfused
    single-device replay, gradients included."""
    from pystencils_autodiff_tpu.parallel import make_mesh

    n, k = 32, 2
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(5), (n, n)))
    op = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.boundary({"u": "neumann"})
        loop.sweep(op, {"u": "u_next"})
    mesh = make_mesh((4,), ("x",))
    run_f = dh.compile(fuse="stages", k=k, mesh=mesh, dim_axes={0: "x"},
                       fused_bwd=True)
    run_r = dh.compile()
    st = dh.state()
    out_f = run_f(st, 2 * k)["u"]
    out_r = run_r(st, 2 * k)["u"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-12, atol=1e-12)
    g_f = jax.grad(lambda a: jnp.sum(
        jnp.sin(run_f({"u": a}, 2 * k)["u"])))(st["u"])
    g_r = jax.grad(lambda a: jnp.sum(
        jnp.sin(run_r({"u": a}, 2 * k)["u"])))(st["u"])
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-11, atol=1e-11)
