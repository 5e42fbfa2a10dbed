"""Boundary conditions fused into chains (ops/chain_bc.py): frame and
masked BCs applied per cycle INSIDE the fused stage-chain kernel must match
per-step jnp boundary application bit-exactly — state and gradients,
including the gradient w.r.t. a moving-wall (lid) velocity.  VERDICT
round 2, next #5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.boundary import bounce_back, dirichlet, neumann
from pystencils_autodiff_tpu.models.lbm import d2q9_bgk_op
from pystencils_autodiff_tpu.ops import fused_stage_chain
from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper

RTOL, ATOL = 1e-12, 1e-12


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def heat_op(dt=0.1):
    u, u_next = fields("u, u_next", 2)
    return AutoDiffOp([Assignment(
        u_next[0, 0],
        u[0, 0] + dt * (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1]
                        - 4 * u[0, 0]))], op_name="heat2d")


@pytest.mark.parametrize("spec,oracle", [
    ("neumann", lambda a, g: neumann(a, g)),
    (("dirichlet", 1.5), lambda a, g: dirichlet(a, g, 1.5)),
])
def test_frame_bc_in_chain(spec, oracle):
    """Frame BC applied before every fused step == per-step jnp BC."""
    op = heat_op()
    k = 2
    chain = fused_stage_chain([(op, {"u": "u_next"})], k, interpret=True,
                              tile_rows=16, boundary={"u": spec})
    step = stage_stepper(op, {"u": "u_next"})
    ghost = ((1, 1), (1, 1))
    u0 = rand(0, (40, 32))

    out = jax.jit(chain)({"u": u0})["u"]
    ref = u0
    for _ in range(k):
        ref = step({"u": oracle(ref, ghost)})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)

    # gradients through the chain's sequential-recompute backward
    g_f = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"]))))(u0)

    def seq_loss(a):
        r = a
        for _ in range(k):
            r = step({"u": oracle(r, ghost)})["u"]
        return jnp.sum(jnp.sin(r))

    g_s = jax.grad(seq_loss)(u0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=RTOL, atol=ATOL)


def test_masked_dirichlet_in_chain():
    """Flagged-cell Dirichlet with a field-valued source inside the chain."""
    op = heat_op()
    k = 2
    chain = fused_stage_chain(
        [(op, {"u": "u_next"})], k, interpret=True, tile_rows=16,
        boundary={"u": ("masked_dirichlet", "obst", "uval")})
    step = stage_stepper(op, {"u": "u_next"})
    n = (40, 32)
    mask = np.zeros(n)
    mask[10:14, 8:12] = 1.0
    state = {"u": rand(0, n), "obst": jnp.asarray(mask), "uval": rand(1, n)}

    out = jax.jit(chain)(state)["u"]
    ref = state["u"]
    for _ in range(k):
        ref = jnp.where(mask != 0, state["uval"], ref)
        ref = step({"u": ref})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)

    # gradient w.r.t. the Dirichlet source field flows through the chain
    g = jax.jit(jax.grad(lambda v: jnp.sum(
        jnp.sin(chain({**state, "uval": v})["u"]))))(state["uval"])

    def seq_loss(v):
        r = state["u"]
        for _ in range(k):
            r = step({"u": jnp.where(mask != 0, v, r)})["u"]
        return jnp.sum(jnp.sin(r))

    g_ref = jax.grad(seq_loss)(state["uval"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=RTOL, atol=ATOL)


def _cavity_setup(n=24):
    solid = np.zeros((n, n))
    solid[0, :] = solid[-1, :] = solid[:, 0] = solid[:, -1] = 1.0
    op = d2q9_bgk_op(omega=1.6)
    from pystencils_autodiff_tpu.models.lbm import D2Q9_WEIGHTS
    W = np.array([float(w) for w in D2Q9_WEIGHTS])
    f0 = jnp.stack([w * jnp.ones((n, n)) for w in W], -1)
    f0 = f0 + 0.01 * rand(3, (n, n, 9))
    return op, jnp.asarray(solid), f0


@pytest.mark.parametrize("k", [2])
def test_bounce_back_cavity_chain(k):
    """Lid-driven cavity fused k>=2: bounce-back walls + moving lid inside
    the chain, bit-exact vs per-step jnp bounce_back, with the gradient
    w.r.t. the lid velocity intact (the verdict's done-criterion)."""
    n = 24
    op, solid, f0 = _cavity_setup(n)
    chain = fused_stage_chain(
        [(op, {"f": "f_out"})], k, interpret=True, tile_rows=16,
        boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))})
    step = stage_stepper(op, {"f": "f_out"})
    lid_mask = jnp.zeros((n, n)).at[0, :].set(1.0)

    def fused_run(u_lid):
        state = {"f": f0, "solid": solid,
                 "uw0": jnp.zeros((n, n)), "uw1": lid_mask * u_lid}
        return chain(state)["f"]

    def seq_run(u_lid):
        f = f0
        for _ in range(k):
            f = bounce_back(f, solid != 0,
                            u_wall=(jnp.zeros((n, n)), lid_mask * u_lid))
            f = step({"f": f})["f"]
        return f

    u_lid = 0.08
    out = jax.jit(fused_run)(u_lid)
    ref = seq_run(u_lid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)

    g_f = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(fused_run(u)))))(u_lid)
    g_s = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(seq_run(u)))))(u_lid)
    np.testing.assert_allclose(float(g_f), float(g_s), rtol=1e-11)
    assert abs(float(g_f)) > 0, "lid-velocity gradient must be alive"


def test_fused_bwd_bounce_back_streaming_canary():
    """Default-lane canary for the bounce-back transpose machinery
    (per-velocity scatter, edge-clamp folds, wall-velocity cotangents):
    a pure streaming stage keeps the stage programs tiny so the trace is
    dominated by the BC transpose itself — the k=2 BGK cavities in the
    thorough tier check the same path on the full collision operator."""
    from pystencils_autodiff_tpu import Field
    from pystencils_autodiff_tpu.models.lbm import D2Q9_VELOCITIES

    n = 16
    f = Field("f", 2, index_shape=(9,), dtype="float64")
    fo = Field("f_out", 2, index_shape=(9,), dtype="float64")
    asgs = [Assignment(fo(j), f[tuple(-c for c in cj)](j))
            for j, cj in enumerate(D2Q9_VELOCITIES)]
    op = AutoDiffOp(asgs, op_name="stream9")
    k = 1
    chain = fused_stage_chain(
        [(op, {"f": "f_out"})], k, interpret=True, fused_bwd=True,
        boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))})
    step = stage_stepper(op, {"f": "f_out"})
    solid = (jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)
             .at[:, 0].set(1.0).at[:, -1].set(1.0))
    f0 = 1.0 + 0.01 * rand(3, (n, n, 9))
    lid_mask = jnp.zeros((n, n)).at[0, :].set(1.0)

    def fused_run(u_lid):
        return chain({"f": f0, "solid": solid, "uw0": jnp.zeros((n, n)),
                      "uw1": lid_mask * u_lid})["f"]

    def seq_run(u_lid):
        r = f0
        for _ in range(k):
            r = bounce_back(r, solid != 0,
                            u_wall=(jnp.zeros((n, n)), lid_mask * u_lid))
            r = step({"f": r})["f"]
        return r

    u_lid = 0.08
    np.testing.assert_allclose(np.asarray(jax.jit(fused_run)(u_lid)),
                               np.asarray(seq_run(u_lid)),
                               rtol=RTOL, atol=ATOL)
    g_f = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(fused_run(u)))))(u_lid)
    g_s = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(seq_run(u)))))(u_lid)
    np.testing.assert_allclose(float(g_f), float(g_s), rtol=1e-11)
    assert abs(float(g_f)) > 0


def test_chain_bc_validation():
    op = heat_op()
    with pytest.raises(ValueError, match="meaningless on"):
        fused_stage_chain([(op, {"u": "u_next"})], 1, periodic=True,
                          interpret=True, boundary={"u": "neumann"})
    with pytest.raises(TypeError, match="state-field NAME"):
        fused_stage_chain([(op, {"u": "u_next"})], 1, interpret=True,
                          boundary={"u": ("masked_dirichlet",
                                          np.zeros((4, 4)), 0.0)})
    with pytest.raises(ValueError, match="not a chain state field"):
        fused_stage_chain([(op, {"u": "u_next"})], 1, interpret=True,
                          boundary={"zz": "neumann"})


def test_graph_compile_stages_with_boundary():
    """compile(fuse='stages') accepts recorded BoundaryNodes (the round-2
    verdict's lifted restriction): fused chain == node-by-node replay."""
    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    n = 32
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", rand(0, (n, n)))
    hop = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    obst = np.zeros((n, n))
    obst[12:16, 12:16] = 1.0
    with dh.timeloop() as loop:
        loop.boundary({"u": ["neumann", ("masked_dirichlet", obst, 0.7)]})
        loop.sweep(hop, {"u": "u_next"})

    k = 2
    run_fused = dh.compile(fuse="stages", k=k, interpret=True, tile_rows=16)
    run_replay = dh.compile()
    state = dh.state()
    out_f = run_fused(state, 2 * k)["u"]
    out_r = run_replay(state, 2 * k)["u"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_chain_with_boundary():
    """Fused BCs compose with the comm-avoiding sharded chain: global
    frame/mask BCs apply at global coordinates on every shard."""
    from pystencils_autodiff_tpu.parallel import ShardedChain, make_mesh

    op = heat_op()
    k = 2
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True,
                         boundary={"u": ("dirichlet", 0.5)})
    step = stage_stepper(op, {"u": "u_next"})
    ghost = ((1, 1), (1, 1))
    u0 = rand(0, (64, 32))
    out = jax.jit(chain)({"u": u0})["u"]
    ref = u0
    for _ in range(k):
        ref = step({"u": dirichlet(ref, ghost, 0.5)})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)

    g_f = jax.grad(lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"])))(u0)

    def seq_loss(a):
        r = a
        for _ in range(k):
            r = step({"u": dirichlet(r, ghost, 0.5)})["u"]
        return jnp.sum(jnp.sin(r))

    g_s = jax.grad(seq_loss)(u0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=RTOL, atol=ATOL)


# ---- fused backward WITH in-chain BCs (round-3 session 2) ----------------

def _assert_fused_bwd_matches_sequential(stages, k, state, boundary,
                                         tile_rows=None, wrt=None):
    """Build the chain with fused_bwd False/True; outputs and gradients
    (w.r.t. ``wrt`` or the first state field) must agree bit-exactly."""
    chains = {fb: fused_stage_chain(stages, k, interpret=True,
                                    boundary=boundary, fused_bwd=fb,
                                    tile_rows=tile_rows)
              for fb in (False, True)}
    wrt = wrt or next(iter(state))
    outs, grads = {}, {}
    for fb, ch in chains.items():
        outs[fb] = jax.jit(ch)(state)[wrt]

        def loss(a, _c=ch):
            return jnp.sum(jnp.sin(_c({**state, wrt: a})[wrt]))

        grads[fb] = jax.jit(jax.grad(loss))(state[wrt])
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("spec,oracle", [
    (("dirichlet", 0.5), lambda a, g: dirichlet(a, g, 0.5)),
    ("neumann", lambda a, g: neumann(a, g)),
])
def test_sharded_fused_bwd_with_frame_bc(spec, oracle):
    """ShardedChain(fused_bwd=True, boundary=…): the BC transposes run
    inside the per-shard two-phase kernel at GLOBAL coordinates; gradients
    must match the sequential single-device path exactly."""
    from pystencils_autodiff_tpu.parallel import ShardedChain, make_mesh

    op = heat_op()
    k = 2
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True, boundary={"u": spec},
                         fused_bwd=True)
    step = stage_stepper(op, {"u": "u_next"})
    ghost = ((1, 1), (1, 1))
    u0 = rand(20, (64, 32))
    cot = rand(21, (64, 32))

    @jax.jit
    def run(uv, cv):
        out, pull = jax.vjp(lambda a: chain({"u": a})["u"], uv)
        return out, pull(cv)[0]

    out, grad = run(u0, cot)

    def seq(a):
        r = a
        for _ in range(k):
            r = step({"u": oracle(r, ghost)})["u"]
        return r

    ref_out, pull = jax.vjp(seq, u0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(pull(cot)[0]),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_fused_bwd_bounce_back_cavity():
    """Sharded lid-driven cavity with fused_bwd: value AND u_lid gradient
    in one kernel per shard per k cycles, matching single-device
    sequential stepping (the cavity done-criterion, sharded edition)."""
    from pystencils_autodiff_tpu.parallel import ShardedChain, make_mesh

    op, solid, f0 = _cavity_setup(n=32)
    u_lid = 0.05 * jnp.exp(-((jnp.arange(32) - 16.0) / 8.0) ** 2)
    u_lid2 = jnp.broadcast_to(u_lid, (32, 32))
    k = 2
    mesh = make_mesh((2,), ("x",))
    chain = ShardedChain(
        op, k, mesh, {0: "x"}, carry_map={"f": "f_out"}, interpret=True,
        boundary={"f": ("bounce_back", "solid", ("u0", 0.0))},
        fused_bwd=True)

    step = stage_stepper(op, {"f": "f_out"})

    def seq(f, ul):
        r = f
        for _ in range(k):
            r = bounce_back(r, solid != 0, u_wall=(ul, 0.0), wrap=False)
            r = step({"f": r})["f"]
        return r

    @jax.jit
    def fused_loss(ul):
        out = chain({"f": f0, "solid": solid, "u0": ul})["f"]
        return jnp.sum(jnp.sin(out))

    g_f = jax.grad(fused_loss)(u_lid2)
    g_s = jax.grad(lambda ul: jnp.sum(jnp.sin(seq(f0, ul))))(u_lid2)
    out_f = jax.jit(chain)({"f": f0, "solid": solid, "u0": u_lid2})["f"]
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(seq(f0, u_lid2)),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=1e-11, atol=1e-11)
    assert float(jnp.max(jnp.abs(g_f))) > 0


@pytest.mark.parametrize("tile_rows", [None, 16])
def test_fused_bwd_neumann_matches_sequential(tile_rows):
    """neumann frame transpose inside the two-phase kernel (2D).
    ``tile_rows=16`` forces a MULTI-TILE kernel (40 rows pad to 48,
    nb=3), exercising the mirrored-reach margin accounting and the
    strict source masks across tile cuts."""
    _assert_fused_bwd_matches_sequential(
        [(heat_op(), {"u": "u_next"})], 2, {"u": rand(11, (40, 32))},
        {"u": "neumann"}, tile_rows=tile_rows)


def test_fused_bwd_neumann_wide_frame():
    """Width-2 frame (reach-2 stencil): the multi-PASS fill transpose —
    two reversed zero-fill passes per (dim, side)."""
    u, u_next = fields("u, u_next", 2)
    op = AutoDiffOp([Assignment(
        u_next[0, 0],
        u[0, 0] + 0.05 * (u[2, 0] + u[-2, 0] + u[0, 2] + u[0, -2]
                          - 4 * u[0, 0]))], op_name="wide2d")
    _assert_fused_bwd_matches_sequential(
        [(op, {"u": "u_next"})], 2, {"u": rand(12, (48, 32))},
        {"u": "neumann"})


@pytest.mark.parametrize("shape", [(16, 16, 32), (16, 12, 32)])
def test_fused_bwd_neumann_3d(shape):
    """3D frames: dim-0/dim-1/lateral fills, reversed dim order in the
    transpose; the 12-slab variant misaligns tile extents with slabs."""
    u, u_next = fields("u, u_next", 3)
    op = AutoDiffOp([Assignment(
        u_next[0, 0, 0],
        u[0, 0, 0] + 0.05 * (u[1, 0, 0] + u[-1, 0, 0] + u[0, 1, 0]
                             + u[0, -1, 0] + u[0, 0, 1] + u[0, 0, -1]
                             - 6 * u[0, 0, 0]))], op_name="heat3d_bc")
    _assert_fused_bwd_matches_sequential(
        [(op, {"u": "u_next"})], 2, {"u": rand(13, shape)},
        {"u": "neumann"})


def test_fused_bwd_pads_awkward_rows():
    """Row counts with no multiple-of-8 divisor (36 = 4·9) previously made
    the two-phase kernel raise 'no viable tile'; the bounded path now row-
    pads exactly like the forward kernel."""
    _assert_fused_bwd_matches_sequential(
        [(heat_op(), {"u": "u_next"})], 2, {"u": rand(16, (36, 32))},
        {"u": ("dirichlet", 0.25)})


def test_fused_bwd_neumann_with_masked_dirichlet():
    """neumann frame + in-domain masked dirichlet in the same cycle, with
    the gradient taken w.r.t. the dirichlet VALUE field."""
    mask = np.zeros((40, 32))
    mask[10:14, 8:12] = 1.0
    state = {"u": rand(14, (40, 32)), "obst": jnp.asarray(mask),
             "uval": rand(15, (40, 32))}
    _assert_fused_bwd_matches_sequential(
        [(heat_op(), {"u": "u_next"})], 2, state,
        {"u": ["neumann", ("masked_dirichlet", "obst", "uval")]},
        wrt="uval")


def test_fused_bwd_frame_dirichlet_matches_sequential():
    """dirichlet-frame transpose inside the two-phase kernel: gradients
    must match the sequential-recompute backward exactly."""
    op = heat_op()
    k = 2
    u0 = rand(10, (40, 32))
    chains = {fb: fused_stage_chain(
        [(op, {"u": "u_next"})], k, interpret=True,
        boundary={"u": ("dirichlet", 1.5)}, fused_bwd=fb)
        for fb in (False, True)}

    outs, grads = {}, {}
    for fb, ch in chains.items():
        outs[fb] = jax.jit(ch)({"u": u0})["u"]
        grads[fb] = jax.jit(jax.grad(
            lambda a, _c=ch: jnp.sum(jnp.sin(_c({"u": a})["u"]))))(u0)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-11, atol=1e-11)


def test_fused_bwd_masked_dirichlet_value_gradient():
    """masked_dirichlet transpose: the cotangent must route into the
    field-valued source; fused backward == sequential backward."""
    op = heat_op()
    k = 2
    n = 40
    obst = jnp.zeros((n, 32)).at[12:18, 10:20].set(1.0)
    uval = rand(11, (n, 32))
    u0 = rand(12, (n, 32))

    grads = {}
    for fb in (False, True):
        chain = fused_stage_chain(
            [(op, {"u": "u_next"})], k, interpret=True,
            boundary={"u": ("masked_dirichlet", "obst", "uval")},
            fused_bwd=fb)

        def loss(uv, _c=chain):
            out = _c({"u": u0, "obst": obst, "uval": uv})
            return jnp.sum(jnp.sin(out["u"]))

        grads[fb] = jax.jit(jax.grad(loss))(uval)
    assert float(jnp.max(jnp.abs(grads[True]))) > 0
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("k", [2])
def test_fused_bwd_bounce_back_cavity(k):
    """The lid-driven cavity with a FULLY fused value+gradient chain:
    bounce-back transposes (incl. edge-clamp folds) inside the two-phase
    kernel; u_lid gradient matches the sequential backward."""
    n = 24
    op, solid, f0 = _cavity_setup(n)
    lid_mask = jnp.zeros((n, n)).at[0, :].set(1.0)

    grads, outs = {}, {}
    for fb in (False, True):
        chain = fused_stage_chain(
            [(op, {"f": "f_out"})], k, interpret=True,
            boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))},
            fused_bwd=fb)

        def run(u_lid, _c=chain):
            state = {"f": f0, "solid": solid,
                     "uw0": jnp.zeros((n, n)), "uw1": lid_mask * u_lid}
            return _c(state)["f"]

        outs[fb] = jax.jit(run)(0.08)
        grads[fb] = jax.jit(jax.grad(
            lambda u, _r=run: jnp.sum(jnp.sin(_r(u)))))(0.08)

    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=RTOL, atol=ATOL)
    assert abs(float(grads[True])) > 0
    np.testing.assert_allclose(float(grads[True]), float(grads[False]),
                               rtol=1e-11)


def test_fused_bwd_bounce_back_f_gradient():
    """Gradient w.r.t. the distributions themselves (exercises the
    transpose scatter along every velocity incl. diagonals)."""
    n = 24
    op, solid, f0 = _cavity_setup(n)

    grads = {}
    for fb in (False, True):
        chain = fused_stage_chain(
            [(op, {"f": "f_out"})], 2, interpret=True,
            boundary={"f": ("bounce_back", "solid")}, fused_bwd=fb)

        def loss(fv, _c=chain):
            return jnp.sum(jnp.sin(_c({"f": fv, "solid": solid})["f"]))

        grads[fb] = jax.jit(jax.grad(loss))(f0)
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-11, atol=1e-11)


def test_fused_bwd_rejects_non_invariant_bc_params():
    """Phase 2 reads BC parameter planes from the original input block:
    carry-written masks/values and target-aliased values are rejected at
    build time instead of silently using stale planes."""
    u, m, u_next = fields("u, m, u_next", 2)
    op2 = AutoDiffOp([Assignment(
        u_next[0, 0], u[0, 0] + 0.1 * m[0, 0]
        + 0.1 * (u[1, 0] + u[-1, 0] - 2 * u[0, 0]))], op_name="heat_m")
    with pytest.raises(ValueError, match="carry targets"):
        fused_stage_chain(
            [(op2, {"u": "u_next", "m": "u_next"})], 2, interpret=True,
            boundary={"u": ("masked_dirichlet", "m", 0.5)},
            fused_bwd=True)
    op = heat_op()
    with pytest.raises(ValueError, match="aliases"):
        fused_stage_chain(
            [(op, {"u": "u_next"})], 2, interpret=True,
            boundary={"u": ("masked_dirichlet", "obst", "u")},
            fused_bwd=True)


@pytest.mark.parametrize("spec,oracle", [
    (("dirichlet", 0.5, (0,)), lambda a, g: dirichlet(a, g, 0.5, dims=(0,))),
    (("neumann", (1,)), lambda a, g: neumann(a, g, dims=(1,))),
])
def test_fused_bwd_frame_bc_dim_subsets(spec, oracle):
    """Frame BCs restricted to a dim SUBSET (dirichlet rows-only,
    neumann cols-only): masks/passes must skip the excluded dims in both
    the forward kernel and the transposes."""
    op = heat_op()
    k = 2
    u0 = rand(30, (40, 32))
    step = stage_stepper(op, {"u": "u_next"})
    ghost = ((1, 1), (1, 1))
    chain = fused_stage_chain([(op, {"u": "u_next"})], k, interpret=True,
                              boundary={"u": spec}, fused_bwd=True)
    out = jax.jit(chain)({"u": u0})["u"]
    ref = u0
    for _ in range(k):
        ref = step({"u": oracle(ref, ghost)})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)

    g_f = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"]))))(u0)

    def seq_loss(a):
        r = a
        for _ in range(k):
            r = step({"u": oracle(r, ghost)})["u"]
        return jnp.sum(jnp.sin(r))

    g_s = jax.grad(seq_loss)(u0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=1e-11, atol=1e-11)


def test_fused_bwd_bounce_back_soa_layout():
    """bounce-back + fused backward on an 'soa' (component-major)
    population field: plane slicing must stay consistent between the BC
    transpose reads and the state planes."""
    from pystencils_autodiff_tpu import Field
    from pystencils_autodiff_tpu.models.lbm import D2Q9_VELOCITIES

    n = 16
    f = Field("f", 2, index_shape=(9,), dtype="float64", layout="soa")
    fo = Field("f_out", 2, index_shape=(9,), dtype="float64", layout="soa")
    asgs = [Assignment(fo(j), f[tuple(-c for c in cj)](j))
            for j, cj in enumerate(D2Q9_VELOCITIES)]
    op = AutoDiffOp(asgs, op_name="stream9_soa")
    chain = fused_stage_chain(
        [(op, {"f": "f_out"})], 1, interpret=True, fused_bwd=True,
        boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))})
    step = stage_stepper(op, {"f": "f_out"})
    solid = (jnp.zeros((n, n)).at[0, :].set(1.0).at[-1, :].set(1.0)
             .at[:, 0].set(1.0).at[:, -1].set(1.0))
    f0 = 1.0 + 0.01 * rand(31, (9, n, n))        # SoA: components leading
    lid_mask = jnp.zeros((n, n)).at[0, :].set(1.0)

    def fused_run(u_lid):
        return chain({"f": f0, "solid": solid, "uw0": jnp.zeros((n, n)),
                      "uw1": lid_mask * u_lid})["f"]

    def seq_run(u_lid):
        # bounce_back's jnp oracle is AoS (trailing Q); round-trip the
        # SoA planes through it
        r = jnp.moveaxis(
            bounce_back(jnp.moveaxis(f0, 0, -1), solid != 0,
                        u_wall=(jnp.zeros((n, n)), lid_mask * u_lid)),
            -1, 0)
        return step({"f": r})["f"]

    u_lid = 0.08
    np.testing.assert_allclose(np.asarray(jax.jit(fused_run)(u_lid)),
                               np.asarray(seq_run(u_lid)),
                               rtol=RTOL, atol=ATOL)
    g_f = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(fused_run(u)))))(u_lid)
    g_s = jax.jit(jax.grad(lambda u: jnp.sum(jnp.sin(seq_run(u)))))(u_lid)
    np.testing.assert_allclose(float(g_f), float(g_s), rtol=1e-11)


# ---------------------------------------------------------------------------
# sponge (absorbing-layer) BC — round 3: non-reflecting boundaries for
# wave/FWI time loops fuse into the chains like every other BC kind


def test_cerjan_damping_profile():
    from pystencils_autodiff_tpu.boundary import cerjan_damping

    d = cerjan_damping((32, 24), width=6, alpha=0.1, dtype=jnp.float64)
    assert d.shape == (32, 24)
    # interior is exactly 1, boundary cells are the most damped
    assert float(d[16, 12]) == 1.0
    assert float(d[0, 12]) < float(d[3, 12]) < float(d[5, 12]) < 1.0
    np.testing.assert_allclose(float(d[0, 12]), np.exp(-(0.1 * 6) ** 2),
                               rtol=1e-12)
    # corners damp with the product of both dims' factors
    np.testing.assert_allclose(float(d[0, 0]), float(d[0, 12]) ** 2,
                               rtol=1e-12)
    # free side stays undamped
    df = cerjan_damping((32, 24), width=6, alpha=0.1, free=[(0, 0)],
                        dtype=jnp.float64)
    assert float(df[0, 12]) == 1.0
    assert float(df[-1, 12]) < 1.0


def test_sponge_in_chain():
    """Fused sponge == per-step jnp sponge, state and (recompute-backward)
    gradients — field-valued and scalar damping."""
    from pystencils_autodiff_tpu.boundary import cerjan_damping, sponge

    op = heat_op()
    k = 2
    n = (40, 32)
    u0 = rand(0, n)
    damp = cerjan_damping(n, width=5, alpha=0.08, dtype=jnp.float64)
    step = stage_stepper(op, {"u": "u_next"})

    for spec, oracle_damp in ((("sponge", "damp"), damp),
                              (("sponge", 0.93), 0.93)):
        chain = fused_stage_chain([(op, {"u": "u_next"})], k,
                                  interpret=True, tile_rows=16,
                                  boundary={"u": spec})
        state = {"u": u0}
        if isinstance(spec[1], str):
            state["damp"] = damp
        out = jax.jit(chain)(state)["u"]
        ref = u0
        for _ in range(k):
            ref = step({"u": sponge(ref, oracle_damp)})["u"]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=RTOL, atol=ATOL)

        g_f = jax.jit(jax.grad(
            lambda a, _c=chain, _s=state: jnp.sum(jnp.sin(
                _c({**_s, "u": a})["u"]))))(u0)

        def seq_loss(a, _d=oracle_damp):
            r = a
            for _ in range(k):
                r = step({"u": sponge(r, _d)})["u"]
            return jnp.sum(jnp.sin(r))

        g_s = jax.grad(seq_loss)(u0)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                   rtol=RTOL, atol=ATOL)


def test_sponge_periodic_chain():
    """sponge is maskless and composes with periodic chain domains (frame
    BCs are rejected there; the damping profile is not a frame fill)."""
    from pystencils_autodiff_tpu.boundary import cerjan_damping, sponge

    op = heat_op()
    k = 2
    n = (32, 32)
    u0 = rand(3, n)
    damp = cerjan_damping(n, width=4, alpha=0.1, dtype=jnp.float64)
    chain = fused_stage_chain([(op, {"u": "u_next"})], k, interpret=True,
                              tile_rows=8, periodic=True,
                              boundary={"u": ("sponge", "damp")})
    step = stage_stepper(op, {"u": "u_next"}, periodic=True)
    out = jax.jit(chain)({"u": u0, "damp": damp})["u"]
    ref = u0
    for _ in range(k):
        ref = step({"u": sponge(ref, damp)})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k", [1, 3])
def test_sponge_fused_bwd_matches_sequential(k):
    """Two-phase fused backward with the sponge transpose: gradients
    w.r.t. the state AND the damping profile match the sequential
    recompute backward exactly (the damp gradient is the one BC
    transpose that consumes a saved pre-BC primal plane)."""
    from pystencils_autodiff_tpu.boundary import cerjan_damping

    op = heat_op()
    n = (40, 32)
    u0 = rand(7, n)
    damp = cerjan_damping(n, width=5, alpha=0.08, dtype=jnp.float64)

    outs, gus, gds = {}, {}, {}
    for fb in (False, True):
        chain = fused_stage_chain(
            [(op, {"u": "u_next"})], k, interpret=True, fused_bwd=fb,
            boundary={"u": [("sponge", "damp"), ("dirichlet", 0.0)]})

        def loss(a, d, _c=chain):
            out = _c({"u": a, "damp": d})
            return jnp.sum(jnp.sin(out["u"]))

        outs[fb] = jax.jit(chain)({"u": u0, "damp": damp})["u"]
        gus[fb], gds[fb] = jax.jit(jax.grad(loss, argnums=(0, 1)))(u0, damp)
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(gus[True]),
                               np.asarray(gus[False]),
                               rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(gds[True]),
                               np.asarray(gds[False]),
                               rtol=1e-11, atol=1e-11)


def test_sponge_fused_bwd_two_stage_wave():
    """Absorbing boundary on a leapfrog wave chain (the FWI use case):
    sponge on both wavefields, fused two-phase backward, gradient w.r.t.
    the velocity field intact and equal to the sequential backward."""
    from pystencils_autodiff_tpu.boundary import cerjan_damping
    from pystencils_autodiff_tpu.models import wave_step_op

    op = wave_step_op(dtype="float64")
    k = 2
    n = (36, 32)
    u0, up0 = rand(20, n), rand(21, n)
    c0 = 2.0 + 0.1 * jnp.abs(rand(22, n))
    damp = cerjan_damping(n, width=4, alpha=0.1, free=[(0, 0)],
                          dtype=jnp.float64)
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}

    grads = {}
    for fb in (False, True):
        chain = fused_stage_chain(
            [(op, carry)], k, interpret=True, fused_bwd=fb,
            boundary={"u_curr": ("sponge", "damp"),
                      "u_prev": ("sponge", "damp")})

        def loss(c, _c=chain):
            out = _c({"u_curr": u0, "u_prev": up0, "c": c, "damp": damp})
            return jnp.sum(jnp.sin(out["u_curr"]))

        grads[fb] = jax.jit(jax.grad(loss))(c0)
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-11, atol=1e-11)


def test_sponge_index_field_aos_and_soa():
    """sponge on a multi-component population field: the damping plane
    broadcasts over components in both storage layouts."""
    from pystencils_autodiff_tpu import Field
    from pystencils_autodiff_tpu.boundary import cerjan_damping, sponge
    from pystencils_autodiff_tpu.models.lbm import D2Q9_VELOCITIES

    n = 16
    damp = cerjan_damping((n, n), width=3, alpha=0.1, dtype=jnp.float64)
    for layout in ("c", "soa"):
        f = Field("f", 2, index_shape=(9,), dtype="float64", layout=layout)
        fo = Field("f_out", 2, index_shape=(9,), dtype="float64",
                   layout=layout)
        asgs = [Assignment(fo(j), f[tuple(-c for c in cj)](j))
                for j, cj in enumerate(D2Q9_VELOCITIES)]
        op = AutoDiffOp(asgs, op_name=f"stream9_sponge_{layout}")
        for fb in (False, True):
            chain = fused_stage_chain(
                [(op, {"f": "f_out"})], 2, interpret=True, fused_bwd=fb,
                boundary={"f": ("sponge", "damp")})
            f0 = 1.0 + 0.01 * rand(31, ((9, n, n) if layout == "soa"
                                        else (n, n, 9)))
            step = stage_stepper(op, {"f": "f_out"})

            def seq(a):
                r = a
                for _ in range(2):
                    if layout == "soa":
                        d = sponge(jnp.moveaxis(r, 0, -1), damp)
                        r = step({"f": jnp.moveaxis(d, -1, 0)})["f"]
                    else:
                        r = step({"f": sponge(r, damp)})["f"]
                return r

            out = jax.jit(chain)({"f": f0, "damp": damp})["f"]
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(seq(f0)),
                                       rtol=RTOL, atol=ATOL)
            g_f = jax.jit(jax.grad(
                lambda a, _c=chain: jnp.sum(jnp.sin(
                    _c({"f": a, "damp": damp})["f"]))))(f0)
            g_s = jax.grad(lambda a: jnp.sum(jnp.sin(seq(a))))(f0)
            np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                                       rtol=1e-11, atol=1e-11)
