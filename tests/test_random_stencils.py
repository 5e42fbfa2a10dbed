"""Randomized stencil property tests: for seeded random assignment
collections (random offsets, coefficients, nonlinearities, multiple
fields), the symbolically derived adjoint must match ``jax.grad`` of the
jnp oracle — across lowerings and diff modes.  A breadth sweep the
reference's hand-picked cases can't give."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import sympy as sp

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, DiffModes, fields

RTOL, ATOL = 1e-10, 1e-10


def _random_op(rng: np.random.Generator, ndim: int, seed_tag: str):
    names = ["a", "b", "c"][: rng.integers(1, 4)]
    ins = fields(", ".join(names), ndim)
    ins = ins if isinstance(ins, tuple) else (ins,)
    out_names = ["u", "v"][: rng.integers(1, 3)]
    outs = fields(", ".join(out_names), ndim)
    outs = outs if isinstance(outs, tuple) else (outs,)

    def rand_access(f):
        off = tuple(int(rng.integers(-2, 3)) for _ in range(ndim))
        return f[off]

    def rand_term():
        f = ins[rng.integers(len(ins))]
        acc = rand_access(f)
        kind = rng.integers(4)
        if kind == 0:
            return float(np.round(rng.normal(), 2)) * acc
        if kind == 1:
            return acc * rand_access(ins[rng.integers(len(ins))])
        if kind == 2:
            return acc ** 2
        return sp.sin(acc)

    asms = []
    for o in outs:
        expr = sum((rand_term() for _ in range(int(rng.integers(2, 5)))),
                   sp.Integer(0))
        asms.append(Assignment(o.center, expr))
    return AutoDiffOp(asms, op_name=f"rand_{seed_tag}")


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("ndim", [1, 2])
def test_random_stencil_gradients(seed, ndim):
    rng = np.random.default_rng(1000 * ndim + seed)
    op = _random_op(rng, ndim, f"{ndim}d_{seed}")
    f = op.jax_function(lowering="jnp")
    shape = (17,) if ndim == 1 else (13, 14)
    arrays = {n: jnp.asarray(rng.standard_normal(shape))
              for n in f.input_names}

    from pystencils_autodiff_tpu.ops import forward_program
    from pystencils_autodiff_tpu.ops.jnp_ref import make_jnp_stencil

    # oracle: jax.grad THROUGH the raw jnp lowering (no custom_vjp)
    prog = forward_program(op)
    raw = make_jnp_stencil(prog)

    def loss_custom(args):
        out = f(**dict(zip(f.input_names, args)))
        outs = out if isinstance(out, tuple) else (out,)
        return sum(jnp.sum(jnp.sin(o)) for o in outs)

    def loss_raw(args):
        outs = raw(dict(zip(f.input_names, args)))
        return sum(jnp.sum(jnp.sin(outs[n])) for n in prog.output_names)

    args = tuple(arrays[n] for n in f.input_names)
    v1, v2 = loss_custom(args), loss_raw(args)
    np.testing.assert_allclose(v1, v2, rtol=RTOL, atol=ATOL)
    g1 = jax.grad(loss_custom)(args)
    g2 = jax.grad(loss_raw)(args)
    for n, a, b in zip(f.input_names, g1, g2):
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL,
                                   err_msg=f"seed={seed} ndim={ndim} {n}")


@pytest.mark.parametrize("seed", range(4))
def test_random_stencil_modes_agree(seed):
    rng = np.random.default_rng(77 + seed)
    results = []
    for mode in (DiffModes.TRANSPOSED, DiffModes.TF_MAD):
        rng2 = np.random.default_rng(77 + seed)  # same op both times
        op = _random_op(rng2, 2, f"m{seed}_{mode.name}")
        op.diff_mode = mode
        f = op.jax_function()
        arrays = tuple(jnp.asarray(np.random.default_rng(5).standard_normal((11, 12)))
                       for _ in f.input_names)

        def loss(args):
            out = f(*args)
            outs = out if isinstance(out, tuple) else (out,)
            return sum(jnp.sum(o ** 2) for o in outs)

        results.append(jax.grad(loss)(arrays))
    for a, b in zip(*results):
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("seed", range(3))
def test_random_stencil_pallas_blocked(seed):
    rng = np.random.default_rng(300 + seed)
    op = _random_op(rng, 2, f"pb{seed}")
    f_pal = op.jax_function(lowering="pallas", interpret=True,
                            strategy="blocked", tile_rows=8)
    f_ref = op.jax_function(lowering="jnp")
    arrays = tuple(jnp.asarray(rng.standard_normal((24, 16)))
                   for _ in f_pal.input_names)

    def loss(f):
        def inner(args):
            out = f(*args)
            outs = out if isinstance(out, tuple) else (out,)
            return sum(jnp.sum(jnp.cos(o)) for o in outs)
        return inner

    np.testing.assert_allclose(loss(f_pal)(arrays), loss(f_ref)(arrays),
                               rtol=RTOL, atol=ATOL)
    g1 = jax.grad(loss(f_pal))(arrays)
    g2 = jax.grad(loss(f_ref))(arrays)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("seed", range(2))
def test_random_stencil_pallas_blocked_3d(seed):
    """Flattened 3D blocked path against the oracle on random stencils."""
    rng = np.random.default_rng(500 + seed)
    op = _random_op(rng, 3, f"pb3_{seed}")
    f_pal = op.jax_function(lowering="pallas", interpret=True,
                            strategy="blocked")
    f_ref = op.jax_function(lowering="jnp")
    arrays = tuple(jnp.asarray(rng.standard_normal((10, 12, 11)))
                   for _ in f_pal.input_names)

    def loss(f):
        def inner(args):
            out = f(*args)
            outs = out if isinstance(out, tuple) else (out,)
            return sum(jnp.sum(jnp.cos(o)) for o in outs)
        return inner

    np.testing.assert_allclose(loss(f_pal)(arrays), loss(f_ref)(arrays),
                               rtol=RTOL, atol=ATOL)
    g1 = jax.grad(loss(f_pal))(arrays)
    g2 = jax.grad(loss(f_ref))(arrays)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL)


# ---- fuzzing the fused two-phase backward with in-chain BCs ---------------

def _random_chain_op(rng: np.random.Generator, seed_tag: str):
    """Random self-map u -> u_next (chainable), reach <= 2, mixed
    linear/nonlinear terms."""
    u, u_next = fields("u, u_next", 2)

    def acc():
        off = (int(rng.integers(-2, 3)), int(rng.integers(-2, 3)))
        return u[off]

    def term():
        kind = rng.integers(4)
        if kind == 0:
            return float(np.round(rng.normal(0, 0.3), 2)) * acc()
        if kind == 1:
            return 0.1 * acc() * acc()
        if kind == 2:
            return 0.1 * acc() ** 2
        return 0.2 * sp.sin(acc())

    expr = u[0, 0] + sum((term() for t in range(int(rng.integers(2, 5)))),
                         sp.Integer(0))
    return AutoDiffOp([Assignment(u_next.center, expr)],
                      op_name=f"randchain_{seed_tag}")


@pytest.mark.parametrize("seed", range(4))
def test_random_chain_fused_bwd_with_bcs(seed):
    """Property sweep over the MOST complex kernel (the two-phase fused
    adjoint with in-chain BC transposes): for random nonlinear self-map
    stencils, random chain depth, and a random BC kind, the fused
    backward must match the sequential-recompute backward bit-for-bit."""
    from pystencils_autodiff_tpu.ops import fused_stage_chain

    rng = np.random.default_rng(7000 + seed)
    op = _random_chain_op(rng, str(seed))
    k = int(rng.integers(1, 3))
    shape = (int(rng.integers(20, 41)), 32)
    state = {"u": jnp.asarray(rng.standard_normal(shape))}
    bc_kind = ["neumann", "dirichlet", "masked_dirichlet",
               None][rng.integers(4)]
    if bc_kind == "masked_dirichlet":
        mask = np.zeros(shape)
        mask[rng.integers(2, 10):rng.integers(12, 18),
             rng.integers(2, 10):rng.integers(12, 18)] = 1.0
        state["m"] = jnp.asarray(mask)
        state["val"] = jnp.asarray(rng.standard_normal(shape))
        boundary = {"u": ("masked_dirichlet", "m", "val")}
        wrt = "val"
    elif bc_kind == "dirichlet":
        boundary = {"u": ("dirichlet", float(np.round(rng.normal(), 2)))}
        wrt = "u"
    elif bc_kind == "neumann":
        boundary = {"u": "neumann"}
        wrt = "u"
    else:
        boundary, wrt = None, "u"

    outs, grads = {}, {}
    for fb in (False, True):
        chain = fused_stage_chain([(op, {"u": "u_next"})], k,
                                  interpret=True, boundary=boundary,
                                  fused_bwd=fb)
        outs[fb] = jax.jit(chain)(state)["u"]

        def loss(a, _c=chain):
            return jnp.sum(jnp.sin(_c({**state, wrt: a})["u"]))

        grads[fb] = jax.jit(jax.grad(loss))(state[wrt])
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=1e-12, atol=1e-12,
                               err_msg=f"fwd seed={seed} bc={bc_kind} k={k}")
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-10, atol=1e-10,
                               err_msg=f"bwd seed={seed} bc={bc_kind} k={k}")


@pytest.mark.parametrize("seed", range(3))
def test_random_two_stage_chain_fused_bwd(seed):
    """Random heterogeneous 2-stage cycles: stage A writes an
    intermediate w from u, stage B updates u from BOTH u and w — fuzzing
    the per-stage carry transpose (feeds/passes) and the saved-plane
    selection in the two-phase backward against sequential recompute."""
    from pystencils_autodiff_tpu.ops import fused_stage_chain

    rng = np.random.default_rng(8100 + seed)
    u, w, w_out, u_next = fields("u, w, w_out, u_next", 2)

    def acc(f):
        return f[(int(rng.integers(-1, 2)), int(rng.integers(-1, 2)))]

    def terms(f, n):
        return sum((0.1 * float(np.round(rng.normal(), 2)) * acc(f)
                    if rng.integers(2) else 0.1 * sp.sin(acc(f))
                    for _ in range(n)), sp.Integer(0))

    op_a = AutoDiffOp([Assignment(w_out.center,
                                  terms(u, int(rng.integers(2, 4))))],
                      op_name=f"stgA_{seed}")
    op_b = AutoDiffOp([Assignment(
        u_next.center,
        u[0, 0] + terms(w, int(rng.integers(1, 3)))
        + terms(u, int(rng.integers(1, 3))))], op_name=f"stgB_{seed}")
    stages = [(op_a, {"w": "w_out"}), (op_b, {"u": "u_next"})]
    k = int(rng.integers(1, 3))
    state = {"u": jnp.asarray(rng.standard_normal((24, 32))),
             "w": jnp.zeros((24, 32))}

    outs, grads = {}, {}
    for fb in (False, True):
        chain = fused_stage_chain(stages, k, interpret=True, fused_bwd=fb,
                                  intermediates=("w",))
        outs[fb] = jax.jit(chain)(state)["u"]

        def loss(a, _c=chain):
            return jnp.sum(jnp.sin(_c({**state, "u": a})["u"]))

        grads[fb] = jax.jit(jax.grad(loss))(state["u"])
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=1e-12, atol=1e-12,
                               err_msg=f"fwd seed={seed} k={k}")
    np.testing.assert_allclose(np.asarray(grads[True]),
                               np.asarray(grads[False]),
                               rtol=1e-10, atol=1e-10,
                               err_msg=f"bwd seed={seed} k={k}")
