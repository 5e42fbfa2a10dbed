"""Flagged-cell (masked) boundary handling: bounce-back/no-slip for LBM and
generic masked value/mirror BCs for scalar fields, with exact adjoints.

Reference anchor: pystencils ``BoundaryHandling`` with boundary objects over
flag arrays (SURVEY.md §1 L1); the TPU rebuild implements the capability as
pure-jnp masked fills whose adjoints JAX derives (boundary.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.boundary import (BoundaryHandling, bounce_back,
                                              masked_dirichlet, masked_neumann)
from pystencils_autodiff_tpu.models.lbm import (D2Q9_VELOCITIES, D2Q9_WEIGHTS,
                                                d2q9_bgk_op, macroscopic)
from pystencils_autodiff_tpu.timeloop import make_time_stepper


def box_mask(n):
    """Solid 1-wide frame around an n x n domain (closed box)."""
    solid = np.zeros((n, n), bool)
    solid[0, :] = solid[-1, :] = True
    solid[:, 0] = solid[:, -1] = True
    return jnp.asarray(solid)


def equilibrium(rho, ux, uy):
    comps = []
    for (cx, cy), w in zip(D2Q9_VELOCITIES, [float(w) for w in D2Q9_WEIGHTS]):
        cu = cx * ux + cy * uy
        comps.append(w * rho * (1 + 3 * cu + 4.5 * cu ** 2
                                - 1.5 * (ux ** 2 + uy ** 2)))
    return jnp.stack(comps, -1)


def cavity_step(op, solid, u_lid, lowering="jnp"):
    """One bounce-back + stream/collide step; lid velocity enters through
    the wall mask so it is traced (differentiable)."""
    lid = jnp.zeros(solid.shape, jnp.float64).at[0, :].set(1.0) * u_lid
    bh = BoundaryHandling(op, {"f": ("bounce_back", solid, (jnp.zeros_like(lid), lid))})
    return make_time_stepper(op, {"f": "f_out"}, boundary=bh,
                             lowering=lowering)


# lid on row 0 moving along axis 1 (+y in offset coords); u_wall components
# are per-axis: (axis0, axis1) = (0, u_lid)


def test_rest_state_is_fixed_point():
    """rho=1, u=0 in a closed no-slip box: equilibrium must be an exact
    fixed point of bounce-back + stream + collide."""
    n = 16
    op = d2q9_bgk_op(omega=1.6)
    solid = box_mask(n)
    f0 = equilibrium(jnp.ones((n, n)), 0.0, 0.0)
    bh = BoundaryHandling(op, {"f": ("bounce_back", solid)})
    step = make_time_stepper(op, {"f": "f_out"}, boundary=bh)
    f = f0
    for _ in range(3):
        f = step({"f": f})["f"]
    fluid = ~np.asarray(solid)
    np.testing.assert_allclose(np.asarray(f)[fluid], np.asarray(f0)[fluid],
                               rtol=1e-14, atol=1e-14)


def test_mass_conservation_stationary_walls():
    """Half-way bounce-back returns every outgoing population: total fluid
    mass is conserved to roundoff with stationary walls."""
    n = 24
    op = d2q9_bgk_op(omega=1.7)
    solid = box_mask(n)
    yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
    ux = 0.02 * jnp.sin(2 * jnp.pi * xx / n) * (~solid)
    f = equilibrium(jnp.ones((n, n)), ux, 0.0)
    bh = BoundaryHandling(op, {"f": ("bounce_back", solid)})
    step = make_time_stepper(op, {"f": "f_out"}, boundary=bh)
    fluid = ~np.asarray(solid)
    mass0 = float(np.asarray(f)[fluid].sum())
    for _ in range(20):
        f = step({"f": f})["f"]
    mass = float(np.asarray(f)[fluid].sum())
    assert abs(mass - mass0) < 1e-10 * mass0


def test_cavity_vortex_forms():
    """Lid-driven cavity: lid drags fluid along +axis1 at the top; the
    primary vortex rotates clockwise (negative vorticity at the centre) and
    the velocity profile on the vertical centreline changes sign."""
    n, steps, u_lid = 32, 600, 0.1
    op = d2q9_bgk_op(omega=1.7)
    solid = box_mask(n)
    step = cavity_step(op, solid, u_lid)

    @jax.jit
    def run(f):
        return jax.lax.fori_loop(0, steps, lambda _, s: step(s), {"f": f})["f"]

    f = run(equilibrium(jnp.ones((n, n)), 0.0, 0.0))
    rho, u0, u1 = macroscopic(f)
    u0, u1 = np.asarray(u0), np.asarray(u1)
    assert np.all(np.isfinite(u1[1:-1, 1:-1]))  # solid frame: rho=0 -> NaN, unused
    col = n // 2
    prof = u1[1:-1, col]                 # u_along-lid on vertical centreline
    assert prof[0] > 0.01                # dragged along under the lid
    assert prof.min() < -1e-3            # return flow near the bottom
    # clockwise rotation: d(u1)/d(axis0) < 0 through the core
    core = prof[: n // 2].mean() - prof[n // 2:].mean()
    assert core > 0.01


def _cavity_loss(lowering, n=12, steps=2, omega=1.6):
    """Jitted loss(u_lid): final fluid kinetic energy of a small cavity."""
    op = d2q9_bgk_op(omega=omega)
    solid = box_mask(n)
    f0 = equilibrium(jnp.ones((n, n)), 0.0, 0.0)
    fluid = jnp.asarray(~np.asarray(solid))

    @jax.jit
    def loss(u_lid):
        step = cavity_step(op, solid, u_lid, lowering=lowering)
        f = f0
        for _ in range(steps):
            f = step({"f": f})["f"]
        rho, u0, u1 = macroscopic(f + 1e-30)
        return 0.5 * jnp.sum(jnp.where(fluid, rho * (u0 ** 2 + u1 ** 2), 0.0))

    return loss


def test_cavity_gradient_wrt_lid_velocity():
    """Gradient of final kinetic energy w.r.t. the (scalar) lid velocity is
    finite and matches central finite differences (jnp lowering)."""
    loss = _cavity_loss("jnp")
    g = jax.grad(loss)(0.08)
    assert np.isfinite(float(g))
    eps = 1e-6
    fd = (loss(0.08 + eps) - loss(0.08 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_cavity_gradient_pallas_matches_jnp():
    """The Pallas lowering's lid-velocity gradient equals the jnp
    reference's (one grad evaluation each)."""
    g_p = jax.grad(_cavity_loss("pallas", steps=1))(0.08)
    g_j = jax.grad(_cavity_loss("jnp", steps=1))(0.08)
    np.testing.assert_allclose(float(g_p), float(g_j), rtol=1e-11)


def test_masked_dirichlet_semantics_and_adjoint():
    mask = jnp.zeros((8, 8), bool).at[2:4, 3:6].set(True)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    y = masked_dirichlet(x, mask, 3.0)
    assert np.all(np.asarray(y)[np.asarray(mask)] == 3.0)
    np.testing.assert_array_equal(np.asarray(y)[~np.asarray(mask)],
                                  np.asarray(x)[~np.asarray(mask)])
    # adjoint: cotangents vanish inside the mask, pass through outside
    g = jax.grad(lambda a: jnp.sum(masked_dirichlet(a, mask, 3.0) ** 2))(x)
    assert np.all(np.asarray(g)[np.asarray(mask)] == 0.0)
    np.testing.assert_allclose(np.asarray(g)[~np.asarray(mask)],
                               2 * np.asarray(x)[~np.asarray(mask)])
    # traced value: gradient w.r.t. the boundary value is the masked count
    gv = jax.grad(lambda v: jnp.sum(masked_dirichlet(x, mask, v)))(0.0)
    assert float(gv) == float(mask.sum())


def test_masked_neumann_zero_normal_gradient():
    """A flagged cell with one fluid neighbour copies it (mirror); with
    several, the mean; obstacle interiors (no fluid neighbour) read 0."""
    x = jnp.arange(25, dtype=jnp.float64).reshape(5, 5)
    mask = jnp.zeros((5, 5), bool).at[1:4, 1:4].set(True)
    y = np.asarray(masked_neumann(x, mask))
    # corner of the flagged block: two fluid neighbours (up, left)
    assert y[1, 1] == (x[0, 1] + x[1, 0]) / 2
    # edge centre: one fluid neighbour
    assert y[1, 2] == x[0, 2]
    # interior of the block: no fluid neighbour -> 0
    assert y[2, 2] == 0.0
    # fluid untouched
    assert y[0, 0] == x[0, 0]
    # differentiable
    g = jax.grad(lambda a: jnp.sum(masked_neumann(a, mask) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_neumann_no_wrap():
    """Shifts must not wrap: a flagged cell on the domain edge must not read
    the opposite edge."""
    x = jnp.zeros((4, 4), jnp.float64).at[3, :].set(100.0)
    mask = jnp.zeros((4, 4), bool).at[0, 1].set(True)
    y = np.asarray(masked_neumann(x, mask))
    # neighbours of (0,1): (1,1)=0, (0,0)=0, (0,2)=0 — never (3,1)=100
    assert y[0, 1] == 0.0


def test_boundary_handling_spec_chain():
    """A list spec applies frame fill then masked BC in order."""
    mask = jnp.zeros((6, 6), bool).at[3, 3].set(True)
    bh = BoundaryHandling([(1, 1), (1, 1)],
                          {"u": [("dirichlet", 7.0),
                                 ("masked_dirichlet", mask, 9.0)]})
    u = jnp.zeros((6, 6))
    out = np.asarray(bh({"u": u})["u"])
    assert out[0, 0] == 7.0 and out[3, 3] == 9.0 and out[2, 2] == 0.0


def test_bounce_back_custom_velocities_need_weights_for_moving_wall():
    """Custom velocity set + moving wall without matching weights raises
    instead of crashing on weights[j] (review finding)."""
    from pystencils_autodiff_tpu.models.lbm import D3Q19_VELOCITIES

    f = jnp.zeros((4, 4, 4, 19))
    solid = jnp.zeros((4, 4, 4), bool).at[0].set(True)
    with pytest.raises(ValueError, match="matching lattice weights"):
        bounce_back(f, solid, u_wall=(0.0, 0.0, 0.1),
                    velocities=D3Q19_VELOCITIES)


def test_spec_kwargs_reach_bc_fn():
    """The spec's trailing dict passes keyword args through — wrap=True
    bounce-back on a periodic domain was unreachable from the spec form
    (code-review finding)."""
    n = 8
    solid = np.zeros((n, n), bool)
    solid[0, :] = True  # wall touching the domain edge: wrap vs clamp differ
    f = jnp.asarray(np.random.default_rng(0).random((n, n, 9)),
                    jnp.float64)

    bh_wrap = BoundaryHandling((1, 1), {"f": ("bounce_back", solid,
                                              {"wrap": True})})
    bh_clamp = BoundaryHandling((1, 1), {"f": ("bounce_back", solid)})

    direct_wrap = bounce_back(f, solid, wrap=True)
    direct_clamp = bounce_back(f, solid)
    np.testing.assert_array_equal(bh_wrap({"f": f})["f"], direct_wrap)
    np.testing.assert_array_equal(bh_clamp({"f": f})["f"], direct_clamp)
    assert float(jnp.max(jnp.abs(direct_wrap - direct_clamp))) > 0


def test_recorded_wrap_conflict_raises_in_fused_compile():
    """A recorded bounce_back(wrap=True) cannot fuse into a bounded
    chain: fused kernels wrap exactly when the chain domain is periodic."""
    from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling

    n = 12
    solid = np.zeros((n, n), bool)
    solid[0, :] = solid[-1, :] = solid[:, 0] = solid[:, -1] = True
    dh = GraphDataHandling((n - 2, n - 2), ghost_layers=1,
                           default_dtype=jnp.float64)
    dh.add_field("f", index_shape=(9,), init=0.0)
    op = d2q9_bgk_op(omega=1.2, dtype="float64")
    with dh.timeloop() as loop:
        loop.boundary({"f": ("bounce_back", solid, {"wrap": True})})
        loop.sweep(op, {"f": "f_out"})
    with pytest.raises(ValueError, match="wrap"):
        dh.compile(fuse="stages", k=2, interpret=True)
