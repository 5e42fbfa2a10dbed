"""Storage layouts: spatial permutations ('f'/custom) honoured end-to-end
and SoA (component-major, 'soa') index-dim placement through every lowering
(VERDICT round 1, missing #5 / next #7).  Reference anchor: pystencils
layout-aware Field/kernels (SURVEY.md §2.1 #8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, Field
from pystencils_autodiff_tpu.field import parse_layout
from pystencils_autodiff_tpu.models.lbm import d2q9_bgk_op, macroscopic
from pystencils_autodiff_tpu.ops import fused_time_chain


def rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float64)


def heat_op(layout):
    u = Field("u", 2, dtype="float64", layout=layout)
    out = Field("u_next", 2, dtype="float64", layout=layout)
    lap = u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1] - 4 * u[0, 0]
    return AutoDiffOp([Assignment(out.center, u[0, 0] + 0.1 * lap)],
                      op_name=f"heat_{layout}")


def test_parse_layout():
    assert parse_layout("c", 3) == ((0, 1, 2), False)
    assert parse_layout("f", 3) == ((2, 1, 0), False)
    assert parse_layout("soa", 2) == ((0, 1), True)
    assert parse_layout((1, 0), 2) == ((1, 0), False)
    with pytest.raises(ValueError):
        parse_layout("weird", 2)
    with pytest.raises(ValueError):
        parse_layout((0, 0), 2)


def test_soa_scalar_is_noop_and_fingerprints_differ():
    s = Field("s", 2, dtype="float64", layout="soa")
    assert not s.index_major
    a = Field("v", 2, index_shape=(3,), dtype="float64", layout="aos")
    b = Field("v", 2, index_shape=(3,), dtype="float64", layout="soa")
    assert b.index_major and not a.index_major
    # same-named fields with different storage must not share cached accesses
    # (the cache is keyed by fingerprint, so equal-fingerprint fields MAY
    # share an access instance — identity with this exact Field object is
    # not guaranteed, equality of every lowering-relevant attribute is)
    assert a._fingerprint() != b._fingerprint()
    assert a.center is not b.center
    assert a.center.field._fingerprint() == a._fingerprint()
    assert b.center.field._fingerprint() == b._fingerprint()


@pytest.mark.parametrize("lowering", ["jnp", "pallas"])
def test_fortran_layout_round_trip(lowering):
    """'f'-layout fields take transposed arrays and return transposed
    results equal to the 'c' run — both values and gradients."""
    kw = {"interpret": True} if lowering == "pallas" else {}
    op_c = heat_op("c")
    op_f = heat_op("f")
    f_c = op_c.jax_function(lowering=lowering, **kw)
    f_f = op_f.jax_function(lowering=lowering, **kw)
    u = rand(0, (24, 40))
    out_c = f_c(u=u)
    out_f = f_f(u=u.T)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c).T,
                               rtol=1e-14, atol=1e-14)
    g_c = jax.grad(lambda a: jnp.sum(f_c(u=a) ** 2))(u)
    g_f = jax.grad(lambda a: jnp.sum(f_f(u=a) ** 2))(u.T)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_c).T,
                               rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("lowering", ["jnp", "pallas"])
def test_d2q9_soa_matches_aos(lowering):
    """SoA (9, H, W) LBM step == AoS (H, W, 9) step, values and gradients,
    through the jnp oracle and the blocked Pallas path."""
    kw = {"interpret": True} if lowering == "pallas" else {}
    op_a = d2q9_bgk_op(omega=1.6, layout="aos")
    op_s = d2q9_bgk_op(omega=1.6, layout="soa")
    fa = op_a.jax_function(lowering=lowering, **kw)
    fs = op_s.jax_function(lowering=lowering, **kw)
    f0 = 1.0 + 0.05 * rand(1, (16, 24, 9)) ** 2
    out_a = fa(f=f0)
    out_s = fs(f=jnp.moveaxis(f0, -1, 0))
    np.testing.assert_allclose(np.asarray(out_s),
                               np.moveaxis(np.asarray(out_a), -1, 0),
                               rtol=1e-13, atol=1e-13)
    ga = jax.grad(lambda a: jnp.sum(fa(f=a)[4:-4, 4:-4] ** 2))(f0)
    gs = jax.grad(lambda a: jnp.sum(
        fs(f=a)[:, 4:-4, 4:-4] ** 2))(jnp.moveaxis(f0, -1, 0))
    np.testing.assert_allclose(np.asarray(gs),
                               np.moveaxis(np.asarray(ga), -1, 0),
                               rtol=1e-12, atol=1e-12)


def test_d2q9_soa_fused_chain():
    """Temporally blocked SoA LBM chain == AoS chain (moveaxis) — the
    per-step plane splits become contiguous slices.  (k=1 keeps this
    canary fast; multi-cycle chaining is covered by the slow-marked LBM
    adjoint chain and the wave/heat k-sweeps.)"""
    k = 1
    op_a = d2q9_bgk_op(omega=1.6, layout="aos")
    op_s = d2q9_bgk_op(omega=1.6, layout="soa")
    ch_a = fused_time_chain(op_a, k, {"f": "f_out"}, periodic=True,
                            interpret=True, tile_rows=16)
    ch_s = fused_time_chain(op_s, k, {"f": "f_out"}, periodic=True,
                            interpret=True, tile_rows=16)
    f0 = 1.0 + 0.05 * rand(2, (16, 16, 9)) ** 2
    # ONE vjp trace per chain gives value and gradient together (the
    # interpret-mode trace dominates this test's wall time)
    out_a, pull_a = jax.vjp(lambda a: ch_a({"f": a})["f"], f0)
    out_s, pull_s = jax.vjp(lambda a: ch_s({"f": a})["f"],
                            jnp.moveaxis(f0, -1, 0))
    np.testing.assert_allclose(np.asarray(out_s),
                               np.moveaxis(np.asarray(out_a), -1, 0),
                               rtol=1e-13, atol=1e-13)
    (ga,) = pull_a(2.0 * out_a)
    (gs,) = pull_s(2.0 * out_s)
    np.testing.assert_allclose(np.asarray(gs),
                               np.moveaxis(np.asarray(ga), -1, 0),
                               rtol=1e-12, atol=1e-12)


def test_macroscopic_layouts_agree():
    f0 = 1.0 + 0.05 * rand(3, (8, 8, 9)) ** 2
    r_a, ux_a, uy_a = macroscopic(f0)
    r_s, ux_s, uy_s = macroscopic(jnp.moveaxis(f0, -1, 0), layout="soa")
    np.testing.assert_allclose(r_s, r_a, rtol=1e-15)
    np.testing.assert_allclose(ux_s, ux_a, rtol=1e-15)
    np.testing.assert_allclose(uy_s, uy_a, rtol=1e-15)


def test_soa_shape_validation():
    op_s = d2q9_bgk_op(omega=1.6, layout="soa")
    fs = op_s.jax_function(lowering="jnp")
    with pytest.raises(ValueError, match="leading index dims"):
        fs(f=jnp.zeros((24, 32, 9)))  # AoS array into an SoA op


def test_fused_chains_reject_permuted_spatial_layout():
    """Chains flatten arrays directly; non-row-major spatial storage must
    be rejected loudly rather than silently misread."""
    op_f = heat_op("f")
    with pytest.raises(ValueError, match="row-major"):
        fused_time_chain(op_f, 2, {"u": "u_next"}, periodic=True,
                         interpret=True)
