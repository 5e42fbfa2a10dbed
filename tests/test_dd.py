"""Double-word (emulated f64) arithmetic: error-free transforms hold in
f32, and the aniso27 adjoint-style 27-term accumulation in dd-f32 matches
the true f64 sum to ~2^-45 — the spot proof that the kernel's residual f32
error is ulp accumulation, not an algorithmic defect (ROADMAP round-3
item; SURVEY.md §7 hard-part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.utils.dd import (dd, dd_add, dd_add_dd, dd_dot,
                                              dd_mul, dd_sum, dd_to, two_prod,
                                              two_sum)


def f32(x):
    return jnp.asarray(x, jnp.float32)


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = f32(rng.standard_normal(1000) * 1e6)
    b = f32(rng.standard_normal(1000) * 1e-3)
    s, e = two_sum(a, b)
    # s + e == a + b exactly, verified in f64
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = f32(rng.standard_normal(1000))
    b = f32(rng.standard_normal(1000))
    p, e = two_prod(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_dd_sum_beats_f32_by_orders():
    rng = np.random.default_rng(2)
    vals64 = rng.standard_normal(10_000) * np.logspace(0, 4, 10_000)
    vals32 = f32(vals64)
    truth = np.asarray(vals32, np.float64).sum()  # true sum of the f32 data
    naive = float(jnp.sum(vals32))
    hi, lo = dd_sum(vals32)
    # evaluate the unevaluated pair at f64 precision: the dd result is
    # f64-grade even though each half is an f32
    comp = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    err_naive = abs(naive - truth)
    err_comp = abs(comp - truth)
    assert err_comp < 1e-3 * max(err_naive, 1e-30)
    assert err_comp / abs(truth) < 1e-12


def test_dd_mul_add_roundtrip():
    a = dd(f32(1.0) / f32(3.0))
    b = dd_mul(a, dd(f32(3.0)))
    assert abs(float(dd_to(b)) - 1.0) < 1e-7
    c = dd_add_dd(dd(f32(1e8)), dd(f32(1.0)))
    c = dd_add_dd(c, dd(f32(-1e8)))
    assert float(dd_to(c)) == 1.0  # f32 alone loses the 1.0 entirely


def test_aniso27_accumulation_spot_proof():
    """27-term weighted accumulations (the aniso27 adjoint inner sum) in
    dd-f32 match the f64 truth to <1e-7 relative, while plain f32 shows
    the documented ~1e-6-grade error — on whatever backend runs this
    (CPU here; the same jnp ops run unchanged on TPU)."""
    rng = np.random.default_rng(3)
    n = 512
    terms64 = rng.standard_normal((27, n)) * np.logspace(0, 2, 27)[:, None]
    terms32 = f32(terms64)
    truth = np.asarray(terms32, np.float64).sum(axis=0)

    naive = np.asarray(jnp.sum(terms32, axis=0), np.float64)
    hi, lo = dd_sum(terms32, axis=0)
    comp = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)

    rel_naive = np.abs(naive - truth).max() / np.abs(truth).max()
    rel_comp = np.abs(comp - truth).max() / np.abs(truth).max()
    assert rel_comp < 1e-12   # f64-grade
    assert rel_comp <= rel_naive


def test_dd_dot():
    rng = np.random.default_rng(4)
    a64 = rng.standard_normal(4096)
    b64 = rng.standard_normal(4096)
    a, b = f32(a64), f32(b64)
    truth = float(np.asarray(a, np.float64) @ np.asarray(b, np.float64))
    hi, lo = dd_dot(a, b)
    comp = float(np.float64(hi) + np.float64(lo))
    assert abs(comp - truth) < 1e-9 * abs(truth) + 1e-9


def test_dd_grad_compatible():
    """dd ops trace under jit/grad (plain jnp arithmetic)."""
    x = f32(np.linspace(0.1, 1.0, 64))

    @jax.jit
    def loss(a):
        return dd_to(dd_sum(a * a))

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-5)


@pytest.mark.tpu
def test_dd_sum_exact_on_tpu():
    """On real TPU hardware the same dd accumulation is f64-grade."""
    rng = np.random.default_rng(5)
    vals64 = rng.standard_normal(27 * 64) * np.logspace(0, 3, 27 * 64)
    vals32 = f32(vals64)
    truth = np.asarray(vals32, np.float64).sum()
    hi, lo = jax.jit(lambda v: dd_sum(v))(vals32)
    comp = float(np.float64(np.asarray(hi)) + np.float64(np.asarray(lo)))
    assert abs(comp - truth) / abs(truth) < 1e-10


def test_dd_accumulate_in_kernels():
    """LoweringConfig(accumulate='dd') compiles wide sums to double-word
    TwoProd/TwoSum chains inside the kernels: the aniso27 f32 gradient
    lands within ~1e-8 of the f64 oracle (plain f32 pairwise: ~1e-6).
    VERDICT round 2, next #8."""
    import numpy as np

    from pystencils_autodiff_tpu.models.elastic import anisotropic27_op
    from pystencils_autodiff_tpu.utils import LoweringConfig

    op64 = anisotropic27_op(dtype="float64")
    op32 = anisotropic27_op(dtype="float32")
    f64 = op64.jax_function(lowering="jnp")
    f32 = op32.jax_function(lowering="jnp")
    fdd = op32.jax_function(config=LoweringConfig(lowering="jnp",
                                                  accumulate="dd"))

    n = 20
    rng = np.random.default_rng(7)
    # evaluate the oracle at the SAME f32-representable inputs, and use a
    # linear loss with f32-exact weights, so the only error measured is the
    # kernels' own accumulation
    u32 = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    w32 = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))

    def grad_of(f, u, w):
        return jax.grad(lambda a: jnp.sum(f(u=a) * w))(u)

    # the f64 oracle needs x64 scoped ON: in the TPU lane (and any
    # x64-off runtime) a bare jnp.float64 silently truncates to f32 and
    # the "oracle" carries 1 f32 ulp of its own noise (the round-3 trap,
    # see test_dd_accumulate_kernel_on_tpu)
    with jax.enable_x64(True), jax.default_device(jax.devices("cpu")[0]):
        u64 = jnp.asarray(np.asarray(u32), jnp.float64)
        w64 = jnp.asarray(np.asarray(w32), jnp.float64)
        g64 = grad_of(f64, u64, w64)
        assert g64.dtype == jnp.float64
        g64 = np.asarray(g64)
        y64 = np.asarray(f64(u=u64))
    g32 = np.asarray(grad_of(f32, u32, w32)).astype(np.float64)
    gdd = np.asarray(grad_of(fdd, u32, w32)).astype(np.float64)

    # an f32-valued gradient can never beat the f32 representation floor
    # (~6e-8 relative); the kernel-accumulation error is the distance to
    # the CORRECTLY-ROUNDED f64 oracle
    gq = g64.astype(np.float32).astype(np.float64)
    scale = np.abs(g64).max()
    err32 = np.abs(g32 - gq).max() / scale
    errdd = np.abs(gdd - gq).max() / scale
    # dd is ~49-bit, not correctly-rounded: elements near an f32 rounding
    # boundary may differ from the correctly-rounded oracle by 1 ulp
    assert errdd < 2e-8, f"dd accumulation error {errdd:.3g}"
    assert errdd < err32, (errdd, err32)
    # values too (y64 computed inside the x64 scope above)
    yq = y64.astype(np.float32).astype(np.float64)
    vdd = np.abs(np.asarray(fdd(u=u32)).astype(np.float64) - yq).max()
    v32 = np.abs(np.asarray(f32(u=u32)).astype(np.float64) - yq).max()
    # within 1 ulp of the correctly-rounded value at the largest elements
    assert vdd < np.abs(y64).max() * 1.3e-7
    assert v32 > vdd


@pytest.mark.tpu
def test_dd_accumulate_kernel_on_tpu():
    """Hardware proof: the dd-accumulating aniso27 Pallas kernel gradient
    matches the CPU f64 oracle to ~1e-8 relative on the chip."""
    import numpy as np

    from pystencils_autodiff_tpu.models.elastic import anisotropic27_op
    from pystencils_autodiff_tpu.utils import LoweringConfig

    op = anisotropic27_op(dtype="float32")
    fdd = op.jax_function(config=LoweringConfig(lowering="pallas",
                                                accumulate="dd"))
    n = 32
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    # linear loss with f32-exact weights: only the kernel's accumulation
    # error is measured (a sin-loss cotangent adds f32 cos noise upstream)
    w = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    g = jax.jit(jax.grad(lambda a: jnp.sum(fdd(u=a) * w)))(u)

    # f64 oracle on CPU.  The TPU test lane runs with jax_enable_x64 OFF
    # (conftest), so a plain jnp.float64 request is SILENTLY truncated to
    # f32 — which is exactly what happened to the round-3 version of this
    # test: its "f64 oracle" was f32, and the famous 1.25e-7 "Mosaic FMA
    # contraction" error was the oracle's own f32 rounding (one f32 ulp
    # = 1.19e-7).  enable_x64() scopes a REAL f64 oracle.
    cpu = jax.devices("cpu")[0]
    op64 = anisotropic27_op(dtype="float64")
    f64 = op64.jax_function(lowering="jnp")
    with jax.enable_x64(True), jax.default_device(cpu):
        u64 = jnp.asarray(np.asarray(u), jnp.float64)
        w64 = jnp.asarray(np.asarray(w), jnp.float64)
        g64 = jax.grad(lambda a: jnp.sum(f64(u=a) * w64))(u64)
        assert g64.dtype == jnp.float64
    g64 = np.asarray(g64)
    gq32 = g64.astype(np.float32)
    got = np.asarray(g).astype(np.float64)
    err = np.abs(got - gq32.astype(np.float64)).max() / np.abs(g64).max()
    # Round-4 hardware truth (v5e, true f64 oracle): 1.57e-8 relative —
    # 8x better than the round-3 record.  Mosaic does NOT contract a*b-p
    # in these kernels (witness-probed 0.0), and the dd chains are now
    # bitcast-barrier-pinned so future contraction cannot corrupt the
    # Veltkamp splitting or the TwoSum inputs.  The residual is a few
    # cells whose true sum lies within the dd error (~2^-49) of an f32
    # rounding boundary, flipping the final rounding by one ulp — so the
    # rigorous statement is per-cell: every entry within 1 ulp of the
    # CORRECTLY ROUNDED f64 oracle, and almost all entries exactly it.
    assert err < 3e-8, f"TPU dd accumulation error {err:.3g}"
    diff = np.abs(got - gq32.astype(np.float64))
    ulp = np.spacing(np.abs(gq32)).astype(np.float64)
    assert (diff <= ulp).all(), "entry beyond 1 ulp of correct rounding"
    # measured 0.06-0.13% across seeds/sessions on the v5e
    assert (diff > 0).mean() < 5e-3, \
        f"too many rounding-boundary flips: {(diff > 0).mean():.2%}"
