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
