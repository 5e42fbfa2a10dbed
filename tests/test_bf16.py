"""bfloat16 state through the chain kernels: the performance playbook
advertises ~1.6x on bandwidth-bound loops with bf16 state; this pins the
CORRECTNESS side — kernels build (the 32-bit-only Mosaic rotate round-trips
through f32, _shift_lateral), values track the f32 oracle to bf16
resolution, and gradients stay finite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields
from pystencils_autodiff_tpu.ops import fused_stage_chain
from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp


def heat_op():
    u, u_next = fields("u, u_next", 2)
    return AutoDiffOp([Assignment(
        u_next[0, 0],
        u[0, 0] + 0.1 * (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1]
                         - 4 * u[0, 0]))], op_name="heat2d_bf16")


def _u0(n=32):
    return jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)


@pytest.mark.parametrize("periodic", [True, False])
def test_bf16_chain_tracks_f32(periodic):
    op = heat_op()
    k = 2
    u0 = _u0()
    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        chain = fused_stage_chain([(op, {"u": "u_next"})], k,
                                  periodic=periodic, interpret=True,
                                  dtype=dt)
        outs[dt] = chain({"u": u0.astype(dt)})["u"]
    assert outs[jnp.bfloat16].dtype == jnp.bfloat16
    # bf16 has ~8 mantissa bits: 2 smoothing steps keep values O(1)
    np.testing.assert_allclose(
        np.asarray(outs[jnp.bfloat16].astype(jnp.float32)),
        np.asarray(outs[jnp.float32]), rtol=0.05, atol=0.05)


def test_bf16_fused_vjp_gradients_finite():
    op = heat_op()
    chain = fused_chain_vjp(op, 2, {"u": "u_next"}, periodic=True,
                            interpret=True)  # kernel dtype = input dtype
    u0 = _u0().astype(jnp.bfloat16)
    st, cot0 = chain({"u": u0}, {"u": jnp.ones_like(u0)})
    assert st["u"].dtype == jnp.bfloat16
    g32 = np.asarray(cot0["u"].astype(jnp.float32))
    assert np.all(np.isfinite(g32)) and np.abs(g32).max() > 0
    # the cotangent of one smoothing chain step is O(1): compare to f32
    chain32 = fused_chain_vjp(op, 2, {"u": "u_next"}, periodic=True,
                              interpret=True)
    _, ref = chain32({"u": _u0()}, {"u": jnp.ones((32, 32), jnp.float32)})
    np.testing.assert_allclose(g32, np.asarray(ref["u"]), rtol=0.05,
                               atol=0.05)
