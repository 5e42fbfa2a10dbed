"""Chain-granularity FWI: probe (receiver-row) outputs in the fused
forward chain + probe-cotangent injection in the fused adjoint chain must
reproduce the sequential checkpointed-adjoint gradient exactly (VERDICT
round-1 item #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu.models.wave import fwi_gradient, wave_step_op
from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain
from pystencils_autodiff_tpu.timeloop import make_time_stepper

CARRY = {"u_curr": "u_next", "u_prev": "u_curr"}
SHAPE = (48, 32)
ROW = 17


def _setup():
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.float64)
    c = 2.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), SHAPE,
                                      jnp.float64) ** 2
    return u0, c


@pytest.mark.parametrize("periodic", [False, True])
def test_chain_probes_match_sequential_recording(periodic):
    op = wave_step_op(dt=0.2, dtype="float64")
    u0, c = _setup()
    state = {"u_curr": u0, "u_prev": u0, "c": c}
    k = 4
    chain = fused_time_chain(op, k, CARRY, periodic=periodic, interpret=True,
                             probes=[("u_curr", ROW)])
    _, (probe,) = chain(state)

    step = make_time_stepper(op, CARRY, lowering="pallas", interpret=True,
                             periodic=periodic)
    st = dict(state)
    rows = []
    for _ in range(k):
        st = step(st)
        rows.append(st["u_curr"][ROW])
    np.testing.assert_allclose(probe, jnp.stack(rows), rtol=1e-12, atol=1e-12)


def test_fused_fwi_gradient_matches_sequential():
    u0, c = _setup()
    n_steps = 8
    obs = 0.01 * jax.random.normal(jax.random.PRNGKey(2),
                                   (n_steps, SHAPE[1]), jnp.float64)
    v_seq, g_seq = fwi_gradient(c, u0, obs, ROW, n_steps, dt=0.2,
                                lowering="pallas", interpret=True)
    v_f, g_f = fwi_gradient(c, u0, obs, ROW, n_steps, dt=0.2, fused_k=4,
                            interpret=True)
    np.testing.assert_allclose(v_f, v_seq, rtol=1e-12)
    np.testing.assert_allclose(g_f, g_seq, rtol=1e-11, atol=1e-12)


def test_fused_fwi_gradient_descends():
    """The fused gradient points downhill on the misfit."""
    u0, c_true = _setup()
    n_steps = 4
    # observed data from the true model, via the fused forward itself
    _, seis = None, None
    op = wave_step_op(dt=0.2, dtype="float64")
    chain = fused_time_chain(op, 4, CARRY, interpret=True,
                             probes=[("u_curr", ROW)])

    def run(c_):
        state = {"u_curr": u0, "u_prev": u0, "c": c_}
        chunks = []
        for _ in range(n_steps // 4):
            state, (p,) = chain(state)
            chunks.append(p)
        return jnp.concatenate(chunks, 0)

    obs = run(c_true)
    c0 = c_true + 0.05
    v0, g = fwi_gradient(c0, u0, obs, ROW, n_steps, dt=0.2, fused_k=4,
                         interpret=True)
    v1, _ = fwi_gradient(c0 - 1e-2 * g, u0, obs, ROW, n_steps, dt=0.2,
                         fused_k=4, interpret=True)
    assert float(v1) < float(v0)
