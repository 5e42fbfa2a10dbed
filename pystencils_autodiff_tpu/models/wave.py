"""2D acoustic wave equation with FWI-style checkpointed adjoint
(BASELINE config #3).

Leapfrog discretisation of  u_tt = c² ∇²u :

    u_next = 2·u_curr − u_prev + (dt·c)² ∇²u_curr

``c`` (the velocity model) is a ``time_constant_field``: its gradient
accumulates over all time steps (the reference's hook, SURVEY.md §5.4).
``fwi_gradient`` computes ∂‖seismogram − observed‖²/∂c with the adjoint
state method materialised automatically by JAX's scan transpose over the
checkpointed time loop — the modern functional form of "store/recompute the
forward history" that the reference leaves to the torch/TF tape.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..assignment import Assignment
from ..autodiff import AutoDiffOp
from ..field import Field
from ..timeloop import make_time_stepper, run_timeloop

from ._memo import memoize_model

__all__ = ["wave_step_op", "wave_simulate", "fwi_gradient"]


@memoize_model
def wave_step_op(dt: float = 0.001, dx: float = 1.0,
                 dtype="float32", grad_c: bool = True) -> AutoDiffOp:
    """``grad_c=False`` declares the velocity model a ``constant_field``
    (no ∂/∂c derived): the op is then linear in state, so periodic fused
    value+gradient chains take the twin-chain fast path
    (``ops.adjoint_chain.transposed_linear_op``) — the right mode for
    adjoint-state propagation w.r.t. wavefields only.  FWI gradients
    (∂/∂c) need the default ``grad_c=True`` (two-phase chain kernel)."""
    u = Field("u_curr", 2, dtype=dtype)
    up = Field("u_prev", 2, dtype=dtype)
    c = Field("c", 2, dtype=dtype)
    out = Field("u_next", 2, dtype=dtype)
    lap = (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1] - 4 * u[0, 0]) / (dx * dx)
    rhs = 2 * u[0, 0] - up[0, 0] + (dt * c[0, 0]) ** 2 * lap
    fields_kw = ({"time_constant_fields": [c]} if grad_c
                 else {"constant_fields": [c]})
    return AutoDiffOp([Assignment(out.center, rhs)], op_name="wave_step2d"
                      + ("" if grad_c else "_cfrozen"), **fields_kw)


def wave_simulate(c: jax.Array, u0: jax.Array, n_steps: int,
                  dt: float = 0.001, dx: float = 1.0,
                  checkpoint: str = "sqrt",
                  record: Optional[Callable[[Dict], jax.Array]] = None,
                  lowering: str = "jnp", fused_k: Optional[int] = None,
                  **kwargs):
    """Run the leapfrog loop from rest (u_prev = u_curr = u0).

    ``fused_k``: temporal blocking — advance k steps per fused Pallas
    kernel (ops.fused_time_chain; 3.2× wall-clock at k=8 on v5e).  Only
    for forward simulation without per-step recording (n_steps must be a
    multiple of k; recording needs per-step state)."""
    op = wave_step_op(dt=dt, dx=dx, dtype=str(c.dtype))
    carry = {"u_curr": "u_next", "u_prev": "u_curr"}
    state = {"u_curr": u0, "u_prev": u0, "c": c}
    if fused_k:
        if record is not None:
            raise ValueError("fused_k does not support per-step recording")
        if n_steps % fused_k:
            raise ValueError("n_steps must be a multiple of fused_k")
        from ..ops.time_chain import fused_time_chain

        chain = fused_time_chain(op, fused_k, carry, **kwargs)
        return run_timeloop(chain, state, n_steps // fused_k,
                            checkpoint=checkpoint)
    step = make_time_stepper(op, carry, lowering=lowering, **kwargs)
    return run_timeloop(step, state, n_steps, checkpoint=checkpoint,
                        record=record)


def fwi_gradient(c: jax.Array, u0: jax.Array, observed: jax.Array,
                 receiver_row: int, n_steps: int, dt: float = 0.001,
                 dx: float = 1.0, checkpoint: str = "sqrt",
                 lowering: str = "jnp", fused_k: Optional[int] = None,
                 **kwargs):
    """Value and gradient of the FWI misfit w.r.t. the velocity model ``c``.

    ``observed``: (n_steps, width) reference seismogram at ``receiver_row``.

    ``fused_k``: run both directions through fused k-step chain kernels
    (ops.fused_time_chain / ops.fused_chain_vjp) with chain-granularity
    seismogram recording — the receiver row is extracted inside the fused
    forward kernel after every stage (probe outputs) and the seismogram
    residual is injected per stage inside the fused adjoint kernel, so the
    full FWI gradient is temporally blocked end to end.  Gradients match
    the sequential checkpointed adjoint (tests/test_fwi_fused.py).
    """
    if fused_k:
        if n_steps % fused_k:
            raise ValueError("n_steps must be a multiple of fused_k")
        from ..ops.time_chain import fused_time_chain

        op = wave_step_op(dt=dt, dx=dx, dtype=str(c.dtype))
        carry = {"u_curr": "u_next", "u_prev": "u_curr"}
        chain = fused_time_chain(op, fused_k, carry, fused_bwd=True,
                                 probes=[("u_curr", receiver_row)], **kwargs)

        def misfit(c_):
            state = {"u_curr": u0, "u_prev": u0, "c": c_}

            def body(st, _):
                st2, (probe,) = chain(st)
                return st2, probe

            _, chunks = jax.lax.scan(body, state, None,
                                     length=n_steps // fused_k)
            seis = chunks.reshape((n_steps,) + chunks.shape[2:])
            return 0.5 * jnp.sum((seis - observed) ** 2)

        return jax.value_and_grad(misfit)(c)

    def record(state):
        return state["u_curr"][receiver_row, :]

    def misfit(c_):
        _, seis = wave_simulate(c_, u0, n_steps, dt=dt, dx=dx,
                                checkpoint=checkpoint, record=record,
                                lowering=lowering, **kwargs)
        return 0.5 * jnp.sum((seis - observed) ** 2)

    return jax.value_and_grad(misfit)(c)
