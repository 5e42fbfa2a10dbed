"""Time stepping with checkpointed adjoints.

The reference's hook for time loops is ``time_constant_fields`` in
``create_backward_assignments`` (gradients of time-constant fields
accumulate across steps) — storing/recomputing the forward history is left
to torch/TF's tape (SURVEY.md §5.4).  The TPU rebuild makes this first-class:

* ``make_time_stepper`` turns an ``AutoDiffOp`` into a state→state step
  function (carry rebinding, optional boundary handling),
* ``run_timeloop`` runs it under ``lax.scan`` with selectable adjoint
  checkpointing:

  - ``"none"``   — XLA keeps the full tape (fastest, O(n) memory),
  - ``"step"``   — ``jax.checkpoint`` around each step (recompute within a
    step; O(n) carries only),
  - ``"sqrt"``   — two-level scan with the inner chunk checkpointed:
    O(√n) stored carries, one extra forward pass — the classic
    checkpointed-adjoint schedule FWI-style gradients need (BASELINE
    config #3).

Gradient accumulation for time-constant fields (e.g. the wave-speed model
in FWI) falls out of scan's transpose: the carried constants are read every
step, so their cotangents sum over steps — exactly the reference's
``time_constant_fields`` accumulation semantics, without mutable state.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .autodiff import AutoDiffOp
from .boundary import BoundaryHandling

__all__ = ["make_time_stepper", "run_timeloop", "Timeloop"]

State = Dict[str, jax.Array]


def make_time_stepper(
    op: AutoDiffOp,
    carry_map: Dict[str, str],
    boundary: Optional[BoundaryHandling] = None,
    lowering: str = "jnp",
    **kwargs,
) -> Callable[[State], State]:
    """Build ``step(state) -> state`` from an AutoDiffOp.

    ``carry_map`` gives each forward *input* field its next-step source:
    an op *output* name or another input name (for shifts like
    u_prev ← u_curr).  Unmapped inputs carry through unchanged (constants).

    Example (leapfrog wave)::

        step = make_time_stepper(op, {"u_curr": "u_next", "u_prev": "u_curr"})
    """
    f = op.jax_function(lowering=lowering, **kwargs)
    in_names = [fl.name for fl in op.forward_input_fields]
    out_names = [fl.name for fl in op.forward_output_fields]
    for dst, src in carry_map.items():
        if dst not in in_names:
            raise ValueError(f"carry target {dst!r} is not an input ({in_names})")
        if src not in out_names and src not in in_names:
            raise ValueError(f"carry source {src!r} is neither output "
                             f"({out_names}) nor input ({in_names})")

    def step(state: State) -> State:
        if boundary is not None:
            state = {**state, **boundary({n: state[n] for n in in_names
                                          if n in boundary.specs})}
        outs = f(**{n: state[n] for n in in_names})
        if not isinstance(outs, tuple):
            outs = (outs,)
        env = {**state, **dict(zip(out_names, outs))}
        new_state = dict(state)
        for dst in in_names:
            src = carry_map.get(dst, dst)
            new_state[dst] = env[src]
        return new_state

    step.input_names = in_names
    step.output_names = out_names
    return step


def _scan_steps(step: Callable[[State], State], state: State, n: int,
                record: Optional[Callable[[State], jax.Array]] = None,
                unroll: int = 1):
    def body(carry, _):
        new = step(carry)
        return new, (record(new) if record else None)

    final, recs = jax.lax.scan(body, state, None, length=n,
                               unroll=min(unroll, max(n, 1)))
    return final, recs


def run_timeloop(
    step: Callable[[State], State],
    state: State,
    n_steps: int,
    checkpoint: str = "none",
    record: Optional[Callable[[State], jax.Array]] = None,
    unroll: int = 4,
) -> State:
    """Advance ``state`` by ``n_steps`` applications of ``step``.

    ``record(state)`` (optional) is stacked per step and returned as the
    second element — e.g. seismogram extraction at receiver locations.
    With ``checkpoint='sqrt'`` recording is applied per inner chunk and
    reshaped to per-step order.

    ``unroll`` (default 4) replicates the scan body so XLA's while-loop
    carry copy — one full read+write pass of every carried array per
    iteration, inserted because custom-call (Pallas) outputs cannot alias
    the carry buffer — amortises to 1/unroll.  Device-trace-measured on
    v5e: 8192² f32 heat step 1.74 ms/step at unroll=1 vs 0.93 ms at
    unroll=4 (the kernel itself is 0.82 ms).  Forward-only loops keep the
    default; under checkpointed adjoints the unroll multiplies the
    recompute granularity, so 'step'/'sqrt' modes pass it through to the
    inner scans unchanged (still correct, marginally larger remat).
    """
    if checkpoint not in ("none", "step", "sqrt"):
        raise ValueError("checkpoint must be 'none', 'step' or 'sqrt'")

    if checkpoint == "none":
        final, recs = _scan_steps(step, state, n_steps, record, unroll)
        return (final, recs) if record else final

    if checkpoint == "step":
        ck_step = jax.checkpoint(step)
        final, recs = _scan_steps(ck_step, state, n_steps, record, unroll)
        return (final, recs) if record else final

    # sqrt: outer scan over chunks; each chunk is a checkpointed inner scan.
    chunk = max(1, int(math.isqrt(n_steps)))
    n_chunks, rem = divmod(n_steps, chunk)

    @jax.checkpoint
    def run_chunk(carry):
        return _scan_steps(step, carry, chunk, record, unroll)

    def outer_body(carry, _):
        new, recs = run_chunk(carry)
        return new, recs

    final, recs = jax.lax.scan(outer_body, state, None, length=n_chunks)
    if rem:
        final, tail = _scan_steps(step, final, rem, record, unroll)
    if record:
        recs = jax.tree.map(
            lambda r: r.reshape((n_chunks * chunk,) + r.shape[2:]), recs)
        if rem:
            recs = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), recs, tail)
        return final, recs
    return final


class Timeloop:
    """Convenience bundle: stepper + BCs + checkpointing policy.

    Capability parity with the reference's recorded-timeloop concept
    (``graph_datahandling.py`` timeloops, SURVEY.md §2.1 #14) in functional
    form: ``loop(state, n)`` is jit-able, differentiable, shard_map-able.
    """

    def __init__(self, op: AutoDiffOp, carry_map: Dict[str, str],
                 boundary: Optional[BoundaryHandling] = None,
                 checkpoint: str = "none", lowering: str = "jnp", **kwargs):
        self.step = make_time_stepper(op, carry_map, boundary=boundary,
                                      lowering=lowering, **kwargs)
        self.checkpoint = checkpoint

    def __call__(self, state: State, n_steps: int,
                 record: Optional[Callable[[State], jax.Array]] = None):
        return run_timeloop(self.step, state, n_steps,
                            checkpoint=self.checkpoint, record=record)
