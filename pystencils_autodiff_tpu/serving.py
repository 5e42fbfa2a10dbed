"""Ahead-of-time export for production serving.

Compiled stencil ops serialize to portable StableHLO artifacts via
``jax.export`` — deployable to a serving runtime without sympy, the
symbolic layer, or even this package (only jax is needed to load).  The
exported function carries the full ``custom_vjp``, so loaded artifacts
remain differentiable (export the VJP wrapper with ``with_gradient``).

The production analog of the reference's "compile once, ship the .so"
torch/TF extension workflow (SURVEY.md §3.3/§3.4), in the XLA world.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["ExportedOp", "export_op", "export_program", "load_exported",
           "save_exported"]


class ExportedOp:
    """A pair of exported artifacts: primal op + its VJP."""

    def __init__(self, primal, vjp=None):
        self.primal = primal
        self.vjp = vjp

    def __call__(self, *args):
        return self.primal.call(*args)


def export_op(op, spatial_shape: Sequence[int], dtype=jnp.float32,
              lowering: str = "jnp", with_gradient: bool = True,
              platforms: Optional[Sequence[str]] = None, **kwargs):
    """Export ``op.jax_function(...)`` for the given shapes.

    Returns a ``jax.export.Exported``; serialize with ``save_exported`` /
    ``exported.serialize()``.  ``platforms`` defaults to the current
    backend (pass ``["tpu"]``/["cpu"] to cross-export).
    """
    f = op.jax_function(lowering=lowering, **kwargs)
    shape = tuple(spatial_shape)
    args = [jax.ShapeDtypeStruct(shape + fl.index_shape, dtype)
            for fl in op.forward_input_fields]
    fn = jax.jit(lambda *a: f(*a))
    exp = jax_export.export(
        fn, platforms=list(platforms) if platforms else None,
        disabled_checks=(),
    )(*args)
    if with_gradient:
        # exporting the VJP alongside: grad of a scalar loss seeded by
        # caller-provided cotangents
        def vjp_fn(*args_and_cots):
            n = len(op.forward_input_fields)
            primals, cots = args_and_cots[:n], args_and_cots[n:]
            out, pullback = jax.vjp(lambda *a: f(*a), *primals)
            grads = pullback(cots if isinstance(out, tuple) else cots[0])
            return grads

        cot_specs = [jax.ShapeDtypeStruct(shape + fl.index_shape, dtype)
                     for fl in op.forward_output_fields]
        exp_vjp = jax_export.export(
            jax.jit(vjp_fn),
            platforms=list(platforms) if platforms else None,
        )(*args, *cot_specs)
        return ExportedOp(exp, exp_vjp)
    return ExportedOp(exp)


def export_program(run, example_state: Dict[str, jax.Array], n_steps: int,
                   with_gradient: bool = True,
                   grad_field: Optional[str] = None,
                   platforms: Optional[Sequence[str]] = None) -> "ExportedOp":
    """Export a whole recorded program — ``run(state, n_steps) -> state``
    from ``GraphDataHandling.compile`` (any fuse mode) or a hand-built
    timeloop — as a portable StableHLO artifact.

    ``n_steps`` is baked in (exported programs have static control flow).
    With ``with_gradient`` a VJP artifact is exported alongside: it takes
    the state fields plus one cotangent per state field and returns the
    gradients w.r.t. ``grad_field`` (default: every state field).  This is
    the whole-program analog of the reference's generated simulation app
    (SURVEY.md §2.1 #15) as a deployable artifact.
    """
    names = sorted(example_state)
    specs = [jax.ShapeDtypeStruct(example_state[n].shape,
                                  example_state[n].dtype) for n in names]

    def fn(*arrays):
        out = run(dict(zip(names, arrays)), n_steps)
        return tuple(out[n] for n in names)

    exp = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None)(*specs)
    if not with_gradient:
        return ExportedOp(exp)

    gnames = [grad_field] if grad_field else names

    def vjp_fn(*args_and_cots):
        primals = args_and_cots[:len(names)]
        cots = args_and_cots[len(names):]

        def f_of_grads(*gvals):
            st = dict(zip(names, primals))
            st.update(zip(gnames, gvals))
            out = run(st, n_steps)
            return tuple(out[n] for n in names)

        _, pullback = jax.vjp(f_of_grads,
                              *[dict(zip(names, primals))[g] for g in gnames])
        return pullback(tuple(cots))

    exp_vjp = jax_export.export(
        jax.jit(vjp_fn),
        platforms=list(platforms) if platforms else None)(*specs, *specs)
    return ExportedOp(exp, exp_vjp)


def save_exported(exported: "ExportedOp", path: str) -> None:
    with open(path, "wb") as fh:
        fh.write(exported.primal.serialize())
    if exported.vjp is not None:
        with open(path + ".vjp", "wb") as fh:
            fh.write(exported.vjp.serialize())


def load_exported(path: str):
    """Load a serialized artifact; returns callables ``(fn, vjp_fn|None)``.

    Needs only jax — no sympy / symbolic layer."""
    import os

    with open(path, "rb") as fh:
        exp = jax_export.deserialize(fh.read())
    fn = exp.call
    vjp_fn = None
    if os.path.exists(path + ".vjp"):
        with open(path + ".vjp", "rb") as fh:
            vjp_fn = jax_export.deserialize(fh.read()).call
    return fn, vjp_fn
