"""jax.numpy reference lowering: shifted-slice evaluation of a stencil program.

This is the executable correctness oracle standing in for the reference's
pystencils CPU backend (SURVEY.md §4 "Rebuild test plan", oracle 1): run it
on CPU with ``jax_enable_x64`` for float64 ground truth, and `jax.grad` of it
is the gradcheck oracle the Pallas custom_vjp kernels are verified against.

It is also a perfectly good production path on TPU for stencils XLA fuses
well — everything here is pure jnp slicing and arithmetic, jit/vmap/shard_map
compatible, with no data-dependent control flow.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..field import Field
from .common import StencilProgram, is_adjoint

__all__ = ["make_jnp_stencil", "evaluate_program"]


def _spatial_shape(program: StencilProgram, inputs: Dict[str, jax.Array]) -> Tuple[int, ...]:
    for f in program.input_fields:
        arr = inputs[f.name]
        return tuple(arr.shape[: f.spatial_dimensions])
    raise ValueError("program has no inputs")


def _access_view(program: StencilProgram, arrays: Dict[str, jax.Array], acc) -> jax.Array:
    sl = program.interior_slices(acc.offsets)
    view = arrays[acc.field.name][sl]
    if acc.index:
        view = view[(Ellipsis,) + tuple(acc.index)]
    elif acc.field.index_dimensions:
        # whole-component read of an index field without component selection
        raise ValueError(f"access {acc} to index field must select components")
    return view


def evaluate_program(
    program: StencilProgram,
    arrays: Dict[str, jax.Array],
    interior_shape: Tuple[int, ...],
    dtype,
) -> Dict[str, jax.Array]:
    """Run the step list on interior-shaped views; returns per-(field)
    interior value arrays keyed by output field name (with index dims)."""
    env: Dict[object, jax.Array] = {}
    out_vals: Dict[str, jax.Array] = {}
    for f in program.output_fields:
        if f.index_shape:
            out_vals[f.name] = jnp.zeros(interior_shape + f.index_shape, dtype)
        else:
            out_vals[f.name] = jnp.zeros(interior_shape, dtype)

    for step in program.steps:
        vals = []
        for at in step.atoms:
            if isinstance(at, Field.Access):
                vals.append(_access_view(program, arrays, at))
            else:
                vals.append(env[at])
        res = step.fn(*vals)
        res = jnp.broadcast_to(jnp.asarray(res, dtype), interior_shape)
        if step.is_main:
            tgt = step.target
            name = tgt.field.name
            if tgt.index:
                out_vals[name] = out_vals[name].at[(Ellipsis,) + tuple(tgt.index)].set(res)
            else:
                out_vals[name] = res
        else:
            env[step.target] = res
    return out_vals


def _pad_input(f: Field, arr: jax.Array, ghost) -> jax.Array:
    """Pad spatial dims by the ghost widths.  Adjoint fields pad with zeros
    (mathematically required — no contributions from outside the domain);
    primal fields edge-replicate so e.g. divisions by a coefficient stay
    finite (the padded values are always multiplied by a zero adjoint)."""
    pads = tuple(ghost) + ((0, 0),) * f.index_dimensions
    mode = "constant" if is_adjoint(f) else "edge"
    return jnp.pad(arr, pads, mode=mode)


def _mask_adjoint_inputs(program, inputs, ghost_spec):
    """Zero adjoint-field inputs outside the given (forward) interior via
    slice+pad (the exact-VJP cotangent mask; no scatter)."""
    out = dict(inputs)
    for f in program.input_fields:
        if is_adjoint(f):
            arr = inputs[f.name]
            nd = program.ndim
            sl = tuple(slice(lo, arr.shape[d] - hi)
                       for d, (lo, hi) in enumerate(ghost_spec))
            pads = tuple(ghost_spec) + ((0, 0),) * (arr.ndim - nd)
            out[f.name] = jnp.pad(arr[sl + (Ellipsis,)], pads)
    return out


def _evaluate_periodic(program: StencilProgram, inputs, dtype):
    """Full-domain evaluation with wrap-around reads (periodic domain):
    every access is a circular roll, every cell is written.  The adjoint of
    a circulant stencil is the transposed circulant, so running the
    symbolic backward collection through this same path gives the exact
    periodic VJP with no masking at all."""
    env: Dict[object, jax.Array] = {}
    shape = _spatial_shape(program, inputs)
    nd = program.ndim
    out_vals: Dict[str, Dict] = {}

    def read(acc):
        arr = inputs[acc.field.name]
        if acc.index:
            arr = arr[(Ellipsis,) + tuple(acc.index)]
        elif acc.field.index_dimensions:
            raise ValueError(f"access {acc} to index field must select components")
        shifts = tuple(-o for o in acc.offsets)
        if any(shifts):
            arr = jnp.roll(arr, shifts, axis=tuple(range(nd)))
        return arr

    for step in program.steps:
        vals = [read(at) if isinstance(at, Field.Access) else env[at]
                for at in step.atoms]
        res = jnp.broadcast_to(jnp.asarray(step.fn(*vals), dtype), shape)
        if step.is_main:
            out_vals.setdefault(step.target.field.name, {})[step.target.index] = res
        else:
            env[step.target] = res

    outputs: Dict[str, jax.Array] = {}
    for f in program.output_fields:
        comps = out_vals[f.name]
        if f.index_shape:
            import itertools

            zeros = jnp.zeros(shape, dtype)
            planes = [comps.get(idx, zeros) for idx in
                      itertools.product(*(range(s) for s in f.index_shape))]
            val = jnp.stack(planes, -1).reshape(shape + f.index_shape)
        else:
            val = comps[()]
        if f in program.accum_fields and f.name in inputs:
            val = val + inputs[f.name]
        outputs[f.name] = val
    return outputs


def make_jnp_stencil(program: StencilProgram, full_domain: bool = False,
                     dtype=None, adjoint_mask_ghost=None,
                     periodic: bool = False):
    """Build ``fn(inputs: dict[str, Array]) -> dict[str, Array]``.

    ``full_domain=False``: reference kernel semantics — outputs are zero on
    the ghost frame, interior holds the stencil result; accumulation outputs
    add into the provided previous array.

    ``full_domain=True``: exact-VJP semantics — inputs are ghost-padded and
    the result covers the entire original domain (see ops/common.py
    docstring and ops/vjp.py).

    ``periodic=True``: wrap-around domain — every cell written, reads roll
    circularly; no ghost frame, no masking (all other flags ignored).
    """

    def fn(inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        out_dtype = dtype or inputs[program.input_fields[0].name].dtype
        if periodic:
            return _evaluate_periodic(program, inputs, out_dtype)
        if adjoint_mask_ghost is not None:
            inputs = _mask_adjoint_inputs(program, inputs, adjoint_mask_ghost)
        if full_domain:
            orig_shape = _spatial_shape(program, inputs)
            arrays = {f.name: _pad_input(f, inputs[f.name], program.ghost)
                      for f in program.input_fields}
            interior = orig_shape
        else:
            arrays = {f.name: inputs[f.name] for f in program.input_fields}
            shape = _spatial_shape(program, inputs)
            interior = program.interior_shape(shape)
        vals = evaluate_program(program, arrays, interior, out_dtype)

        outputs: Dict[str, jax.Array] = {}
        for f in program.output_fields:
            val = vals[f.name]
            accum = f in program.accum_fields
            if full_domain:
                if accum:
                    prev = inputs.get(f.name)
                    outputs[f.name] = val if prev is None else prev + val
                else:
                    outputs[f.name] = val
            else:
                shape = _spatial_shape(program, inputs) + f.index_shape
                sl = program.interior_slices()
                if accum and f.name in inputs:
                    outputs[f.name] = inputs[f.name].at[sl].add(val)
                else:
                    outputs[f.name] = jnp.zeros(shape, out_dtype).at[sl].set(val)
        return outputs

    fn.program = program
    fn.__name__ = f"jnp_{program.name}"
    return fn
