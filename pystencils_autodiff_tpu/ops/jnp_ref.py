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
from .common import (StencilProgram, assemble_planes, field_components,
                     is_adjoint, plane_view, spatial_index, storage_spatial)

__all__ = ["make_jnp_stencil", "evaluate_program"]


def _spatial_shape(program: StencilProgram, inputs: Dict[str, jax.Array]) -> Tuple[int, ...]:
    for f in program.input_fields:
        return storage_spatial(f, inputs[f.name])
    raise ValueError("program has no inputs")


def _access_view(program: StencilProgram, arrays: Dict[str, jax.Array], acc) -> jax.Array:
    sl = program.interior_slices(acc.offsets)
    arr = arrays[acc.field.name]
    if acc.index:
        arr = plane_view(acc.field, arr, tuple(acc.index))
    elif acc.field.index_dimensions:
        # whole-component read of an index field without component selection
        raise ValueError(f"access {acc} to index field must select components")
    return arr[sl]


def evaluate_program(
    program: StencilProgram,
    arrays: Dict[str, jax.Array],
    interior_shape: Tuple[int, ...],
    dtype,
) -> Dict[str, Dict[tuple, jax.Array]]:
    """Run the step list on interior-shaped views; returns per-component
    interior planes keyed by output field name then index tuple."""
    env: Dict[object, jax.Array] = {}
    out_vals: Dict[str, Dict[tuple, jax.Array]] = {
        f.name: {} for f in program.output_fields}

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
            out_vals[step.target.field.name][tuple(step.target.index)] = res
        else:
            env[step.target] = res
    return out_vals


def _spatial_pads(f: Field, ghost) -> tuple:
    """jnp.pad spec padding the spatial dims of a storage-layout array."""
    idx_pads = ((0, 0),) * f.index_dimensions
    if getattr(f, "index_major", False):
        return idx_pads + tuple(ghost)
    return tuple(ghost) + idx_pads


def _pad_input(f: Field, arr: jax.Array, ghost) -> jax.Array:
    """Pad spatial dims by the ghost widths.  Adjoint fields pad with zeros
    (mathematically required — no contributions from outside the domain);
    primal fields edge-replicate so e.g. divisions by a coefficient stay
    finite (the padded values are always multiplied by a zero adjoint)."""
    mode = "constant" if is_adjoint(f) else "edge"
    return jnp.pad(arr, _spatial_pads(f, ghost), mode=mode)


def _mask_adjoint_inputs(program, inputs, ghost_spec):
    """Zero adjoint-field inputs outside the given (forward) interior via
    slice+pad (the exact-VJP cotangent mask; no scatter)."""
    out = dict(inputs)
    for f in program.input_fields:
        if is_adjoint(f):
            arr = inputs[f.name]
            spatial = storage_spatial(f, arr)
            sl = tuple(slice(lo, s - hi)
                       for s, (lo, hi) in zip(spatial, ghost_spec))
            out[f.name] = jnp.pad(arr[spatial_index(f, sl)],
                                  _spatial_pads(f, ghost_spec))
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
            arr = plane_view(acc.field, arr, tuple(acc.index))
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
        zeros = jnp.zeros(shape, dtype)
        val = assemble_planes(f, [comps.get(idx, zeros)
                                  for idx in field_components(f)], shape)
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
        spatial = _spatial_shape(program, inputs)
        zeros_int = jnp.zeros(interior, out_dtype)
        for f in program.output_fields:
            comps = vals[f.name]
            accum = f in program.accum_fields
            if full_domain:
                val = assemble_planes(
                    f, [comps.get(idx, zeros_int)
                        for idx in field_components(f)], interior)
                if accum:
                    prev = inputs.get(f.name)
                    outputs[f.name] = val if prev is None else prev + val
                else:
                    outputs[f.name] = val
            else:
                sl = program.interior_slices()
                planes = [jnp.zeros(spatial, out_dtype).at[sl].set(
                    comps.get(idx, zeros_int)) for idx in field_components(f)]
                val = assemble_planes(f, planes, spatial)
                if accum and f.name in inputs:
                    outputs[f.name] = inputs[f.name] + val
                else:
                    outputs[f.name] = val
        return outputs

    fn.program = program
    fn.__name__ = f"jnp_{program.name}"
    return fn
