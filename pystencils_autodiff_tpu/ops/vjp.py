"""custom_vjp assembly: the TPU-native replacement for the reference's
torch/TF custom-op wrapping (SURVEY.md §2.2, §3.3).

``build_custom_vjp(op)`` returns a jit/vmap/shard_map-compatible function
``f(*inputs) -> outputs`` (ordered by ``op.forward_input_fields`` /
``op.forward_output_fields``) registered with ``jax.custom_vjp`` so that
``jax.grad`` invokes the *symbolically derived* backward kernel instead of
XLA's autodiff.

Boundary-exactness (SURVEY.md §7 hard-part #2): the forward writes only the
ghost-shrunk interior, so its exact VJP must (a) mask incoming cotangents to
that interior — cells the forward never wrote contribute nothing — and
(b) evaluate the backward gather over the *full* domain with ghost-padded
reads, so gradients land in the primal ghost cells that the forward's
interior reads touched.  The backward lowering's ``full_domain=True`` mode
implements exactly this; gradcheck-style tests against ``jax.grad`` of the
jnp oracle then agree to float64 round-off everywhere, including boundaries.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..adjoint_field import AdjointField
from .common import (StencilProgram, backward_programs, forward_program,
                     is_staged_backward, spatial_index, storage_shape,
                     storage_spatial)

__all__ = ["build_custom_vjp", "build_custom_vjp_from_programs",
           "make_staged_fn"]


def make_staged_fn(progs, lower, final_kwargs, **kwargs):
    """Chain lowered per-stage functions: each stage's outputs join the
    environment the next stage reads from (multi-pass backward programs,
    e.g. TF_MAD's materialised Jacobian stage).  All stages run
    full-domain; only the final (gather) stage applies the exact-VJP
    cotangent masking."""
    fns = [lower(p, full_domain=True, **kwargs) for p in progs[:-1]]
    fns.append(lower(progs[-1], full_domain=True, **final_kwargs, **kwargs))

    def fn(inputs):
        env = dict(inputs)
        out = env
        for f in fns:
            out = f(env)
            env.update(out)
        return out

    return fn


def _interior_mask_set(program: StencilProgram, field, cot: jax.Array) -> jax.Array:
    """Zero the cotangent outside the forward interior (slice+pad — cheaper
    than a scatter on TPU).  ``field`` is the forward output the cotangent
    belongs to (its storage layout places the index dims)."""
    sl = program.interior_slices()
    idx_pads = ((0, 0),) * (cot.ndim - program.ndim)
    if getattr(field, "index_major", False):
        pads = idx_pads + tuple(program.ghost)
    else:
        pads = tuple(program.ghost) + idx_pads
    return jnp.pad(cot[spatial_index(field, sl)], pads)


def build_custom_vjp_from_programs(
    op,
    fwd_fn: Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]],
    bwd_full_fn: Callable[[Dict[str, jax.Array]], Dict[str, jax.Array]],
    fwd_prog: StencilProgram,
    bwd_prog: StencilProgram,
    bwd_masks_cotangents: bool = False,
    bwd_input_fields=None,
):
    """Wire lowered forward/backward dict-functions into a custom_vjp."""
    in_names = [f.name for f in op.forward_input_fields]
    out_names = [f.name for f in op.forward_output_fields]
    saved_names = [f.name for f in op.saved_fields]
    grad_names = [f.corresponding_forward_field.name for f in op.backward_output_fields]
    # adjoint inputs of the bwd program, in program order (overridable for
    # staged backward programs whose external signature spans stages)
    if bwd_input_fields is None:
        bwd_input_fields = bwd_prog.input_fields

    def apply(*arrays):
        inputs = dict(zip(in_names, arrays))
        outputs = fwd_fn(inputs)
        return tuple(outputs[n] for n in out_names)

    def fwd_rule(*arrays):
        inputs = dict(zip(in_names, arrays))
        outputs = fwd_fn(inputs)
        residuals = tuple(inputs[n] for n in saved_names)
        return tuple(outputs[n] for n in out_names), residuals

    def bwd_rule(residuals, cotangents):
        saved = dict(zip(saved_names, residuals))
        # All fields share the spatial shape; recover it from a cotangent.
        out0_field = op.forward_output_fields[0]
        spatial = storage_spatial(out0_field, cotangents[0])
        in_dtype = cotangents[0].dtype
        cots = dict(zip(out_names, cotangents))
        out_fields = {f.name: f for f in op.forward_output_fields}
        bwd_inputs: Dict[str, jax.Array] = {}
        for f in bwd_input_fields:
            if isinstance(f, AdjointField):
                primal_name = f.corresponding_forward_field.name
                if primal_name in cots:
                    # mask to the forward interior: exact VJP of the
                    # "write-interior-only" forward map.  Skipped when the
                    # lowering fuses the mask into the kernel.
                    cot = cots[primal_name]
                    bwd_inputs[f.name] = (
                        cot if bwd_masks_cotangents
                        else _interior_mask_set(fwd_prog,
                                                out_fields[primal_name], cot))
                else:
                    # previous-adjoint input of an accumulation
                    # (time_constant_fields) assignment: within a single
                    # custom_vjp step the accumulator starts at zero — JAX's
                    # scan/loop transpose performs the cross-step summation.
                    primal = f.corresponding_forward_field
                    bwd_inputs[f.name] = jnp.zeros(
                        storage_shape(primal, spatial), in_dtype)
            else:
                bwd_inputs[f.name] = saved[f.name]
        grads = bwd_full_fn(bwd_inputs)
        grad_by_primal = dict(zip(grad_names, (grads[f.name] for f in op.backward_output_fields)))
        out = []
        for f in op.forward_input_fields:
            if f.name in grad_by_primal:
                out.append(grad_by_primal[f.name])
            else:  # constant field: zero cotangent
                out.append(jnp.zeros(storage_shape(f, spatial), in_dtype))
        return tuple(out)

    wrapped = jax.custom_vjp(apply)
    wrapped.defvjp(fwd_rule, bwd_rule)

    def user_fn(*arrays, **kw_arrays):
        if kw_arrays:
            if arrays:
                raise TypeError("pass fields either positionally or by name, not both")
            unknown = set(kw_arrays) - set(in_names)
            if unknown:
                raise TypeError(f"unknown field(s) {sorted(unknown)}; inputs are {in_names}")
            missing = set(in_names) - set(kw_arrays)
            if missing:
                raise TypeError(f"missing field(s) {sorted(missing)}; inputs are {in_names}")
            arrays = tuple(kw_arrays[n] for n in in_names)
        if len(arrays) != len(in_names):
            raise TypeError(f"expected {len(in_names)} inputs {in_names}, got {len(arrays)}")
        # all fields share one spatial shape (plus per-field index dims,
        # trailing for AoS storage, leading for 'soa')
        spatial_shapes = {}
        for f, a in zip(op.forward_input_fields, arrays):
            sd = f.spatial_dimensions
            ni = f.index_dimensions
            if a.ndim != sd + ni:
                raise ValueError(
                    f"field {f.name!r}: expected rank {sd + ni} "
                    f"({sd} spatial + {ni} index dims), got "
                    f"array of rank {a.ndim}")
            got_idx = (tuple(a.shape[:ni]) if getattr(f, "index_major", False)
                       else tuple(a.shape[sd:]))
            if f.index_shape and got_idx != f.index_shape:
                where = "leading" if getattr(f, "index_major", False) else "trailing"
                raise ValueError(
                    f"field {f.name!r}: {where} index dims {got_idx} != "
                    f"declared index_shape {f.index_shape}")
            spatial_shapes[f.name] = storage_spatial(f, a)
        if len(set(spatial_shapes.values())) > 1:
            raise ValueError(
                f"all fields must share one spatial shape; got {spatial_shapes}")
        result = wrapped(*arrays)
        return result[0] if len(result) == 1 else result

    user_fn.input_names = in_names
    user_fn.output_names = out_names
    user_fn.op = op
    user_fn.forward_program = fwd_prog
    user_fn.backward_program = bwd_prog
    user_fn.__name__ = op.op_name
    return user_fn


def build_custom_vjp(op, lowering: str = "jnp", periodic: bool = False,
                     **kwargs):
    from . import get_lowering
    lower = get_lowering(lowering)
    accumulate = kwargs.pop("accumulate", "pairwise")
    fwd_prog = forward_program(op, accumulate=accumulate)
    bwd_progs = backward_programs(op, accumulate=accumulate)
    bwd_prog = bwd_progs[-1]
    staged = is_staged_backward(op)
    if periodic:
        # wrap-around domain: every cell is written, so the VJP needs no
        # interior masking anywhere — the adjoint of a circulant stencil is
        # the transposed circulant, evaluated through the same periodic path
        fwd_fn = lower(fwd_prog, full_domain=False, periodic=True, **kwargs)
        if staged:
            bwd_full_fn = make_staged_fn(bwd_progs, lower, {},
                                         periodic=True, **kwargs)
        else:
            bwd_full_fn = lower(bwd_prog, full_domain=True, periodic=True,
                                **kwargs)
    else:
        fwd_fn = lower(fwd_prog, full_domain=False, **kwargs)
        # the lowering applies the exact-VJP cotangent interior mask itself
        # (fused in-kernel for the blocked Pallas strategy)
        if staged:
            bwd_full_fn = make_staged_fn(
                bwd_progs, lower,
                {"adjoint_mask_ghost": fwd_prog.ghost}, **kwargs)
        else:
            bwd_full_fn = lower(bwd_prog, full_domain=True,
                                adjoint_mask_ghost=fwd_prog.ghost, **kwargs)
    bwd_input_fields = None
    if staged:
        inter = set(op.backward_assignments.intermediate_fields)
        seen, bwd_input_fields = set(), []
        for p in bwd_progs:
            for f in p.input_fields:
                if f not in inter and f not in seen:
                    seen.add(f)
                    bwd_input_fields.append(f)
    return build_custom_vjp_from_programs(op, fwd_fn, bwd_full_fn,
                                          fwd_prog, bwd_prog,
                                          bwd_masks_cotangents=True,
                                          bwd_input_fields=bwd_input_fields)
