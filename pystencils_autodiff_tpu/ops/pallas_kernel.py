"""Pallas TPU lowering: stencil programs → tiled VMEM kernels.

This is the TPU-native analog of the reference's generated CUDA kernels
(SURVEY.md §2.2): where pystencils emitted a ``__global__`` grid over the
interior and the torch/TF modules JIT-compiled it, here each stencil program
becomes a ``pl.pallas_call`` compiled by Mosaic/XLA.

Two strategies, selected automatically per call by array size:

* **whole-array** (small arrays): one grid step, every field lives in VMEM
  as a single block; shifted reads are static sub-slices.  This is optimal
  whenever all operands fit in VMEM (≲ a few MB) — zero grid overhead and
  one HBM round-trip per array.

* **row-tiled double-buffered** (large arrays): the leading spatial dim is
  tiled; inputs stay in HBM (``memory_space=ANY``) and each grid step DMAs
  its tile+halo slab into a 2-slot VMEM scratch while the previous slab
  computes (the double-buffering pattern from the Pallas guide).  HBM
  traffic is (1 + (lo+hi)/T)× the array size, so with T ≫ halo the kernel
  runs at effectively STREAM bandwidth — the BASELINE north-star metric.

Ghost-layer semantics match ops/common.py: ``interior`` mode writes only the
ghost-shrunk interior (rest zeros); ``full`` mode (exact VJP) computes every
cell from ghost-padded inputs.

Cell-centred masking is done with ``broadcasted_iota`` comparisons so the
kernel body stays branch-free (VPU-friendly, no scalar control flow).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from .common import StencilProgram, is_adjoint

__all__ = ["make_pallas_stencil"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pad_mode(f: Field) -> str:
    return "constant" if is_adjoint(f) else "edge"


def _eval_steps(program: StencilProgram, read, interior_shape, dtype):
    """Evaluate the step list; ``read(access)`` yields an interior-shaped
    array for a field access.  Returns {output name: value or per-component
    dict}."""
    env: Dict[object, jax.Array] = {}
    out_vals: Dict[str, Dict[Tuple[int, ...], jax.Array]] = {}
    for step in program.steps:
        vals = []
        for at in step.atoms:
            if isinstance(at, Field.Access):
                vals.append(read(at))
            else:
                vals.append(env[at])
        res = step.fn(*vals)
        res = jnp.broadcast_to(jnp.asarray(res, dtype), interior_shape)
        if step.is_main:
            out_vals.setdefault(step.target.field.name, {})[step.target.index] = res
        else:
            env[step.target] = res
    return out_vals


def _assemble_components(field: Field, comps: Dict[Tuple[int, ...], jax.Array],
                         interior_shape, dtype):
    """Stack per-component values into the field's (spatial..., index...)
    array layout; missing components are zero.  Built with ``stack`` (not
    scatter) so it lowers in Mosaic TPU kernels."""
    if not field.index_shape:
        return comps[()]
    import itertools

    zeros = jnp.zeros(tuple(interior_shape), dtype)
    flat = [comps.get(idx, zeros)
            for idx in itertools.product(*(range(s) for s in field.index_shape))]
    stacked = jnp.stack(flat, axis=-1)
    return stacked.reshape(tuple(interior_shape) + field.index_shape)


# ---------------------------------------------------------------------------
# Strategy A: whole-array kernel (single grid step, everything in VMEM)
# ---------------------------------------------------------------------------

def _whole_array_kernel(program: StencilProgram, spatial: Tuple[int, ...],
                        index_shapes: Dict[str, Tuple[int, ...]],
                        dtype, full_domain: bool):
    """Build the kernel function for the whole-array strategy.

    In ``full`` mode the wrapper has already ghost-padded the inputs, so the
    padded interior is exactly the original domain.
    """
    ghost = program.ghost
    nd = program.ndim
    if full_domain:
        interior = spatial  # original domain; inputs padded by wrapper
    else:
        interior = tuple(s - lo - hi for s, (lo, hi) in zip(spatial, ghost))

    def access_slices(offsets):
        return tuple(slice(lo + o, lo + o + n)
                     for (lo, _), o, n in zip(ghost, offsets, interior))

    n_in = len(program.input_fields)
    input_pos = {f.name: i for i, f in enumerate(program.input_fields)}

    def kernel(*refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]

        def read(acc):
            ref = in_refs[input_pos[acc.field.name]]
            sl = access_slices(acc.offsets)
            if acc.index:
                sl = sl + tuple(acc.index)
            return ref[sl]

        out_vals = _eval_steps(program, read, interior, dtype)
        for f, ref in zip(program.output_fields, out_refs):
            val = _assemble_components(f, out_vals[f.name], interior, dtype)
            accum = f in program.accum_fields
            if full_domain:
                if accum:
                    prev_ref = in_refs[input_pos[f.name]]
                    # prev is padded like other inputs; its interior is the
                    # original domain
                    psl = access_slices((0,) * nd)
                    val = val + prev_ref[psl + (Ellipsis,)]
                ref[...] = val
            else:
                isl = tuple(slice(lo, lo + n) for (lo, _), n in zip(ghost, interior))
                if accum and f.name in input_pos:
                    prev_ref = in_refs[input_pos[f.name]]
                    ref[...] = prev_ref[...]
                    ref[isl + (Ellipsis,)] = prev_ref[isl + (Ellipsis,)] + val
                else:
                    ref[...] = jnp.zeros(spatial + index_shapes[f.name], dtype)
                    ref[isl + (Ellipsis,)] = val

    return kernel, interior


def _run_whole_array(program: StencilProgram, inputs: Dict[str, jax.Array],
                     spatial, dtype, full_domain: bool, interpret: bool):
    index_shapes = {f.name: f.index_shape for f in program.output_fields}
    arrays = []
    for f in program.input_fields:
        arr = inputs[f.name].astype(dtype)
        if full_domain:
            pads = tuple(program.ghost) + ((0, 0),) * f.index_dimensions
            arr = jnp.pad(arr, pads, mode=_pad_mode(f))
        arrays.append(arr)
    in_spatial = arrays[0].shape[: program.ndim]

    kernel, interior = _whole_array_kernel(
        program, in_spatial if not full_domain else spatial,
        index_shapes, dtype, full_domain)
    # In full mode outputs have the original (unpadded) shape.
    out_spatial = spatial
    out_shapes = [jax.ShapeDtypeStruct(tuple(out_spatial) + f.index_shape, dtype)
                  for f in program.output_fields]

    result = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrays],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes),
        interpret=interpret,
    )(*arrays)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    return dict(zip(program.output_names, result))


# ---------------------------------------------------------------------------
# Strategy B: leading-dim tiled kernel with double-buffered manual DMA
# ---------------------------------------------------------------------------

def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _run_row_tiled(program: StencilProgram, inputs: Dict[str, jax.Array],
                   spatial, dtype, full_domain: bool, interpret: bool,
                   tile_rows: Optional[int] = None,
                   vmem_limit_bytes: int = 96 * 1024 * 1024):
    """Tile the leading spatial dim; DMA tile+halo slabs HBM→VMEM with a
    2-slot pipeline (compute on slot ``i%2`` while slot ``(i+1)%2`` loads).
    """
    nd = program.ndim
    ghost = program.ghost
    lo0, hi0 = ghost[0]
    rest_ghost = ghost[1:]

    # --- choose tile size: fill ~half the VMEM budget with all live slabs.
    itemsize = jnp.dtype(dtype).itemsize
    rest_spatial = spatial[1:]

    def slab_row_bytes(f: Field) -> int:
        n = itemsize
        dims = tuple(s + lo + hi for s, (lo, hi) in zip(rest_spatial, rest_ghost))
        for s in dims + f.index_shape:
            n *= s
        return n

    row_bytes = sum(slab_row_bytes(f) for f in program.input_fields)
    out_row_bytes = sum(slab_row_bytes(f) for f in program.output_fields)
    if tile_rows is None:
        budget = vmem_limit_bytes // 2
        # 2 slots per input slab + double-buffered output blocks
        denom = 2 * row_bytes + 2 * out_row_bytes
        tile_rows = max(8, min(512, budget // max(denom, 1)))
        tile_rows = max(tile_rows, lo0 + hi0 + 1)
        # output blocks must have sublane-divisible leading extent
        tile_rows = max(8, (tile_rows // 8) * 8)
    t = int(tile_rows)

    # --- pad inputs so every read is in bounds: leading dim by
    # (lo0, hi0 + grid alignment), every other spatial dim by its (lo, hi).
    # The kernel then computes values on the full tile extent and masks
    # ghost cells with iota comparisons (no scatter — Mosaic-friendly).
    #
    # Mosaic requires manually-sliced VMEM buffer *shapes* aligned to the
    # hardware tiling (sublane 8, lane 128 for f32), so the slab row count
    # is rounded up to 8 and the trailing scratch dims are padded to
    # alignment (padding is masked out / never read as real data).
    s0 = spatial[0]
    n_tiles = _cdiv(s0, t)
    slab_rows = _round_up(t + lo0 + hi0, 8)
    right = max(n_tiles * t - s0 + hi0,
                (n_tiles - 1) * t + slab_rows - lo0 - s0)
    # alignment for trailing scratch dims: minor → 128, second-minor → 8
    align = [1] * (nd - 1)
    if nd >= 2:
        align[-1] = 128
    if nd >= 3:
        align[-2] = 8
    rest_pad_hi = []
    for d, ((lo, hi), s) in enumerate(zip(rest_ghost, rest_spatial)):
        target = _round_up(s + lo + hi, align[d])
        rest_pad_hi.append(target - s - lo)
    arrays = []
    for f in program.input_fields:
        arr = inputs[f.name].astype(dtype)
        pads = [(lo0, right)] + [(lo, ph) for (lo, _), ph
                                 in zip(rest_ghost, rest_pad_hi)]
        pads += [(0, 0)] * f.index_dimensions
        arrays.append(jnp.pad(arr, pads, mode=_pad_mode(f)))

    rest_in = tuple(arrays[0].shape[1:nd])  # padded (aligned) rest extents
    rest_lo = tuple(lo for lo, _ in rest_ghost)

    n_in = len(program.input_fields)
    input_pos = {f.name: i for i, f in enumerate(program.input_fields)}
    interior_shape = (t,) + tuple(rest_spatial)

    def kernel(*args):
        # args: n_in hbm refs, then outputs, then n_in scratch slabs, sems
        hbm = args[:n_in]
        outs = args[n_in: n_in + len(program.output_fields)]
        scratch = args[n_in + len(program.output_fields):
                       n_in + len(program.output_fields) + n_in]
        sems = args[-1]
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def start(slot, tile_idx):
            for k in range(n_in):
                pltpu.make_async_copy(
                    hbm[k].at[(pl.ds(tile_idx * t, slab_rows),) ],
                    scratch[k].at[slot],
                    sems.at[slot, k],
                ).start()

        def wait(slot):
            for k in range(n_in):
                pltpu.make_async_copy(
                    hbm[k].at[(pl.ds(0, slab_rows),)],  # shape-only
                    scratch[k].at[slot],
                    sems.at[slot, k],
                ).wait()

        two = jnp.int32(2)
        slot = jax.lax.rem(i, two)
        nxt = jax.lax.rem(i + jnp.int32(1), two)

        @pl.when(i == 0)
        def _():
            start(0, 0)

        @pl.when(i + 1 < n)
        def _():
            start(nxt, i + 1)

        wait(slot)

        def read(acc):
            ref = scratch[input_pos[acc.field.name]]
            row = slice(lo0 + acc.offsets[0], lo0 + acc.offsets[0] + t)
            rest = tuple(slice(l + o, l + o + m) for l, o, m
                         in zip(rest_lo, acc.offsets[1:], rest_spatial))
            sl = (slot, row) + rest
            if acc.index:
                sl = sl + tuple(acc.index)
            return ref[sl]

        out_vals = _eval_steps(program, read, interior_shape, dtype)

        # ghost-cell mask in global coordinates, branch-free via iota
        row_ids = jax.lax.broadcasted_iota(jnp.int32, interior_shape, 0) + i * t
        if full_domain:
            mask = row_ids < s0  # drop only grid-alignment rows
        else:
            mask = (row_ids >= lo0) & (row_ids < s0 - hi0)
            for d, (lo, hi) in enumerate(rest_ghost):
                if lo == 0 and hi == 0:
                    continue
                ids = jax.lax.broadcasted_iota(jnp.int32, interior_shape, d + 1)
                mask &= (ids >= lo) & (ids < rest_spatial[d] - hi)

        for f, ref in zip(program.output_fields, outs):
            val = _assemble_components(f, out_vals[f.name], interior_shape, dtype)
            m = mask
            if f.index_shape:
                m = jnp.expand_dims(mask, tuple(range(nd, nd + f.index_dimensions)))
            result = jnp.where(m, val, 0)
            accum = f in program.accum_fields
            if accum and f.name in input_pos:
                # previous adjoint rows for this tile live in our own slab
                prev = read(Field.Access(f_primal_lookup[f.name], (0,) * nd, ()))
                result = result + prev
            ref[...] = result

    # accumulation: read previous value through the field's own slab
    f_primal_lookup = {f.name: f for f in program.input_fields}

    grid = (n_tiles,)
    out_shapes = [jax.ShapeDtypeStruct((n_tiles * t,) + tuple(rest_spatial) + f.index_shape,
                                       dtype) for f in program.output_fields]
    out_specs = tuple(
        pl.BlockSpec((t,) + tuple(rest_spatial) + f.index_shape,
                     lambda i, _f=f: (i,) + (0,) * (nd - 1 + _f.index_dimensions),
                     memory_space=pltpu.VMEM)
        for f in program.output_fields)
    scratch_shapes = [
        pltpu.VMEM((2, slab_rows) + tuple(rest_in) + f.index_shape, dtype)
        for f in program.input_fields
    ] + [pltpu.SemaphoreType.DMA((2, n_in))]

    result = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in arrays],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes,
        ),
    )(*arrays)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    return {name: arr[:s0] for name, arr in zip(program.output_names, result)}


# ---------------------------------------------------------------------------
# public factory
# ---------------------------------------------------------------------------

_WHOLE_ARRAY_LIMIT_BYTES = 2 * 1024 * 1024  # per-array VMEM heuristic


def make_pallas_stencil(program: StencilProgram, full_domain: bool = False,
                        dtype=None, interpret: Optional[bool] = None,
                        tile_rows: Optional[int] = None,
                        strategy: Optional[str] = None):
    """Build ``fn(inputs: dict) -> dict`` running as a Pallas TPU kernel.

    ``interpret=None`` auto-selects interpreter mode off-TPU (CI-safe, the
    reference's capability-gating pattern, SURVEY.md §4).  ``strategy`` can
    force ``"whole"`` or ``"tiled"``; default picks by array size.
    """

    def fn(inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        interp = interpret if interpret is not None else not _on_tpu()
        f0 = program.input_fields[0]
        arr0 = inputs[f0.name]
        out_dtype = dtype or arr0.dtype
        spatial = tuple(arr0.shape[: f0.spatial_dimensions])

        # Tiled-path viability: needs ≥2 spatial dims, scalar fields, and
        # (compiled mode) hardware-aligned read extents in the trailing dims.
        has_index = any(f.index_shape for f in
                        program.input_fields + program.output_fields)
        rest = spatial[1:]
        aligned = (not rest or rest[-1] % 128 == 0) and (
            len(rest) < 2 or all(s % 8 == 0 for s in rest[:-1]))
        tiled_ok = program.ndim >= 2 and not has_index and (interp or aligned)

        strat = strategy
        if strat is None:
            nbytes = int(np.prod(spatial)) * jnp.dtype(out_dtype).itemsize
            total = nbytes * (len(program.input_fields) + len(program.output_fields))
            if total <= _WHOLE_ARRAY_LIMIT_BYTES or not tiled_ok:
                strat = "whole"
            else:
                strat = "tiled"
        if strat == "whole":
            return _run_whole_array(program, inputs, spatial, out_dtype,
                                    full_domain, interp)
        if not tiled_ok:
            raise ValueError(
                f"{program.name}: tiled Pallas path needs ≥2 spatial dims, "
                f"scalar (no index-dim) fields, and trailing extents aligned "
                f"to (8, 128) in compiled mode; got spatial={spatial}, "
                f"index fields={has_index}")
        return _run_row_tiled(program, inputs, spatial, out_dtype,
                              full_domain, interp, tile_rows=tile_rows)

    fn.program = program
    fn.__name__ = f"pallas_{program.name}"
    return fn
