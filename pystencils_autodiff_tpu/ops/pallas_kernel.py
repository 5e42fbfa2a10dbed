"""Pallas TPU lowering: stencil programs → tiled VMEM kernels.

This is the TPU-native analog of the reference's generated CUDA kernels
(SURVEY.md §2.2): where pystencils emitted a ``__global__`` grid over the
interior and the torch/TF modules JIT-compiled it, here each stencil program
becomes a ``pl.pallas_call`` compiled by Mosaic/XLA.

Strategies, selected automatically per call:

* **whole-array** (small arrays): one grid step, every field one VMEM block,
  shifted reads are static sub-slices — optimal when everything fits VMEM.

* **blocked** (the default fast path): all leading spatial dims flatten into
  one row axis so every kernel is 2D (3D+ blocks crash/bloat Mosaic); the
  grid auto-pipelines row blocks; cross-block row halos come from two tiny
  strip tensors built with cheap XLA slices; lateral shifts are
  ``pltpu.roll`` + iota masks (measured free: a 5-point stencil runs at
  copy speed); index-dim fields split into scalar component planes; the
  exact-VJP cotangent mask fuses into the kernel; rows pad to a divisible
  tile when needed; ``periodic=True`` wraps strips and rolls with no masks.

* **tiled** (kept as an alternative implementation): manual double-buffered
  HBM→VMEM DMA slabs following the Pallas-guide pipeline pattern.

Ghost-layer semantics match ops/common.py: ``interior`` mode writes only the
ghost-shrunk interior (rest zeros); ``full`` mode (exact VJP) computes every
cell from ghost-padded/zero-extended reads; ``periodic`` wraps.

Cell-centred masking is done with ``broadcasted_iota`` comparisons so the
kernel body stays branch-free (VPU-friendly, no scalar control flow).
Temporal blocking (k steps per kernel) lives in ops/time_chain.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from .common import (StencilProgram, assemble_planes, is_adjoint,
                     lat_shifted_read, plane_view, scoped_vmem,
                     shared_lateral_offsets, spatial_index,
                     storage_spatial)

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
        # the default scoped-vmem limit (16M) rejects kernels with many
        # live temporaries (e.g. dd accumulation trees) even on tiny
        # arrays; raise it like every other strategy does
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*arrays)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    return dict(zip(program.output_names, result))


# ---------------------------------------------------------------------------
# Strategy "blocked": auto-pipelined row blocks + halo strips + in-register
# shifts.  The fast path: measured at pallas copy speed on v5e (shifted
# reads inside a kernel are free; wrapper pads/scatters are not — so this
# strategy has none).  Cross-block row halos come from two small strip
# tensors built with cheap XLA slices; lateral (non-leading-dim) shifts are
# value-level concats; cotangent interior masking (exact VJP) is fused into
# the kernel via ``adjoint_mask_ghost``.
# ---------------------------------------------------------------------------


def _shift_lateral(v, offset: int, axis: int, zero_fill: bool,
                   interpret: bool, periodic: bool = False):
    """Shift value ``v`` by ``offset`` along ``axis``: ``result[i] =
    v[i+offset]``; cells beyond the edge are zero (adjoint semantics) or
    edge-replicated (primal; replicated values are always multiplied by
    masked-zero factors but must stay finite).

    Implemented as a circular roll + iota mask: Mosaic lowers ``pltpu.roll``
    to a cheap lane/sublane rotate (measured at copy speed), whereas
    lane-dim concatenates of odd-width pieces hit layout-offset
    restrictions.  Interpret mode falls back to ``jnp.roll``.
    """
    if offset == 0:
        return v
    w = v.shape[axis]
    if interpret:
        rolled = jnp.roll(v, -offset, axis=axis)
    elif v.dtype.itemsize != 4:
        # Mosaic's rotate is 32-bit only; round-trip through f32 (exact for
        # bf16/f16 values — widening then narrowing the same value)
        rolled = pltpu.roll(v.astype(jnp.float32), (-offset) % w,
                            axis).astype(v.dtype)
    else:
        rolled = pltpu.roll(v, (-offset) % w, axis)
    if periodic:  # circular domain: the roll IS the shift
        return rolled
    ids = jax.lax.broadcasted_iota(jnp.int32, v.shape, axis)
    mask = (ids < w - offset) if offset > 0 else (ids >= -offset)
    if zero_fill:
        return jnp.where(mask, rolled, 0)
    edge = jax.lax.slice_in_dim(v, w - 1, w, axis=axis) if offset > 0 \
        else jax.lax.slice_in_dim(v, 0, 1, axis=axis)
    return jnp.where(mask, rolled, jnp.broadcast_to(edge, v.shape))


def _pick_divisor_tile(s0: int, lo0: int, hi0: int, row_bytes: int,
                       vmem_limit: int) -> Optional[int]:
    """Largest multiple-of-8 divisor of s0 whose slabs fit the VMEM budget;
    None if s0 has no multiple-of-8 divisor (fallback to other strategies).

    ``row_bytes`` is bytes per row summed over all live tile-sized values
    (blocks + one shifted value per distinct access); ~60% of the VMEM
    budget may be live at once (measured safe: 27-access adjoints at
    t=1152×384 compile, while 30×7 MB blocks crash Mosaic)."""
    budget_rows = max(8, (vmem_limit * 3 // 5) // max(row_bytes, 1))
    best = None
    for t in range(8, s0 + 1, 8):
        if s0 % t == 0 and t <= max(budget_rows, 8) and t >= lo0 + hi0:
            best = t
    if best is None:
        for t in range(8, s0 + 1, 8):
            if s0 % t == 0 and t >= lo0 + hi0:
                return t  # smallest fitting divisor even if over budget guess
    return best


def _run_blocked(program: StencilProgram, inputs: Dict[str, jax.Array],
                 spatial, dtype, full_domain: bool, interpret: bool,
                 tile_rows: Optional[int] = None,
                 adjoint_mask_ghost=None,
                 vmem_limit_bytes: int = 100 * 1024 * 1024,
                 debug: bool = False,
                 periodic: bool = False):
    """Flattened-2D blocked execution.

    All leading spatial dims are flattened into one row axis, so every
    kernel is a 2D (rows, cols) program regardless of the stencil's rank —
    Mosaic-friendly shapes (3D+ blocks crash/bloat the compiler) and one
    uniform code path:

    * spatial offset (o_0..o_{n-2}, o_col) → row offset Σ o_d·stride_d and
      a column offset;
    * cross-block row halos come from two strip tensors (cheap XLA slices);
    * column shifts are rolls + iota masks;
    * reads that cross an *inner* flattened-dim boundary land on the
      adjacent row — harmless for primal factors (finite, always multiplied
      by a zeroed adjoint factor or masked output) but adjoint reads get an
      explicit per-access validity mask, which keeps the VJP exact (when
      the adjoint factor is valid, every primal factor's per-dim coordinate
      is provably in range — interior chain rule);
    * ghost/interior masks evaluate per-dim coordinates with div/mod on a
      row iota.

    Constraint: ``full_domain`` without any adjoint input field would need
    per-access edge clamping across inner dims — callers fall back to the
    jnp lowering for that case (only oracle tests use it).
    """
    nd = program.ndim
    ghost = program.ghost
    cols = spatial[-1]
    lead = tuple(spatial[:-1])  # flattened dims
    rows_total = int(np.prod(lead, dtype=np.int64))
    # row stride of each leading spatial dim
    strides = [1] * (nd - 1)
    for d in range(nd - 3, -1, -1):
        strides[d] = strides[d + 1] * lead[d + 1]

    def row_off(offsets) -> int:
        return int(sum(int(o) * strides[d] for d, o in enumerate(offsets[:-1])))

    all_accesses = [at for s in program.steps for at in s.atoms
                    if isinstance(at, Field.Access)]
    lo0 = max([0] + [-row_off(a.offsets) for a in all_accesses])
    hi0 = max([0] + [row_off(a.offsets) for a in all_accesses])

    itemsize = jnp.dtype(dtype).itemsize
    row_bytes = cols * itemsize

    def _n_comp(f):
        return int(np.prod(f.index_shape)) if f.index_shape else 1

    # VMEM pressure per tile row: the auto-pipeline double-buffers every
    # operand *plane* (index fields are split into component planes), and
    # the kernel holds one live value per distinct access plus slack for
    # subexpressions/masks — many-plane programs (D2Q9: 18 planes) and
    # many-access programs (27-point adjoints) need smaller tiles or the
    # compiler runs out of VMEM / drowns in spills.
    n_in_planes = sum(_n_comp(f) for f in program.input_fields)
    n_out_planes = sum(_n_comp(f) for f in program.output_fields)
    n_access = len({(a.field.name, a.offsets, a.index) for a in all_accesses})
    n_live = 2 * (n_in_planes + n_out_planes) + n_access + 4

    if tile_rows is None:
        t = _pick_divisor_tile(rows_total, lo0, hi0,
                               row_bytes * max(n_live, 1), vmem_limit_bytes)
    else:
        t = int(tile_rows)
        if rows_total % t or t < lo0 + hi0:
            t = None
    if periodic and t is None:
        raise ValueError("periodic blocked path needs a divisible row tile")
    pad_rows = 0
    if t is None:
        # no suitable divisor: pad the flattened row axis.  Pad rows hold
        # zeros for adjoint fields (exact zero-extension) and edge copies
        # for primal fields (finite); cells there are sliced off, and valid
        # cells never depend on them except through already-masked reads.
        t = max(256, _round_up(lo0 + hi0 + 1, 8))
        pad_rows = _round_up(rows_total, t) - rows_total
    rows_padded = rows_total + pad_rows
    nb = rows_padded // t

    # Index-dimension fields are split into scalar component *planes* —
    # every kernel operand is then a 2D (rows, cols) array.  AoS trailing
    # component dims (lane extent 2–9) are hostile to Mosaic layouts; the
    # split costs one strided-slice pass per component at the wrapper and
    # buys clean (8,128)-tileable kernels (the SoA transform, done lazily).
    import itertools as _it

    def _components(f):
        if f.index_shape:
            return [tuple(c) for c in
                    _it.product(*(range(s) for s in f.index_shape))]
        return [()]

    in_keys = [(f, idx) for f in program.input_fields for idx in _components(f)]
    out_keys = [(f, idx) for f in program.output_fields for idx in _components(f)]
    shared_lat = shared_lateral_offsets(program.steps)

    arrays, ups, downs = [], [], []
    for f, idx in in_keys:
        arr = inputs[f.name].astype(dtype)
        # SoA ('soa' layout): component planes are contiguous leading slices;
        # AoS: strided trailing-dim gather (the lazy SoA transform)
        plane = plane_view(f, arr, idx).reshape((rows_total, cols))
        zero_fill = is_adjoint(f)
        if pad_rows:
            plane = jnp.pad(plane, ((0, pad_rows), (0, 0)),
                            mode="constant" if zero_fill else "edge")
        xr = plane.reshape((nb, t, cols))
        if lo0:
            if periodic:
                ups.append(jnp.roll(xr[:, t - lo0:], 1, axis=0))
            else:
                first = (jnp.zeros((1, lo0, cols), dtype) if zero_fill else
                         jnp.broadcast_to(xr[:1, :1], (1, lo0, cols)))
                ups.append(jnp.concatenate([first, xr[:-1, t - lo0:]], axis=0))
        if hi0:
            if periodic:
                downs.append(jnp.roll(xr[:, :hi0], -1, axis=0))
            else:
                last = (jnp.zeros((1, hi0, cols), dtype) if zero_fill else
                        jnp.broadcast_to(xr[-1:, -1:], (1, hi0, cols)))
                downs.append(jnp.concatenate([xr[1:, :hi0], last], axis=0))
        arrays.append(plane)

    n_in = len(in_keys)
    n_up = len(ups)
    n_dn = len(downs)
    input_pos = {(f.name, idx): i for i, (f, idx) in enumerate(in_keys)}
    interior_shape = (t, cols)
    adj_ghost = adjoint_mask_ghost
    glo_col, ghi_col = (adj_ghost[-1] if adj_ghost is not None else (0, 0))

    def dim_coord(rows_global, d):
        """Per-dim coordinate of a flat row index (vectorised div/mod)."""
        c = rows_global // strides[d]
        if d > 0:
            c = c % lead[d]
        return c

    def dims_interior_mask(rows_global, col_ids, ghost_spec, shape2):
        m = jnp.ones(shape2, bool)
        for d in range(nd - 1):
            lo, hi = ghost_spec[d]
            if lo or hi:
                c = dim_coord(rows_global, d)
                m &= (c >= lo) & (c < lead[d] - hi)
        lo, hi = ghost_spec[-1]
        if lo or hi:
            m &= (col_ids >= lo) & (col_ids < cols - hi)
        return m

    def kernel(*refs):
        xs = refs[:n_in]
        up_refs = refs[n_in:n_in + n_up]
        dn_refs = refs[n_in + n_up:n_in + n_up + n_dn]
        outs = refs[n_in + n_up + n_dn:]
        i = pl.program_id(0)

        rows_tile = (jax.lax.broadcasted_iota(jnp.int32, interior_shape, 0)
                     + i * t)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, interior_shape, 1)

        ext: Dict[tuple, jax.Array] = {}
        for f, idx in in_keys:
            k = input_pos[(f.name, idx)]
            parts = []
            if lo0:
                parts.append(up_refs[k][0])
            parts.append(xs[k][...])
            if hi0:
                parts.append(dn_refs[k][0])
            ext[(f.name, idx)] = (jnp.concatenate(parts, axis=0)
                                  if len(parts) > 1 else parts[0])

        shift_cache: Dict[tuple, jax.Array] = {}
        lat_cache: Dict[tuple, jax.Array] = {}

        def read(acc):
            key = (acc.field.name, acc.offsets, acc.index)
            if key in shift_cache:
                return shift_cache[key]
            if acc.field.index_shape and not acc.index:
                raise ValueError(f"{acc}: select index components")
            ro = row_off(acc.offsets)
            oc = acc.offsets[-1]
            zero_fill = is_adjoint(acc.field)
            v = lat_shifted_read(
                lat_cache, shared_lat, (acc.field.name, acc.index, oc),
                ext[(acc.field.name, acc.index)], oc, lo0 + ro, t,
                zero_fill, interpret, periodic)
            if zero_fill and not periodic:
                # adjoint reads: exact-VJP masking, all in one pass —
                # (a) fused cotangent interior mask in *global* coords of
                #     the cell being read (rows_tile+ro, col+oc),
                # (b) validity of inner-flattened-dim crossings.
                r_read = rows_tile + ro
                c_read = col_ids + oc
                m = (r_read >= 0) & (r_read < rows_total)
                if adj_ghost is not None:
                    for d in range(nd - 1):
                        lo, hi = adj_ghost[d]
                        c = dim_coord(r_read, d)
                        m &= (c >= lo) & (c < lead[d] - hi)
                    m &= (c_read >= glo_col) & (c_read < cols - ghi_col)
                # inner-dim crossing validity: the per-dim coordinate of
                # the *source* row must equal target coord + offset
                for d in range(1, nd - 1):
                    o_d = acc.offsets[d]
                    if o_d:
                        tgt = dim_coord(rows_tile, d) + o_d
                        m &= (tgt >= 0) & (tgt < lead[d])
                v = jnp.where(m, v, 0)
            shift_cache[key] = v
            return v

        out_vals = _eval_steps(program, read, interior_shape, dtype)

        if debug:
            first = next(iter(ext.values()))
            pl.debug_print("block {}: ext[0,0]={}", i, first[(0,) * first.ndim])

        if full_domain or periodic:
            mask = None
        else:
            mask = dims_interior_mask(rows_tile, col_ids, ghost, interior_shape)

        zeros_plane = jnp.zeros(interior_shape, dtype)
        for (f, idx), ref in zip(out_keys, outs):
            val = out_vals.get(f.name, {}).get(idx, zeros_plane)
            if mask is not None:
                val = jnp.where(mask, val, 0)
            if f in program.accum_fields and (f.name, idx) in input_pos:
                val = val + xs[input_pos[(f.name, idx)]][...]
            ref[...] = val

    def strip_spec(shape):
        return pl.BlockSpec((1,) + shape[1:],
                            lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    plane_spec = pl.BlockSpec((t, cols), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    x_specs = [plane_spec] * n_in
    up_specs = [strip_spec(u.shape) for u in ups]
    dn_specs = [strip_spec(d.shape) for d in downs]
    out_specs = tuple(plane_spec for _ in out_keys)
    out_shapes = [jax.ShapeDtypeStruct((rows_padded, cols), dtype)
                  for _ in out_keys]

    result = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=tuple(out_shapes),
        in_specs=x_specs + up_specs + dn_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
    )(*arrays, *ups, *downs)
    if not isinstance(result, (tuple, list)):
        result = (result,)

    # restack component planes into the field's storage layout
    outputs: Dict[str, jax.Array] = {}
    pos = 0
    for f in program.output_fields:
        comps = _components(f)
        planes = [result[pos + j][:rows_total] for j in range(len(comps))]
        pos += len(comps)
        outputs[f.name] = assemble_planes(f, planes, spatial)
    return outputs


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
    from ..utils.config import log_lowering_decision
    log_lowering_decision(program.name, tile_rows=t,
                          slab_bytes=2 * row_bytes * (t + lo0 + hi0),
                          vmem_limit=vmem_limit_bytes)

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
            vmem_limit_bytes=scoped_vmem(vmem_limit_bytes),
        ),
    )(*arrays)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    return {name: arr[:s0] for name, arr in zip(program.output_names, result)}


# ---------------------------------------------------------------------------
# Strategy D: plane-blocked single step (3D) — the k=1 degenerate chain
# ---------------------------------------------------------------------------


def _run_plane_single(program: StencilProgram, inputs: Dict[str, jax.Array],
                      spatial, dtype, interpret: bool,
                      tile_rows: Optional[int] = None,
                      vmem_limit_bytes: int = 100 * 1024 * 1024,
                      periodic: bool = False):
    """Single-step plane-blocked execution for 3D programs.

    The flattened blocked strategy turns a ±1 dim-0 offset into a ±n1-row
    halo — at 384³ the strips are whole 384-row planes on a ~1536-row
    tile, i.e. ~50 % redundant reads AND compute per block (measured:
    diff3d fwd 390 GB/s, 0.48 of roofline).  Tiling dim 0 in planes
    (ops/plane_chain.py with k=1) makes the halo ``reach`` PLANES on a
    t-plane tile (~2/t redundancy), drops the div/mod interior masks for
    native 3D iotas, and gives periodic 3D single steps a Pallas path at
    all (they previously fell back to the XLA jnp lowering).

    The "carry map" fed to the chain kernel is only output-slot naming:
    any output↔input pairing with matching component structure is valid
    for k=1, and ``emit_names`` restricts the written volumes to real
    outputs so invariant operands (a coefficient field) cost no output
    write.  Raises ``ValueError`` when no pairing or no viable plane
    tile exists — the caller falls back to the blocked strategy."""
    from .plane_chain import make_plane_chain_kernel_fn

    carry: Dict[str, str] = {}
    used: list = []
    for fo in program.output_fields:
        cand = next((fi for fi in program.input_fields
                     if fi.name not in carry
                     and fi.index_shape == fo.index_shape), None)
        if cand is None:
            raise ValueError(f"{program.name}: no input slot for output "
                             f"{fo.name!r} (plane single-step)")
        carry[cand.name] = fo.name
        used.append(cand.name)

    kern = make_plane_chain_kernel_fn(
        program, 1, carry, spatial, dtype, interpret, periodic,
        tile_planes=tile_rows, vmem_limit_bytes=vmem_limit_bytes,
        emit_names=used)
    res = kern(inputs)
    return {carry[n]: res[n] for n in used}


def _run_plane_full(program: StencilProgram, inputs: Dict[str, jax.Array],
                    spatial, dtype, interpret: bool,
                    tile_rows: Optional[int] = None,
                    vmem_limit_bytes: int = 100 * 1024 * 1024,
                    periodic: bool = False,
                    adjoint_mask_ghost=None):
    """Full-domain plane-blocked execution for 3D programs — the exact-VJP
    backward geometry (ops/vjp.py: every cell written, adjoint reads
    zero-extended, primal reads edge-clamped).

    In plane geometry the full mode needs NO in-kernel masks at all: the
    dim-0 halo strips ARE the exact extension (zeros for adjoint fields,
    edge copies for primal), ``_shift_lateral``'s zero-fill/edge modes
    are per-dim exact in dims 1/2, and there are no flattened inner-dim
    crossings to validate.  This replaces the blocked strategy's
    384-row-plane halo strips (~50 % redundant compute at 384³) for the
    3D ``fwd+adj`` single-step path, and gives primal-only full-domain
    3D programs (oracle mode) and periodic 3D backwards a Pallas path at
    all (both previously jnp fallbacks).  ``adjoint_mask_ghost`` fuses
    the exact-VJP cotangent interior mask into the adjoint reads (a
    global 3D iota test of the READ cell — equivalent to pre-masking the
    cotangent then zero-extending, without the wrapper's extra pad+slice
    memory pass).  Raises ``ValueError`` when no viable plane tile
    exists."""
    from .plane_chain import pick_plane_tile, plane_reach

    n0, n1, n2 = spatial
    accesses = [at for s in program.steps for at in s.atoms
                if isinstance(at, Field.Access)]
    lo1, hi1 = plane_reach(accesses)
    itemsize = jnp.dtype(dtype).itemsize
    n_in = len(program.input_fields)
    n_out = len(program.output_fields)
    lat_pairs = {(a.field.name, a.offsets[1], a.offsets[2])
                 for a in accesses if a.offsets[1] or a.offsets[2]}
    n_live = 2 * (n_in + n_out) + len(lat_pairs) + 4
    t = tile_rows or pick_plane_tile(n0, lo1, hi1,
                                     n1 * n2 * itemsize * n_live,
                                     vmem_limit_bytes)
    if t is None or n0 % t or t < max(lo1 + hi1, 1):
        raise ValueError(f"no viable plane tile for n0={n0} (full mode)")
    if tile_rows is None and t < 2 * (lo1 + hi1):
        # profitability floor: a tile smaller than twice the halo means
        # ≥50 % redundant reads/rotates — many-operand backwards whose
        # VMEM estimate only admits such tiles do better on the blocked
        # path (which shares its halo cost across a ~1536-row tile)
        raise ValueError(f"plane tile t={t} below profitability floor "
                         f"for halo {lo1 + hi1}")
    nb = n0 // t

    in_names = [f.name for f in program.input_fields]
    arrays, ups, downs = [], [], []
    for f in program.input_fields:
        vol = inputs[f.name].astype(dtype).reshape((n0, n1, n2))
        arrays.append(vol)
        xr = vol.reshape((nb, t, n1, n2))
        zero = is_adjoint(f)
        if lo1:
            if periodic:
                ups.append(jnp.roll(xr[:, t - lo1:], 1, axis=0))
            else:
                first = (jnp.zeros((1, lo1, n1, n2), dtype) if zero else
                         jnp.broadcast_to(xr[:1, :1], (1, lo1, n1, n2)))
                ups.append(jnp.concatenate([first, xr[:-1, t - lo1:]], 0))
        if hi1:
            if periodic:
                downs.append(jnp.roll(xr[:, :hi1], -1, axis=0))
            else:
                last = (jnp.zeros((1, hi1, n1, n2), dtype) if zero else
                        jnp.broadcast_to(xr[-1:, -1:], (1, hi1, n1, n2)))
                downs.append(jnp.concatenate([xr[1:, :hi1], last], 0))
    n_up, n_dn = len(ups), len(downs)
    input_pos = {f.name: i for i, f in enumerate(program.input_fields)}
    adj_of = {f.name: is_adjoint(f) for f in program.input_fields}
    shape_t = (t, n1, n2)

    adj_ghost = adjoint_mask_ghost if not periodic else None

    def kernel(*refs):
        xs = refs[:n_in]
        up_refs = refs[n_in:n_in + n_up]
        dn_refs = refs[n_in + n_up:n_in + n_up + n_dn]
        outs = refs[n_in + n_up + n_dn:]
        i = pl.program_id(0)

        ext: Dict[str, jax.Array] = {}
        for f in program.input_fields:
            kk = input_pos[f.name]
            parts = []
            if lo1:
                parts.append(up_refs[kk][0])
            parts.append(xs[kk][...])
            if hi1:
                parts.append(dn_refs[kk][0])
            ext[f.name] = (jnp.concatenate(parts, axis=0)
                           if len(parts) > 1 else parts[0])

        lat_cache: Dict[tuple, jax.Array] = {}
        iotas = ([jax.lax.broadcasted_iota(jnp.int32, shape_t, d)
                  for d in range(3)] if adj_ghost is not None else None)

        def read(acc):
            name = acc.field.name
            zero = adj_of[name]
            o1, o2 = acc.offsets[1], acc.offsets[2]
            key = (name, o1, o2)
            v = lat_cache.get(key)
            if v is None:
                k1 = (name, o1)
                v1 = lat_cache.get(k1)
                if v1 is None:
                    v1 = _shift_lateral(ext[name], o1, 1, zero,
                                        interpret, periodic)
                    lat_cache[k1] = v1
                v = _shift_lateral(v1, o2, 2, zero, interpret, periodic)
                lat_cache[key] = v
            start = lo1 + acc.offsets[0]
            v = jax.lax.slice_in_dim(v, start, start + t, axis=0)
            if zero and adj_ghost is not None:
                # fused exact-VJP cotangent interior mask: the READ cell's
                # global coordinates must lie in the forward interior
                p = iotas[0] + (i * t + acc.offsets[0])
                a = iotas[1] + o1
                b = iotas[2] + o2
                (g0l, g0h), (g1l, g1h), (g2l, g2h) = adj_ghost
                m = ((p >= g0l) & (p < n0 - g0h)
                     & (a >= g1l) & (a < n1 - g1h)
                     & (b >= g2l) & (b < n2 - g2h))
                v = jnp.where(m, v, 0)
            return v

        out_vals = _eval_steps(program, read, shape_t, dtype)
        zeros_t = jnp.zeros(shape_t, dtype)
        for f, ref in zip(program.output_fields, outs):
            val = out_vals.get(f.name, {}).get((), zeros_t)
            if f in program.accum_fields and f.name in input_pos:
                val = val + xs[input_pos[f.name]][...]
            ref[...] = val

    vol_spec = pl.BlockSpec((t, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def strip_spec(shape):
        return pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    result = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((n0, n1, n2), dtype)
                        for _ in program.output_fields),
        in_specs=[vol_spec] * n_in + [strip_spec(u.shape) for u in ups]
        + [strip_spec(d.shape) for d in downs],
        out_specs=tuple(vol_spec for _ in program.output_fields),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
    )(*arrays, *ups, *downs)
    if not isinstance(result, (tuple, list)):
        result = (result,)
    return dict(zip(program.output_names, result))


# ---------------------------------------------------------------------------
# public factory
# ---------------------------------------------------------------------------

_WHOLE_ARRAY_LIMIT_BYTES = 2 * 1024 * 1024  # per-array VMEM heuristic


def make_pallas_stencil(program: StencilProgram, full_domain: bool = False,
                        dtype=None, interpret: Optional[bool] = None,
                        tile_rows: Optional[int] = None,
                        strategy: Optional[str] = None,
                        adjoint_mask_ghost=None,
                        debug: bool = False,
                        periodic: bool = False):
    """Build ``fn(inputs: dict) -> dict`` running as a Pallas TPU kernel.

    ``interpret=None`` auto-selects interpreter mode off-TPU (CI-safe, the
    reference's capability-gating pattern, SURVEY.md §4).  ``strategy``:
    ``"blocked"`` (fast path: auto-pipelined row blocks + halo strips +
    in-register shifts), ``"whole"`` (everything one VMEM block),
    ``"tiled"`` (manual double-buffered DMA slabs); default auto-selects.
    ``adjoint_mask_ghost``: forward ghost spec — fuse exact-VJP cotangent
    interior masking into the kernel (blocked strategy) or pre-mask in the
    wrapper (other strategies).
    """

    def fn(inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        interp = interpret if interpret is not None else not _on_tpu()
        f0 = program.input_fields[0]
        arr0 = inputs[f0.name]
        out_dtype = dtype or arr0.dtype
        spatial = storage_spatial(f0, arr0)

        has_index = any(f.index_shape for f in
                        program.input_fields + program.output_fields)
        # plane-blocked single step (strategy D): 3D forward programs
        # without index/adjoint/accum structure ride the k=1 plane chain
        # — halo `reach` planes instead of `reach·n1` flattened rows.
        # Gated to single-operand programs: measured at 384³, lap3d fwd
        # 411→486 and aniso27 fwd 248→307 GB/s, but the two-operand
        # diff3d REGRESSED 390→304 (a second ext concat + lateral cache
        # on the VMEM-limited ~6-plane tile outweighs the halo saving)
        plane_ok = (program.ndim == 3 and not full_domain
                    and not has_index
                    and len(program.input_fields) == 1
                    and not any(is_adjoint(f) for f in program.input_fields)
                    and not program.accum_fields
                    and getattr(program, "accumulate", "pairwise") != "dd"
                    and adjoint_mask_ghost is None)

        def try_plane(per: bool):
            from ..utils.config import log_lowering_decision

            try:
                out = _run_plane_single(program, inputs, spatial, out_dtype,
                                        interp, tile_rows=tile_rows,
                                        periodic=per)
            except ValueError:
                return None
            log_lowering_decision(program.name, strategy="plane",
                                  spatial=spatial, dtype=str(out_dtype),
                                  interpret=interp, periodic=per)
            return out

        if periodic:
            # in-kernel wrap-around is implemented for the 2D blocked path
            # (inner flattened dims would need huge wrap shifts in 3D+) and
            # for 3D via the plane-blocked single step / full-domain plane
            # backward, which wrap in all three dims; everything else uses
            # the roll-based jnp evaluation
            rows0 = spatial[0]
            nbytes0 = int(np.prod(spatial)) * jnp.dtype(out_dtype).itemsize
            if (program.ndim == 3 and full_domain and not has_index
                    and strategy is None
                    and getattr(program, "accumulate", "pairwise") != "dd"
                    and nbytes0 > _WHOLE_ARRAY_LIMIT_BYTES):
                # periodic exact-VJP backward (no masks anywhere)
                try:
                    out = _run_plane_full(program, inputs, spatial,
                                          out_dtype, interp,
                                          tile_rows=tile_rows,
                                          periodic=True)
                    from ..utils.config import log_lowering_decision

                    log_lowering_decision(program.name,
                                          strategy="plane_full",
                                          spatial=spatial, periodic=True)
                    return out
                except ValueError:
                    pass
            if (plane_ok and strategy in (None, "plane")
                    and nbytes0 > _WHOLE_ARRAY_LIMIT_BYTES):
                out = try_plane(True)
                if out is not None:
                    return out
            per_ok = (program.ndim == 2
                      and any(rows0 % tt == 0 for tt in range(8, rows0 + 1, 8))
                      and strategy in (None, "blocked"))
            if not per_ok:
                from .jnp_ref import make_jnp_stencil

                return make_jnp_stencil(program, full_domain=full_domain,
                                        dtype=dtype, periodic=True)(inputs)
            return _run_blocked(program, inputs, spatial, out_dtype,
                                full_domain, interp, tile_rows=tile_rows,
                                vmem_limit_bytes=100 * 1024 * 1024,
                                debug=debug, periodic=True)
        rest = spatial[1:]
        aligned = (not rest or rest[-1] % 128 == 0) and (
            len(rest) < 2 or all(s % 8 == 0 for s in rest[:-1]))
        tiled_ok = program.ndim >= 2 and not has_index and (interp or aligned)
        s0 = spatial[0]
        # full-domain *primal-only* programs in 3D+ would need edge-clamped
        # inner-dim crossings the flattened path doesn't emulate (only the
        # oracle-test mode uses this; the VJP's bwd programs have adjoints)
        has_adjoint_in = any(is_adjoint(f) for f in program.input_fields)
        blocked_ok = (program.ndim >= 2
                      and not (full_domain and program.ndim >= 3
                               and not has_adjoint_in))

        strat = strategy
        if strat == "plane" or (strat is None and plane_ok):
            nbytes = int(np.prod(spatial)) * jnp.dtype(out_dtype).itemsize
            total = nbytes * (len(program.input_fields)
                              + len(program.output_fields))
            if strat == "plane" or total > _WHOLE_ARRAY_LIMIT_BYTES:
                out = try_plane(False)
                if out is not None:
                    return out
                if strat == "plane":
                    raise ValueError(
                        f"{program.name}: plane strategy needs a 3D "
                        f"scalar-field forward program with a viable "
                        f"plane tile; got spatial={spatial}")
                # no pairing / viable tile: fall through to auto-select
        if strat is None:
            nbytes = int(np.prod(spatial)) * jnp.dtype(out_dtype).itemsize
            total = nbytes * (len(program.input_fields) + len(program.output_fields))
            if (getattr(program, "accumulate", "pairwise") == "dd"
                    and blocked_ok):
                # dd TwoProd/TwoSum trees carry many live temporaries: the
                # whole-array 3D block blows the scoped-vmem budget / hangs
                # the remote Mosaic compiler (measured); flattened blocked
                # tiles compile fine
                strat = "blocked"
            elif total <= _WHOLE_ARRAY_LIMIT_BYTES:
                strat = "whole"
            elif (program.ndim == 3 and full_domain and not has_index):
                # exact-VJP backward (and primal-only oracle mode) in
                # plane geometry: reach-plane halos instead of the
                # blocked strategy's reach·n1 flattened rows
                strat = "plane_full"
            elif blocked_ok:
                strat = "blocked"
            elif tiled_ok:
                strat = "tiled"
            else:
                # too big for one VMEM block and no viable tiling: fall back
                # to the XLA-fused jnp lowering rather than OOM VMEM
                from ..utils.config import log_lowering_decision
                from .jnp_ref import make_jnp_stencil

                log_lowering_decision(program.name, strategy="jnp-fallback",
                                      spatial=spatial, reason="no viable "
                                      "pallas tiling for this shape")
                return make_jnp_stencil(
                    program, full_domain=full_domain, dtype=dtype,
                    adjoint_mask_ghost=adjoint_mask_ghost)(inputs)
        from ..utils.config import log_lowering_decision
        log_lowering_decision(program.name, strategy=strat, spatial=spatial,
                              dtype=str(out_dtype), interpret=interp,
                              full_domain=full_domain, ghost=program.ghost)

        def premask(src):
            # pre-mask cotangents in the wrapper (slice+pad, no scatter)
            from ..adjoint_field import AdjointField

            masked = dict(src)
            for f in program.input_fields:
                if isinstance(f, AdjointField):
                    arr = src[f.name]
                    sl = tuple(slice(lo, s - hi) for (lo, hi), s
                               in zip(adjoint_mask_ghost, spatial))
                    sp_pads = tuple((lo, hi) for lo, hi in adjoint_mask_ghost)
                    idx_pads = ((0, 0),) * f.index_dimensions
                    pads = (idx_pads + sp_pads
                            if getattr(f, "index_major", False)
                            else sp_pads + idx_pads)
                    masked[f.name] = jnp.pad(arr[spatial_index(f, sl)], pads)
            return masked

        # blocked and plane_full fuse the exact-VJP cotangent mask into
        # the kernel; every other strategy gets pre-masked inputs
        if (strat not in ("blocked", "plane_full")
                and adjoint_mask_ghost is not None):
            inputs_eff = premask(inputs)
        else:
            inputs_eff = inputs

        if strat == "plane_full":
            try:
                out = _run_plane_full(program, inputs, spatial,
                                      out_dtype, interp,
                                      tile_rows=tile_rows,
                                      adjoint_mask_ghost=adjoint_mask_ghost)
                log_lowering_decision(program.name, strategy="plane_full",
                                      spatial=spatial, dtype=str(out_dtype),
                                      interpret=interp)
                return out
            except ValueError:
                # no viable plane tile: fall back
                strat = ("blocked" if blocked_ok
                         else "tiled" if tiled_ok else None)
                if strat is None:
                    from .jnp_ref import make_jnp_stencil

                    return make_jnp_stencil(
                        program, full_domain=full_domain, dtype=dtype,
                        adjoint_mask_ghost=adjoint_mask_ghost)(inputs)
                if strat == "tiled" and adjoint_mask_ghost is not None:
                    inputs_eff = premask(inputs)
        if strat == "whole":
            # the whole-array kernel indexes AoS (trailing index dims);
            # normalise SoA fields at the wrapper (tiny arrays by definition)
            soa_in = [f for f in program.input_fields
                      if getattr(f, "index_major", False)]
            soa_out = [f for f in program.output_fields
                       if getattr(f, "index_major", False)]
            if soa_in or soa_out:
                conv = dict(inputs_eff)
                for f in soa_in:
                    ni = f.index_dimensions
                    conv[f.name] = jnp.moveaxis(
                        inputs_eff[f.name], tuple(range(ni)),
                        tuple(range(-ni, 0)))
                res = _run_whole_array(program, conv, spatial, out_dtype,
                                       full_domain, interp)
                for f in soa_out:
                    ni = f.index_dimensions
                    res[f.name] = jnp.moveaxis(
                        res[f.name], tuple(range(-ni, 0)), tuple(range(ni)))
                return res
            return _run_whole_array(program, inputs_eff, spatial, out_dtype,
                                    full_domain, interp)
        if strat == "blocked":
            return _run_blocked(program, inputs_eff, spatial, out_dtype,
                                full_domain, interp, tile_rows=tile_rows,
                                adjoint_mask_ghost=adjoint_mask_ghost,
                                debug=debug)
        if not tiled_ok:
            raise ValueError(
                f"{program.name}: tiled Pallas path needs ≥2 spatial dims, "
                f"scalar (no index-dim) fields, and trailing extents aligned "
                f"to (8, 128) in compiled mode; got spatial={spatial}, "
                f"index fields={has_index}")
        return _run_row_tiled(program, inputs_eff, spatial, out_dtype,
                              full_domain, interp, tile_rows=tile_rows)

    fn.program = program
    fn.__name__ = f"pallas_{program.name}"
    return fn
