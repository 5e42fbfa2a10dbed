"""Boundary conditions inside fused chains.

The round-2 verdict's missing piece #3: workloads with walls (lid-driven
cavity, Dirichlet/Neumann time loops) were locked out of the 3–5× fused
chain speedups because ``fused_stage_chain`` rejected boundary handling.
BC fills are local elementwise/shift ops — the same machinery as the
chains' fused interior masks — so they fuse directly: each chain stage may
be preceded by a list of BC events that transform the in-register tile
state at the correct (shrinking) extent, consuming their own read reach
from the halo margin exactly like a stencil stage.

Array-valued BC parameters (obstacle masks, wall-velocity profiles) are
**state fields**: they ride the chain as pass-through planes (halo strips,
sharding, and differentiation come for free — ``jax.grad`` w.r.t. a lid
velocity profile flows through the chain's sequential-recompute backward).
Scalar parameters are baked in at build time.

Supported kinds (mirroring boundary.py, which remains the sequential /
non-fused implementation): ``dirichlet`` (frame, scalar value),
``neumann`` (frame, ghost width 1), ``masked_dirichlet`` (mask field +
scalar or field value), ``bounce_back`` (solid-mask field, optional
moving-wall velocity fields/scalars; out-of-domain pulls edge-clamp,
matching ``boundary.bounce_back(wrap=False)``), ``sponge`` (absorbing
layer: elementwise multiply by a damping-profile field or scalar —
``boundary.cerjan_damping`` builds the classic profile).

Reference anchor: pystencils ``BoundaryHandling`` + lbmpy boundary sweeps
inside waLBerla timeloops (SURVEY.md §1 L1, §2.1 #13).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..field import Field

__all__ = ["ChainBC", "normalize_chain_bcs", "bc_shift_offsets",
           "bc_dim_reach", "bc_row_reach", "apply_bc_sequential"]


def apply_bc_sequential(state, bc: ChainBC, ghost, periodic: bool,
                        fields=None):
    """Apply one ChainBC to a (global-array) state dict with the plain jnp
    implementations from boundary.py — the oracle the fused kernel must
    match bit-exactly, and the path the chains' backward recompute uses.

    ``fields`` (optional ``{name: Field}``) disambiguates index-dimension
    placement for layout-sensitive kinds (sponge on 'soa' storage)."""
    import jax.numpy as jnp

    from ..boundary import bounce_back, dirichlet, neumann

    arr = state[bc.field]

    def resolve(v):
        return state[v] if isinstance(v, str) else v

    if bc.kind == "dirichlet":
        arr = dirichlet(arr, ghost, value=bc.value, dims=bc.dims)
    elif bc.kind == "neumann":
        arr = neumann(arr, ghost, dims=bc.dims)
    elif bc.kind == "masked_dirichlet":
        mask = resolve(bc.mask) != 0
        val = resolve(bc.value)
        arr = jnp.where(mask, jnp.asarray(val, arr.dtype), arr)
    elif bc.kind == "bounce_back":
        u_wall = (tuple(resolve(u) for u in bc.u_wall)
                  if bc.u_wall is not None else None)
        arr = bounce_back(arr, resolve(bc.mask) != 0, u_wall=u_wall,
                          rho_wall=bc.rho_wall, velocities=bc.velocities,
                          weights=bc.weights, wrap=periodic)
    elif bc.kind == "sponge":
        damp = jnp.asarray(resolve(bc.value), arr.dtype)
        if damp.ndim and arr.ndim > damp.ndim:
            f = (fields or {}).get(bc.field)
            if f is not None and getattr(f, "index_major", False):
                pass  # 'soa' storage: trailing-aligned broadcast is exact
            else:
                damp = damp.reshape(damp.shape
                                    + (1,) * (arr.ndim - damp.ndim))
        arr = arr * damp
    else:
        raise ValueError(bc.kind)
    return {**state, bc.field: arr}


@dataclasses.dataclass(frozen=True)
class ChainBC:
    field: str
    kind: str
    dims: Optional[Tuple[int, ...]] = None
    value: Union[float, str] = 0.0
    mask: Optional[str] = None
    u_wall: Optional[Tuple[Union[str, float], ...]] = None
    rho_wall: float = 1.0
    velocities: Optional[tuple] = None
    weights: Optional[tuple] = None
    opposite: Optional[tuple] = None


def bc_shift_offsets(bc: ChainBC, nd: int) -> List[Tuple[int, ...]]:
    """Spatial offsets the BC reads at (reach accounting)."""
    if bc.kind in ("dirichlet", "masked_dirichlet", "sponge"):
        return []
    if bc.kind == "neumann":
        offs = []
        for d in (bc.dims if bc.dims is not None else range(nd)):
            for s in (1, -1):
                o = [0] * nd
                o[d] = s
                offs.append(tuple(o))
        return offs
    if bc.kind == "bounce_back":
        # the pull ghost_j(s) = f_jbar(s + c_j) READS at +c_j
        return [tuple(int(c) for c in v) for v in bc.velocities]
    raise ValueError(f"unknown chain BC kind {bc.kind!r}")


def bc_row_reach(bc: ChainBC, ghost, geom, nd: int) -> Tuple[int, int]:
    """Flattened-row (lo, hi) read reach of one BC event — THE shared
    accounting for the forward chain kernel and the two-phase adjoint
    (their margins must agree or the transpose misaligns).  neumann's
    ``g`` sequential inward-copy passes per dim shift by the dim stride
    each; shift-based kinds derive from ``bc_shift_offsets``."""
    if bc.kind == "neumann":
        lo_r = hi_r = 0
        for d in (bc.dims if bc.dims is not None else range(nd)):
            g = max(ghost[d])
            if g and d < nd - 1:
                lo_r = max(lo_r, g * geom.strides[d])
                hi_r = max(hi_r, g * geom.strides[d])
        return lo_r, hi_r
    offs = bc_shift_offsets(bc, nd)
    return (max([0] + [-geom.row_off(o) for o in offs]),
            max([0] + [geom.row_off(o) for o in offs]))


def bc_dim_reach(bc: ChainBC, ghost, nd: int) -> List[Tuple[int, int]]:
    """Per-spatial-dim (lo, hi) read reach of a BC event (for sharded-chain
    halo sizing; the flattened-row reach is computed kernel-side)."""
    r = [(0, 0)] * nd
    if bc.kind in ("dirichlet", "masked_dirichlet", "sponge"):
        return r
    if bc.kind == "neumann":
        for d in (bc.dims if bc.dims is not None else range(nd)):
            g = max(ghost[d])
            r[d] = (g, g)
        return r
    if bc.kind == "bounce_back":
        # reads at +c_j: low reach = max(-c), high reach = max(c)
        for v in bc.velocities:
            for d, c in enumerate(v):
                lo, hi = r[d]
                r[d] = (max(lo, -c), max(hi, c))
        return r
    raise ValueError(bc.kind)


def _require_field_name(arg, what: str) -> Union[str, float]:
    """Array-valued BC args must be state-field *names* in fused chains."""
    if isinstance(arg, (str, int, float)):
        return arg
    raise TypeError(
        f"fused-chain BCs take {what} as a state-field NAME (the array is "
        f"then passed in the chain state and differentiates/shards for "
        f"free), not an inline array — got {type(arg).__name__}")


def normalize_chain_bcs(boundary, state_fields: Dict[str, Field],
                        index_shapes: Dict[str, tuple], nd: int,
                        n_stages: int, dtype):
    """Parse the ``boundary`` argument of ``fused_stage_chain``.

    ``boundary``: ``{stage_idx: {field: spec}}`` or a plain ``{field:
    spec}`` dict (stage 0).  Specs follow ``boundary.BoundaryHandling``:
    a kind string, a ``(kind, *args)`` tuple, or a list thereof.

    Returns ``(bcs_per_stage, extra_fields)`` where extra_fields are
    scalar pass-through state fields the BCs reference (masks, wall
    profiles) that no stage reads.
    """
    if not boundary:
        return {}, {}
    if not all(isinstance(k, int) for k in boundary):
        boundary = {0: boundary}
    extra: Dict[str, Field] = {}

    def field_ref(name: str) -> str:
        if name not in state_fields and name not in extra:
            extra[name] = Field(name, nd, dtype=dtype)
        return name

    bcs: Dict[int, List[ChainBC]] = {}
    for stage_idx, specs in boundary.items():
        if not (0 <= stage_idx < n_stages):
            raise ValueError(f"boundary stage index {stage_idx} out of "
                             f"range for {n_stages} stages")
        out: List[ChainBC] = []
        for fname, spec in specs.items():
            if fname not in state_fields:
                raise ValueError(f"boundary field {fname!r} is not a chain "
                                 f"state field ({sorted(state_fields)})")
            chain_specs = spec if isinstance(spec, list) else [spec]
            for s in chain_specs:
                kind, args = (s, ()) if isinstance(s, str) else (s[0], s[1:])
                if kind == "dirichlet":
                    value = float(args[0]) if args else 0.0
                    dims = tuple(args[1]) if len(args) > 1 else None
                    out.append(ChainBC(fname, kind, dims=dims, value=value))
                elif kind == "neumann":
                    dims = tuple(args[0]) if args else None
                    out.append(ChainBC(fname, kind, dims=dims))
                elif kind == "masked_dirichlet":
                    mask = field_ref(_require_field_name(args[0], "the mask"))
                    value = args[1] if len(args) > 1 else 0.0
                    if isinstance(value, str):
                        value = field_ref(value)
                    else:
                        value = float(value)
                    out.append(ChainBC(fname, kind, mask=mask, value=value))
                elif kind == "sponge":
                    if not args:
                        raise ValueError("sponge needs a damping profile: "
                                         "('sponge', damp_field_or_scalar)")
                    damp = _require_field_name(args[0], "the damping "
                                               "profile")
                    if isinstance(damp, str):
                        damp = field_ref(damp)
                    else:
                        damp = float(damp)
                    out.append(ChainBC(fname, kind, value=damp))
                elif kind == "bounce_back":
                    mask = field_ref(_require_field_name(args[0], "the mask"))
                    u_wall = None
                    if len(args) > 1 and args[1] is not None:
                        u_wall = tuple(
                            field_ref(u) if isinstance(u, str) else float(u)
                            for u in (_require_field_name(u, "a wall "
                                                          "velocity")
                                      for u in args[1]))
                        if len(u_wall) != nd:
                            raise ValueError(f"u_wall needs {nd} components")
                    rho_wall = float(args[2]) if len(args) > 2 else 1.0
                    ncomp = index_shapes.get(fname, ())
                    if len(ncomp) != 1:
                        raise ValueError(
                            f"bounce_back target {fname!r} must be a "
                            f"1-index-dim population field, has index "
                            f"shape {ncomp}")
                    velocities = args[3] if len(args) > 3 else None
                    weights = args[4] if len(args) > 4 else None
                    if velocities is None:
                        if nd == 2 and ncomp[0] == 9:
                            from ..models.lbm import (D2Q9_VELOCITIES,
                                                      D2Q9_WEIGHTS)
                            velocities = D2Q9_VELOCITIES
                            weights = [float(w) for w in D2Q9_WEIGHTS]
                        elif nd == 3 and ncomp[0] == 19:
                            from ..models.lbm import (D3Q19_VELOCITIES,
                                                      D3Q19_WEIGHTS)
                            velocities = D3Q19_VELOCITIES
                            weights = [float(w) for w in D3Q19_WEIGHTS]
                        else:
                            raise ValueError(
                                "bounce_back needs velocities= for this "
                                "field shape")
                    velocities = tuple(tuple(int(c) for c in v)
                                       for v in velocities)
                    if u_wall is not None and weights is None:
                        raise ValueError("moving wall needs weights=")
                    opposite = tuple(
                        velocities.index(tuple(-c for c in v))
                        for v in velocities)
                    out.append(ChainBC(
                        fname, kind, mask=mask, u_wall=u_wall,
                        rho_wall=rho_wall, velocities=velocities,
                        weights=tuple(float(w) for w in weights)
                        if weights is not None else None,
                        opposite=opposite))
                else:
                    raise ValueError(
                        f"BC kind {kind!r} cannot fuse into a chain; "
                        f"supported: dirichlet, neumann, masked_dirichlet, "
                        f"bounce_back, sponge")
        if out:
            bcs.setdefault(stage_idx, []).extend(out)
    return bcs, extra


def apply_bc_tile(bc, ghost_j, state_keys, state_fields, rd, r_ids, c_ids,
                  bc_coord, g_spatial, nd, dtype, lat_shift, geom=None):
    """Apply one ChainBC to an in-register tile state — THE single
    implementation both the forward chain kernel and the two-phase
    adjoint's phase-1 recompute share (they must match bit-for-bit).

    ``rd(key, off)`` reads a state plane at a spatial offset (the caller
    owns extent/slice bookkeeping); ``bc_coord(r_ids, c_ids, d)`` returns
    the global per-dim coordinate (shard-aware in the forward kernel);
    ``lat_shift(v, s, axis)`` is the kernel's non-wrapping lateral shift
    for neumann's inward copies.  Returns the new tile state dict.
    """
    import jax.numpy as jnp

    from .common import field_components

    new = {key: rd(key) for key in state_keys}
    comps = field_components(state_fields[bc.field])
    shape_b = r_ids.shape

    if bc.kind == "dirichlet":
        dims_bc = (bc.dims if bc.dims is not None else range(nd))
        m = jnp.zeros(shape_b, bool)
        for d in dims_bc:
            lo_g, hi_g = ghost_j[d]
            if lo_g or hi_g:
                cd = bc_coord(r_ids, c_ids, d)
                m |= (cd < lo_g) | (cd >= g_spatial[d] - hi_g)
        for idx in comps:
            new[(bc.field, idx)] = jnp.where(
                m, jnp.asarray(bc.value, dtype), new[(bc.field, idx)])
    elif bc.kind == "neumann":
        dims_bc = (bc.dims if bc.dims is not None else range(nd))
        for idx in comps:
            plane = new[(bc.field, idx)]
            for d in dims_bc:
                lo_g, hi_g = ghost_j[d]
                cd = bc_coord(r_ids, c_ids, d)
                shift = (geom.strides[d] if d < nd - 1 else 1)
                axis = 0 if d < nd - 1 else 1
                for side, width in ((0, lo_g), (1, hi_g)):
                    s = shift if side == 0 else -shift
                    # g sequential inward-copy passes fill a width-g
                    # frame from the first interior cell (corner cells
                    # see earlier dims' fills, like boundary.py)
                    for _ in range(width):
                        shifted = lat_shift(plane, s, axis)
                        m = ((cd < lo_g) if side == 0 else
                             (cd >= g_spatial[d] - hi_g))
                        plane = jnp.where(m, shifted, plane)
            new[(bc.field, idx)] = plane
    elif bc.kind == "masked_dirichlet":
        maskp = rd((bc.mask, ()))
        val = (rd((bc.value, ())) if isinstance(bc.value, str)
               else jnp.asarray(bc.value, dtype))
        for idx in comps:
            new[(bc.field, idx)] = jnp.where(maskp != 0, val,
                                             new[(bc.field, idx)])
    elif bc.kind == "sponge":
        damp = (rd((bc.value, ())) if isinstance(bc.value, str)
                else jnp.asarray(bc.value, dtype))
        for idx in comps:
            new[(bc.field, idx)] = new[(bc.field, idx)] * damp
    elif bc.kind == "bounce_back":
        solid = rd((bc.mask, ())) != 0
        for jv, cj in enumerate(bc.velocities):
            # pull scheme: ghost_j(s) = f_jbar(s + c_j); rd reads at +off
            off = tuple(int(c) for c in cj)
            ghost = rd((bc.field, (bc.opposite[jv],)), off)
            if bc.u_wall is not None and any(cj):
                cu = jnp.asarray(0.0, dtype)
                for c, uw in zip(cj, bc.u_wall):
                    if c:
                        uv = (rd((uw, ())) if isinstance(uw, str)
                              else jnp.asarray(uw, dtype))
                        cu = cu + c * uv
                ghost = ghost + (6.0 * bc.weights[jv] * bc.rho_wall) * cu
            new[(bc.field, (jv,))] = jnp.where(solid, ghost,
                                               new[(bc.field, (jv,))])
    else:
        raise ValueError(bc.kind)
    return new
