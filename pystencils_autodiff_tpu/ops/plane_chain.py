"""Plane-blocked ("2.5D") fused chains for 3D domains.

The flattened-row chain geometry (time_chain/adjoint_chain over FlatGeom)
merges leading dims into the row axis, so a ±1 offset in dim 0 becomes a
±n1-row reach and the k-step chain halo grows ∝ k·n1 — at 384³ a k=2
chain would be ~75 % redundant compute.  This module tiles dim 0 in
*planes* instead: the kernel's refs are 3D ``(tile_planes, n1, n2)``
blocks, the chain halo is ``k·reach`` PLANES (independent of plane size),
offsets in dims 1/2 are in-plane `pltpu.roll` shifts, and periodic wrap
works in ALL THREE dims (the flattened path's periodic mode is 2D-only).

Used automatically by ``fused_time_chain`` for 3D states (probes still
route through the flattened path); the exact-VJP backward recomputes
through single-step custom_vjp ops exactly like the flattened chain.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from .common import (StencilProgram, assemble_planes, field_components,
                     plane_view,
                     scoped_vmem)

__all__ = ["make_plane_chain_kernel_fn", "plane_reach", "pick_plane_tile"]


def plane_reach(accesses):
    """(lo, hi) dim-0 plane reach of a set of accesses."""
    lo = max([0] + [-a.offsets[0] for a in accesses])
    hi = max([0] + [a.offsets[0] for a in accesses])
    return lo, hi


def pick_plane_tile(n0: int, LO: int, HI: int, plane_bytes_live: int,
                    vmem_limit: int):
    """Largest divisor of ``n0`` whose extended block (t+LO+HI planes ×
    live buffers) fits ~60 % of the VMEM budget; the plane axis needs no
    8-alignment (Mosaic tiles the last two dims)."""
    budget = (vmem_limit * 3) // 5
    best = None
    for t in range(1, n0 + 1):
        if n0 % t or t < max(LO + HI, 1):
            continue
        if (t + LO + HI) * plane_bytes_live <= budget:
            best = t
    if best is not None:
        return best
    for t in range(1, n0 + 1):
        if n0 % t == 0 and t >= max(LO + HI, 1):
            return t
    return None


def _lat_shifted(cache, state, acc, interpret, wrap1, wrap2):
    """Laterally shifted full state volume for an access, cached two-level
    so axis-1 shifts are shared across axis-2 offsets: a 27-point operand
    needs 3 axis-1 + 9 axis-2 rotates instead of 27×2.  Shifting before
    the plane slice is bit-exact (the rotate acts on axes the slice never
    touches).  ``wrap1``/``wrap2``: per-axis circular wrap — a SHARDED
    dim must not wrap locally (its periodic neighbour data arrived via
    the ppermute exchange; the non-wrapped edge band stays inside the
    shrinking halo margin, same validity cone as the flattened kernel)."""
    from .pallas_kernel import _shift_lateral

    name, idx = acc.field.name, acc.index
    o1, o2 = acc.offsets[1], acc.offsets[2]
    k2 = (name, idx, o1, o2)
    v = cache.get(k2)
    if v is None:
        k1 = (name, idx, o1)
        v1 = cache.get(k1)
        if v1 is None:
            v1 = _shift_lateral(state[(name, idx)], o1, 1, False,
                                interpret, wrap1)
            cache[k1] = v1
        v = _shift_lateral(v1, o2, 2, False, interpret, wrap2)
        cache[k2] = v
    return v


def make_plane_chain_kernel_fn(program: StencilProgram, k: int,
                               carry_map: Dict[str, str],
                               spatial, dtype, interpret: bool,
                               periodic: bool,
                               tile_planes: Optional[int] = None,
                               vmem_limit_bytes: int = 100 * 1024 * 1024,
                               shard=None,
                               emit_names=None):
    """Forward-only fused k-step kernel over a 3D domain, tiled in planes.

    ``shard`` (an ``ops.flatten.ShardSpec``, parallel.ShardedChain): the
    3D sharded fused chain then rides the plane geometry instead of the
    flattened kernel — ``spatial`` is the halo-EXTENDED local block,
    plane halo strips are bounded-style even for globally periodic
    domains (the wrap arrived via the exchange), sharded lateral dims
    never wrap locally, and interior masks test GLOBAL coordinates via
    the ``bases`` scalars the returned fn takes as a second argument
    (VERDICT round-4 next #6: the plane-blocked sharded 3D chain).

    ``emit_names``: input-field names whose advanced state is written
    back to HBM (default: all).  The k=1 single-step route
    (pallas_kernel._run_plane_single) restricts this to the fields that
    map to real outputs, so invariant pass-through operands (a
    coefficient field) do not cost a full extra volume write per call."""
    from .pallas_kernel import _shift_lateral

    if program.ndim != 3:
        raise ValueError("plane chains are for 3D domains")
    n0, n1, n2 = spatial
    # per-dim wrap: only a dim the shard decomposes loses its local wrap
    # (its periodic neighbour data arrived via the exchanged halo — the
    # non-wrapped edge band stays inside the shrinking margin); whole
    # dims keep wrapping exactly like the unsharded kernel
    sharded_dims = set(shard.sharded_dims) if shard is not None else set()
    if 2 in sharded_dims:
        raise ValueError("the lane dim (2) cannot be sharded")
    plane_wrap = periodic and 0 not in sharded_dims
    wrap1 = periodic and 1 not in sharded_dims
    wrap2 = periodic
    ghost = program.ghost
    all_acc = [at for s in program.steps for at in s.atoms
               if isinstance(at, Field.Access)]
    lo1, hi1 = plane_reach(all_acc)
    LO, HI = k * lo1, k * hi1

    in_names = [f.name for f in program.input_fields]
    fields_by_name = {f.name: f for f in program.input_fields}
    next_src = {n: carry_map.get(n, n) for n in in_names}

    in_keys = [(f.name, idx) for f in program.input_fields
               for idx in field_components(f)]
    emit = set(emit_names if emit_names is not None else in_names)
    emit_keys = [ky for ky in in_keys if ky[0] in emit]

    # chain-invariant subexpressions (face-averaged coefficients etc.)
    # compute ONCE per tile instead of once per step (ops/hoist.py)
    from .hoist import invariant_fields, plan_hoisting

    inv = invariant_fields(in_names, program.output_names, carry_map)
    hoist_steps, cycle_steps = plan_hoisting(program.steps, inv)
    from .common import shared_lateral_offsets

    def _pair_key(a):
        o1, o2 = a.offsets[1], a.offsets[2]
        return ((a.field.name, a.index, o1, o2) if (o1 or o2) else None)

    shared_pairs = shared_lateral_offsets(cycle_steps, key=_pair_key)
    shared_hpairs = shared_lateral_offsets(hoist_steps, key=_pair_key)
    hr_lo, hr_hi = plane_reach([a for s_ in hoist_steps for a in s_.atoms
                                if isinstance(a, Field.Access)])

    itemsize = jnp.dtype(dtype).itemsize
    n_live = len(in_keys) * (k + 2) + 8 + len(hoist_steps)
    t = tile_planes or pick_plane_tile(n0, LO, HI,
                                       n1 * n2 * itemsize * n_live,
                                       vmem_limit_bytes)
    if t is None or n0 % t or t < max(LO + HI, 1):
        raise ValueError(f"no viable plane tile for n0={n0}, "
                         f"halo={LO + HI} planes")
    nb = n0 // t

    def fn(inputs: Dict[str, jax.Array], bases=None) -> Dict[str, jax.Array]:
        arrays, ups, downs = [], [], []
        for name, idx in in_keys:
            f = fields_by_name[name]
            arr = inputs[name].astype(dtype)
            vol = plane_view(f, arr, idx).reshape((n0, n1, n2))
            arrays.append(vol)
            xr = vol.reshape((nb, t, n1, n2))
            if LO:
                if plane_wrap:
                    ups.append(jnp.roll(xr[:, t - LO:], 1, axis=0))
                else:
                    first = jnp.broadcast_to(xr[:1, :1], (1, LO, n1, n2))
                    ups.append(jnp.concatenate([first, xr[:-1, t - LO:]], 0))
            if HI:
                if plane_wrap:
                    downs.append(jnp.roll(xr[:, :HI], -1, axis=0))
                else:
                    last = jnp.broadcast_to(xr[-1:, -1:], (1, HI, n1, n2))
                    downs.append(jnp.concatenate([xr[1:, :HI], last], 0))
        n_in = len(in_keys)
        n_up, n_dn = len(ups), len(downs)
        scalar_ins = []
        if shard is not None:
            if bases is None:
                raise ValueError("sharded plane chain kernel needs base "
                                 "offsets")
            scalar_ins.append(jnp.asarray(bases, jnp.int32))

        def kernel(*refs):
            xs = refs[:n_in]
            up_refs = refs[n_in:n_in + n_up]
            dn_refs = refs[n_in + n_up:n_in + n_up + n_dn]
            rest = refs[n_in + n_up + n_dn:]
            if shard is not None:
                bases_ref, rest = rest[0], rest[1:]
                base_vals = [bases_ref[d] for d in range(3)]
            outs = rest
            i = pl.program_id(0)

            state: Dict[tuple, jax.Array] = {}
            for kk, key in enumerate(in_keys):
                parts = []
                if LO:
                    parts.append(up_refs[kk][0])
                parts.append(xs[kk][...])
                if HI:
                    parts.append(dn_refs[kk][0])
                state[key] = (jnp.concatenate(parts, axis=0)
                              if len(parts) > 1 else parts[0])

            henv: Dict[object, jax.Array] = {}
            if hoist_steps:
                EH = (LO + t + HI) - hr_lo - hr_hi

                hl_cache: Dict[tuple, jax.Array] = {}

                def hread(acc):
                    # lateral shifts commute bit-exactly with the plane
                    # slice: shift the full volume once per RECURRING
                    # (o1, o2) and slice per access (27-point operands
                    # share 9 lateral offsets — 3× fewer rotates);
                    # single-use offsets keep slice-then-shift
                    start = hr_lo + acc.offsets[0]
                    if _pair_key(acc) not in shared_hpairs:
                        v = state[(acc.field.name, acc.index)]
                        v = jax.lax.slice_in_dim(v, start, start + EH,
                                                 axis=0)
                        v = _shift_lateral(v, acc.offsets[1], 1, False,
                                           interpret, wrap1)
                        return _shift_lateral(v, acc.offsets[2], 2, False,
                                              interpret, wrap2)
                    v = _lat_shifted(hl_cache, state, acc, interpret,
                                     wrap1, wrap2)
                    return jax.lax.slice_in_dim(v, start, start + EH, axis=0)

                for st_ in hoist_steps:
                    hv = [hread(a) if isinstance(a, Field.Access)
                          else henv[a] for a in st_.atoms]
                    henv[st_.target] = jnp.broadcast_to(
                        jnp.asarray(st_.fn(*hv), dtype), (EH, n1, n2))

            for s in range(k):
                margin_lo = LO - (s + 1) * lo1
                ext = t + margin_lo + (HI - (s + 1) * hi1)
                a_s = LO - margin_lo
                stage_out: Dict[tuple, jax.Array] = {}
                env: Dict[object, jax.Array] = {}

                lat_cache: Dict[tuple, jax.Array] = {}

                def read(acc, _ext=ext):
                    start = lo1 + acc.offsets[0]
                    if _pair_key(acc) not in shared_pairs:
                        v = state[(acc.field.name, acc.index)]
                        v = jax.lax.slice_in_dim(v, start, start + _ext,
                                                 axis=0)
                        v = _shift_lateral(v, acc.offsets[1], 1, False,
                                           interpret, wrap1)
                        return _shift_lateral(v, acc.offsets[2], 2, False,
                                              interpret, wrap2)
                    v = _lat_shifted(lat_cache, state, acc, interpret,
                                     wrap1, wrap2)
                    return jax.lax.slice_in_dim(v, start, start + _ext,
                                                axis=0)

                def sym(at, _ext=ext, _a=a_s):
                    v = env.get(at)
                    if v is not None:
                        return v
                    return jax.lax.slice_in_dim(
                        henv[at], _a - hr_lo, _a - hr_lo + _ext, axis=0)

                shape_s = (ext, n1, n2)
                for step_ in cycle_steps:
                    vals = [read(at) if isinstance(at, Field.Access)
                            else sym(at) for at in step_.atoms]
                    res = jnp.broadcast_to(
                        jnp.asarray(step_.fn(*vals), dtype), shape_s)
                    if step_.is_main:
                        stage_out[(step_.target.field.name,
                                   step_.target.index)] = res
                    else:
                        env[step_.target] = res

                if not periodic:
                    # sequential semantics: zero the global ghost frame
                    # (sharded: GLOBAL coordinates via the base scalars —
                    # an interior shard's halo is live early-step data)
                    base = i * t - margin_lo
                    p_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_s, 0)
                             + base)
                    a_ids = jax.lax.broadcasted_iota(jnp.int32, shape_s, 1)
                    b_ids = jax.lax.broadcasted_iota(jnp.int32, shape_s, 2)
                    if shard is not None:
                        p_ids = p_ids + base_vals[0]
                        a_ids = a_ids + base_vals[1]
                        b_ids = b_ids + base_vals[2]
                        g0, g1, g2 = shard.global_spatial
                    else:
                        g0, g1, g2 = n0, n1, n2
                    (g0l, g0h), (g1l, g1h), (g2l, g2h) = ghost
                    m = ((p_ids >= g0l) & (p_ids < g0 - g0h)
                         & (a_ids >= g1l) & (a_ids < g1 - g1h)
                         & (b_ids >= g2l) & (b_ids < g2 - g2h))
                    stage_out = {key_: jnp.where(m, v, 0)
                                 for key_, v in stage_out.items()}

                new_state = {}
                for name, idx in in_keys:
                    src = next_src[name]
                    if (src, idx) in stage_out:
                        new_state[(name, idx)] = stage_out[(src, idx)]
                    else:
                        v = state[(src, idx)]
                        new_state[(name, idx)] = jax.lax.slice_in_dim(
                            v, lo1, lo1 + ext, axis=0)
                state = new_state

            for ref, key in zip(outs, emit_keys):
                ref[...] = state[key]

        vol_spec = pl.BlockSpec((t, n1, n2), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def strip_spec(shape):
            return pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        scalar_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)
                        for _ in scalar_ins]
        result = pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=tuple(jax.ShapeDtypeStruct((n0, n1, n2), dtype)
                            for _ in emit_keys),
            in_specs=[vol_spec] * n_in + [strip_spec(u.shape) for u in ups]
            + [strip_spec(d.shape) for d in downs] + scalar_specs,
            out_specs=tuple(vol_spec for _ in emit_keys),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
        )(*arrays, *ups, *downs, *scalar_ins)
        if not isinstance(result, (tuple, list)):
            result = (result,)

        outputs: Dict[str, jax.Array] = {}
        pos = 0
        for f in program.input_fields:
            if f.name not in emit:
                continue
            comps = field_components(f)
            vols = [result[pos + j] for j in range(len(comps))]
            pos += len(comps)
            outputs[f.name] = assemble_planes(f, vols, spatial)
        return outputs

    return fn
