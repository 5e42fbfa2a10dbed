"""Temporal blocking: k time steps of a stencil op fused into one kernel.

The single-kernel Pallas read+write pipeline caps at ~290 GB/s on this
platform, so the biggest remaining lever for time-stepped workloads is to
amortize the HBM round trip over several steps: one kernel loads the state
once (with a k×-wide halo), applies the step k times with intermediates
held in registers/VMEM, and writes the final state once.  Per-step HBM
traffic drops k×.

This is *program-level* fusion — stages chain inside the kernel over
``StencilProgram`` values, not by symbolic inlining (which explodes sympy
trees for nonlinear steps like WENO; see ROADMAP.md).

Gradients: the fused chain is wrapped in ``jax.custom_vjp`` whose backward
recomputes the chain with the ordinary (exact) single-step custom_vjp ops
and pulls back through them — the standard recompute-from-checkpoint
adjoint, so gradients are identical to sequential stepping.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from .common import (StencilProgram, assemble_planes, field_components,
                     forward_program, plane_view, require_row_major,
                     storage_spatial,
                     scoped_vmem)

__all__ = ["fused_time_chain"]


def _make_chain_kernel_fn(program: StencilProgram, k: int,
                          carry_map: Dict[str, str],
                          spatial, dtype, interpret: bool,
                          periodic: bool,
                          tile_rows: Optional[int] = None,
                          vmem_limit_bytes: int = 100 * 1024 * 1024,
                          probes=None, reads: str = "slice"):
    """Forward-only fused k-step kernel over an nd spatial domain,
    flattened to (rows, cols) — leading dims merge into the row axis
    (FlatGeom); per-stage interior masks use per-dim div/mod coordinates,
    so 3D (and higher) chains run through the same 2D Mosaic-friendly
    kernel.  Periodic wrap is 2D-only (an inner flattened dim would need
    per-row wrap shifts).

    Index-dimension fields are split into scalar component planes (same
    transform as the blocked strategy) — covers wave/heat/advection and
    D2Q9 LBM time loops.

    ``probes``: list of ``(field_name, flat_row)`` — after every stage the
    kernel extracts that (flattened) row of the named scalar state field
    (mask-reduced, written once by the owning tile), so per-step
    observables (e.g. an FWI seismogram at a receiver row) survive
    temporal blocking.  The wrapped fn then returns ``(state, probe_list)``
    with each probe of shape ``(k, cols)``.
    """
    from .flatten import FlatGeom, pick_chain_tile
    from .pallas_kernel import _shift_lateral

    nd = program.ndim
    if periodic and nd != 2:
        raise ValueError("periodic fused chains support 2D domains only")
    geom = FlatGeom(spatial)
    rows, cols = geom.rows, geom.cols
    ghost = program.ghost
    all_acc = [at for s in program.steps for at in s.atoms
               if isinstance(at, Field.Access)]
    lo1, hi1 = geom.row_reach(all_acc)
    LO, HI = k * lo1, k * hi1

    in_names = [f.name for f in program.input_fields]
    fields_by_name = {f.name: f for f in program.input_fields}
    next_src = {n: carry_map.get(n, n) for n in in_names}

    in_keys = [(f.name, idx) for f in program.input_fields
               for idx in field_components(f)]

    # chain-invariant subexpressions (face-averaged coefficients etc.)
    # compute ONCE per tile instead of once per step (ops/hoist.py)
    from .hoist import invariant_fields, plan_hoisting

    inv = invariant_fields(in_names, program.output_names, carry_map)
    hoist_steps, cycle_steps = plan_hoisting(program.steps, inv)
    h_acc = [a for s_ in hoist_steps for a in s_.atoms
             if isinstance(a, Field.Access)]
    hr_lo, hr_hi = geom.row_reach(h_acc)
    from .common import lat_shifted_read, shared_lateral_offsets
    shared_lat = shared_lateral_offsets(cycle_steps)
    shared_h = shared_lateral_offsets(hoist_steps)

    if reads not in ("slice", "roll"):
        raise ValueError(f"reads={reads!r}: expected 'slice' or 'roll'")
    roll_reads = reads == "roll"
    if roll_reads and (hr_lo > lo1 or hr_hi > hi1):
        # roll-mode validity band shrinks by the per-step reach; hoisted
        # values are garbage in their own halo margin, so they must not
        # out-reach one step (holds for face-averaged coefficients)
        raise ValueError("reads='roll' needs hoist reach <= per-step reach")

    probes = list(probes or ())
    for pname, _prow in probes:
        if fields_by_name[pname].index_shape:
            raise ValueError(f"probe field {pname!r} must be scalar")

    itemsize = jnp.dtype(dtype).itemsize
    n_live = (len(in_keys) * (k + 2) + 8 + len(hoist_steps))
    t = tile_rows or pick_chain_tile(rows, LO, HI,
                                     cols * itemsize * n_live,
                                     vmem_limit_bytes)
    if t is None or rows % t or t < LO + HI:
        raise ValueError(f"no viable tile for rows={rows}, halo={LO + HI}")
    nb = rows // t

    def fn(inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        arrays, ups, downs = [], [], []
        for name, idx in in_keys:
            f = fields_by_name[name]
            arr = inputs[name].astype(dtype)
            plane = plane_view(f, arr, idx).reshape((rows, cols))
            arrays.append(plane)
            xr = plane.reshape((nb, t, cols))
            if LO:
                if periodic:
                    ups.append(jnp.roll(xr[:, t - LO:], 1, axis=0))
                else:
                    first = jnp.broadcast_to(xr[:1, :1], (1, LO, cols))
                    ups.append(jnp.concatenate([first, xr[:-1, t - LO:]], 0))
            if HI:
                if periodic:
                    downs.append(jnp.roll(xr[:, :HI], -1, axis=0))
                else:
                    last = jnp.broadcast_to(xr[-1:, -1:], (1, HI, cols))
                    downs.append(jnp.concatenate([xr[1:, :HI], last], 0))
        n_in = len(in_keys)
        n_up, n_dn = len(ups), len(downs)

        def kernel(*refs):
            xs = refs[:n_in]
            up_refs = refs[n_in:n_in + n_up]
            dn_refs = refs[n_in + n_up:n_in + n_up + n_dn]
            outs = refs[n_in + n_up + n_dn:]
            probe_outs = outs[len(in_keys):]
            outs = outs[:len(in_keys)]
            probe_rows = [[] for _ in probes]
            i = pl.program_id(0)

            # state planes on the fully-extended tile (LO + t + HI rows)
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

            text = LO + t + HI
            inv_lat_cache: Dict[tuple, jax.Array] = {}
            inv_row_cache: Dict[tuple, jax.Array] = {}

            def make_roll_read(st_dict, lat_cache, row_cache):
                """Roll-mode read: every access is a cyclic sublane roll
                of the (lane-rotated, cached) FULL extended tile — no
                per-access misaligned row slices.  Wrapped rows land
                outside the shrinking validity band, exactly where the
                slice-mode geometry discards rows."""
                def read(acc):
                    name, idx = acc.field.name, acc.index
                    lc, rc = ((inv_lat_cache, inv_row_cache)
                              if name in inv else (lat_cache, row_cache))
                    oc = acc.offsets[-1]
                    ck = (name, idx, oc)
                    v = lc.get(ck)
                    if v is None:
                        v = st_dict[(name, idx)]
                        if oc:
                            v = _shift_lateral(v, oc, 1, False, interpret,
                                               periodic)
                        lc[ck] = v
                    ro = geom.row_off(acc.offsets)
                    if not ro:
                        return v
                    rk = ck + (ro,)
                    r = rc.get(rk)
                    if r is None:
                        r = (jnp.roll(v, -ro, axis=0) if interpret
                             else pltpu.roll(v, (-ro) % text, 0))
                        rc[rk] = r
                    return r
                return read

            henv: Dict[object, jax.Array] = {}
            if hoist_steps and roll_reads:
                EH = text
                hread = make_roll_read(state, {}, {})
                for st_ in hoist_steps:
                    hv = [hread(a) if isinstance(a, Field.Access)
                          else henv[a] for a in st_.atoms]
                    henv[st_.target] = jnp.broadcast_to(
                        jnp.asarray(st_.fn(*hv), dtype), (EH, cols))
            elif hoist_steps:
                EH = (LO + t + HI) - hr_lo - hr_hi

                hl_cache: Dict[tuple, jax.Array] = {}

                def hread(acc):
                    ck = (acc.field.name, acc.index, acc.offsets[-1])
                    return lat_shifted_read(
                        hl_cache, shared_h, ck, state[ck[:2]],
                        acc.offsets[-1], hr_lo + geom.row_off(acc.offsets),
                        EH, False, interpret, periodic)

                for st_ in hoist_steps:
                    hv = [hread(a) if isinstance(a, Field.Access)
                          else henv[a] for a in st_.atoms]
                    henv[st_.target] = jnp.broadcast_to(
                        jnp.asarray(st_.fn(*hv), dtype), (EH, cols))

            for s in range(k):
                if roll_reads:
                    margin_lo = LO
                    ext_rows = text
                else:
                    margin_lo = LO - (s + 1) * lo1
                    ext_rows = t + margin_lo + (HI - (s + 1) * hi1)
                a_s = LO - margin_lo  # low-side rows consumed so far
                stage_out: Dict[tuple, jax.Array] = {}
                env: Dict[object, jax.Array] = {}

                lat_cache: Dict[tuple, jax.Array] = {}

                if roll_reads:
                    read = make_roll_read(state, lat_cache, {})
                else:
                    def read(acc, _er=ext_rows):
                        ck = (acc.field.name, acc.index, acc.offsets[-1])
                        return lat_shifted_read(
                            lat_cache, shared_lat, ck, state[ck[:2]],
                            acc.offsets[-1], lo1 + geom.row_off(acc.offsets),
                            _er, False, interpret, periodic)

                def sym(at, _er=ext_rows, _a=a_s):
                    v = env.get(at)
                    if v is not None:
                        return v
                    if roll_reads:
                        return henv[at]
                    return jax.lax.slice_in_dim(
                        henv[at], _a - hr_lo, _a - hr_lo + _er, axis=0)

                shape_s = (ext_rows, cols)
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
                    # sequential semantics: each step zeroes its global
                    # ghost frame (per-dim interior test via div/mod of
                    # the flattened row — also annihilates garbage from
                    # reads that crossed an inner flattened-dim boundary)
                    base = i * t - margin_lo
                    r_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_s, 0)
                             + base)
                    c_ids = jax.lax.broadcasted_iota(jnp.int32, shape_s, 1)
                    m = ((r_ids >= 0) & (r_ids < rows)
                         & geom.interior_mask(r_ids, c_ids, ghost))
                    stage_out = {key_: jnp.where(m, v, 0)
                                 for key_, v in stage_out.items()}

                new_state = {}
                for name, idx in in_keys:
                    src = next_src[name]
                    if (src, idx) in stage_out:
                        new_state[(name, idx)] = stage_out[(src, idx)]
                    elif roll_reads:  # constant extent: pass through as-is
                        new_state[(name, idx)] = state[(src, idx)]
                    else:
                        v = state[(src, idx)]
                        new_state[(name, idx)] = jax.lax.slice_in_dim(
                            v, lo1, lo1 + ext_rows, axis=0)
                state = new_state

                if probes:
                    # per-step observable rows: mask-reduce (no dynamic
                    # indexing in Mosaic); only the owning tile's rows
                    # contribute, so a later sum over tiles is exact
                    r_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_s, 0)
                             + i * t - margin_lo)
                    own = (r_ids >= i * t) & (r_ids < (i + 1) * t)
                    for p, (pname, prow) in enumerate(probes):
                        sel = own & (r_ids == prow)
                        probe_rows[p].append(jnp.sum(
                            jnp.where(sel, state[(pname, ())], 0), axis=0))

            for ref, key in zip(outs, in_keys):
                ref[...] = (jax.lax.slice_in_dim(state[key], LO, LO + t,
                                                 axis=0)
                            if roll_reads else state[key])
            for p in range(len(probes)):
                probe_outs[p][...] = jnp.stack(probe_rows[p], axis=0)[None]

        plane_spec = pl.BlockSpec((t, cols), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)

        def strip_spec(shape):
            return pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        probe_shape = tuple(jax.ShapeDtypeStruct((nb, k, cols), dtype)
                            for _ in probes)
        probe_spec = tuple(pl.BlockSpec((1, k, cols), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
                           for _ in probes)
        result = pl.pallas_call(
            kernel,
            grid=(nb,),
            out_shape=tuple(jax.ShapeDtypeStruct((rows, cols), dtype)
                            for _ in in_keys) + probe_shape,
            in_specs=[plane_spec] * n_in + [strip_spec(u.shape) for u in ups]
            + [strip_spec(d.shape) for d in downs],
            out_specs=tuple(plane_spec for _ in in_keys) + probe_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
        )(*arrays, *ups, *downs)
        if not isinstance(result, (tuple, list)):
            result = (result,)

        outputs: Dict[str, jax.Array] = {}
        pos = 0
        for f in program.input_fields:
            comps = field_components(f)
            planes = [result[pos + j] for j in range(len(comps))]
            pos += len(comps)
            outputs[f.name] = assemble_planes(f, planes, spatial)
        if probes:
            # non-owning tiles wrote zeros — sum collapses to the one row
            probe_vals = [result[pos + p].sum(axis=0)
                          for p in range(len(probes))]
            return outputs, probe_vals
        return outputs

    return fn


def fused_time_chain(op, k: int, carry_map: Dict[str, str],
                     periodic: bool = False, interpret: Optional[bool] = None,
                     tile_rows: Optional[int] = None, dtype=None,
                     fused_bwd: bool = False, probes=None,
                     vmem_limit_bytes: int = 100 * 1024 * 1024,
                     reads: str = "slice"):
    """``chain(state: dict) -> state`` advancing ``k`` steps in ONE kernel.

    Exact gradients: the backward rule recomputes the k steps with the
    ordinary single-step custom_vjp ops (recompute-from-checkpoint), or —
    with ``fused_bwd=True`` — with ONE fused adjoint-chain kernel
    (ops/adjoint_chain.py), so both directions are temporally blocked.
    Domains of any rank run through the flattened-row kernel (periodic
    wrap is 2D-only); index-component fields are split into planes.

    ``probes``: list of ``(field_name, flat_row)`` — the chain then returns
    ``(state, probe_tuple)`` with one ``(k, cols)`` array per probe holding
    that row after every step (chain-granularity recording: per-step
    observables like FWI seismograms survive temporal blocking), and the
    backward rule injects the probe cotangents exactly.
    """
    from .pallas_kernel import _on_tpu
    from ..timeloop import make_time_stepper

    prog = forward_program(op)
    in_names = [f.name for f in op.forward_input_fields]
    require_row_major(op.forward_input_fields, "fused_time_chain")
    probes = list(probes or ())
    if reads != "slice" and prog.ndim == 3 and not probes:
        raise ValueError("reads='roll' applies to the flattened-row kernel; "
                         "3D chains ride the plane-blocked geometry")

    seq_step = make_time_stepper(op, carry_map, lowering="pallas",
                                 periodic=periodic,
                                 **({"interpret": interpret}
                                    if interpret is not None else {}))

    def sequential(state):
        recs = [[] for _ in probes]
        for _ in range(k):
            state = seq_step(state)
            for p, (pname, prow) in enumerate(probes):
                arr = state[pname]
                recs[p].append(arr.reshape(-1, arr.shape[-1])[prow])
        out = {n: state[n] for n in in_names}
        if probes:
            return out, tuple(jnp.stack(r) for r in recs)
        return out

    kernel_cache = {}

    def _build_kernel(spatial, arr_dtype, interp, kk, vmem=None):
        """One fused kk-step kernel for this geometry (kk == k normally;
        the compile guard composes shallower chains on Mosaic failures,
        and a reduced ``vmem`` budget makes the tile picker choose smaller
        tiles on scoped-VMEM OOMs)."""
        vmem = vmem or vmem_limit_bytes
        tile = tile_rows
        if tile is None:
            # measured-best dispatch: consult the autotune cache for a
            # tile recorded by a sweep of this exact configuration
            from ..utils.autotune import tuned_tile

            tile = tuned_tile("chain", "fwd", op.op_name, spatial,
                              dtype or arr_dtype, periodic, kk,
                              interp=interp)
        if prog.ndim == 3 and not probes:
            # plane-blocked ("2.5D") geometry: chain halo is k·reach
            # PLANES instead of k·reach·n1 flattened rows, and periodic
            # wrap works in all three dims (ops/plane_chain.py)
            from .plane_chain import make_plane_chain_kernel_fn

            return make_plane_chain_kernel_fn(
                prog, kk, carry_map, spatial, dtype or arr_dtype,
                interp, periodic, tile_planes=tile,
                vmem_limit_bytes=vmem)
        try:
            return _make_chain_kernel_fn(
                prog, kk, carry_map, spatial,
                dtype or arr_dtype, interp, periodic,
                tile_rows=tile, probes=probes,
                vmem_limit_bytes=vmem, reads=reads)
        except ValueError as e:
            if not (periodic and not probes
                    and "no viable tile" in str(e)):
                raise
            # awkward periodic shapes: reroute through the stage
            # kernel, whose wrap-extend fallback row-pads them
            # (round-2 verdict weak #4); carry expanded to full
            # coverage so stage semantics == time semantics
            from .stage_chain import (_make_stage_chain_kernel,
                                      _validate_stages)

            outs_set = set(prog.output_names)
            full_carry = {n: carry_map.get(n, n) for n in in_names
                          if n in carry_map
                          or carry_map.get(n, n) in outs_set}
            sp, sc, sf, sn = _validate_stages([(op, full_carry)])
            return _make_stage_chain_kernel(
                sp, sc, sf, sn, kk, spatial, dtype or arr_dtype,
                interp, periodic, tile_rows=tile,
                vmem_limit_bytes=vmem)

    def fused_fwd(state):
        f0 = op.forward_input_fields[0]
        arr0 = state[in_names[0]]
        spatial = storage_spatial(f0, arr0)
        key = (spatial, str(arr0.dtype))
        if key not in kernel_cache:
            interp = interpret if interpret is not None else not _on_tpu()
            if interp or probes:
                kernel_cache[key] = _build_kernel(spatial, arr0.dtype,
                                                  interp, k)
            else:
                # on hardware: route Mosaic compile crashes/hangs to
                # shallower chains (same per-step arithmetic, k//kk kernel
                # launches) and ultimately sequential stepping
                from .guard import guard_variants, tuning_tag

                abstract = {n: jax.ShapeDtypeStruct(state[n].shape,
                                                    state[n].dtype)
                            for n in in_names}

                def compose(kk, vmem=None):
                    def build():
                        from .guard import aot_probe

                        # force the Mosaic compile NOW (AOT, abstract
                        # args): under an outer jit the in-trace call
                        # would defer compilation past the guard, letting
                        # HTTP 500s / scoped-VMEM OOMs escape it;
                        # aot_probe keeps the executable so the first
                        # real call doesn't recompile
                        kern = aot_probe(
                            _build_kernel(spatial, arr0.dtype, interp,
                                          kk, vmem), abstract)
                        reps = k // kk

                        def fn(st):
                            for _ in range(reps):
                                st = kern(st)
                            return st
                        return fn
                    return build

                def seq_build():
                    def fn(st):
                        for _ in range(k):
                            st = seq_step(st)
                        return {n: st[n] for n in in_names}
                    return fn

                variants = [(f"chain_k{k}", compose(k))]
                for div in (2, 4):
                    variants.append((f"chain_k{k}_vmem/{div}",
                                     compose(k, vmem_limit_bytes // div)))
                seen_kk = {k}
                for kk in (k // 2, 1):
                    if 0 < kk < k and k % kk == 0 and kk not in seen_kk:
                        seen_kk.add(kk)
                        variants.append((f"chain_k{kk}", compose(kk)))
                variants.append(("sequential", seq_build()))
                name, fn, result = guard_variants(
                    variants, {n: state[n] for n in in_names},
                    signature=f"time_chain|{op.op_name}|{spatial}|"
                              f"{arr0.dtype}|k={k}|periodic={periodic}"
                              + (f"|reads={reads}" if reads != "slice" else "")
                              + tuning_tag(tile_rows, vmem_limit_bytes))
                kernel_cache[key] = fn
                return result
        res = kernel_cache[key]({n: state[n] for n in in_names})
        if probes:
            outputs, probe_vals = res
            return outputs, tuple(probe_vals)
        return res

    @jax.custom_vjp
    def chain(state):
        return fused_fwd(state)

    def fwd_rule(state):
        return fused_fwd(state), {n: state[n] for n in in_names}

    def _cast(tree):
        # keep forward/backward precision consistent under a dtype override
        # (advisor finding, round 1): the fused forward computes in `dtype`,
        # so the recompute/adjoint must too.
        if dtype is None:
            return tree
        return jax.tree.map(lambda v: v.astype(dtype), tree)

    if fused_bwd:
        from .adjoint_chain import fused_chain_vjp

        adj_chain = fused_chain_vjp(op, k, carry_map, periodic=periodic,
                                    interpret=interpret,
                                    tile_rows=tile_rows, probes=probes,
                                    vmem_limit_bytes=vmem_limit_bytes)

        def bwd_rule(saved, cot):
            if probes:
                cot_state, cot_probes = cot
                _, cot0 = adj_chain(_cast(saved), _cast(cot_state),
                                    _cast(tuple(cot_probes)))
            else:
                _, cot0 = adj_chain(_cast(saved), _cast(cot))
            return (cot0,)
    else:
        def bwd_rule(saved, cot):
            _, pullback = jax.vjp(sequential, _cast(saved))
            (grads,) = pullback(_cast(cot))
            return (grads,)

    chain.defvjp(fwd_rule, bwd_rule)
    chain.input_names = in_names
    chain.k = k
    return chain
