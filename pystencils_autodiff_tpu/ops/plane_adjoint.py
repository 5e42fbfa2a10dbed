"""Plane-blocked ("2.5D") fused adjoint chains for 3D domains: value AND
gradient of k steps in ONE kernel, tiled in dim-0 planes.

The flattened-row two-phase kernel (ops/adjoint_chain.py) merges leading
dims into the row axis, so a ±1 dim-0 offset reaches a whole plane of rows
and the k-step VALUE+GRADIENT halo grows ∝ k·(reach_f+reach_b)·n1 rows —
at 384³ the tile is almost all halo and the kernel crashes the Mosaic
compiler (BENCH_NOTES round-2 note (c); the guard pre-seeded those shapes
OUT to a 2× slower sequential-recompute backward — VERDICT round-3
missing #1).  This module is the adjoint analog of ops/plane_chain.py:
the kernel's refs are 3D ``(tile_planes, n1, n2)`` blocks, the chain halo
is ``k·(reach_f+reach_b)`` PLANES (independent of plane size), lateral
offsets are in-plane rotates (two-level cached: axis-1 shifts shared
across axis-2 offsets), and periodic wrap works in ALL THREE dims — the
flattened two-phase kernel's periodic mode is 2D-only, so this also makes
periodic 3D *nonlinear* fused value+gradient chains possible at all.

Phase 1 recomputes the k forward stages (saving, per stage, only the
primal planes the backward program actually reads — nothing for linear
ops); phase 2 walks the stages in reverse, threading cotangents through
the transposed carry map exactly as ``fused_chain_vjp``:

    ĉ_s[m] = Σ_{n: carry[n] is an output o} (∂F_o/∂m)ᵀ · ĉ_{s+1}[n]
           + Σ_{n: carry[n] == m (pass-through)} ĉ_{s+1}[n]

Bit-exactness contract: identical per-step arithmetic to the sequential
``jax.vjp`` of the single-step custom_vjp ops (verified in
tests/test_plane_adjoint.py), with the same bounded-domain semantics —
each forward stage zeroes the global ghost frame, each reverse stage
masks adjoint reads to the forward interior (exact-VJP rule), and
out-of-domain primal reads are sanitized to 1 before nonlinear jacobians
(they only ever multiply masked-zero cotangents; see
FlatGeom.in_domain_mask for the 0·NaN failure this prevents).

Reference anchor: the upstream library leaves the time loop to torch/TF's
tape and differentiates each generated kernel separately (SURVEY.md
§5.4); temporally-blocked adjoints are the TPU-native upgrade.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..adjoint_field import AdjointField
from ..field import Field
from .common import (assemble_planes, backward_program, field_components,
                     forward_program, plane_view, scoped_vmem,
                     shared_lateral_offsets)
from .plane_chain import pick_plane_tile, plane_reach

__all__ = ["make_plane_chain_vjp_fn"]


def _lat2(cache, key, full, o1, o2, zero_fill, interp, wrap1, wrap2=None):
    """Two-level cached lateral shift of a full (E, n1, n2) volume: the
    axis-1 rotate is shared across axis-2 offsets (a 27-point operand
    needs 3 + 9 rotates instead of 27×2).  Shifting before the plane
    slice is bit-exact — the rotates act on axes the slice never touches.
    ``full`` may be a zero-arg callable (multi-carrier cotangent sum),
    evaluated only on a cache miss.  ``wrap1``/``wrap2``: per-axis
    circular wrap (a sharded dim must not wrap locally — its periodic
    neighbour data arrived via the ppermute exchange)."""
    from .pallas_kernel import _shift_lateral

    if wrap2 is None:
        wrap2 = wrap1
    v = cache.get(key)
    if v is None:
        k1 = key[:-1]
        v1 = cache.get(k1)
        if v1 is None:
            v1 = _shift_lateral(full() if callable(full) else full,
                                o1, 1, zero_fill, interp, wrap1)
            cache[k1] = v1
        v = _shift_lateral(v1, o2, 2, zero_fill, interp, wrap2)
        cache[key] = v
    return v


def make_plane_chain_vjp_fn(op, k: int, carry_map: Dict[str, str],
                            spatial, dtype, interpret: bool,
                            periodic: bool,
                            tile_planes: Optional[int] = None,
                            vmem_limit_bytes: int = 100 * 1024 * 1024,
                            shard=None):
    """Build ``g(state, cots) -> (state_k, cot_0)`` for a 3D op: advances
    k steps AND pulls the state cotangents back through them, in one
    plane-blocked kernel.  Same contract as the flattened
    ``fused_chain_vjp`` kernel (which routes 3D domains here).

    ``shard`` (an ``ops.flatten.ShardSpec``, parallel.ShardedChain fused
    backward): ``spatial`` is then the halo-EXTENDED local block, the fn
    takes base-offset scalars as a third argument, plane halo strips are
    bounded-style even for globally periodic domains, sharded lateral
    dims never wrap locally, and every interior/exact-VJP/sanitize mask
    tests GLOBAL coordinates (VERDICT round-4 next #6)."""
    from .pallas_kernel import _shift_lateral

    fwd_prog = forward_program(op)
    bwd_prog = backward_program(op)
    if fwd_prog.ndim != 3:
        raise ValueError("plane-blocked adjoint chains are for 3D domains")
    n0, n1, n2 = (int(s) for s in spatial)
    fwd_ghost = fwd_prog.ghost
    sharded_dims = set(shard.sharded_dims) if shard is not None else set()
    if 2 in sharded_dims:
        raise ValueError("the lane dim (2) cannot be sharded")
    # per-dim wrap: only a dim the shard decomposes loses its local wrap
    # (its periodic neighbour data arrived via the exchanged halo); whole
    # dims keep wrapping exactly like the unsharded kernel
    plane_wrap = periodic and 0 not in sharded_dims
    wrap1 = periodic and 1 not in sharded_dims
    wrap2 = periodic

    in_names = [f.name for f in op.forward_input_fields]
    fields_by_name = {f.name: f for f in op.forward_input_fields}
    in_keys = [(f.name, idx) for f in op.forward_input_fields
               for idx in field_components(f)]
    out_names = [f.name for f in op.forward_output_fields]
    next_src = {n: carry_map.get(n, n) for n in in_names}
    # reverse cotangent flow (same transposed-carry semantics as
    # adjoint_chain.fused_chain_vjp)
    pass_to: Dict[str, list] = {m: [] for m in in_names}
    feeds_output: Dict[str, list] = {o: [] for o in out_names}
    for n, src in next_src.items():
        if src in feeds_output:
            feeds_output[src].append(n)
        else:
            pass_to[src].append(n)
    grad_of = {f.name: f.corresponding_forward_field.name
               for f in op.backward_output_fields}

    fwd_acc = [a for s in fwd_prog.steps for a in s.atoms
               if isinstance(a, Field.Access)]
    bwd_acc = [a for s in bwd_prog.steps for a in s.atoms
               if isinstance(a, Field.Access)]
    lo_f, hi_f = plane_reach(fwd_acc)
    lo_b, hi_b = plane_reach(bwd_acc)
    LO = k * (lo_f + lo_b)
    HI = k * (hi_f + hi_b)

    # selective primal saving: phase 1 keeps, per stage, only the planes
    # the backward program reads as primals (nothing for linear ops —
    # both phases then run with rolling 2-deep state).  CHAIN-INVARIANT
    # fields (coefficients the carry never writes: diffusion's κ, wave's
    # c) are never saved or re-sliced at all — both phases read them from
    # the stage-independent full input block, which cut the live-VMEM set
    # enough to matter at 384³ (the saved-κ extents alone were ~37 MB of
    # the ~127 MB physical budget at k=2).
    from .hoist import invariant_fields

    inv = invariant_fields(in_names, out_names, carry_map)
    saved_keys = tuple(sorted({(a.field.name, a.index) for a in bwd_acc
                               if not isinstance(a.field, AdjointField)
                               and a.field.name not in inv}))
    bwd_reads_primal = bool(saved_keys)

    def _fpair(a):
        o1, o2 = a.offsets[1], a.offsets[2]
        return ((a.field.name, a.index, o1, o2) if (o1 or o2) else None)

    def _bpair(a):
        o1, o2 = a.offsets[1], a.offsets[2]
        if not (o1 or o2):
            return None
        f = a.field
        if isinstance(f, AdjointField):
            return ("c", f.corresponding_forward_field.name, a.index, o1, o2)
        return ("p", f.name, a.index, o1, o2)

    shared_fwd = shared_lateral_offsets(fwd_prog.steps, key=_fpair)
    shared_bwd = shared_lateral_offsets(bwd_prog.steps, key=_bpair)

    itemsize = jnp.dtype(dtype).itemsize
    n_saved = k * len(saved_keys)
    n_live = (len(in_keys) * (10 if bwd_reads_primal else 24)
              + 3 * n_saved + 8)
    t = tile_planes or pick_plane_tile(n0, LO, HI,
                                       n1 * n2 * itemsize * n_live,
                                       vmem_limit_bytes)
    if t is None or n0 % t or t < max(LO + HI, 1):
        raise ValueError(f"no viable plane tile for n0={n0}, "
                         f"halo={LO + HI} planes")
    nb = n0 // t
    E = LO + t + HI
    all_in = ([("s", key) for key in in_keys]
              + [("c", key) for key in in_keys])

    def fn(state, cots, bases=None):
        arrays, ups, downs = [], [], []
        for kind, (name, idx) in all_in:
            is_cot = kind == "c"
            f = fields_by_name[name]
            arr = (cots[name] if is_cot else state[name]).astype(dtype)
            vol = plane_view(f, arr, idx).reshape((n0, n1, n2))
            arrays.append(vol)
            xr = vol.reshape((nb, t, n1, n2))
            if LO:
                if plane_wrap:
                    ups.append(jnp.roll(xr[:, t - LO:], 1, axis=0))
                else:
                    first = (jnp.zeros((1, LO, n1, n2), dtype) if is_cot
                             else jnp.broadcast_to(xr[:1, :1],
                                                   (1, LO, n1, n2)))
                    ups.append(jnp.concatenate([first, xr[:-1, t - LO:]], 0))
            if HI:
                if plane_wrap:
                    downs.append(jnp.roll(xr[:, :HI], -1, axis=0))
                else:
                    last = (jnp.zeros((1, HI, n1, n2), dtype) if is_cot
                            else jnp.broadcast_to(xr[-1:, -1:],
                                                  (1, HI, n1, n2)))
                    downs.append(jnp.concatenate([xr[1:, :HI], last], 0))
        n_in = len(all_in)
        n_up, n_dn = len(ups), len(downs)
        scalar_ins = []
        if shard is not None:
            if bases is None:
                raise ValueError("sharded plane adjoint kernel needs base "
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
            tile_i = pl.program_id(0)

            full: Dict[tuple, jax.Array] = {}
            for kk, (kind, key) in enumerate(all_in):
                parts = []
                if LO:
                    parts.append(up_refs[kk][0])
                parts.append(xs[kk][...])
                if HI:
                    parts.append(dn_refs[kk][0])
                full[(kind, key)] = (jnp.concatenate(parts, axis=0)
                                     if len(parts) > 1 else parts[0])

            # GLOBAL extents: masks in sharded mode test global
            # coordinates (ids are built with the base offsets below)
            if shard is not None:
                G0, G1, G2 = shard.global_spatial
            else:
                G0, G1, G2 = n0, n1, n2

            def interior_mask(p_ids, a_ids, b_ids, ghost):
                (g0l, g0h), (g1l, g1h), (g2l, g2h) = ghost
                return ((p_ids >= 0) & (p_ids < G0)
                        & (p_ids >= g0l) & (p_ids < G0 - g0h)
                        & (a_ids >= g1l) & (a_ids < G1 - g1h)
                        & (b_ids >= g2l) & (b_ids < G2 - g2h))

            # ---- phase 1: forward recompute over k stages ----
            # stage-s input extent: E − s·(lo_f+hi_f) planes, local plane 0
            # at global i·t − (LO − s·lo_f).  Invariant fields are NOT
            # threaded through cur: every stage reads them from the
            # stage-independent full block (offset (s+1)·lo_f folds the
            # frame walk), with a kernel-lifetime lateral cache.
            cur = {key: full[("s", key)] for key in in_keys
                   if key[0] not in inv}
            inv_lat_cache: Dict[tuple, jax.Array] = {}
            saved: List[Optional[Dict]] = []
            for s in range(k):
                if bwd_reads_primal:
                    saved.append({kk_: cur[kk_] for kk_ in saved_keys})
                ext = E - (s + 1) * (lo_f + hi_f)
                env: Dict[object, jax.Array] = {}
                stage_out: Dict[tuple, jax.Array] = {}
                latf_cache: Dict[tuple, jax.Array] = {}

                def readf(acc, _ext=ext, _cur=cur, _c=latf_cache, _s=s):
                    name_i = (acc.field.name, acc.index)
                    o1, o2 = acc.offsets[1], acc.offsets[2]
                    if acc.field.name in inv:
                        start = (_s + 1) * lo_f + acc.offsets[0]
                        v = _lat2(inv_lat_cache, ("s",) + name_i + (o1, o2),
                                  full[("s", name_i)], o1, o2,
                                  False, interpret, wrap1, wrap2)
                        return jax.lax.slice_in_dim(v, start, start + _ext,
                                                    axis=0)
                    start = lo_f + acc.offsets[0]
                    if _fpair(acc) not in shared_fwd:
                        v = jax.lax.slice_in_dim(_cur[name_i], start,
                                                 start + _ext, axis=0)
                        v = _shift_lateral(v, o1, 1, False, interpret,
                                           wrap1)
                        return _shift_lateral(v, o2, 2, False, interpret,
                                              wrap2)
                    v = _lat2(_c, name_i + (o1, o2), _cur[name_i], o1, o2,
                              False, interpret, wrap1, wrap2)
                    return jax.lax.slice_in_dim(v, start, start + _ext,
                                                axis=0)

                shape_s = (ext, n1, n2)
                for st in fwd_prog.steps:
                    vals = [readf(a) if isinstance(a, Field.Access)
                            else env[a] for a in st.atoms]
                    res = jnp.broadcast_to(
                        jnp.asarray(st.fn(*vals), dtype), shape_s)
                    if st.is_main:
                        stage_out[(st.target.field.name,
                                   st.target.index)] = res
                    else:
                        env[st.target] = res
                if not periodic:
                    # sequential semantics: zero the global ghost frame
                    base = tile_i * t - (LO - (s + 1) * lo_f)
                    if shard is not None:
                        base = base + base_vals[0]
                    p_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_s, 0)
                             + base)
                    a_ids = jax.lax.broadcasted_iota(jnp.int32, shape_s, 1)
                    b_ids = jax.lax.broadcasted_iota(jnp.int32, shape_s, 2)
                    if shard is not None:
                        a_ids = a_ids + base_vals[1]
                        b_ids = b_ids + base_vals[2]
                    m = interior_mask(p_ids, a_ids, b_ids, fwd_ghost)
                    stage_out = {key_: jnp.where(m, v, 0)
                                 for key_, v in stage_out.items()}

                nxt = {}
                for name, idx in in_keys:
                    if name in inv:
                        continue  # read from full at stage offsets
                    src = next_src[name]
                    if (src, idx) in stage_out:
                        nxt[(name, idx)] = stage_out[(src, idx)]
                    elif src in inv:  # carry from an invariant source
                        nxt[(name, idx)] = jax.lax.slice_in_dim(
                            full[("s", (src, idx))], (s + 1) * lo_f,
                            (s + 1) * lo_f + ext, axis=0)
                    else:
                        nxt[(name, idx)] = jax.lax.slice_in_dim(
                            cur[(src, idx)], lo_f, lo_f + ext, axis=0)
                cur = nxt

            # ---- phase 2: reverse sweep of the backward program ----
            ck = E - k * (lo_f + hi_f)
            off0 = k * lo_f  # planes consumed on the low side by phase 1
            cot = {key: jax.lax.slice_in_dim(full[("c", key)], off0,
                                             off0 + ck, axis=0)
                   for key in in_keys}
            for s in range(k - 1, -1, -1):
                r = k - 1 - s  # reverse index: 0 first
                ext = ck - (lo_b + hi_b)
                prim = saved[s] if bwd_reads_primal else {}
                # offset of the cot frame's local 0 inside the prim frame
                prim_off = (k - s) * lo_f + r * lo_b
                # global plane of output-local 0 in this reverse stage
                p0_out = tile_i * t - k * lo_b + (r + 1) * lo_b
                env: Dict[object, jax.Array] = {}
                shape_s = (ext, n1, n2)
                latb_cache: Dict[tuple, jax.Array] = {}

                # mask hoisting: the exact-VJP / sanitize masks depend only
                # on the (static) access offsets, so build the three base
                # iotas ONCE per reverse stage and memoise each offset's
                # mask — the earlier per-read 3×iota + compares dominated
                # phase-2 cost (measured 116 ps/cell/step at 384³ k=1,
                # ~6× the forward chain's per-cell work)
                if not periodic:
                    p0g = (p0_out + base_vals[0] if shard is not None
                           else p0_out)
                    p_base = (jax.lax.broadcasted_iota(
                        jnp.int32, shape_s, 0) + p0g)
                    a_base = jax.lax.broadcasted_iota(jnp.int32, shape_s, 1)
                    b_base = jax.lax.broadcasted_iota(jnp.int32, shape_s, 2)
                    if shard is not None:
                        a_base = a_base + base_vals[1]
                        b_base = b_base + base_vals[2]
                mask_cache: Dict[tuple, jax.Array] = {}

                def read_mask(off, kind):
                    """'adj': forward-interior mask at the read cell;
                    'prim': in-domain mask (sanitize target)."""
                    mk = (kind,) + tuple(off)
                    m = mask_cache.get(mk)
                    if m is None:
                        p = p_base + off[0]
                        a = a_base + off[1] if off[1] else a_base
                        b = b_base + off[2] if off[2] else b_base
                        if kind == "adj":
                            m = interior_mask(p, a, b, fwd_ghost)
                        else:
                            m = ((p >= 0) & (p < G0) & (a >= 0) & (a < G1)
                                 & (b >= 0) & (b < G2))
                        mask_cache[mk] = m
                    return m

                def readb(acc, _er=ext, _prim=prim, _cot=cot,
                          _po=prim_off, _p0=p0_out, _c=latb_cache, _r=r):
                    f = acc.field
                    o1, o2 = acc.offsets[1], acc.offsets[2]
                    if isinstance(f, AdjointField):
                        primal = f.corresponding_forward_field.name
                        # ŵ_o := Σ cotangents of states fed by output o;
                        # un-carried outputs and accumulator-prev inputs
                        # read zero (the cross-stage accumulation happens
                        # through the pass-through cotangent recursion)
                        carriers = feeds_output.get(primal, [])
                        if not carriers:
                            return jnp.zeros((_er, n1, n2), dtype)

                        def full_v(_cs=carriers, _ix=acc.index, _ct=_cot):
                            v_ = _ct[(_cs[0], _ix)]
                            for extra in _cs[1:]:
                                v_ = v_ + _ct[(extra, _ix)]
                            return v_

                        start = lo_b + acc.offsets[0]
                        zf = not periodic
                        if _bpair(acc) not in shared_bwd:
                            v = jax.lax.slice_in_dim(full_v(), start,
                                                     start + _er, axis=0)
                            v = _shift_lateral(v, o1, 1, zf, interpret,
                                               wrap1)
                            v = _shift_lateral(v, o2, 2, zf, interpret,
                                               wrap2)
                        else:
                            v = _lat2(_c,
                                      ("c", primal, acc.index, o1, o2),
                                      full_v, o1, o2, zf, interpret,
                                      wrap1, wrap2)
                            v = jax.lax.slice_in_dim(v, start, start + _er,
                                                     axis=0)
                        if not periodic:
                            # exact-VJP rule: zero the cotangent outside
                            # the forward interior, at the READ cell
                            v = jnp.where(read_mask(acc.offsets, "adj"),
                                          v, 0)
                        return v
                    if f.name in inv:
                        # invariant primal: read the stage-independent
                        # full block (local 0 of this reverse stage's
                        # output frame sits at E-pos k·lo_f + (r+1)·lo_b)
                        name_i = (f.name, acc.index)
                        start = (k * lo_f + (_r + 1) * lo_b
                                 + acc.offsets[0])
                        v = _lat2(inv_lat_cache, ("s",) + name_i + (o1, o2),
                                  full[("s", name_i)], o1, o2,
                                  False, interpret, wrap1, wrap2)
                        v = jax.lax.slice_in_dim(v, start, start + _er,
                                                 axis=0)
                    elif _bpair(acc) not in shared_bwd:
                        start = _po + lo_b + acc.offsets[0]
                        v = jax.lax.slice_in_dim(_prim[(f.name, acc.index)],
                                                 start, start + _er, axis=0)
                        v = _shift_lateral(v, o1, 1, False, interpret,
                                           wrap1)
                        v = _shift_lateral(v, o2, 2, False, interpret,
                                           wrap2)
                    else:
                        start = _po + lo_b + acc.offsets[0]
                        v = _lat2(_c, ("p", f.name, acc.index, o1, o2),
                                  _prim[(f.name, acc.index)], o1, o2,
                                  False, interpret, wrap1, wrap2)
                        v = jax.lax.slice_in_dim(v, start, start + _er,
                                                 axis=0)
                    if not periodic:
                        # sanitize OUT-OF-DOMAIN primal garbage to 1
                        # (masked-zero recompute zones make 1/x jacobians
                        # NaN, and 0·NaN poisons exact terms whose
                        # cotangent reads are already masked)
                        v = jnp.where(read_mask(acc.offsets, "prim"), v, 1)
                    return v

                grads_stage: Dict[tuple, jax.Array] = {}
                for st in bwd_prog.steps:
                    vals = [readb(a) if isinstance(a, Field.Access)
                            else env[a] for a in st.atoms]
                    res = jnp.broadcast_to(
                        jnp.asarray(st.fn(*vals), dtype), shape_s)
                    if st.is_main:
                        grads_stage[(grad_of[st.target.field.name],
                                     st.target.index)] = res
                    else:
                        env[st.target] = res

                new_cot = {}
                for name, idx in in_keys:
                    v = grads_stage.get((name, idx))
                    for n in pass_to.get(name, ()):
                        pv = jax.lax.slice_in_dim(
                            cot[(n, idx)], lo_b, lo_b + ext, axis=0)
                        v = pv if v is None else v + pv
                    if v is None:
                        v = jnp.zeros(shape_s, dtype)
                    new_cot[(name, idx)] = v
                cot = new_cot
                ck = ext

            # final state: extent E − k(lo_f+hi_f), local 0 at global
            # i·t − (LO − k·lo_f); cot frame consumed LO planes low side,
            # extent exactly t
            fin_off = LO - k * lo_f
            for j, key in enumerate(in_keys):
                if key[0] in inv:  # unchanged: the input block's own tile
                    outs[j][...] = jax.lax.slice_in_dim(
                        full[("s", key)], LO, LO + t, axis=0)
                else:
                    outs[j][...] = jax.lax.slice_in_dim(
                        cur[key], fin_off, fin_off + t, axis=0)
            for j, key in enumerate(in_keys):
                outs[len(in_keys) + j][...] = cot[key]

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
                            for _ in range(2 * len(in_keys))),
            in_specs=[vol_spec] * n_in + [strip_spec(u.shape) for u in ups]
            + [strip_spec(d.shape) for d in downs] + scalar_specs,
            out_specs=tuple(vol_spec for _ in range(2 * len(in_keys))),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
        )(*arrays, *ups, *downs, *scalar_ins)

        def restack(vols_flat, base):
            out, pos = {}, base
            for f in op.forward_input_fields:
                comps = field_components(f)
                vols = [vols_flat[pos + j] for j in range(len(comps))]
                pos += len(comps)
                out[f.name] = assemble_planes(f, vols, (n0, n1, n2))
            return out

        new_state = restack(result, 0)
        cot_out = restack(result, len(in_keys))
        return new_state, cot_out

    return fn
