"""Fused adjoint for heterogeneous stage chains: value AND gradient of
``k`` cycles of a multi-op sequence in ONE kernel.

Generalises ``ops/adjoint_chain.py`` (one op, k steps) to the stage form of
``ops/stage_chain.py`` (RK stages, elastic velocity/stress sweeps,
Cahn–Hilliard two-sweep): phase 1 recomputes every forward stage of every
cycle with tile states in registers (saving the pre-stage state only for
stages whose backward program reads primal values), phase 2 walks the
``k·S`` stages in reverse, applying each stage's symbolically derived
backward program and threading cotangents through the *stage-chain* carry
transpose:

    ĉ_state[m] = Σ_{n mapped to output o of this stage} (∂F_o/∂m)ᵀ·ĉ'[n]
               + Σ_{n whose effective source is state field m}  ĉ'[n]

where unmapped state entries pass through (their cotangent does too) —
exactly the transpose of ``stage_stepper`` semantics.

The extent bookkeeping generalises the uniform per-step reach of
adjoint_chain to prefix sums over the per-stage forward/backward row
reaches; everything else (flattened-row geometry, bounded-domain interior
masking in the forward stages, exact-VJP adjoint-read masks in the reverse
stages) is identical in structure and verified bit-exact against
sequential ``jax.vjp`` of the per-op custom_vjp steps.

Reference anchor: the upstream library differentiates each generated sweep
separately and leaves the time loop to torch/TF's tape (SURVEY.md §5.4);
fusing the whole cycle's adjoint is the TPU-native upgrade (VERDICT
round 2, next #3).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..adjoint_field import AdjointField
from ..field import Field
from .common import (assemble_planes, backward_program, field_components,
                     plane_view, require_row_major, storage_spatial,
                     scoped_vmem)
from .stage_chain import _validate_stages

__all__ = ["fused_stage_chain_vjp", "validate_bc_invariance"]


def validate_bc_invariance(bcs, carries) -> None:
    """Build-time checks for BCs entering the fused backward: phase 2
    reads BC parameter planes from the ORIGINAL input block
    (chain-invariance) — a carry-written mask/value/u_wall field would
    make every cycle's transpose use the cycle-0 plane, and a
    masked_dirichlet value aliasing its target is ambiguous."""
    bad = [bc.kind for bl in bcs.values() for bc in bl
           if bc.kind not in ("dirichlet", "neumann",
                              "masked_dirichlet", "bounce_back", "sponge")]
    if bad:
        raise ValueError(
            f"fused_stage_chain_vjp: BC kinds {bad} have no fused "
            f"transpose yet — use fused_bwd=False (sequential "
            f"recompute backward)")
    carried = {dst for c in carries for dst in c}
    for bl in bcs.values():
        for bc in bl:
            params = [bc.mask] + list(bc.u_wall or ()) + [bc.value]
            refs = [p for p in params if isinstance(p, str)]
            if bc.value == bc.field:
                raise ValueError(
                    f"fused backward: {bc.kind} value/profile field "
                    f"aliases its target {bc.field!r} — unsupported")
            hot = sorted(set(refs) & carried)
            if hot:
                raise ValueError(
                    f"fused backward: BC parameter field(s) {hot} are "
                    f"carry targets (not chain-invariant) — use "
                    f"fused_bwd=False")


def fused_stage_chain_vjp(stages: Sequence[Tuple[object, Dict[str, str]]],
                          k: int, periodic: bool = False,
                          interpret: Optional[bool] = None,
                          tile_rows: Optional[int] = None,
                          vmem_limit_bytes: int = 100 * 1024 * 1024,
                          shard=None, bcs=None, extra_state=None):
    """Build ``g(state, cot_state) -> (state_k, cot_0)`` advancing ``k``
    cycles of the stage sequence and pulling the state cotangents back
    through all of them, in one kernel.

    ``shard`` (an ``ops.flatten.ShardSpec``, parallel.ShardedChain fused
    backward): ``state`` is then a halo-EXTENDED local block of a larger
    global domain; the returned fn takes a third ``bases`` argument (the
    global coordinate of ext-local 0 per dim), row halo strips are
    bounded-style even for globally periodic domains (the wrap arrived
    via ppermute), and every interior / exact-VJP mask tests GLOBAL
    coordinates — making this kernel the exact transpose of
    ``stage_chain._make_stage_chain_kernel(shard=...)`` on the same
    block."""
    from .flatten import FlatGeom, pick_chain_tile
    from .pallas_kernel import _on_tpu, _shift_lateral

    stages = [(op, dict(carry)) for op, carry in stages]
    if not stages:
        raise ValueError("no stages")
    fwd_progs, carries, state_fields, state_names = _validate_stages(stages)
    # in-chain boundary conditions (ops/chain_bc.py): every supported BC
    # event is LINEAR/affine in state, so its transpose needs no saved
    # primals — only the (chain-invariant, pass-through) mask planes and
    # the running cotangents.  neumann's frame-fill transpose reverses
    # its pass sequence with zero-fill outward shifts.
    bcs = dict(bcs or {})
    if bcs:
        validate_bc_invariance(bcs, carries)
    if extra_state:
        state_fields = {**state_fields, **extra_state}
        state_names = list(state_names) + [n for n in extra_state
                                           if n not in state_names]
    require_row_major(state_fields.values(), "fused_stage_chain_vjp")
    S = len(stages)
    nd = fwd_progs[0].ndim
    if periodic and nd != 2 and shard is None:
        raise ValueError("periodic fused chains support 2D domains only")
    # sharded blocks never wrap rows intra-block: the periodic neighbour
    # data is in the exchanged halo
    row_wrap = periodic and shard is None

    bwd_progs = [backward_program(op) for op, _ in stages]
    if periodic and shard is not None:
        # row wrap is disabled for sharded blocks: every leading dim the
        # stencil (forward OR backward) reaches into must get its wrap
        # data via the exchanged halo — an unsharded reached dim would
        # silently lose its seam
        reached = set()
        for p in list(fwd_progs) + list(bwd_progs):
            for d in range(nd - 1):
                if p.ghost[d] != (0, 0):
                    reached.add(d)
        missing = sorted(reached - set(shard.sharded_dims))
        if missing:
            raise ValueError(
                f"periodic sharded vjp kernel: leading dims {missing} are "
                f"reached by the stencil but not in shard.sharded_dims — "
                f"their wrap data never arrives via halo exchange (map "
                f"them to a size-1 mesh axis if they should not be "
                f"decomposed)")
    grad_ofs = [{f.name: f.corresponding_forward_field.name
                 for f in op.backward_output_fields} for op, _ in stages]

    state_keys = [(n, idx) for n in state_names
                  for idx in field_components(state_fields[n])]

    # per-stage transposed carry flow (stage_stepper semantics: only mapped
    # entries consult the stage outputs; unmapped entries pass through)
    feeds: List[Dict[str, list]] = []
    passes: List[Dict[str, list]] = []
    for prog, carry in zip(fwd_progs, carries):
        outs_j = set(prog.output_names)
        fj: Dict[str, list] = {}
        pj: Dict[str, list] = {}
        for n in state_names:
            if n in carry:
                src = carry[n]
                if src in outs_j:
                    fj.setdefault(src, []).append(n)
                else:
                    pj.setdefault(src, []).append(n)
            else:
                pj.setdefault(n, []).append(n)
        feeds.append(fj)
        passes.append(pj)

    # per-stage primal planes the backward program actually READS — save
    # only those in phase 1 (saving the whole state dict per need_primal
    # stage kept k·S·n_keys planes live and dominated the VMEM estimate,
    # shrinking the viable tile; nonlinear stages typically read a small
    # subset of the state)
    saved_keys: List[tuple] = []
    for bp in bwd_progs:
        ks = {(a.field.name, a.index) for st in bp.steps for a in st.atoms
              if isinstance(a, Field.Access)
              and not isinstance(a.field, AdjointField)}
        saved_keys.append(tuple(k for k in ks))
    need_primal = [bool(ks) for ks in saved_keys]

    # shift-before-slice only pays for RECURRING lane offsets; single-use
    # offsets keep slice-then-shift (pre-shifting the larger un-sliced
    # tile for one use measured a 1.5× regression — ops/common.py)
    from .common import (lat_shifted_read,
                         shared_lateral_offsets)

    shared_fwd = [shared_lateral_offsets(p.steps) for p in fwd_progs]

    def _bkey(a):
        off = a.offsets[-1]
        if not off:
            return None
        f = a.field
        if isinstance(f, AdjointField):
            return ("c", f.corresponding_forward_field.name, a.index, off)
        return ("p", f.name, a.index, off)

    shared_bwd = [shared_lateral_offsets(p.steps, key=_bkey)
                  for p in bwd_progs]

    def build(spatial, dtype, interp):
        geom = FlatGeom(spatial)
        rows, cols = geom.rows, geom.cols
        lof, hif, lob, hib = [], [], [], []
        for fp, bp in zip(fwd_progs, bwd_progs):
            fa = [a for st in fp.steps for a in st.atoms
                  if isinstance(a, Field.Access)]
            ba = [a for st in bp.steps for a in st.atoms
                  if isinstance(a, Field.Access)]
            lo_f, hi_f = geom.row_reach(fa)
            lo_b, hi_b = geom.row_reach(ba)
            lof.append(lo_f), hif.append(hi_f)
            lob.append(lo_b), hib.append(hi_b)
        # BC events consume read reach before their stage (phase 1), and
        # their transposes consume the MIRRORED reach after the stage's
        # transpose (phase 2) — same flattened-row accounting as the
        # forward kernel (bc_row_reach is shared with it)
        from .chain_bc import bc_row_reach

        bcF: Dict[int, list] = {}
        for j in range(S):
            bcF[j] = [bc_row_reach(bc, fwd_progs[j].ghost, geom, nd)
                      for bc in bcs.get(j, ())]
        bclo = [sum(lo for lo, _ in bcF[j]) for j in range(S)]
        bchi = [sum(hi for _, hi in bcF[j]) for j in range(S)]
        LO = k * (sum(lof) + sum(lob) + sum(bclo) + sum(bchi))
        HI = k * (sum(hif) + sum(hib) + sum(bchi) + sum(bclo))
        n_stages = k * S
        stage_j = [i % S for i in range(n_stages)]
        # prefix sums over the flattened (cycle, stage) sequence; a
        # phase-1 "stage" consumes its BCs' reach then the stencil's, so
        # the save point (post-BC, pre-stencil) has its own low offset
        cumF_lo = [0]       # low consumed after stage i (BCs + stencil)
        cumF = [0]          # total consumed after stage i
        cumF_lo_save = []   # low consumed at stage i's save point
        for i in range(n_stages):
            j = stage_j[i]
            cumF_lo_save.append(cumF_lo[-1] + bclo[j])
            cumF_lo.append(cumF_lo[-1] + bclo[j] + lof[j])
            cumF.append(cumF[-1] + bclo[j] + bchi[j] + lof[j] + hif[j])

        itemsize = jnp.dtype(dtype).itemsize
        # live planes: ~10 working values per state key, plus 3× every
        # SAVED primal plane (saved at pre-stage extent, re-read shifted
        # in phase 2) across all k·S stages — selective saving means a
        # stage contributes only the planes its backward actually reads
        n_saved_planes = sum(len(saved_keys[stage_j[i]])
                             for i in range(n_stages)
                             if need_primal[stage_j[i]])
        # sponge damp gradients need the PRE-sponge target planes saved
        # from phase 1 (the one BC transpose that reads a primal)
        n_saved_planes += sum(
            len(field_components(state_fields[bc.field]))
            for i in range(n_stages)
            for bc in bcs.get(stage_j[i], ())
            if bc.kind == "sponge" and isinstance(bc.value, str))
        n_live = (len(state_keys) * (10 if n_saved_planes else 24)
                  + 3 * n_saved_planes + 8)
        tile = tile_rows
        if tile is None and shard is None:
            # measured-best dispatch (autotune cache; VERDICT r3 next #6)
            from ..utils.autotune import stage_sig_of, tuned_tile

            tile = tuned_tile("stages", "grad", stage_sig_of(stages, bcs),
                              spatial, dtype, periodic, k, interp=interp)
        t = tile or pick_chain_tile(rows, LO, HI,
                                    cols * itemsize * n_live,
                                    vmem_limit_bytes)
        pad_rows = 0
        if t is None or rows % t or t < LO + HI:
            if row_wrap:
                raise ValueError(f"no viable tile for rows={rows}, "
                                 f"halo={LO + HI} (periodic rows must "
                                 f"admit a divisor tile)")
            # bounded/sharded: pad the flattened row axis (same trick as
            # the forward kernel) — pad rows are edge copies (state) /
            # zeros (cotangents); every mask tests the TRUE global row,
            # so valid cells never depend on pad content
            from .pallas_kernel import _round_up

            t = (int(tile_rows) if tile_rows
                 else max(256, _round_up(LO + HI + 1, 8)))
            if t < LO + HI:
                raise ValueError(f"tile_rows={t} smaller than chain halo "
                                 f"{LO + HI}")
            pad_rows = _round_up(rows, t) - rows
        rows_padded = rows + pad_rows
        nb = rows_padded // t
        all_in = ([("s", key) for key in state_keys]
                  + [("c", key) for key in state_keys])

        def fn(state, cots, bases=None):
            arrays, ups, downs = [], [], []
            for kind, (name, idx) in all_in:
                is_cot = kind == "c"
                arr = (cots[name] if is_cot else state[name]).astype(dtype)
                plane = plane_view(state_fields[name], arr, idx).reshape(
                    (rows, cols))
                if pad_rows:
                    plane = (jnp.pad(plane, ((0, pad_rows), (0, 0)))
                             if is_cot else
                             jnp.pad(plane, ((0, pad_rows), (0, 0)),
                                     mode="edge"))
                arrays.append(plane)
                xr = plane.reshape((nb, t, cols))
                if LO:
                    if row_wrap:
                        ups.append(jnp.roll(xr[:, t - LO:], 1, axis=0))
                    else:
                        first = (jnp.zeros((1, LO, cols), dtype) if is_cot
                                 else jnp.broadcast_to(xr[:1, :1],
                                                       (1, LO, cols)))
                        ups.append(jnp.concatenate(
                            [first, xr[:-1, t - LO:]], 0))
                if HI:
                    if row_wrap:
                        downs.append(jnp.roll(xr[:, :HI], -1, axis=0))
                    else:
                        last = (jnp.zeros((1, HI, cols), dtype) if is_cot
                                else jnp.broadcast_to(xr[-1:, -1:],
                                                      (1, HI, cols)))
                        downs.append(jnp.concatenate(
                            [xr[1:, :HI], last], 0))
            n_in = len(all_in)
            n_up, n_dn = len(ups), len(downs)
            scalar_ins = []
            if shard is not None:
                if bases is None:
                    raise ValueError("sharded vjp kernel needs base offsets")
                scalar_ins.append(jnp.asarray(bases, jnp.int32))

            def kernel(*refs):
                xs = refs[:n_in]
                up_refs = refs[n_in:n_in + n_up]
                dn_refs = refs[n_in + n_up:n_in + n_up + n_dn]
                rest = refs[n_in + n_up + n_dn:]
                if shard is not None:
                    bases_ref, rest = rest[0], rest[1:]
                    base_vals = [bases_ref[d] for d in range(nd)]
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

                g_spatial = (shard.global_spatial if shard is not None
                             else tuple(spatial))

                def bc_coord(r_ids, c_ids, d):
                    """Global per-dim coordinate for frame-BC masks (the
                    bases offset makes every mask/clamp test global when
                    running on one shard of a larger domain)."""
                    if d < nd - 1:
                        c = geom.dim_coord(r_ids, d)
                        return c + base_vals[d] if shard is not None else c
                    return (c_ids + base_vals[nd - 1] if shard is not None
                            else c_ids)

                def apply_bc_F(cur_s, bc, ghost_j, blo_b, er, g_row0):
                    """One BC event on the in-register state — the SAME
                    shared implementation the forward kernel uses
                    (chain_bc.apply_bc_tile), so the phase-1 recompute
                    matches it bit-for-bit."""
                    from .chain_bc import apply_bc_tile

                    shape_b = (er, cols)

                    def rd(key, off=(0,) * nd):
                        v = cur_s[key]
                        start = blo_b + geom.row_off(off)
                        v = jax.lax.slice_in_dim(v, start, start + er,
                                                 axis=0)
                        return _shift_lateral(v, off[-1], 1, False, interp,
                                              periodic)

                    r_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_b, 0)
                             + g_row0)
                    c_ids = jax.lax.broadcasted_iota(jnp.int32, shape_b, 1)
                    return apply_bc_tile(
                        bc, ghost_j, state_keys, state_fields, rd, r_ids,
                        c_ids, bc_coord, g_spatial, nd, dtype,
                        lambda v, s, axis: _shift_lateral(
                            v, s, axis, False, interp, False),
                        geom=geom)

                # ---- phase 1: forward recompute over all k·S stages ----
                cur = {key: full[("s", key)] for key in state_keys}
                saved: List[Optional[Dict]] = []
                # pre-BC target planes for sponge damp gradients:
                # bc_pre[i][bc_pos] = ({key: plane}, low margin at capture)
                bc_pre: List[Dict[int, tuple]] = []
                for i in range(n_stages):
                    j = stage_j[i]
                    prog, carry = fwd_progs[j], carries[j]
                    done_lo, done_tot = cumF_lo[i], cumF[i]
                    pre_i: Dict[int, tuple] = {}
                    for p, (bc, (blo_b, bhi_b)) in enumerate(
                            zip(bcs.get(j, ()), bcF[j])):
                        done_lo += blo_b
                        done_tot += blo_b + bhi_b
                        if (bc.kind == "sponge"
                                and isinstance(bc.value, str)):
                            pre_i[p] = (
                                {kk: cur[kk] for kk in state_keys
                                 if kk[0] == bc.field}, done_lo)
                        cur = apply_bc_F(cur, bc, prog.ghost, blo_b,
                                         (LO + t + HI) - done_tot,
                                         tile_i * t - (LO - done_lo))
                    bc_pre.append(pre_i)
                    saved.append({kk: cur[kk] for kk in saved_keys[j]}
                                 if need_primal[j] else None)
                    ext_rows = (LO + t + HI) - cumF[i + 1]
                    env: Dict[object, jax.Array] = {}
                    stage_out: Dict[tuple, jax.Array] = {}

                    latf_cache: Dict[tuple, jax.Array] = {}

                    def readf(acc, _er=ext_rows, _cur=cur, _lo=lof[j],
                              _c=latf_cache, _j=j):
                        ck = (acc.field.name, acc.index, acc.offsets[-1])
                        return lat_shifted_read(
                            _c, shared_fwd[_j], ck, _cur[ck[:2]],
                            acc.offsets[-1],
                            _lo + geom.row_off(acc.offsets), _er, False,
                            interp, periodic)

                    shape_s = (ext_rows, cols)
                    for st in prog.steps:
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
                        base = tile_i * t - (LO - cumF_lo[i + 1])
                        r_ids = (jax.lax.broadcasted_iota(
                            jnp.int32, shape_s, 0) + base)
                        c_ids = jax.lax.broadcasted_iota(
                            jnp.int32, shape_s, 1)
                        m = (r_ids >= 0) & (r_ids < rows)
                        if shard is not None:
                            # one shard of a global domain: mask the GLOBAL
                            # ghost frame only (must match the forward
                            # sharded kernel's write mask bit-for-bit)
                            m &= geom.interior_mask_global(
                                r_ids, c_ids, prog.ghost, base_vals,
                                shard.global_spatial)
                        else:
                            m &= geom.interior_mask(r_ids, c_ids,
                                                    prog.ghost)
                        stage_out = {key_: jnp.where(m, v, 0)
                                     for key_, v in stage_out.items()}

                    nxt = {}
                    for name, idx in state_keys:
                        src = carry.get(name)
                        if src is not None and (src, idx) in stage_out:
                            nxt[(name, idx)] = stage_out[(src, idx)]
                        else:
                            v = cur[(src if src is not None else name, idx)]
                            nxt[(name, idx)] = jax.lax.slice_in_dim(
                                v, lof[j], lof[j] + ext_rows, axis=0)
                    cur = nxt

                def apply_bc_T(cot_s, bc, ghost_j, lo_rd, er, g_row0,
                               inv_off, pre=None):
                    """Exact transpose of ``apply_bc_F``: cotangent of the
                    post-BC state → cotangent of the pre-BC state.  BC
                    events are linear/affine in state, so only the
                    chain-invariant mask planes (read from the ORIGINAL
                    input block at ``inv_off``) and the running cotangents
                    are needed — except sponge's damp gradient, whose
                    phase-1 pre-BC target planes arrive via ``pre``
                    (``({key: plane}, capture low margin)``)."""
                    shape_b = (er, cols)

                    def rdc(key, off=(0,) * nd):
                        # cotangent read at MIRRORED offset; zero-fill
                        # lateral shifts on bounded domains (out-of-lane
                        # contributions are handled by the clamp folds)
                        v = cot_s[key]
                        start = lo_rd + geom.row_off(off)
                        v = jax.lax.slice_in_dim(v, start, start + er,
                                                 axis=0)
                        return _shift_lateral(v, off[-1], 1, not periodic,
                                              interp, periodic)

                    def rdi(key, off=(0,) * nd):
                        # chain-invariant plane (mask/solid) from the
                        # original input block
                        v = full[("s", key)]
                        start = inv_off + geom.row_off(off)
                        v = jax.lax.slice_in_dim(v, start, start + er,
                                                 axis=0)
                        return _shift_lateral(v, off[-1], 1, False, interp,
                                              periodic)

                    new = {key: rdc(key) for key in state_keys}
                    comps = field_components(state_fields[bc.field])
                    r_ids = (jax.lax.broadcasted_iota(jnp.int32, shape_b, 0)
                             + g_row0)
                    c_ids = jax.lax.broadcasted_iota(jnp.int32, shape_b, 1)

                    if bc.kind == "dirichlet":
                        dims_bc = (bc.dims if bc.dims is not None
                                   else range(nd))
                        m = jnp.zeros(shape_b, bool)
                        for d in dims_bc:
                            lo_g, hi_g = ghost_j[d]
                            if lo_g or hi_g:
                                cd = bc_coord(r_ids, c_ids, d)
                                m |= (cd < lo_g) | (cd >= g_spatial[d] - hi_g)
                        for idx in comps:
                            new[(bc.field, idx)] = jnp.where(
                                m, 0, new[(bc.field, idx)])
                    elif bc.kind == "neumann":
                        # forward: g inward-copy passes per (dim, side) in
                        # ascending dim order, low side first —
                        #   y = (1−m)·x + m·S_in x.
                        # transpose, passes reversed:
                        #   x̂ = (1−m)·ŷ + S_out(m_strict·ŷ)
                        # with zero-fill outward shifts; the source mask is
                        # STRICT (frame AND in-domain) so halo rows — whose
                        # dim-0 coordinate runs past the domain — never
                        # scatter into valid cells.  Inner-dim crossings
                        # self-mask: a crossed source's mod-coordinate
                        # lands outside the frame.
                        dims_bc = list(bc.dims if bc.dims is not None
                                       else range(nd))
                        for idx in comps:
                            plane = new[(bc.field, idx)]
                            for d in reversed(dims_bc):
                                lo_g, hi_g = ghost_j[d]
                                if not (lo_g or hi_g):
                                    continue
                                cd = bc_coord(r_ids, c_ids, d)
                                shift = (geom.strides[d] if d < nd - 1
                                         else 1)
                                axis = 0 if d < nd - 1 else 1
                                for side, width in ((1, hi_g), (0, lo_g)):
                                    s = shift if side == 0 else -shift
                                    if side == 0:
                                        m_t = cd < lo_g
                                        m_src = (cd >= 0) & m_t
                                    else:
                                        m_t = cd >= g_spatial[d] - hi_g
                                        m_src = m_t & (cd < g_spatial[d])
                                    for _ in range(width):
                                        contrib = _shift_lateral(
                                            jnp.where(m_src, plane, 0),
                                            -s, axis, True, interp, False)
                                        plane = (jnp.where(m_t, 0, plane)
                                                 + contrib)
                            new[(bc.field, idx)] = plane
                    elif bc.kind == "masked_dirichlet":
                        m = rdi((bc.mask, ())) != 0
                        for idx in comps:
                            yj = new[(bc.field, idx)]
                            if isinstance(bc.value, str):
                                new[(bc.value, ())] = (
                                    new[(bc.value, ())]
                                    + jnp.where(m, yj, 0))
                            new[(bc.field, idx)] = jnp.where(m, 0, yj)
                    elif bc.kind == "sponge":
                        # y = damp ⊙ x  ⇒  x̂ = damp ⊙ ŷ; when damp is a
                        # field, its cotangent needs the pre-sponge primal
                        # (the ONE BC transpose reading a saved plane):
                        # d̂ += Σ_idx x_pre[idx] ⊙ ŷ[idx]
                        damp = (rdi((bc.value, ()))
                                if isinstance(bc.value, str)
                                else jnp.asarray(bc.value, dtype))
                        if isinstance(bc.value, str):
                            pre_planes, cap_lo = pre
                            start = inv_off - cap_lo
                            acc = jnp.zeros(shape_b, dtype)
                            for idx in comps:
                                xp = jax.lax.slice_in_dim(
                                    pre_planes[(bc.field, idx)], start,
                                    start + er, axis=0)
                                acc = acc + xp * new[(bc.field, idx)]
                            new[(bc.value, ())] = new[(bc.value, ())] + acc
                        for idx in comps:
                            new[(bc.field, idx)] = (new[(bc.field, idx)]
                                                    * damp)
                    elif bc.kind == "bounce_back":
                        solid = rdi((bc.mask, ())) != 0
                        # forward: out_j = (1-s)·x_j + s·(x_jbar(·+c_j)
                        #          + 6 w_j ρ (c_j·u));  transpose:
                        #   x̂_m  = (1-s)·ŷ_m + Σ_{j: opp_j=m} T_j
                        #   û_d += Σ_j 6 w_j ρ c_j[d]·s·ŷ_j
                        # where T_j scatters s·ŷ_j back along −c_j, with
                        # out-of-domain clamp reads FOLDED onto the edge
                        # cell (the exact transpose of edge-clamp).
                        import itertools as _it

                        ybars = {}
                        for jv, cj in enumerate(bc.velocities):
                            m_tgt = bc.opposite[jv]
                            off = tuple(int(c) for c in cj)
                            dims_c = [d for d in range(nd) if off[d]]
                            contrib = jnp.zeros(shape_b, dtype)
                            if periodic:
                                sy = (rdc((bc.field, (jv,)),
                                          tuple(-c for c in off))
                                      * rdi((bc.mask, ()),
                                            tuple(-c for c in off)))
                                contrib = sy
                            else:
                                for q in _it.chain.from_iterable(
                                        _it.combinations(dims_c, r_)
                                        for r_ in range(len(dims_c) + 1)):
                                    eff = tuple(
                                        0 if d in q else -off[d]
                                        for d in range(nd))
                                    sy = (rdc((bc.field, (jv,)), eff)
                                          * rdi((bc.mask, ()), eff))
                                    m_q = jnp.ones(shape_b, bool)
                                    for d in dims_c:
                                        cd = bc_coord(r_ids, c_ids, d)
                                        if d in q:
                                            # clamped dim: target is the
                                            # outward edge cell
                                            edge = (g_spatial[d] - 1
                                                    if off[d] > 0 else 0)
                                            m_q &= cd == edge
                                        else:
                                            m_q &= ((cd - off[d] >= 0)
                                                    & (cd - off[d]
                                                       < g_spatial[d]))
                                    contrib = contrib + jnp.where(
                                        m_q, sy, 0)
                            ybars.setdefault(m_tgt, []).append(contrib)
                            if bc.u_wall is not None and any(off):
                                syc = (rdc((bc.field, (jv,)))
                                       * rdi((bc.mask, ())))
                                for c, uw in zip(off, bc.u_wall):
                                    if c and isinstance(uw, str):
                                        new[(uw, ())] = (
                                            new[(uw, ())]
                                            + (6.0 * bc.weights[jv]
                                               * bc.rho_wall * c) * syc)
                        solid_f = solid.astype(dtype)
                        for jv in range(len(bc.velocities)):
                            base_v = (1 - solid_f) * new[(bc.field, (jv,))]
                            for contrib in ybars.get(jv, ()):
                                base_v = base_v + contrib
                            new[(bc.field, (jv,))] = base_v
                    return new

                # ---- phase 2: reverse sweep over all stages ----
                cumF_lo_total = cumF_lo[-1]
                ck_rows = (LO + t + HI) - cumF[-1]
                cot = {key: jax.lax.slice_in_dim(
                    full[("c", key)], cumF_lo_total,
                    cumF_lo_total + ck_rows, axis=0) for key in state_keys}
                cl2 = cumF_lo_total  # low margin consumed (both phases)
                for i in range(n_stages - 1, -1, -1):
                    j = stage_j[i]
                    bwd, fwd = bwd_progs[j], fwd_progs[j]
                    ext_rows = ck_rows - (lob[j] + hib[j])
                    prim = saved[i]
                    prim_off = cl2 - cumF_lo_save[i]
                    row0_out = tile_i * t - LO + cl2 + lob[j]
                    env: Dict[object, jax.Array] = {}
                    shape_s = (ext_rows, cols)

                    latb_cache: Dict[tuple, jax.Array] = {}

                    # mask hoisting (same as plane_adjoint/adjoint_chain):
                    # base iotas once per reverse stage, masks memoised per
                    # (kind, offsets) — per-read iota + div/mod interior
                    # tests dominated phase-2 cost
                    if not periodic:
                        r_tgt_base = (jax.lax.broadcasted_iota(
                            jnp.int32, shape_s, 0) + row0_out)
                        c_base = jax.lax.broadcasted_iota(
                            jnp.int32, shape_s, 1)
                    mask_cache: Dict[tuple, jax.Array] = {}

                    def read_mask(offsets, kind, ghost_j):
                        mk = (kind,) + tuple(offsets)
                        m = mask_cache.get(mk)
                        if m is None:
                            rr = r_tgt_base + geom.row_off(offsets)
                            oc = offsets[-1]
                            cc = c_base + oc if oc else c_base
                            if kind == "adj":
                                m = (rr >= 0) & (rr < rows)
                                if shard is not None:
                                    m &= geom.interior_mask_global(
                                        rr, cc, ghost_j, base_vals,
                                        shard.global_spatial)
                                else:
                                    m &= geom.interior_mask(rr, cc, ghost_j)
                                xm = geom.crossing_mask(r_tgt_base, offsets)
                                if xm is not None:
                                    m &= xm
                            else:
                                m = geom.in_domain_mask(
                                    rr, cc,
                                    base_vals if shard is not None else None,
                                    shard.global_spatial
                                    if shard is not None else None)
                            mask_cache[mk] = m
                        return m

                    def readb(acc, _er=ext_rows, _prim=prim, _cot=cot,
                              _po=prim_off, _r0=row0_out, _j=j,
                              _c=latb_cache):
                        f = acc.field
                        if isinstance(f, AdjointField):
                            primal = f.corresponding_forward_field.name
                            carriers = feeds[_j].get(primal, [])
                            if not carriers:
                                return jnp.zeros((_er, cols), dtype)
                            ck = ("c", primal, acc.index, acc.offsets[-1])

                            def full_v(_cs=carriers, _ix=acc.index,
                                       _ct=_cot):
                                v_ = _ct[(_cs[0], _ix)]
                                for extra in _cs[1:]:
                                    v_ = v_ + _ct[(extra, _ix)]
                                return v_

                            v = lat_shifted_read(
                                _c, shared_bwd[_j], ck, full_v,
                                acc.offsets[-1],
                                lob[_j] + geom.row_off(acc.offsets), _er,
                                not periodic, interp, periodic)
                            if not periodic:
                                v = jnp.where(
                                    read_mask(acc.offsets, "adj", fwd.ghost),
                                    v, 0)
                            return v
                        ck = ("p", f.name, acc.index, acc.offsets[-1])
                        v = lat_shifted_read(
                            _c, shared_bwd[_j], ck,
                            _prim[(f.name, acc.index)], acc.offsets[-1],
                            _po + lob[_j] + geom.row_off(acc.offsets),
                            _er, False, interp, periodic)
                        if not periodic:
                            # sanitize OUT-OF-DOMAIN primal garbage to 1
                            # (FlatGeom.in_domain_mask docstring): global
                            # bounds when sharded — edge shards' outward
                            # halos are zero-filled and equally poisonous
                            v = jnp.where(
                                read_mask(acc.offsets, "prim", fwd.ghost),
                                v, 1)
                        return v

                    grads_stage: Dict[tuple, jax.Array] = {}
                    for st in bwd.steps:
                        vals = [readb(a) if isinstance(a, Field.Access)
                                else env[a] for a in st.atoms]
                        res = jnp.broadcast_to(
                            jnp.asarray(st.fn(*vals), dtype), shape_s)
                        if st.is_main:
                            grads_stage[(grad_ofs[j][st.target.field.name],
                                         st.target.index)] = res
                        else:
                            env[st.target] = res

                    new_cot = {}
                    for name, idx in state_keys:
                        v = grads_stage.get((name, idx))
                        for n in passes[j].get(name, ()):
                            pv = jax.lax.slice_in_dim(
                                cot[(n, idx)], lob[j], lob[j] + ext_rows,
                                axis=0)
                            v = pv if v is None else v + pv
                        if v is None:
                            v = jnp.zeros(shape_s, dtype)
                        new_cot[(name, idx)] = v
                    cot = new_cot
                    ck_rows = ext_rows
                    cl2 += lob[j]
                    # BC transposes in reverse event order, each consuming
                    # its MIRRORED reach
                    for p, (bc, (blo_b, bhi_b)) in reversed(
                            list(enumerate(zip(bcs.get(j, ()), bcF[j])))):
                        er_b = ck_rows - (bhi_b + blo_b)
                        cot = apply_bc_T(cot, bc, fwd.ghost, bhi_b, er_b,
                                         tile_i * t - LO + cl2 + bhi_b,
                                         cl2 + bhi_b,
                                         pre=bc_pre[i].get(p))
                        ck_rows = er_b
                        cl2 += bhi_b

                fin_off = LO - cumF_lo_total
                for jj, key in enumerate(state_keys):
                    outs[jj][...] = jax.lax.slice_in_dim(
                        cur[key], fin_off, fin_off + t, axis=0)
                for jj, key in enumerate(state_keys):
                    outs[len(state_keys) + jj][...] = cot[key]

            plane = pl.BlockSpec((t, cols), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)

            def strip_spec(shape):
                return pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)

            scalar_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)
                            for _ in scalar_ins]
            result = pl.pallas_call(
                kernel,
                grid=(nb,),
                out_shape=tuple(jax.ShapeDtypeStruct((rows_padded, cols),
                                                     dtype)
                                for _ in range(2 * len(state_keys))),
                in_specs=[plane] * n_in + [strip_spec(u.shape) for u in ups]
                + [strip_spec(d.shape) for d in downs] + scalar_specs,
                out_specs=tuple(plane for _ in range(2 * len(state_keys))),
                interpret=interp,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=scoped_vmem(vmem_limit_bytes)),
            )(*arrays, *ups, *downs, *scalar_ins)
            if pad_rows:
                result = [r[:rows] for r in result]

            def restack(planes_flat, base):
                out, pos = {}, base
                for n in state_names:
                    f = state_fields[n]
                    comps = field_components(f)
                    planes = [planes_flat[pos + jj]
                              for jj in range(len(comps))]
                    pos += len(comps)
                    out[n] = assemble_planes(f, planes, spatial)
                return out

            new_state = restack(result, 0)
            cot_out = restack(result, len(state_keys))
            return new_state, cot_out

        return fn

    cache = {}

    def chain_grad(state, cot_state, bases=None):
        f0 = state_fields[state_names[0]]
        arr0 = state[state_names[0]]
        spatial = storage_spatial(f0, arr0)
        key = (spatial, str(arr0.dtype))
        if key not in cache:
            interp = interpret if interpret is not None else not _on_tpu()
            cache[key] = build(spatial, arr0.dtype, interp)
        return cache[key](state, cot_state, bases)

    chain_grad.input_names = list(state_names)
    chain_grad.k = k
    return chain_grad
