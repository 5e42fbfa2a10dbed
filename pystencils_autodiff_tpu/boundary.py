"""Ghost-layer boundary handling and its adjoints.

The reference delegates boundary conditions to pystencils'
``BoundaryHandling`` (flagged cells + generated BC kernels; SURVEY.md §1 L1).
The TPU-native equivalent fills ghost frames with pure jnp slice/where ops —
fully differentiable (JAX transposes the fills, so the adjoint "accumulate
ghost gradients into edge cells" of e.g. Neumann BCs comes out exactly),
jit/shard_map-compatible, and fused by XLA into neighbouring kernels.

Conventions match the kernel semantics (ops/common.py): arrays carry their
ghost frame; a BC writes the frame, the stencil writes the interior.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .assignment import AssignmentCollection

__all__ = [
    "dirichlet",
    "neumann",
    "periodic",
    "masked_dirichlet",
    "masked_neumann",
    "bounce_back",
    "sponge",
    "cerjan_damping",
    "BoundaryHandling",
]

GhostSpec = Sequence[Tuple[int, int]]


def _frame_indices(ndim: int, dim: int, side: int, width: int, extent: int):
    idx = [slice(None)] * ndim
    idx[dim] = slice(0, width) if side == 0 else slice(extent - width, extent)
    return tuple(idx)


def dirichlet(arr: jax.Array, ghost: GhostSpec, value=0.0,
              dims: Optional[Sequence[int]] = None) -> jax.Array:
    """Set the ghost frame to ``value`` (constant Dirichlet data)."""
    nd = len(ghost)
    out = arr
    for d in (dims if dims is not None else range(nd)):
        lo, hi = ghost[d]
        if lo:
            out = out.at[_frame_indices(arr.ndim, d, 0, lo, arr.shape[d])].set(value)
        if hi:
            out = out.at[_frame_indices(arr.ndim, d, 1, hi, arr.shape[d])].set(value)
    return out


def neumann(arr: jax.Array, ghost: GhostSpec,
            dims: Optional[Sequence[int]] = None) -> jax.Array:
    """Zero-gradient BC: mirror the first interior cell into the ghost frame."""
    nd = len(ghost)
    out = arr
    for d in (dims if dims is not None else range(nd)):
        lo, hi = ghost[d]
        e = arr.shape[d]
        if lo:
            idx = [slice(None)] * arr.ndim
            idx[d] = slice(lo, lo + 1)
            edge = out[tuple(idx)]
            out = out.at[_frame_indices(arr.ndim, d, 0, lo, e)].set(
                jnp.broadcast_to(edge, out[_frame_indices(arr.ndim, d, 0, lo, e)].shape))
        if hi:
            idx = [slice(None)] * arr.ndim
            idx[d] = slice(e - hi - 1, e - hi)
            edge = out[tuple(idx)]
            out = out.at[_frame_indices(arr.ndim, d, 1, hi, e)].set(
                jnp.broadcast_to(edge, out[_frame_indices(arr.ndim, d, 1, hi, e)].shape))
    return out


def periodic(arr: jax.Array, ghost: GhostSpec,
             dims: Optional[Sequence[int]] = None) -> jax.Array:
    """Wrap-around BC: ghost cells copy the opposite interior edge."""
    nd = len(ghost)
    out = arr
    for d in (dims if dims is not None else range(nd)):
        lo, hi = ghost[d]
        e = arr.shape[d]
        if lo:
            idx = [slice(None)] * arr.ndim
            idx[d] = slice(e - hi - lo, e - hi)
            out = out.at[_frame_indices(arr.ndim, d, 0, lo, e)].set(out[tuple(idx)])
        if hi:
            idx = [slice(None)] * arr.ndim
            idx[d] = slice(lo, lo + hi)
            out = out.at[_frame_indices(arr.ndim, d, 1, hi, e)].set(out[tuple(idx)])
    return out


# ---------------------------------------------------------------------------
# Flagged-cell (masked) boundary conditions — the TPU-native analog of
# pystencils' BoundaryHandling with boundary objects over flag arrays
# (SURVEY.md §1 L1): obstacles of arbitrary shape inside the domain, not
# just the ghost frame.  All fns are pure jnp (differentiable, jit/shard
# compatible); masks are static-shaped boolean arrays over the spatial grid.


def _expand_mask(mask: jax.Array, arr: jax.Array) -> jax.Array:
    """Broadcast a spatial mask over trailing index dimensions of ``arr``."""
    if arr.ndim > mask.ndim:
        return mask.reshape(mask.shape + (1,) * (arr.ndim - mask.ndim))
    return mask


def masked_dirichlet(arr: jax.Array, mask, value=0.0) -> jax.Array:
    """Flagged-cell Dirichlet: set ``arr`` to ``value`` wherever ``mask``.

    ``value`` may be a scalar or an array broadcastable to ``arr``; the
    adjoint (via JAX) zeroes cotangents inside the mask and, when ``value``
    is a traced array, routes them to it — no custom rule needed.
    """
    mask = _expand_mask(jnp.asarray(mask, bool), arr)
    return jnp.where(mask, jnp.asarray(value, arr.dtype), arr)


def masked_neumann(arr: jax.Array, mask) -> jax.Array:
    """Flagged cells take the mean of their un-flagged face neighbours
    (zero normal gradient into the obstacle); cells with no fluid
    neighbour (obstacle interior) are set to 0.

    Neighbour gathering shifts do not wrap: contributions that would cross
    the domain edge are dropped, so border-touching masks stay local (use
    the frame BCs for true domain borders).
    """
    mask = jnp.asarray(mask, bool)
    nd = mask.ndim
    fluid = (~mask).astype(arr.dtype)
    num = jnp.zeros_like(arr)
    cnt = jnp.zeros(mask.shape, arr.dtype)

    def shift_nowrap(x, s, d):
        y = jnp.roll(x, -s, axis=d)
        idx = [slice(None)] * x.ndim
        idx[d] = slice(-s, None) if s > 0 else slice(0, -s)
        return y.at[tuple(idx)].set(0)

    for d in range(nd):
        for s in (-1, 1):
            nbr_fluid = shift_nowrap(fluid, s, d)
            nbr_val = shift_nowrap(arr * _expand_mask(fluid, arr), s, d)
            num = num + nbr_val * _expand_mask(nbr_fluid, arr)
            cnt = cnt + nbr_fluid
    filled = num / _expand_mask(jnp.maximum(cnt, 1), arr)
    return jnp.where(_expand_mask(mask, arr), filled, arr)


def bounce_back(f: jax.Array, solid, u_wall=None, rho_wall: float = 1.0,
                velocities=None, weights=None, wrap: bool = False) -> jax.Array:
    """Half-way bounce-back (no-slip / moving wall) ghost-population
    preparation for pull-scheme LBM steps (models.lbm.d2q9_bgk_op).

    Writes, into every flagged (solid) cell ``s``, the population a
    neighbouring fluid cell will pull on the next streaming step::

        f_j(s) = f_jbar(s + c_j) + 6 w_j rho_wall (c_j . u_wall)

    i.e. the population that left the fluid towards the wall comes back
    reversed, plus the Ladd moving-wall momentum term (c_s^2 = 1/3).
    Apply between steps (before each fused stream+collide); fluid cells
    pass through unchanged.  Fully differentiable — the adjoint reverses
    the copies and accumulates wall-velocity gradients, so
    ``jax.grad(loss)(u_lid)`` works out of the box.

    ``u_wall``: None (no-slip) or a tuple of per-axis wall velocities
    (scalars or spatial arrays — e.g. the lid row carrying ``u_lid``).
    ``velocities``/``weights`` default to the D2Q9 set.

    Out-of-domain pulls (a frame solid cell whose neighbour ``s + c_j``
    lies outside the grid) read the edge-clamped value by default — no
    fluid exists beyond the frame, so the choice is physically irrelevant,
    and clamping is what the fused chain kernels reproduce exactly.  Pass
    ``wrap=True`` on genuinely periodic domains.
    """
    if velocities is None:
        from .models.lbm import D2Q9_VELOCITIES, D2Q9_WEIGHTS
        velocities = D2Q9_VELOCITIES
        if weights is None:
            weights = [float(w) for w in D2Q9_WEIGHTS]
    elif weights is None and u_wall is not None:
        raise ValueError(
            "bounce_back: a moving wall (u_wall) with a custom velocity set "
            "needs the matching lattice weights — pass weights= (the Ladd "
            "momentum term is 6 w_j rho (c_j . u_wall))")
    velocities = [tuple(int(c) for c in v) for v in velocities]
    opposite = [velocities.index(tuple(-c for c in v)) for v in velocities]
    solid = jnp.asarray(solid, bool)
    nd = solid.ndim
    if f.ndim != nd + 1 or f.shape[-1] != len(velocities):
        raise ValueError(
            f"f must be spatial+({len(velocities)},) for this velocity set; "
            f"got {f.shape} with {nd}-D mask")
    if u_wall is not None:
        u_wall = tuple(jnp.asarray(u, f.dtype) for u in u_wall)
        if len(u_wall) != nd:
            raise ValueError(f"u_wall needs {nd} components, got {len(u_wall)}")

    def shift_clamped(x, shifts):
        y = jnp.roll(x, shifts, axis=tuple(range(nd)))
        if wrap:
            return y
        for d, s in enumerate(shifts):
            if not s:
                continue
            # overwrite the wrapped rows with the edge value (clamp)
            idx = [slice(None)] * x.ndim
            edge_idx = [slice(None)] * x.ndim
            if s > 0:  # rolled forward: first s rows wrapped from the end
                idx[d] = slice(0, s)
                edge_idx[d] = slice(s, s + 1)
            else:
                idx[d] = slice(x.shape[d] + s, x.shape[d])
                edge_idx[d] = slice(x.shape[d] + s - 1, x.shape[d] + s)
            y = y.at[tuple(idx)].set(
                jnp.broadcast_to(y[tuple(edge_idx)], y[tuple(idx)].shape))
        return y

    comps = []
    for j, cj in enumerate(velocities):
        ghost = shift_clamped(f[..., opposite[j]],
                              tuple(-c for c in cj))
        if u_wall is not None and any(cj):
            cu = sum((c * u for c, u in zip(cj, u_wall) if c),
                     jnp.asarray(0.0, f.dtype))
            ghost = ghost + (6.0 * float(weights[j]) * rho_wall) * cu
        comps.append(jnp.where(solid, ghost, f[..., j]))
    return jnp.stack(comps, -1)


def sponge(arr: jax.Array, damp) -> jax.Array:
    """Absorbing-layer (Cerjan/sponge) damping: multiply by a profile.

    ``damp`` is a spatial array (build one with :func:`cerjan_damping`) or
    a scalar; interior cells carry 1.0 and the absorbing frame decays
    towards the boundary, so each application attenuates outgoing waves a
    little more per layer cell — the standard cheap non-reflecting
    boundary for time-stepped wave/FWI workloads (reference analog:
    user-side damping sweeps around pystencils time loops; SURVEY.md §5.4).

    Diagonal-linear in ``arr``, so the adjoint is the same multiply on the
    cotangent; when ``damp`` is a traced array its gradient (``arr * ĉ``)
    flows automatically.  Index (component) dimensions of ``arr`` follow
    the trailing-axis convention of the other masked BCs.
    """
    damp = jnp.asarray(damp, arr.dtype)
    if damp.ndim and arr.ndim > damp.ndim:
        damp = damp.reshape(damp.shape + (1,) * (arr.ndim - damp.ndim))
    return arr * damp


def cerjan_damping(shape: Sequence[int], width: int, alpha: float = 0.0053,
                   dims: Optional[Sequence[int]] = None,
                   free: Sequence[Tuple[int, int]] = (),
                   dtype=jnp.float32) -> jax.Array:
    """Cerjan et al. (1985) absorbing-layer profile for :func:`sponge`.

    ``G(i) = exp(-(alpha * (width - i))^2)`` for cells ``i < width`` from
    a boundary, 1 in the interior; per-dim factors multiply, so corners
    damp with the product.  ``free`` lists ``(dim, side)`` pairs to leave
    undamped (e.g. ``[(0, 0)]`` keeps a free surface at the top in FWI).
    The default ``alpha`` gives ~1%% amplitude reduction per pass at the
    outermost of 20 layers — tune ``width``/``alpha`` per workload.
    """
    import numpy as np

    nd = len(shape)
    free = {(int(d), int(s)) for d, s in free}
    damp = np.ones(tuple(shape), np.float64)
    for d in (dims if dims is not None else range(nd)):
        n = int(shape[d])
        idx = np.arange(n)
        g = np.ones(n, np.float64)
        for side in (0, 1):
            if (d, side) in free:
                continue
            dist = idx if side == 0 else (n - 1 - idx)
            g = g * np.where(dist < width,
                             np.exp(-(alpha * (width - dist)) ** 2), 1.0)
        damp = damp * g.reshape([n if dd == d else 1 for dd in range(nd)])
    return jnp.asarray(damp, dtype)


_BC_FNS = {"dirichlet": dirichlet, "neumann": neumann, "periodic": periodic}
# masked BCs take (arr, *args) — no ghost-frame spec
_MASKED_BC_FNS = {"masked_dirichlet": masked_dirichlet,
                  "masked_neumann": masked_neumann,
                  "bounce_back": bounce_back,
                  "sponge": sponge}


class BoundaryHandling:
    """Per-field boundary conditions applied before a stencil step.

    Parity with pystencils ``BoundaryHandling`` at the capability level
    (SURVEY.md §1 L1): specify a BC per field (and optionally per dim);
    call the instance on a state dict to get BC-applied arrays.

    Frame BCs take the ghost spec implicitly; masked (flagged-cell) BCs
    take their mask (and further args) in the spec tuple.

    Example::

        bh = BoundaryHandling(op, {"u": "neumann", "p": ("dirichlet", 0.0)})
        bh = BoundaryHandling(op, {"f": ("bounce_back", solid, (u_lid, 0.0))})
        state = bh(state)

    A spec may also be a *list* of specs applied in order (e.g. a frame
    fill followed by obstacle bounce-back), and its last element may be a
    dict of keyword arguments for the BC function — e.g. periodic-domain
    bounce-back, whose out-of-domain pulls must wrap across the seam::

        bh = BoundaryHandling(op, {"f": ("bounce_back", solid,
                                         {"wrap": True})})
    """

    def __init__(self, op_or_ghost, specs: Dict[str, Union[str, tuple, list]]):
        if hasattr(op_or_ghost, "forward_assignments"):
            coll = AssignmentCollection.normalize(op_or_ghost.forward_assignments)
            self.ghost = coll.ghost_layers()
        else:
            self.ghost = tuple(op_or_ghost)
        self.specs = {}
        for name, spec in specs.items():
            chain = spec if isinstance(spec, list) else [spec]
            parsed = []
            for s in chain:
                if isinstance(s, str):
                    kind, args = s, ()
                else:
                    kind, *args = s
                if kind not in _BC_FNS and kind not in _MASKED_BC_FNS:
                    raise ValueError(f"unknown BC {kind!r}; have "
                                     f"{sorted(_BC_FNS) + sorted(_MASKED_BC_FNS)}")
                kwargs = {}
                if args and isinstance(args[-1], dict):
                    kwargs = dict(args[-1])  # snapshot: no caller aliasing
                    args = args[:-1]
                parsed.append((kind, tuple(args), kwargs))
            self.specs[name] = parsed

    def apply(self, name: str, arr: jax.Array) -> jax.Array:
        for kind, args, kwargs in self.specs.get(name, ()):
            if kind in _MASKED_BC_FNS:
                arr = _MASKED_BC_FNS[kind](arr, *args, **kwargs)
            else:
                arr = _BC_FNS[kind](arr, self.ghost, *args, **kwargs)
        return arr

    def __call__(self, state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {name: self.apply(name, arr) for name, arr in state.items()}
