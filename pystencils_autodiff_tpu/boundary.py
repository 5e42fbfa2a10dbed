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


_BC_FNS = {"dirichlet": dirichlet, "neumann": neumann, "periodic": periodic}


class BoundaryHandling:
    """Per-field boundary conditions applied before a stencil step.

    Parity with pystencils ``BoundaryHandling`` at the capability level
    (SURVEY.md §1 L1): specify a BC per field (and optionally per dim);
    call the instance on a state dict to get BC-applied arrays.

    Example::

        bh = BoundaryHandling(op, {"u": "neumann", "p": ("dirichlet", 0.0)})
        state = bh(state)
    """

    def __init__(self, op_or_ghost, specs: Dict[str, Union[str, tuple]]):
        if hasattr(op_or_ghost, "forward_assignments"):
            coll = AssignmentCollection.normalize(op_or_ghost.forward_assignments)
            self.ghost = coll.ghost_layers()
        else:
            self.ghost = tuple(op_or_ghost)
        self.specs = {}
        for name, spec in specs.items():
            if isinstance(spec, str):
                kind, args = spec, ()
            else:
                kind, *args = spec
            if kind not in _BC_FNS:
                raise ValueError(f"unknown BC {kind!r}; have {sorted(_BC_FNS)}")
            self.specs[name] = (kind, tuple(args))

    def apply(self, name: str, arr: jax.Array) -> jax.Array:
        if name not in self.specs:
            return arr
        kind, args = self.specs[name]
        return _BC_FNS[kind](arr, self.ghost, *args)

    def __call__(self, state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        return {name: self.apply(name, arr) for name, arr in state.items()}
