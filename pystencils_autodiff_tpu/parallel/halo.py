"""Halo (ghost-layer) exchange over a TPU mesh via collective-permute.

The TPU-native replacement for the reference's delegated waLBerla/MPI domain
decomposition (SURVEY.md §2.3 "Domain decomposition" row, §5.7/§5.8): inside
``shard_map``, each shard extends its local block with neighbour edge slices
transported by ``jax.lax.ppermute`` — which XLA compiles to ICI
collective-permute (DCN across slices transparently).

Everything here is differentiable by construction: the transpose of
``ppermute`` is the reversed permutation and the transpose of
concatenate-then-stencil is the edge-accumulating reverse exchange, so
``jax.grad`` of a sharded stencil derives exactly the "transposed exchange"
the adjoint needs (SURVEY.md §7 hard-part #5) while the stencil core itself
still uses our symbolic custom_vjp backward kernel.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["exchange_dim", "extend_with_halo", "mask_global_ghost"]


def _shift_perm(n: int, direction: int, periodic: bool):
    """(src, dst) pairs sending data ``direction`` (+1 = to higher index)."""
    pairs = []
    for i in range(n):
        j = i + direction
        if 0 <= j < n:
            pairs.append((i, j))
        elif periodic:
            pairs.append((i, j % n))
    return pairs


def exchange_dim(local: jax.Array, dim: int, axis_name: str,
                 lo: int, hi: int, periodic: bool = False) -> jax.Array:
    """Extend ``local`` along ``dim`` with neighbour halos of width (lo, hi).

    Returns an array with ``lo + L + hi`` extent in ``dim``: received left
    halo rows, the local block, received right halo rows.  Edge shards (non-
    periodic) receive zeros — callers mask global ghost cells anyway
    (ppermute's "no source → zeros" semantics matches that).
    """
    n = lax.axis_size(axis_name)
    parts = []
    if lo:
        # my left halo = left neighbour's last `lo` interior rows
        src = _take(local, dim, local.shape[dim] - lo, lo)
        recv = _route(src, axis_name, n, +1, periodic)
        parts.append(recv)
    parts.append(local)
    if hi:
        src = _take(local, dim, 0, hi)
        recv = _route(src, axis_name, n, -1, periodic)
        parts.append(recv)
    if len(parts) == 1:
        return local
    return jnp.concatenate(parts, axis=dim)


def _route(src: jax.Array, axis_name: str, n: int, direction: int,
           periodic: bool) -> jax.Array:
    """Transport an edge slice one mesh step; on a size-1 axis the
    collective is elided (periodic wrap = the shard's own opposite edge,
    non-periodic = zeros, matching ppermute's no-source semantics) —
    part of shaving the trivial-mesh plumbing cost (VERDICT r4 next #7)."""
    if n == 1:
        return src if periodic else jnp.zeros_like(src)
    return lax.ppermute(src, axis_name, _shift_perm(n, direction, periodic))


def _take(arr: jax.Array, dim: int, start: int, size: int) -> jax.Array:
    idx = [slice(None)] * arr.ndim
    idx[dim] = slice(start, start + size)
    return arr[tuple(idx)]


def extend_with_halo(local: jax.Array, dim_axes: Dict[int, str],
                     ghost: Sequence[Tuple[int, int]],
                     periodic: bool = False) -> jax.Array:
    """Halo-extend every mesh-sharded spatial dim (in ascending dim order so
    corner/edge halos of multi-dim decompositions are exchanged correctly:
    later dims transport the earlier dims' halo rows along with them)."""
    out = local
    for d in sorted(dim_axes):
        lo, hi = ghost[d]
        if lo or hi:
            out = exchange_dim(out, d, dim_axes[d], lo, hi, periodic)
    return out


def mask_global_ghost(local_out: jax.Array, dim_axes: Dict[int, str],
                      ghost: Sequence[Tuple[int, int]],
                      global_shape: Sequence[int],
                      index_dims: int = 0,
                      periodic: bool = False) -> jax.Array:
    """Zero cells whose *global* coordinate lies in the ghost frame of a
    mesh-sharded dim (the local kernel can't see shard position).  Non-ghost
    dims were already handled inside the kernel.  Periodic domains have no
    global ghost frame."""
    if periodic:
        return local_out
    out = local_out
    nd = local_out.ndim - index_dims
    for d, ax in dim_axes.items():
        lo, hi = ghost[d]
        if not (lo or hi):
            continue
        n = lax.axis_size(ax)
        size_local = local_out.shape[d]
        base = lax.axis_index(ax) * size_local
        ids = jax.lax.broadcasted_iota(
            jnp.int32, local_out.shape[:nd], d) + base
        mask = (ids >= lo) & (ids < global_shape[d] - hi)
        if index_dims:
            mask = jnp.expand_dims(mask, tuple(range(nd, nd + index_dims)))
        out = jnp.where(mask, out, 0)
    return out
