"""Sharded stencil execution: shard_map over a device mesh + halo exchange.

The TPU rebuild's first-class replacement for the reference's experimental
waLBerla/MPI app generation (SURVEY.md §2.1 #13–#15, §2.3): a global jax
array lives sharded over a ``jax.sharding.Mesh``; each step the sharded op

1. halo-extends every shard with neighbour edges (``lax.ppermute`` → ICI
   collective-permute; halo.py),
2. runs the single-device custom_vjp stencil kernel on the extended block
   (so the symbolic backward kernel is used per shard under ``jax.grad``),
3. slices back to the local block and masks global ghost cells.

The result is bit-identical to the single-device op on the gathered array,
and ``jax.grad`` through it performs the transposed halo exchange
automatically (reverse ppermute + edge accumulation) because every piece of
glue is linear and JAX-transposable (SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..autodiff import AutoDiffOp
from ..ops import forward_program
from .halo import extend_with_halo, mask_global_ghost

__all__ = ["ShardedStencil", "make_mesh", "shard_array"]


def make_mesh(shape: Sequence[int], axis_names: Sequence[str],
              devices=None) -> Mesh:
    """Build a Mesh from the first ``prod(shape)`` devices (row-major)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(tuple(shape)), tuple(axis_names))


def shard_array(arr: jax.Array, mesh: Mesh, spec: PartitionSpec) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, spec))


class ShardedStencil:
    """A domain-decomposed AutoDiffOp over a device mesh.

    Parameters
    ----------
    op: the AutoDiffOp.
    mesh: the device mesh.
    dim_axes: spatial dim → mesh axis name, e.g. ``{0: 'x', 1: 'y'}``.
    periodic: wrap halos around sharded dims (periodic domain).
    lowering/kwargs: forwarded to ``op.jax_function``.
    """

    def __init__(self, op: AutoDiffOp, mesh: Mesh, dim_axes: Dict[int, str],
                 periodic: bool = False, lowering: str = "jnp",
                 overlap: bool = False, mask_global_spatial=None, **kwargs):
        """``overlap=True`` splits each step into a bulk computation that
        does not depend on the halo exchange (XLA's latency-hiding
        scheduler runs it concurrently with the ICI collective-permute) and
        thin edge-strip computations that do — hiding communication latency
        behind the bulk compute (the stencil analog of comm/compute
        overlap in ring collectives, SURVEY.md §5.7)."""
        self.op = op
        self.mesh = mesh
        self.dim_axes = dict(dim_axes)
        self.periodic = periodic
        self.overlap = overlap
        # masks test these extents instead of the array-derived global
        # shape — set when the caller pre-padded an uneven domain and the
        # true ghost frame sits inside the padded arrays (ShardedChain's
        # sequential backward recompute on padded state)
        self._mask_global = (tuple(mask_global_spatial)
                             if mask_global_spatial is not None else None)
        self._local = op.jax_function(lowering=lowering, **kwargs)
        prog = forward_program(op)
        self.ghost = prog.ghost
        self.ndim = prog.ndim
        for d, ax in self.dim_axes.items():
            if ax not in mesh.axis_names:
                raise ValueError(f"axis {ax!r} not in mesh {mesh.axis_names}")
            if not (0 <= d < self.ndim):
                raise ValueError(f"dim {d} out of range for {self.ndim}D op")
        # unsharded dims of a globally periodic domain wrap LOCALLY (the
        # whole dim lives on every shard); sharded dims wrap via ppermute
        self._local_wrap_dims = [
            d for d in range(self.ndim)
            if periodic and d not in self.dim_axes
            and (self.ghost[d][0] or self.ghost[d][1])]
        if self._local_wrap_dims and overlap:
            raise NotImplementedError(
                "overlap mode with periodic wrap in an unsharded dim is not "
                "supported; shard that dim (a size-1 mesh axis works) or "
                "disable overlap")

    def partition_spec(self, field) -> PartitionSpec:
        entries = [self.dim_axes.get(d) for d in range(self.ndim)]
        entries += [None] * field.index_dimensions
        return PartitionSpec(*entries)

    def input_shardings(self):
        return {f.name: NamedSharding(self.mesh, self.partition_spec(f))
                for f in self.op.forward_input_fields}

    def _pad_uneven(self, arrays, global_spatial):
        """Pad global arrays so every sharded dim divides its mesh axis
        (shard_map's layout requirement).  Pads are edge copies (finite
        under nonlinear kernels), land entirely in the last shard, are
        never read by true-interior cells (interior reads stay within the
        true extents), and are zeroed by the global-ghost mask testing the
        TRUE extents — so results and gradients are bit-exact vs the
        single-device op (VERDICT round-3 missing #5; the waLBerla
        reference's block forests handle ragged domains natively,
        SURVEY.md §2.3)."""
        pads = {}
        for d, ax in self.dim_axes.items():
            nsh = self.mesh.shape[ax]
            rem = global_spatial[d] % nsh
            if rem:
                pads[d] = nsh - rem
        if not pads:
            return arrays, None
        if self.periodic:
            raise ValueError(
                f"periodic sharded dims must divide the mesh evenly "
                f"(global {global_spatial}, mesh "
                f"{dict(self.mesh.shape)}): pad-and-mask would break the "
                f"wrap seam — resize the domain or the mesh")
        padded = []
        for a in arrays:
            width = [(0, pads.get(d, 0)) if d < self.ndim else (0, 0)
                     for d in range(a.ndim)]
            padded.append(jnp.pad(a, width, mode="edge"))
        return tuple(padded), pads

    def __call__(self, *arrays, **kw_arrays):
        in_fields = self.op.forward_input_fields
        names = [f.name for f in in_fields]
        if kw_arrays:
            if arrays:
                raise TypeError("pass fields either positionally or by name, not both")
            arrays = tuple(kw_arrays[n] for n in names)
        out_fields = self.op.forward_output_fields
        true_spatial = tuple(arrays[0].shape[: self.ndim])
        arrays, pads = self._pad_uneven(arrays, true_spatial)
        # ghost masks always test the TRUE extents (pad cells count as
        # global ghost and are zeroed)
        global_spatial = self._mask_global or true_spatial

        def slice_back(o):
            idx = [slice(None)] * o.ndim
            for d in self.dim_axes:
                lo, hi = self.ghost[d]
                idx[d] = slice(lo, o.shape[d] - hi)
            for d in self._local_wrap_dims:
                lo, hi = self.ghost[d]
                idx[d] = slice(lo, o.shape[d] - hi)
            return o[tuple(idx)]

        def wrap_extend(a):
            for d in self._local_wrap_dims:
                lo, hi = self.ghost[d]
                parts = []
                if lo:
                    parts.append(jax.lax.slice_in_dim(
                        a, a.shape[d] - lo, a.shape[d], axis=d))
                parts.append(a)
                if hi:
                    parts.append(jax.lax.slice_in_dim(a, 0, hi, axis=d))
                if len(parts) > 1:
                    a = jnp.concatenate(parts, axis=d)
            return a

        def local_fn(*locals_):
            ext = [wrap_extend(
                extend_with_halo(a, self.dim_axes, self.ghost, self.periodic))
                   for a in locals_]
            if self.overlap:
                # bulk result from the raw local block — independent of the
                # halo exchange, so XLA overlaps it with the ppermutes;
                # shard-edge bands are then recomputed from thin ext strips
                bulk = self._local(*locals_)
                bulk = bulk if isinstance(bulk, tuple) else (bulk,)
                outs = list(bulk)
                for d in self.dim_axes:
                    lo, hi = self.ghost[d]
                    for side, width in ((0, lo), (1, hi)):
                        if not width:
                            continue
                        strip_idx = [slice(None)] * ext[0].ndim
                        # strip of ext covering the edge band + its reach
                        if side == 0:
                            strip_idx[d] = slice(0, 2 * lo + hi)
                        else:
                            e = ext[0].shape[d]
                            strip_idx[d] = slice(e - (lo + 2 * hi), e)
                        strips = [a[tuple(strip_idx)] for a in ext]
                        s_outs = self._local(*strips)
                        s_outs = (s_outs if isinstance(s_outs, tuple)
                                  else (s_outs,))
                        for k, (f, so) in enumerate(zip(out_fields, s_outs)):
                            band = [slice(None)] * so.ndim
                            band[d] = (slice(lo, 2 * lo) if side == 0
                                       else slice(so.shape[d] - 2 * hi,
                                                  so.shape[d] - hi))
                            tgt = [slice(None)] * outs[k].ndim
                            tgt[d] = (slice(0, lo) if side == 0
                                      else slice(outs[k].shape[d] - hi,
                                                 outs[k].shape[d]))
                            # the strip spans the ext extent in other
                            # sharded dims; trim to the local extent
                            for d2 in self.dim_axes:
                                if d2 == d:
                                    continue
                                lo2, hi2 = self.ghost[d2]
                                band[d2] = slice(lo2, so.shape[d2] - hi2)
                            outs[k] = outs[k].at[tuple(tgt)].set(
                                so[tuple(band)])
                outs = tuple(outs)
            else:
                outs = self._local(*ext)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                outs = tuple(slice_back(o) for o in outs)
            res = []
            for f, o in zip(out_fields, outs):
                o = mask_global_ghost(o, self.dim_axes, self.ghost,
                                      global_spatial, f.index_dimensions,
                                      self.periodic)
                res.append(o)
            return tuple(res)

        in_specs = tuple(self.partition_spec(f) for f in in_fields)
        out_specs = tuple(self.partition_spec(f) for f in out_fields)
        # check_vma=False: pallas_call out_shapes don't carry vma metadata
        result = jax.shard_map(local_fn, mesh=self.mesh,
                               in_specs=in_specs, out_specs=out_specs,
                               check_vma=False)(*arrays)
        if pads:
            result = tuple(
                o[tuple(slice(0, true_spatial[d]) if d in pads
                        else slice(None) for d in range(o.ndim))]
                for o in result)
        return result[0] if len(result) == 1 else result
