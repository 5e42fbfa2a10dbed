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
                 periodic: bool = False, lowering: str = "jnp", **kwargs):
        self.op = op
        self.mesh = mesh
        self.dim_axes = dict(dim_axes)
        self.periodic = periodic
        self._local = op.jax_function(lowering=lowering, **kwargs)
        prog = forward_program(op)
        self.ghost = prog.ghost
        self.ndim = prog.ndim
        for d, ax in self.dim_axes.items():
            if ax not in mesh.axis_names:
                raise ValueError(f"axis {ax!r} not in mesh {mesh.axis_names}")
            if not (0 <= d < self.ndim):
                raise ValueError(f"dim {d} out of range for {self.ndim}D op")

    def partition_spec(self, field) -> PartitionSpec:
        entries = [self.dim_axes.get(d) for d in range(self.ndim)]
        entries += [None] * field.index_dimensions
        return PartitionSpec(*entries)

    def input_shardings(self):
        return {f.name: NamedSharding(self.mesh, self.partition_spec(f))
                for f in self.op.forward_input_fields}

    def __call__(self, *arrays, **kw_arrays):
        in_fields = self.op.forward_input_fields
        names = [f.name for f in in_fields]
        if kw_arrays:
            if arrays:
                raise TypeError("pass fields either positionally or by name, not both")
            arrays = tuple(kw_arrays[n] for n in names)
        out_fields = self.op.forward_output_fields
        global_spatial = tuple(arrays[0].shape[: self.ndim])

        def local_fn(*locals_):
            ext = [extend_with_halo(a, self.dim_axes, self.ghost, self.periodic)
                   for a in locals_]
            outs = self._local(*ext)
            if not isinstance(outs, tuple):
                outs = (outs,)
            res = []
            for f, o in zip(out_fields, outs):
                idx = [slice(None)] * o.ndim
                for d in self.dim_axes:
                    lo, hi = self.ghost[d]
                    idx[d] = slice(lo, o.shape[d] - hi)
                o = o[tuple(idx)]
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
        return result[0] if len(result) == 1 else result
