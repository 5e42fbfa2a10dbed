"""Field-array management: allocation, ghost layers, (sharded) storage.

Capability parity with the pystencils ``DataHandling`` the reference builds
on and records (SURVEY.md §2.1 #14): create arrays for symbolic fields,
carry ghost-layer conventions, and place them on a device mesh — in
functional JAX style (a dict-of-arrays state pytree rather than mutable
storage).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .field import Field

__all__ = ["DataHandling"]


class DataHandling:
    """Allocate and track arrays for a set of symbolic fields.

    Parameters
    ----------
    domain_size:
        Interior spatial shape (without ghost frame).
    ghost_layers:
        (lo, hi) per dim or a single int applied symmetrically.
    mesh / dim_axes:
        Optional device mesh + spatial-dim→axis mapping; arrays are
        placed with the matching NamedSharding.
    """

    def __init__(self, domain_size: Sequence[int],
                 ghost_layers=1,
                 default_dtype=jnp.float32,
                 mesh=None, dim_axes: Optional[Dict[int, str]] = None):
        self.domain_size = tuple(int(s) for s in domain_size)
        nd = len(self.domain_size)
        if isinstance(ghost_layers, int):
            self.ghost = tuple((ghost_layers, ghost_layers) for _ in range(nd))
        else:
            self.ghost = tuple((int(a), int(b)) for a, b in ghost_layers)
        self.default_dtype = default_dtype
        self.mesh = mesh
        self.dim_axes = dict(dim_axes or {})
        self.fields: Dict[str, Field] = {}
        self.arrays: Dict[str, jax.Array] = {}

    @property
    def shape_with_ghost(self) -> Tuple[int, ...]:
        return tuple(s + lo + hi
                     for s, (lo, hi) in zip(self.domain_size, self.ghost))

    def add_field(self, name: str, index_shape: Tuple[int, ...] = (),
                  dtype=None, init=0.0, origin=None) -> Field:
        """Register a field and allocate its array (ghost frame included)."""
        dtype = dtype or self.default_dtype
        f = Field(name, len(self.domain_size), index_shape=index_shape,
                  dtype=np.dtype(jnp.dtype(dtype).name), origin=origin)
        self.fields[name] = f
        shape = self.shape_with_ghost + tuple(index_shape)
        arr = jnp.full(shape, init, dtype)
        self.arrays[name] = self._place(arr, f)
        return f

    def add_arrays(self, spec: str, dtype=None) -> Tuple[Field, ...]:
        """``dh.add_arrays('u, v(2)')`` — parity with pystencils helper."""
        from .field import fields as _fields

        fs = _fields(spec, len(self.domain_size))
        fs = fs if isinstance(fs, tuple) else (fs,)
        out = []
        for f in fs:
            out.append(self.add_field(f.name, f.index_shape, dtype=dtype))
        return tuple(out) if len(out) > 1 else out[0]

    def _place(self, arr: jax.Array, f: Field) -> jax.Array:
        if self.mesh is None or not self.dim_axes:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec

        for d, ax in self.dim_axes.items():
            n = self.mesh.shape[ax]
            if arr.shape[d] % n:
                lo, hi = self.ghost[d]
                raise ValueError(
                    f"dim {d}: global extent {arr.shape[d]} (interior "
                    f"{self.domain_size[d]} + ghost {lo}+{hi}) must divide the "
                    f"{n}-way mesh axis {ax!r}; choose a domain size with "
                    f"interior + ghost ≡ 0 (mod {n})")
        entries = [self.dim_axes.get(d) for d in range(len(self.domain_size))]
        entries += [None] * f.index_dimensions
        return jax.device_put(arr, NamedSharding(self.mesh, PartitionSpec(*entries)))

    def set_array(self, name: str, value) -> None:
        f = self.fields[name]
        arr = jnp.asarray(value, self.arrays[name].dtype)
        if arr.shape != self.arrays[name].shape:
            raise ValueError(f"{name}: expected shape {self.arrays[name].shape}, "
                             f"got {arr.shape}")
        self.arrays[name] = self._place(arr, f)

    def fill_interior(self, name: str, value) -> None:
        sl = tuple(slice(lo, s - hi) for (lo, hi), s
                   in zip(self.ghost, self.shape_with_ghost))
        self.arrays[name] = self.arrays[name].at[sl].set(value)

    def interior(self, name: str) -> jax.Array:
        sl = tuple(slice(lo, s - hi) for (lo, hi), s
                   in zip(self.ghost, self.shape_with_ghost))
        return self.arrays[name][sl]

    def state(self) -> Dict[str, jax.Array]:
        """The state pytree passed into time loops."""
        return dict(self.arrays)

    def update(self, new_state: Dict[str, jax.Array]) -> None:
        for k, v in new_state.items():
            if k in self.arrays:
                self.arrays[k] = v

    def __getitem__(self, name: str) -> jax.Array:
        return self.arrays[name]

    def __repr__(self):
        inner = ", ".join(f"{n}{list(self.arrays[n].shape)}" for n in self.arrays)
        return f"DataHandling(domain={self.domain_size}, ghost={self.ghost}, fields=[{inner}])"
