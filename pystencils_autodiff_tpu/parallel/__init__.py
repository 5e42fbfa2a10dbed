"""Multi-chip domain decomposition: mesh sharding + ICI halo exchange.

Replaces the reference's generated waLBerla/MPI apps (SURVEY.md §2.3) with
``shard_map`` + ``lax.ppermute`` — the idiomatic TPU path.
"""

from .chain import ShardedChain
from .halo import exchange_dim, extend_with_halo, mask_global_ghost
from .sharding import ShardedStencil, make_mesh, shard_array

__all__ = [
    "exchange_dim",
    "extend_with_halo",
    "mask_global_ghost",
    "ShardedChain",
    "ShardedStencil",
    "make_mesh",
    "shard_array",
]
