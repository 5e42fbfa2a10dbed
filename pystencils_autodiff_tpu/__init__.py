"""pystencils_autodiff_tpu — a TPU-native differentiable stencil framework.

A from-scratch rebuild of the capabilities of
`theHamsta/pystencils_autodiff` (see SURVEY.md): symbolic stencil
assignments over field accesses, symbolic reverse-mode adjoint derivation
(`create_backward_assignments`), and lowering of both forward and adjoint
stencils — here to jax.numpy / Pallas TPU kernels registered through
``jax.custom_vjp`` (instead of generated C/CUDA wrapped as torch/TF custom
ops), with multi-chip domain decomposition via ``shard_map`` + ICI
collective-permute halo exchange (instead of generated waLBerla/MPI apps).

Public API surface mirrors the reference's ``__init__`` re-exports
(SURVEY.md §2.1 #1).
"""

from .adjoint_field import AdjointField
from .assignment import Assignment, AssignmentCollection
from .autodiff import (
    AutoDiffKernelPair,
    AutoDiffOp,
    DiffModes,
    create_backward_assignments,
    get_jacobian_of_assignments,
)
from .compose import compose_ops, fuse_sweeps
from .field import Field, FieldType, fields
from .field_tensor_conversion import (
    ArrayWrapper,
    coerce_to_field,
    create_field_from_array_like,
    is_array_like,
)

__all__ = [
    "Field",
    "FieldType",
    "fields",
    "Assignment",
    "AssignmentCollection",
    "AdjointField",
    "DiffModes",
    "create_backward_assignments",
    "get_jacobian_of_assignments",
    "AutoDiffOp",
    "AutoDiffKernelPair",
    "compose_ops",
    "fuse_sweeps",
    "ArrayWrapper",
    "create_field_from_array_like",
    "coerce_to_field",
    "is_array_like",
]

__version__ = "0.1.0"
