"""Lowering backends: symbolic assignment collections → executable kernels.

Replaces the reference's L3–L5 stack (generated C/CUDA + subprocess JIT +
torch/TF binding modules, SURVEY.md §1): here the "generated native code"
path is Pallas→Mosaic (XLA is the JIT), the oracle path is pure jax.numpy,
and a generated-C CPU path lives in backends/_c_native.py for
oracle/parity purposes.
"""

from __future__ import annotations

from .common import StencilProgram, backward_program, forward_program, make_program
from .jnp_ref import make_jnp_stencil
from .adjoint_chain import fused_chain_vjp
from .stage_adjoint import fused_stage_chain_vjp
from .stage_chain import fused_stage_chain
from .time_chain import fused_time_chain
from .vjp import build_custom_vjp

__all__ = [
    "StencilProgram",
    "make_program",
    "forward_program",
    "backward_program",
    "make_jnp_stencil",
    "build_custom_vjp",
    "fused_time_chain",
    "fused_chain_vjp",
    "fused_stage_chain",
    "fused_stage_chain_vjp",
    "lower_forward",
    "lower_backward",
    "get_lowering",
]

_LOWERINGS = {}


def register_lowering(name: str, factory):
    _LOWERINGS[name] = factory


def get_lowering(name: str):
    if name not in _LOWERINGS:
        # lazy import of optional backends
        if name == "pallas":
            from .pallas_kernel import make_pallas_stencil
            register_lowering("pallas", make_pallas_stencil)
        elif name == "c_native":
            from ..backends._c_native import make_c_stencil
            register_lowering("c_native", make_c_stencil)
        else:
            raise ValueError(f"unknown lowering {name!r}; have {sorted(_LOWERINGS)}")
    return _LOWERINGS[name]


register_lowering("jnp", make_jnp_stencil)


def lower_forward(op, lowering: str = "jnp", **kwargs):
    prog = forward_program(op)
    return get_lowering(lowering)(prog, full_domain=False, **kwargs)


def lower_backward(op, lowering: str = "jnp",
                   full_domain: "bool | None" = None, **kwargs):
    """``full_domain=None`` uses each construction's native semantics:
    interior-write (zeroed ghost ring) for single-pass backwards, and
    full-domain for staged (TF_MAD) backwards — whose passes cannot run
    interior-write, so explicitly requesting ``full_domain=False`` on a
    staged op raises instead of being silently ignored."""
    from .common import backward_programs, is_staged_backward

    if is_staged_backward(op):
        from .vjp import make_staged_fn

        if full_domain is False:
            raise ValueError(
                "staged (TF_MAD) backward ops run all passes full-domain; "
                "full_domain=False (interior-write/zeroed-ghost semantics) "
                "is not available for them — compare in full_domain=True "
                "or use diff_mode='transposed'")
        return make_staged_fn(backward_programs(op), get_lowering(lowering),
                              {}, **kwargs)
    prog = backward_program(op)
    return get_lowering(lowering)(prog, full_domain=bool(full_domain),
                                  **kwargs)
