"""Lattice-Boltzmann (D2Q9 BGK) model family.

The reference's primary downstream ecosystem is lbmpy (LBM kernels over
pystencils); this module provides the equivalent differentiable LBM
capability natively: a fused stream-and-collide step as a single
``AutoDiffOp`` over a 9-component distribution field, with the adjoint
derived symbolically (including the nonlinear equilibrium terms and the
1/ρ divisions — the saved-primal machinery handles them).

Pull-scheme step:  f_i'(x) = f̂_i + ω (f_i^eq(ρ, u) − f̂_i),
                   f̂_i(x) = f_i(x − c_i)                (streaming reads)
                   ρ = Σ_i f̂_i,  ρ u = Σ_i c_i f̂_i
                   f_i^eq = w_i ρ (1 + 3 c_i·u + 9/2 (c_i·u)² − 3/2 u²)
"""

from __future__ import annotations

import sympy as sp

from ..assignment import Assignment, AssignmentCollection
from ..autodiff import AutoDiffOp
from ..field import Field

__all__ = ["D2Q9_VELOCITIES", "D2Q9_WEIGHTS", "d2q9_bgk_op", "macroscopic"]

D2Q9_VELOCITIES = [
    (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
    (1, 1), (-1, -1), (1, -1), (-1, 1),
]
_w0, _ws, _wd = sp.Rational(4, 9), sp.Rational(1, 9), sp.Rational(1, 36)
D2Q9_WEIGHTS = [_w0, _ws, _ws, _ws, _ws, _wd, _wd, _wd, _wd]


def d2q9_bgk_op(omega: float = 1.7, dtype="float64",
                compressible: bool = True, layout: str = "aos") -> AutoDiffOp:
    """Fused stream+collide BGK step: ``f_out = op(f)``.

    ``f`` is a 2D field with index_shape (9,).  Ghost layers are (1,1) per
    dim (the streaming pull); apply periodic/bounce-back boundary fills
    between steps via boundary.py.

    ``layout="soa"`` stores the distribution component-major — runtime
    arrays are ``(9, H, W)`` and every lowering/chain slices contiguous
    planes instead of 9-stride gathers (the fast layout for time loops).
    """
    f = Field("f", 2, index_shape=(9,), dtype=dtype, layout=layout)
    f_out = Field("f_out", 2, index_shape=(9,), dtype=dtype, layout=layout)

    # streaming reads: component i pulled from x - c_i
    f_in = [f[(-cx, -cy)](i) for i, (cx, cy) in enumerate(D2Q9_VELOCITIES)]

    rho = sp.Symbol("rho")
    ux = sp.Symbol("ux")
    uy = sp.Symbol("uy")
    subexprs = [
        Assignment(rho, sum(f_in, sp.Integer(0))),
        Assignment(ux, sum((cx * fi for (cx, _), fi
                            in zip(D2Q9_VELOCITIES, f_in)), sp.Integer(0)) / rho),
        Assignment(uy, sum((cy * fi for (_, cy), fi
                            in zip(D2Q9_VELOCITIES, f_in)), sp.Integer(0)) / rho),
    ]
    u2 = ux * ux + uy * uy
    mains = []
    for i, ((cx, cy), w, fi) in enumerate(zip(D2Q9_VELOCITIES, D2Q9_WEIGHTS,
                                              f_in)):
        cu = cx * ux + cy * uy
        feq = w * rho * (1 + 3 * cu + sp.Rational(9, 2) * cu ** 2
                         - sp.Rational(3, 2) * u2)
        mains.append(Assignment(f_out.center(i), fi + omega * (feq - fi)))

    return AutoDiffOp(AssignmentCollection(mains, subexprs),
                      op_name="d2q9_bgk")


def macroscopic(f_arr, layout: str = "aos"):
    """Density and velocity fields from a distribution array — ``(H, W, 9)``
    for the default AoS layout, ``(9, H, W)`` for ``layout="soa"``."""
    import jax.numpy as jnp

    axis = 0 if layout == "soa" else -1
    comp = (lambda i: f_arr[i]) if layout == "soa" else (lambda i: f_arr[..., i])
    rho = jnp.sum(f_arr, axis=axis)
    ux = sum(c[0] * comp(i) for i, c in enumerate(D2Q9_VELOCITIES)) / rho
    uy = sum(c[1] * comp(i) for i, c in enumerate(D2Q9_VELOCITIES)) / rho
    return rho, ux, uy
