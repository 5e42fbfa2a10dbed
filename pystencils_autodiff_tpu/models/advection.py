"""Advection schemes: upwind and WENO5 — wide-stencil, strongly nonlinear
model family (differentiable WENO is the classic hard case for adjoint
codegen: the smoothness-indicator weights make the Jacobian dense in the
6-point neighbourhood).

1D conservative advection  u_t + a u_x = 0  (a > 0):

* ``upwind1_op``  — first-order upwind, 2-point.
* ``weno5_op``    — fifth-order WENO-JS reconstruction of the left-biased
  flux; offsets span [-3, +2] (ghost width 3), and the adjoint saves the
  primal field because the nonlinear weights depend on it.
"""

from __future__ import annotations

import sympy as sp

from ..assignment import Assignment, AssignmentCollection
from ..autodiff import AutoDiffOp
from ..field import Field

__all__ = ["upwind1_op", "weno5_op"]


def upwind1_op(a: float = 1.0, dt: float = 0.4, dx: float = 1.0,
               dtype="float64") -> AutoDiffOp:
    u = Field("u", 1, dtype=dtype)
    out = Field("u_next", 1, dtype=dtype)
    cfl = a * dt / dx
    return AutoDiffOp(
        [Assignment(out.center, u[0] - cfl * (u[0] - u[-1]))],
        op_name="upwind1")


def _weno5_flux_at(u, shift: int):
    """WENO-JS reconstruction of u at the i+1/2 interface (left-biased,
    a>0), all accesses shifted by ``shift``."""
    eps = sp.Float(1e-6)
    m3, m2, m1, p0, p1 = (u[shift - 3 + k] for k in range(5))
    # candidate stencils (interface values)
    q0 = sp.Rational(1, 3) * m3 - sp.Rational(7, 6) * m2 + sp.Rational(11, 6) * m1
    q1 = -sp.Rational(1, 6) * m2 + sp.Rational(5, 6) * m1 + sp.Rational(1, 3) * p0
    q2 = sp.Rational(1, 3) * m1 + sp.Rational(5, 6) * p0 - sp.Rational(1, 6) * p1
    # smoothness indicators
    b0 = (sp.Rational(13, 12) * (m3 - 2 * m2 + m1) ** 2
          + sp.Rational(1, 4) * (m3 - 4 * m2 + 3 * m1) ** 2)
    b1 = (sp.Rational(13, 12) * (m2 - 2 * m1 + p0) ** 2
          + sp.Rational(1, 4) * (m2 - p0) ** 2)
    b2 = (sp.Rational(13, 12) * (m1 - 2 * p0 + p1) ** 2
          + sp.Rational(1, 4) * (3 * m1 - 4 * p0 + p1) ** 2)
    a0 = sp.Rational(1, 10) / (eps + b0) ** 2
    a1 = sp.Rational(6, 10) / (eps + b1) ** 2
    a2 = sp.Rational(3, 10) / (eps + b2) ** 2
    s = a0 + a1 + a2
    return (a0 * q0 + a1 * q1 + a2 * q2) / s


def weno5_op(a: float = 1.0, dt: float = 0.4, dx: float = 1.0,
             dtype="float64") -> AutoDiffOp:
    """u' = u − (a·dt/dx)(F_{i+1/2} − F_{i−1/2}), F by WENO5-JS."""
    u = Field("u", 1, dtype=dtype)
    out = Field("u_next", 1, dtype=dtype)
    cfl = a * dt / dx
    f_plus = _weno5_flux_at(u, 1)    # interface i+1/2 uses u[i-2..i+2]
    f_minus = _weno5_flux_at(u, 0)   # interface i-1/2 uses u[i-3..i+1]
    rhs = u[0] - cfl * (f_plus - f_minus)
    return AutoDiffOp(AssignmentCollection.normalize(
        [Assignment(out.center, rhs)]).new_with_cse(),
        op_name="weno5")

