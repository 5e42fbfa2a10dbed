"""Symbolic operator composition (stencil fusion).

``compose_ops(op1, op2)`` inlines op1's output fields into op2's reads —
shifted appropriately — producing a single fused ``AutoDiffOp``.  One fused
kernel makes one pass over HBM where sequential sweeps make two, and the
fused adjoint comes for free from ``create_backward_assignments`` on the
composed collection.

Mathematically: if op2 reads ``w[o]`` and op1 defines ``w[0] ← rhs``, the
fusion substitutes ``shift(rhs, o)`` for ``w[o]``.  Ghost layers compose
(the fused stencil's reach is the Minkowski sum of the two stencils'
reaches), so a fused kernel trades halo width for memory passes — the
symbolic form of temporal blocking.

This capability goes beyond the reference (which compiles each sweep
separately and leaves fusion to waLBerla's C++); it falls out of the
symbolic substrate.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import sympy as sp

from .assignment import Assignment, AssignmentCollection
from .autodiff import AutoDiffOp, shift_expr
from .field import Field

__all__ = ["compose_ops", "fuse_sweeps"]


def compose_ops(op1: AutoDiffOp, op2: AutoDiffOp,
                op_name: Optional[str] = None,
                keep_intermediate: bool = False,
                do_common_subexpression_elimination: bool = True) -> AutoDiffOp:
    """Fuse two stencil ops: op2 ∘ op1 (op1 runs "first").

    op2's reads of op1's output fields are replaced by op1's (shifted)
    right-hand sides.  ``keep_intermediate=True`` also emits op1's outputs
    from the fused op (costs extra writes; default drops them).

    Constant/time-constant field sets are unioned.
    """
    coll1 = op1.forward_assignments
    coll2 = op2.forward_assignments
    rhs1: Dict[Field, sp.Expr] = {}
    for a in coll1.inlined_main_assignments():
        if a.lhs.index:
            raise NotImplementedError(
                "composition over index-component outputs not yet supported")
        rhs1[a.lhs.field] = a.rhs

    fused_main = []
    for a in coll2.inlined_main_assignments():
        expr = a.rhs
        # iterate until no op1-output accesses remain (op1 outputs could be
        # read at several offsets; substitution introduces no new ones since
        # op1 rhs only reads op1 inputs)
        mapping = {}
        for acc in sorted(expr.atoms(Field.Access), key=sp.default_sort_key):
            if acc.field in rhs1:
                mapping[acc] = shift_expr(rhs1[acc.field], acc.offsets)
        if mapping:
            expr = expr.xreplace(mapping)
        fused_main.append(Assignment(a.lhs, expr))

    if keep_intermediate:
        fused_main = [Assignment(f.center, r) for f, r in rhs1.items()] + fused_main

    name = op_name or f"{op1.op_name}_then_{op2.op_name}"
    fused = AutoDiffOp(
        AssignmentCollection(fused_main),
        op_name=name,
        constant_fields=list({*op1.constant_fields, *op2.constant_fields}),
        time_constant_fields=list({*op1.time_constant_fields,
                                   *op2.time_constant_fields}),
        diff_mode=op1.diff_mode,
        do_common_subexpression_elimination=do_common_subexpression_elimination,
    )
    # sanity: any op1 output still read means op2 read a field op1 didn't
    # define — that's just a normal input, fine.
    return fused


def fuse_sweeps(ops: Sequence[AutoDiffOp], op_name: Optional[str] = None,
                **kwargs) -> AutoDiffOp:
    """Left-fold composition of a sweep sequence into one op."""
    if not ops:
        raise ValueError("no ops to fuse")
    fused = ops[0]
    for nxt in ops[1:]:
        fused = compose_ops(fused, nxt, **kwargs)
    if op_name:
        fused.op_name = op_name
    return fused
