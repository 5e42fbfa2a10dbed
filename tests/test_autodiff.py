"""Symbolic adjoint-derivation tests (reference parity:
tests/test_autodiff.py — SURVEY.md §4)."""

import sympy as sp

from pystencils_autodiff_tpu import (
    Assignment,
    AutoDiffOp,
    DiffModes,
    create_backward_assignments,
    fields,
    get_jacobian_of_assignments,
)
from pystencils_autodiff_tpu.adjoint_field import AdjointField


def _laplacian_op(diff_mode=DiffModes.TRANSPOSED):
    x, y = fields("x, y", 2)
    asm = Assignment(y.center,
                     x[1, 0] + x[-1, 0] + x[0, 1] + x[0, -1] - 4 * x[0, 0])
    return x, y, AutoDiffOp([asm], op_name="lap", diff_mode=diff_mode)


def test_laplacian_adjoint_is_laplacian():
    """The 5-point Laplacian is self-adjoint: backward == forward stencil."""
    x, y, op = _laplacian_op()
    bwd = op.backward_assignments.inlined_main_assignments()
    assert len(bwd) == 1
    (asm,) = bwd
    assert isinstance(asm.lhs.field, AdjointField)
    assert asm.lhs.field.corresponding_forward_field == x
    dy = AdjointField(y)
    expected = dy[1, 0] + dy[-1, 0] + dy[0, 1] + dy[0, -1] - 4 * dy[0, 0]
    assert sp.simplify(asm.rhs - expected) == 0


def test_asymmetric_stencil_transposes():
    """Upwind stencil y = x[1] - x[0]: adjoint must negate the offset."""
    x, y = fields("x, y", 1)
    op = AutoDiffOp([Assignment(y.center, x[1] - x[0])], op_name="upwind")
    (asm,) = op.backward_assignments.inlined_main_assignments()
    dy = AdjointField(y)
    assert sp.simplify(asm.rhs - (dy[-1] - dy[0])) == 0


def test_nonlinear_saves_primal():
    """y = x² ⇒ x̂ = 2 x ŷ; the backward reads the primal x (residual)."""
    x, y = fields("x, y", 2)
    op = AutoDiffOp([Assignment(y.center, x[0, 0] ** 2)], op_name="sq")
    (asm,) = op.backward_assignments.inlined_main_assignments()
    dy = AdjointField(y)
    assert sp.simplify(asm.rhs - 2 * x[0, 0] * dy[0, 0]) == 0
    assert op.saved_fields == [x]


def test_variable_coefficient_shifts_coefficient():
    """y = k[0]·x[1]: x̂[0] = k[-1]·ŷ[-1] — the coefficient access must be
    shifted along with the adjoint read (SURVEY.md §3.1 transposition)."""
    x, y, k = fields("x, y, k", 1)
    op = AutoDiffOp([Assignment(y.center, k[0] * x[1])],
                    op_name="varco", constant_fields=[k])
    bwd = op.backward_assignments.inlined_main_assignments()
    assert len(bwd) == 1  # only x̂ — k is constant
    (asm,) = bwd
    dy = AdjointField(y)
    assert sp.simplify(asm.rhs - k[-1] * dy[-1]) == 0


def test_constant_fields_get_no_adjoint():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp([Assignment(y.center, k[0, 0] * x[0, 0])],
                    op_name="c", constant_fields=[k])
    outs = {f.corresponding_forward_field.name for f in op.backward_output_fields}
    assert outs == {"x"}


def test_nonconstant_coefficient_gets_adjoint():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp([Assignment(y.center, k[0, 0] * x[1, 0])], op_name="kc")
    outs = {f.corresponding_forward_field.name for f in op.backward_output_fields}
    assert outs == {"x", "k"}
    # k̂[0] = x[1]·ŷ[0] (k read at centre only)
    for asm in op.backward_assignments.inlined_main_assignments():
        if asm.lhs.field.corresponding_forward_field.name == "k":
            dy = AdjointField(y)
            assert sp.simplify(asm.rhs - x[1, 0] * dy[0, 0]) == 0


def test_multi_output_accumulates_contributions():
    """Two outputs both reading x: x̂ sums both adjoint contributions."""
    x, y, z = fields("x, y, z", 1)
    op = AutoDiffOp([
        Assignment(y.center, 2 * x[0]),
        Assignment(z.center, x[1]),
    ], op_name="multi")
    (asm,) = op.backward_assignments.inlined_main_assignments()
    dy, dz = AdjointField(y), AdjointField(z)
    assert sp.simplify(asm.rhs - (2 * dy[0] + dz[-1])) == 0


def test_time_constant_fields_accumulate():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp([Assignment(y.center, k[0, 0] * x[0, 0])],
                    op_name="tc", time_constant_fields=[k])
    accum = [a for a in op.backward_assignments.main_assignments if a.is_accumulation]
    assert len(accum) == 1
    assert accum[0].lhs.field.corresponding_forward_field == k


def test_field_classification():
    x, y, k = fields("x, y, k", 2)
    op = AutoDiffOp([Assignment(y.center, k[0, 0] * x[1, 0] ** 2)], op_name="cls")
    assert set(f.name for f in op.forward_input_fields) == {"x", "k"}
    assert [f.name for f in op.forward_output_fields] == ["y"]
    # backward reads ŷ plus the primals x and k (nonlinear/var-coeff terms)
    bwd_in = {f.name for f in op.backward_input_fields}
    assert "diffy" in bwd_in and "x" in bwd_in and "k" in bwd_in
    assert set(f.name for f in op.saved_fields) == {"x", "k"}


def test_subexpressions_are_inlined_through_chain_rule():
    x, y = fields("x, y", 1)
    t = sp.Symbol("t")
    op = AutoDiffOp([
        Assignment(t, x[1] + x[-1]),
        Assignment(y.center, t ** 2),
    ], op_name="sub")
    dy = AdjointField(y)
    (asm,) = op.backward_assignments.inlined_main_assignments()
    expected = (2 * (x[2] + x[0]) * dy[1]) + (2 * (x[0] + x[-2]) * dy[-1])
    assert sp.expand(asm.rhs - expected) == 0


def test_jacobian_of_assignments():
    x, y = fields("x, y", 1)
    asm = Assignment(y.center, 3 * x[0] + x[1] ** 2)
    jac = get_jacobian_of_assignments([asm], [x[0], x[1]])
    assert jac.shape == (1, 2)
    assert jac[0, 0] == 3
    assert jac[0, 1] == 2 * x[1]


def test_diff_modes_symbolically_equivalent():
    """Both construction orders must yield the same adjoint operator —
    the upstream tfmad equivalence contract (SURVEY.md §4).

    TF_MAD is now a *structurally different* two-stage program
    (materialised Jacobian fields evaluated in the forward frame + a
    transposed gather); equivalence holds after inlining the stage-A
    Jacobian definitions shifted to the gather's read offsets."""
    from pystencils_autodiff_tpu.assignment import StagedAssignmentCollection
    from pystencils_autodiff_tpu.autodiff import shift_expr
    from pystencils_autodiff_tpu.field import Field

    x, y, k = fields("x, y, k", 2)
    fwd = [Assignment(y.center,
                      k[0, 0] * x[1, 0] + k[1, 0] * x[-1, 0] + x[0, 1] ** 2)]
    a = create_backward_assignments(fwd, diff_mode=DiffModes.TRANSPOSED,
                                    do_common_subexpression_elimination=False)
    b = create_backward_assignments(fwd, diff_mode=DiffModes.TF_MAD,
                                    do_common_subexpression_elimination=False)
    # the variable-coefficient entries force a genuinely staged program
    assert isinstance(b, StagedAssignmentCollection)
    assert not isinstance(a, StagedAssignmentCollection)

    jac_defs = {asm.lhs.field.name: asm.rhs
                for st in b.stages[:-1] for asm in st.inlined_main_assignments()}
    assert jac_defs  # stage A materialises at least one Jacobian field

    def inline_jacs(expr):
        rep = {acc: shift_expr(jac_defs[acc.field.name], acc.offsets)
               for acc in expr.atoms(Field.Access)
               if acc.field.name in jac_defs}
        return expr.xreplace(rep)

    am = {asm.lhs: asm.rhs for asm in a.inlined_main_assignments()}
    bm = {asm.lhs: inline_jacs(asm.rhs)
          for asm in b.inlined_main_assignments()}
    assert am.keys() == bm.keys()
    for lhs in am:
        assert sp.simplify(am[lhs] - bm[lhs]) == 0
