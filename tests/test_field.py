"""Field / Access / Assignment substrate tests (reference parity:
pystencils Field semantics the AD pass relies on, SURVEY.md §1 L1)."""

import numpy as np
import pytest
import sympy as sp

from pystencils_autodiff_tpu import (
    Assignment,
    AssignmentCollection,
    Field,
    fields,
)
from pystencils_autodiff_tpu.assignment import ghost_layers_of


def test_access_identity_and_diff():
    x = Field("x", 2)
    a1 = x[1, 0]
    a2 = x[1, 0]
    assert a1 == a2
    assert a1 is not None
    assert sp.diff(3 * a1 + a1**2, a2) == 3 + 2 * a1
    assert sp.diff(a1, x[0, 1]) == 0


def test_access_offsets_and_shift():
    x = Field("x", 3)
    a = x[1, -2, 0]
    assert a.offsets == (1, -2, 0)
    s = a.shifted((-1, 2, 0))
    assert s.offsets == (0, 0, 0)
    assert s.is_center
    assert s == x.center


def test_index_dimensions():
    v = Field("v", 2, index_shape=(3,))
    a = v[1, 0](2)
    assert a.index == (2,)
    assert a.offsets == (1, 0)
    with pytest.raises(IndexError):
        v(5)
    b = v(0)
    assert b.is_center and b.index == (0,)


def test_fields_helper():
    u, w = fields("u, w", 2)
    assert u.name == "u" and w.spatial_dimensions == 2
    vel = fields("vel(3)", 3)
    assert vel.index_shape == (3,)


def test_staggered_origin():
    fx = Field("fx", 2, origin=(0.5, 0.0))
    assert fx.is_staggered
    # fractional physical offsets resolve against the origin...
    assert fx[0.5, 0].offsets == (0, 0)
    assert fx[-0.5, 0].offsets == (-1, 0)
    # ...and positions between samples are rejected
    with pytest.raises(ValueError, match="does not land"):
        fx[0.25, 0]
    with pytest.raises(ValueError, match="does not land"):
        Field("cc", 2)[0.5, 0]  # cell-centred field has no sample there


def test_ghost_layers():
    x = Field("x", 2)
    gl = ghost_layers_of([x[2, 0], x[-1, 0], x[0, 3]])
    assert gl == ((1, 2), (0, 3))


def test_assignment_collection_analysis():
    x, y, k = fields("x, y, k", 2)
    t = sp.Symbol("t")
    coll = AssignmentCollection.normalize([
        Assignment(t, k[0, 0] * x[1, 0]),
        Assignment(y.center, t + x[-1, 0]),
    ])
    assert coll.fields_written == [y]
    assert set(f.name for f in coll.fields_read) == {"k", "x"}
    inlined = coll.inlined_main_assignments()
    assert len(inlined) == 1
    assert inlined[0].rhs == k[0, 0] * x[1, 0] + x[-1, 0]


def test_center_write_enforced():
    x, y = fields("x, y", 2)
    with pytest.raises(ValueError):
        AssignmentCollection([Assignment(y[1, 0], x.center)])


def test_cse():
    x, y, z = fields("x, y, z", 2)
    e = (x[1, 0] + x[-1, 0]) ** 2
    coll = AssignmentCollection.normalize([
        Assignment(y.center, e + 1),
        Assignment(z.center, e - 1),
    ])
    cse = coll.new_with_cse()
    assert len(cse.subexpressions) >= 1
    # CSE preserves semantics
    back = cse.inlined_main_assignments()
    for a, b in zip(coll.inlined_main_assignments(), back):
        assert sp.simplify(a.rhs - b.rhs) == 0


def test_create_from_numpy_array():
    arr = np.zeros((4, 5, 3))
    f = Field.create_from_numpy_array("f", arr, index_dimensions=1)
    assert f.spatial_dimensions == 2
    assert f.index_shape == (3,)


def test_same_name_different_fields_do_not_share_access_instances():
    """Advisor round-1 medium: sympy's Symbol cache is keyed by name alone;
    a later same-named field must not retarget .field on accesses inside
    previously built expressions."""
    scalar = Field("dup", 2)
    a_scalar = scalar.center
    assert a_scalar.field.index_shape == ()

    vector = Field("dup", 2, index_shape=(9,))
    a_vector = vector.center
    assert a_vector.field.index_shape == (9,)
    # the earlier access must be untouched
    assert a_scalar.field.index_shape == ()
    assert a_scalar.field is scalar
    assert a_scalar is not a_vector

    # equal-fingerprint fields share the cached instance (cheap + harmless)
    again = Field("dup", 2)
    assert again.center is a_scalar
