"""Staggered-grid origins consumed by access resolution (VERDICT round 1,
weak #7; SURVEY.md hard-part #6): fractional physical offsets resolve
against a field's origin, invalid positions are rejected, and the elastic
model written in physical coordinates reproduces the hand-shifted integer
form exactly."""

import numpy as np
import pytest

from pystencils_autodiff_tpu import Assignment, AutoDiffOp, Field
from pystencils_autodiff_tpu.models.elastic import (elastic_stress_op,
                                                    elastic_velocity_op)


def test_physical_offset_resolves_against_origin():
    vx = Field("vx", 2, origin=(0.5, 0.0))
    a = vx[0.5, 0]
    assert a.offsets == (0, 0)
    b = vx[-0.5, 0]
    assert b.offsets == (-1, 0)
    assert a.physical_position == (0.5, 0.0)
    assert b.physical_position == (-0.5, 0.0)


def test_integer_offsets_stay_storage_offsets():
    vx = Field("vx", 2, origin=(0.5, 0.0))
    assert vx[1, 0].offsets == (1, 0)
    assert vx[1, 0].physical_position == (1.5, 0.0)


def test_physical_offset_off_grid_rejected():
    u = Field("u", 2)  # cell-centred
    with pytest.raises(ValueError, match="does not land on this field's grid"):
        u[0.5, 0]
    sxy = Field("sxy", 2, origin=(0.5, 0.5))
    with pytest.raises(ValueError, match="does not land"):
        sxy[0.25, 0.5]


def test_elastic_velocity_in_physical_coordinates_matches_model():
    """The P-SV velocity update written with physical half-offsets equals
    the model library's hand-shifted integer-offset form symbolically."""
    dt, rho, dx = 0.001, 1.0, 1.0
    vx = Field("vx", 2, dtype="float32", origin=(0.5, 0.0))
    vy = Field("vy", 2, dtype="float32", origin=(0.0, 0.5))
    sxx = Field("sxx", 2, dtype="float32")
    syy = Field("syy", 2, dtype="float32")
    sxy = Field("sxy", 2, dtype="float32", origin=(0.5, 0.5))
    vx_n = Field("vx_next", 2, dtype="float32", origin=(0.5, 0.0))
    vy_n = Field("vy_next", 2, dtype="float32", origin=(0.0, 0.5))

    a = dt / (rho * dx)
    # physical positions relative to each target's own sample location:
    # vx lives at (i+1/2, j): sxx difference straddles it at i+1 and i,
    # sxy difference at j+1/2 and j-1/2
    phys = [
        Assignment(vx_n[0.5, 0],
                   vx[0.5, 0] + a * ((sxx[1, 0] - sxx[0, 0])
                                     + (sxy[0.5, 0.5] - sxy[0.5, -0.5]))),
        Assignment(vy_n[0, 0.5],
                   vy[0, 0.5] + a * ((sxy[0.5, 0.5] - sxy[-0.5, 0.5])
                                     + (syy[0, 1] - syy[0, 0]))),
    ]
    ref = elastic_velocity_op(dt=dt, dx=dx, rho=rho).forward_assignments
    for p, r in zip(phys, ref.main_assignments):
        assert p.lhs == r.lhs
        assert (p.rhs - r.rhs).simplify() == 0


def test_staggered_ops_still_lower_and_differentiate():
    import jax
    import jax.numpy as jnp

    vel = elastic_velocity_op(dt=0.01, dtype="float64")
    stress = elastic_stress_op(dt=0.01, dtype="float64")
    f = vel.jax_function(lowering="jnp")
    state = {n: jax.random.normal(jax.random.PRNGKey(i), (16, 16))
             for i, n in enumerate(f.input_names)}

    def loss(sxx):
        vx_n, vy_n = f(**{**state, "sxx": sxx})
        return jnp.sum(vx_n ** 2) + jnp.sum(vy_n ** 2)

    g = jax.grad(loss)(state["sxx"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0
    assert stress.forward_input_fields  # both staggered ops construct fine
