"""DataHandling + Simulation assembly tests (reference parity for
graph_datahandling/simulation, SURVEY.md §2.1 #14/#15) and
field_tensor_conversion tests (#8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pystencils_autodiff_tpu import (
    Assignment,
    AutoDiffOp,
    create_field_from_array_like,
    fields,
)
from pystencils_autodiff_tpu.datahandling import DataHandling
from pystencils_autodiff_tpu.field_tensor_conversion import (
    ArrayWrapper,
    coerce_to_field,
    tf_constant_from_field,
    to_numpy,
    torch_tensor_from_field,
)
from pystencils_autodiff_tpu.models.elastic import elastic_stress_op, elastic_velocity_op
from pystencils_autodiff_tpu.parallel import make_mesh
from pystencils_autodiff_tpu.simulation import Simulation


def test_datahandling_basic():
    dh = DataHandling((16, 16), ghost_layers=1, default_dtype=jnp.float64)
    u = dh.add_field("u", init=2.0)
    assert dh["u"].shape == (18, 18)
    assert float(dh["u"][0, 0]) == 2.0
    dh.fill_interior("u", 5.0)
    assert float(dh["u"][0, 0]) == 2.0 and float(dh["u"][5, 5]) == 5.0
    assert dh.interior("u").shape == (16, 16)
    a, b = dh.add_arrays("p, q(2)")
    assert dh["q"].shape == (18, 18, 2)


def test_datahandling_sharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh((4,), ("x",))
    dh = DataHandling((30, 16), mesh=mesh, dim_axes={0: "x"})
    dh.add_field("u")
    assert "x" in str(dh["u"].sharding)


def test_simulation_heat_matches_manual():
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    op = heat_step_op(dt=0.1, dtype="float64")
    dh = DataHandling((14, 14), ghost_layers=1, default_dtype=jnp.float64)
    dh.add_field("u")
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(0), (16, 16),
                                        dtype=jnp.float64))
    sim = Simulation(dh)
    sim.add_sweep(op, {"u": "u_next"})
    u0 = dh["u"]
    sim.run(dh.state(), 4)

    f = op.jax_function()
    u = u0
    for _ in range(4):
        u = f(u)
    np.testing.assert_allclose(dh["u"], u, rtol=1e-12, atol=1e-12)


def test_simulation_multi_sweep_elastic():
    vop = elastic_velocity_op(dtype="float64")
    sop = elastic_stress_op(dtype="float64")
    dh = DataHandling((20, 20), ghost_layers=1, default_dtype=jnp.float64)
    for n in ("vx", "vy", "sxx", "syy", "sxy"):
        dh.add_field(n)
    dh.set_array("sxx", dh["sxx"].at[10, 10].set(1.0))

    sim = Simulation(dh)
    sim.add_boundary_conditions({"vx": "neumann", "vy": "neumann"})
    sim.add_sweep(vop, {"vx": "vx_next", "vy": "vy_next"})
    sim.add_sweep(sop, {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"})
    final = sim.run(dh.state(), 10)
    energy = sum(float(jnp.sum(v ** 2)) for v in final.values())
    assert energy > 0 and np.isfinite(energy)


def test_simulation_differentiable():
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    op = heat_step_op(dt=0.05, kappa_field=True, dtype="float64")
    sim = Simulation()
    sim.add_sweep(op, {"u": "u_next"})
    step = sim.step_fn()
    u0 = jax.random.normal(jax.random.PRNGKey(1), (12, 12), dtype=jnp.float64)
    k0 = jnp.ones((12, 12), jnp.float64)

    from pystencils_autodiff_tpu.timeloop import run_timeloop

    def loss(k):
        out = run_timeloop(step, {"u": u0, "kappa": k}, 5, checkpoint="sqrt")
        return jnp.sum(out["u"] ** 2)

    g = jax.grad(loss)(k0)
    assert float(jnp.abs(g).max()) > 0


def test_simulation_sharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from pystencils_autodiff_tpu.models.heat import heat_step_op

    op = heat_step_op(dt=0.1, dtype="float64")
    mesh = make_mesh((4,), ("x",))
    dh = DataHandling((30, 16), mesh=mesh, dim_axes={0: "x"},
                      default_dtype=jnp.float64)
    dh.add_field("u")
    dh.set_array("u", jax.random.normal(jax.random.PRNGKey(2), (32, 18),
                                        dtype=jnp.float64))
    u0 = dh["u"]
    sim = Simulation(dh)
    sim.add_sweep(op, {"u": "u_next"})
    sim.run(dh.state(), 3)

    f = op.jax_function()
    u = u0
    for _ in range(3):
        u = f(u)
    np.testing.assert_allclose(np.asarray(dh["u"]), np.asarray(u),
                               rtol=1e-12, atol=1e-12)


# ------------------------------------------------- field_tensor_conversion --

def test_create_field_from_numpy():
    f = create_field_from_array_like("f", np.zeros((4, 5), np.float32))
    assert f.spatial_dimensions == 2 and f.dtype == np.float32


def test_create_field_from_jax():
    f = create_field_from_array_like("g", jnp.zeros((4, 5, 3)), index_dimensions=1)
    assert f.index_shape == (3,)


def test_create_field_from_torch_and_back():
    torch = pytest.importorskip("torch")
    t = torch.zeros(6, 7, dtype=torch.float64)
    f = create_field_from_array_like("h", t)
    assert f.dtype == np.float64
    t2 = torch_tensor_from_field(f, (6, 7), requires_grad=True)
    assert t2.requires_grad and tuple(t2.shape) == (6, 7)
    assert to_numpy(t2).shape == (6, 7)


def test_create_field_from_tf():
    tf = pytest.importorskip("tensorflow")
    c = tf_constant_from_field(
        create_field_from_array_like("k", np.zeros((3, 3))), (3, 3), init=1.5)
    assert float(c[0, 0]) == 1.5
    f = create_field_from_array_like("m", c)
    assert f.dtype == np.float64


def test_array_wrapper_and_coerce():
    w = ArrayWrapper(np.zeros((4, 4, 2)), index_dimensions=1)
    f = create_field_from_array_like("w", w)
    assert f.index_shape == (2,)
    assert coerce_to_field("w", w).index_shape == (2,)
    with pytest.raises(TypeError):
        coerce_to_field("bad", object())
