# User flow: assemble a sharded elastic simulation from DataHandling +
# Simulation (the app-assembly layer), run it, differentiate through it.
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from pystencils_autodiff_tpu.datahandling import DataHandling
from pystencils_autodiff_tpu.simulation import Simulation
from pystencils_autodiff_tpu.parallel import make_mesh
from pystencils_autodiff_tpu.models.heat import heat_step_op
from pystencils_autodiff_tpu.models.elastic import elastic_velocity_op, elastic_stress_op

mesh = make_mesh((2, 2), ("x", "y"))
dh = DataHandling((30, 30), mesh=mesh, dim_axes={0: "x", 1: "y"}, default_dtype=jnp.float64)
for n in ("vx", "vy", "sxx", "syy", "sxy"):
    dh.add_field(n)
dh.set_array("sxx", dh["sxx"].at[16, 16].set(1.0))
sim = Simulation(dh)
sim.add_boundary_conditions({"vx": "neumann", "vy": "neumann"})
sim.add_sweep(elastic_velocity_op(dtype="float64"), {"vx": "vx_next", "vy": "vy_next"})
sim.add_sweep(elastic_stress_op(dtype="float64"), {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"})
sim.run(dh.state(), 25)
print("sharded elastic after 25 steps: vx sharding =", dh["vx"].sharding.spec,
      " energy =", float(sum(jnp.sum(v**2) for v in dh.arrays.values())))

# unsharded replica must agree exactly
dh2 = DataHandling((30, 30), default_dtype=jnp.float64)
for n in ("vx", "vy", "sxx", "syy", "sxy"):
    dh2.add_field(n)
dh2.set_array("sxx", dh2["sxx"].at[16, 16].set(1.0))
sim2 = Simulation(dh2)
sim2.add_boundary_conditions({"vx": "neumann", "vy": "neumann"})
sim2.add_sweep(elastic_velocity_op(dtype="float64"), {"vx": "vx_next", "vy": "vy_next"})
sim2.add_sweep(elastic_stress_op(dtype="float64"), {"sxx": "sxx_next", "syy": "syy_next", "sxy": "sxy_next"})
sim2.run(dh2.state(), 25)
err = max(float(jnp.abs(dh.arrays[n] - dh2.arrays[n]).max()) for n in dh.arrays)
print("max sharded-vs-single err over all fields:", err)
assert err < 1e-13
print("SHARDED SIM OK")

# probe: divisibility error message
try:
    bad = DataHandling((33, 30), mesh=mesh, dim_axes={0: "x", 1: "y"})
    bad.add_field("u")
except ValueError as e:
    print("P-divisibility:", str(e)[:95])
# probe: no sweeps
try:
    Simulation().step_fn()
except ValueError as e:
    print("P-empty:", e)
