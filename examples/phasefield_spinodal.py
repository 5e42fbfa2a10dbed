"""Spinodal decomposition with the Cahn-Hilliard two-sweep model:
recorded as a GraphDataHandling program and run in all three fuse modes
(node replay / symbolic fusion is N/A for 2 coupled sweeps / fused stage
chain), then an inverse problem recovering the mobility."""
import jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
import numpy as np

from pystencils_autodiff_tpu.graph_datahandling import GraphDataHandling
from pystencils_autodiff_tpu.models.phasefield import (cahn_hilliard_stages,
                                                       ginzburg_landau_energy)
from pystencils_autodiff_tpu.ops.stage_chain import stage_stepper

n, k, cycles = 64, 2, 20
stages = cahn_hilliard_stages(dt=0.01, mobility=1.0)

# record the program
dh = GraphDataHandling((n, n), ghost_layers=0, default_dtype=jnp.float64)
dh.add_field("phi", init=0.0)
dh.add_field("mu", init=0.0)
dh.set_array("phi", 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n, n)))
with dh.timeloop() as loop:
    for op, carry in stages:
        loop.sweep(op, carry)
    loop.communicate("phi")
print(dh.graph.describe())

run_replay = dh.compile(lowering="jnp", periodic=True)
run_fused = dh.compile(fuse="stages", k=k, periodic=True, interpret=True)

st = dh.state()
out_r = run_replay(st, k * cycles)
out_f = run_fused(st, k * cycles)
np.testing.assert_allclose(out_f["phi"], out_r["phi"], rtol=1e-12, atol=1e-12)
m0 = float(jnp.sum(st["phi"]))
m1 = float(jnp.sum(out_r["phi"]))
print(f"mass conserved: {m0:.6f} -> {m1:.6f} (drift {abs(m1-m0):.2e})")
e0 = float(ginzburg_landau_energy(st["phi"]))
e1 = float(ginzburg_landau_energy(out_r["phi"]))
print(f"free energy descends: {e0:.3f} -> {e1:.3f}")
assert e1 < e0
print("FUSED == REPLAY, physics OK")

# inverse problem: recover the mobility from an observed trajectory
target = out_r["phi"]

def traj(mobility):
    # mobility enters the update sweep linearly: scale its dt
    steps_m = [stage_stepper(op, carry, periodic=True)
               for op, carry in cahn_hilliard_stages(dt=0.01 * mobility)]
    s = dict(st)
    for _ in range(k * cycles):
        for stp in steps_m:
            s = stp(s)
    return s["phi"]

# scan a bracket: the misfit is minimised at the true mobility (1.0)
vals = {m: float(jnp.mean((traj(m) - target) ** 2)) for m in (0.5, 1.0, 1.5)}
print("misfit by mobility:", vals)
assert vals[1.0] < vals[0.5] and vals[1.0] < vals[1.5]
print("INVERSE PROBLEM OK")
