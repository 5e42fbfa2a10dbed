# Differentiable lattice-Boltzmann: lid-driven-ish shear decay with a
# gradient-recovered relaxation field would need an omega field; this demo
# runs a Taylor-Green-style vortex decay and differentiates the final
# kinetic energy w.r.t. the initial distribution.
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from pystencils_autodiff_tpu.models.lbm import (
    D2Q9_VELOCITIES,
    D2Q9_WEIGHTS,
    d2q9_bgk_op,
    macroscopic,
)
from pystencils_autodiff_tpu.boundary import BoundaryHandling
from pystencils_autodiff_tpu.timeloop import make_time_stepper, run_timeloop

n, steps, omega = 64, 100, 1.7
W = np.array([float(w) for w in D2Q9_WEIGHTS])

yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
kx = 2 * jnp.pi / n
ux = 0.04 * jnp.cos(kx * xx) * jnp.sin(kx * yy)
uy = -0.04 * jnp.sin(kx * xx) * jnp.cos(kx * yy)
rho = jnp.ones((n, n))

comps = []
for (cx, cy), w in zip(D2Q9_VELOCITIES, W):
    cu = cx * ux + cy * uy
    comps.append(w * rho * (1 + 3 * cu + 4.5 * cu ** 2
                            - 1.5 * (ux ** 2 + uy ** 2)))
f0 = jnp.stack(comps, -1)

op = d2q9_bgk_op(omega=omega)
# periodic domain: refill the ghost frame from the opposite edge each step
bh = BoundaryHandling(op, {"f": "periodic"})
step = make_time_stepper(op, {"f": "f_out"}, boundary=bh)


def kinetic_energy(f):
    rho, ux, uy = macroscopic(f[8:-8, 8:-8] + 1e-12)
    return 0.5 * jnp.sum(rho * (ux ** 2 + uy ** 2))


e0 = kinetic_energy(f0)
final = run_timeloop(step, {"f": f0}, steps, checkpoint="sqrt")["f"]
e1 = kinetic_energy(final)
print(f"kinetic energy decay over {steps} steps: {float(e0):.5f} -> {float(e1):.5f}")
assert 0 < float(e1) < float(e0), "viscous decay expected"

g = jax.grad(lambda f: kinetic_energy(
    run_timeloop(step, {"f": f}, 20, checkpoint="sqrt")["f"]))(f0)
print("dE/df0: finite =", bool(jnp.all(jnp.isfinite(g))),
      " max =", float(jnp.abs(g).max()))
print("LBM OK")
