# Differentiable lid-driven cavity (D2Q9 BGK, half-way bounce-back walls).
#
# A closed box with three no-slip walls and a moving lid: the classic LBM
# validation case.  The lid drags fluid along the top; a primary clockwise
# vortex forms.  Because the bounce-back boundary (boundary.bounce_back) is
# pure jnp, the *lid velocity itself is differentiable*: we recover it from
# an observed steady velocity field by gradient descent.
#
# Reference anchor: pystencils BoundaryHandling with flag arrays + lbmpy
# no-slip/UBB boundaries (SURVEY.md §1 L1); here masks + Ladd moving-wall
# bounce-back with the adjoint derived by JAX.
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from pystencils_autodiff_tpu.boundary import BoundaryHandling
from pystencils_autodiff_tpu.models.lbm import (D2Q9_VELOCITIES, D2Q9_WEIGHTS,
                                                d2q9_bgk_op, macroscopic)
from pystencils_autodiff_tpu.timeloop import make_time_stepper

n, steps, omega, u_lid_true = 48, 1500, 1.7, 0.1
W = np.array([float(w) for w in D2Q9_WEIGHTS])

solid = np.zeros((n, n), bool)
solid[0, :] = solid[-1, :] = solid[:, 0] = solid[:, -1] = True
solid = jnp.asarray(solid)
fluid = ~np.asarray(solid)

op = d2q9_bgk_op(omega=omega)
f_eq0 = jnp.stack([w * jnp.ones((n, n)) for w in W], -1)  # rho=1, u=0


def run_cavity(u_lid, f0, n_steps):
    """Bounce-back walls; the lid (row 0) moves with velocity u_lid along
    axis 1.  u_lid is traced -> differentiable end-to-end."""
    lid_profile = jnp.zeros((n, n)).at[0, :].set(1.0) * u_lid
    bh = BoundaryHandling(op, {"f": ("bounce_back", solid,
                                     (jnp.zeros((n, n)), lid_profile))})
    step = make_time_stepper(op, {"f": "f_out"}, boundary=bh)
    return jax.lax.fori_loop(0, n_steps, lambda _, s: step(s), {"f": f0})["f"]


# --- forward: develop the cavity flow -------------------------------------
f_final = jax.jit(run_cavity, static_argnums=2)(u_lid_true, f_eq0, steps)
rho, u0, u1 = macroscopic(f_final)
u0, u1 = np.asarray(u0), np.asarray(u1)

col = n // 2
prof = u1[1:-1, col]          # lid-parallel velocity on the vertical centreline
# vorticity at the cavity core (clockwise for a lid moving +axis1)
du1_d0 = np.gradient(np.where(fluid, u1, 0.0), axis=0)
du0_d1 = np.gradient(np.where(fluid, u0, 0.0), axis=1)
vort_core = (du0_d1 - du1_d0)[n // 4: -n // 4, n // 4: -n // 4].mean()

print(f"cavity {n}x{n}, Re ~ "
      f"{u_lid_true * (n - 2) / ((1 / omega - 0.5) / 3):.0f}, {steps} steps")
print(f"centreline u_parallel: under lid {prof[0]:+.4f}, "
      f"bottom return flow {prof.min():+.4f}")
print(f"core vorticity (clockwise > 0 here): {vort_core:+.5f}")
assert prof[0] > 0.01 and prof.min() < -1e-3, "primary vortex expected"

# --- inverse: recover the lid velocity from the observed flow -------------
m_steps = 200
f_t = jax.jit(run_cavity, static_argnums=2)(u_lid_true, f_eq0, m_steps)
_, _, v1_t = macroscopic(f_t + 1e-30)
v1_t = jnp.where(solid, 0.0, v1_t)


@jax.jit
def loss(u_lid):
    f = run_cavity(u_lid, f_eq0, m_steps)
    _, _, v1 = macroscopic(f + 1e-30)
    return jnp.sum((jnp.where(solid, 0.0, v1) - v1_t) ** 2)


u = 0.05
for it in range(20):
    val, g = jax.value_and_grad(loss)(u)
    u = u - 8e-3 * g  # ~Newton step: d2loss/du2 ~ 1e2 for this cavity
print(f"lid-velocity recovery: start 0.05 -> {float(u):.6f} "
      f"(true {u_lid_true}), loss {float(val):.3e}")
assert abs(float(u) - u_lid_true) < 1e-3, "gradient should recover the lid velocity"
print("cavity OK")

# --- TPU fast path: the same cavity as ONE fused kernel per k cycles -------
# On hardware, per-step stepping pays an HBM round trip per sweep; the fused
# chain runs k full [bounce-back, BGK] cycles in one Pallas kernel, and with
# fused_bwd=True the u_lid GRADIENT comes out of one two-phase kernel too
# (the BC transposes run in-kernel).  Bit-exact vs the stepper above.
from pystencils_autodiff_tpu.ops import fused_stage_chain

k = 2
chain = fused_stage_chain(
    [(op, {"f": "f_out"})], k, fused_bwd=True,
    boundary={"f": ("bounce_back", "solid", ("uw0", "uw1"))})
lid_mask = jnp.zeros((n, n)).at[0, :].set(1.0)


def run_cavity_fused(u_lid, f0, n_calls):
    state = {"f": f0, "solid": solid.astype(f0.dtype),
             "uw0": jnp.zeros((n, n)), "uw1": lid_mask * u_lid}
    return jax.lax.fori_loop(
        0, n_calls, lambda _, s: {**s, "f": chain(s)["f"]}, state)["f"]


f_seq = jax.jit(run_cavity, static_argnums=2)(u_lid_true, f_eq0, 2 * k)
f_fus = jax.jit(run_cavity_fused, static_argnums=2)(u_lid_true, f_eq0, 2)
np.testing.assert_allclose(np.asarray(f_fus), np.asarray(f_seq),
                           rtol=1e-12, atol=1e-12)
g_fused = jax.grad(lambda ul: jnp.sum(
    jnp.sin(run_cavity_fused(ul, f_eq0, 2))))(u_lid_true)
g_seq = jax.grad(lambda ul: jnp.sum(
    jnp.sin(run_cavity(ul, f_eq0, 2 * k))))(u_lid_true)
np.testing.assert_allclose(float(g_fused), float(g_seq), rtol=1e-10)
print(f"fused chain (k={k}, in-kernel bounce-back, fused backward): "
      f"state and u_lid gradient match the stepper "
      f"({float(g_fused):+.6f})")
