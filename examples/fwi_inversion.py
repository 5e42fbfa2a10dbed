# User flow (BASELINE config #3): FWI — recover a velocity anomaly from
# seismograms via checkpointed-adjoint gradients, then elastic staggered sim.
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import optax
from pystencils_autodiff_tpu.models import wave_simulate, fwi_gradient
from pystencils_autodiff_tpu.models import elastic_velocity_op, elastic_stress_op
from pystencils_autodiff_tpu.timeloop import run_timeloop

n, steps = 24, 200
yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
anomaly = 0.4 * jnp.exp(-((xx - 12.) ** 2 + (yy - 12.) ** 2) / 8.0)
c_true = 2.0 + anomaly
u0 = jnp.zeros((n, n)).at[19, 12].set(1.0)
_, observed = wave_simulate(c_true, u0, steps, dt=0.05, checkpoint="none",
                            record=lambda s: s["u_curr"][3, :])
print("observed seismogram energy:", float(jnp.sum(observed**2)))

c = 2.0 + jnp.zeros((n, n))
opt = optax.adam(0.02); st = opt.init(c)
grad_fn = jax.jit(lambda c: fwi_gradient(c, u0, observed, 3, steps, dt=0.05, checkpoint="sqrt"))
v0 = None
for i in range(120):
    v, g = grad_fn(c)
    if v0 is None: v0 = v
    up, st = opt.update(g, st); c = optax.apply_updates(c, up)
print(f"FWI misfit: {float(v0):.4e} -> {float(v):.4e}  (reduction {float(v0/v):.0f}x)")
corr = jnp.corrcoef((c - 2.0).ravel(), anomaly.ravel())[0, 1]
print(f"recovered-anomaly correlation with truth: {float(corr):.3f}")
assert float(v) < float(v0) / 1000 and corr > 0.1  # single-shot FWI is underdetermined; misfit is the real test
print("FWI OK")

# elastic staggered-grid wave: run 50 coupled velocity/stress steps
fv = jax.jit(elastic_velocity_op(dt=0.01, dtype="float64").jax_function())
fs = jax.jit(elastic_stress_op(dt=0.01, dtype="float64").jax_function())
shape = (32, 32)
state = {k: jnp.zeros(shape) for k in ["vx", "vy", "sxx", "syy", "sxy"]}
state["sxx"] = state["sxx"].at[16, 16].set(1.0)
state["syy"] = state["syy"].at[16, 16].set(1.0)
for i in range(50):
    vx, vy = fv(**{k: state[k] for k in ["vx", "vy", "sxx", "syy", "sxy"]})
    state["vx"], state["vy"] = vx, vy
    sxx, syy, sxy = fs(**{k: state[k] for k in ["vx", "vy", "sxx", "syy", "sxy"]})
    state["sxx"], state["syy"], state["sxy"] = sxx, syy, sxy
e = float(sum(jnp.sum(v**2) for v in state.values()))
print(f"elastic energy after 50 steps: {e:.4f}  nan={any(bool(jnp.isnan(v).any()) for v in state.values())}")
assert e > 0 and not any(bool(jnp.isnan(v).any()) for v in state.values())
print("ELASTIC OK")
