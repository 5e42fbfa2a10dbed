import jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu'); jax.config.update('jax_enable_x64', True)
from pystencils_autodiff_tpu import fields, Assignment, AutoDiffOp
import optax

u, out, kappa = fields("u, out, kappa", 2)
step = Assignment(out.center, u[0,0] + 0.1*kappa[0,0]*(u[1,0]+u[-1,0]+u[0,1]+u[0,-1]-4*u[0,0]))
op = AutoDiffOp([step], op_name="heat_step")
f = jax.jit(op.jax_function())
u0 = jax.random.normal(jax.random.PRNGKey(0), (16,16))
k_true = 1.0 + 0.5*jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(1), (16,16)))
target = f(u=u0, kappa=k_true)
def loss(k): return jnp.mean((f(u=u0, kappa=k)-target)**2)
opt = optax.adam(0.05); k = jnp.ones((16,16)); state = opt.init(k)
vg = jax.jit(jax.value_and_grad(loss))
for i in range(500):
    l, g = vg(k); up, state = opt.update(g, state); k = optax.apply_updates(k, up)
print("adam final loss:", float(l))
assert float(l) < 1e-12
print("OPTIMIZATION OK")

# --- probes ---
# probe 1: wrong arg count
try:
    f(u0)
except TypeError as e:
    print("P1 wrong-arity:", e)
# probe 2: unknown kwarg
try:
    f(u=u0, kappa=k_true, bogus=u0)
except (TypeError, KeyError) as e:
    print("P2 bogus kwarg:", type(e).__name__, e)
# probe 3: half-integer offset
try:
    u[0.5, 0]
except ValueError as e:
    print("P3 half offset:", e)
# probe 4: writing off-centre
from pystencils_autodiff_tpu import AssignmentCollection
try:
    AssignmentCollection([Assignment(out[1,0], u[0,0])])
except ValueError as e:
    print("P4 off-centre write:", e)
# probe 5: mixed positional+kwargs
try:
    f(u0, kappa=k_true)
except TypeError as e:
    print("P5 mixed args:", e)
