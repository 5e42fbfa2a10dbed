# User flow: sharded 2D diffusion over a 2x4 mesh of 8 (virtual CPU) devices,
# gradient of a loss wrt the conductivity field through the sharded op.
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from pystencils_autodiff_tpu import fields, Assignment, AutoDiffOp
from pystencils_autodiff_tpu.parallel import ShardedStencil, make_mesh, shard_array

u, out, k = fields("u, out, k", 2)
op = AutoDiffOp([Assignment(out.center,
    u[0,0] + 0.1*k[0,0]*(u[1,0]+u[-1,0]+u[0,1]+u[0,-1]-4*u[0,0]))], op_name="heat")

mesh = make_mesh((2, 4), ("x", "y"))
print("mesh:", mesh)
sh = ShardedStencil(op, mesh, {0: "x", 1: "y"})
u0 = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
kv = 1.0 + 0.1*jax.random.normal(jax.random.PRNGKey(1), (64, 128))**2
us = shard_array(u0, mesh, sh.partition_spec(u))
ks = shard_array(kv, mesh, sh.partition_spec(k))
y = sh(k=ks, u=us)
print("out sharding:", y.sharding)
single = op.jax_function()
print("fwd max err vs single-device:", float(jnp.abs(y - single(k=kv, u=u0)).max()))

g = jax.grad(lambda kk: jnp.sum(jnp.sin(sh(k=kk, u=us))))(ks)
g_ref = jax.grad(lambda kk: jnp.sum(jnp.sin(single(k=kk, u=u0))))(kv)
print("grad max err vs single-device:", float(jnp.abs(g - g_ref).max()))

# probe: jit the whole sharded op + grad
f = jax.jit(jax.grad(lambda kk, uu: jnp.sum(sh(k=kk, u=uu)**2), argnums=(0,1)))
gk, gu = f(ks, us)
print("jitted sharded grad ok:", gk.shape, gu.shape, gu.sharding)

# probe: wrong mesh axis
try:
    ShardedStencil(op, mesh, {0: "nope"})
except ValueError as e:
    print("P-axis:", e)
# probe: dim out of range
try:
    ShardedStencil(op, mesh, {5: "x"})
except ValueError as e:
    print("P-dim:", e)

# comm-avoiding fused chain: k steps per ONE deep halo exchange, and with
# fused_bwd=True the BACKWARD is comm-avoiding too (one deeper exchange +
# the two-phase adjoint kernel per shard)
from pystencils_autodiff_tpu.parallel import ShardedChain

hop = AutoDiffOp([Assignment(out.center,
    u[0,0] + 0.1*(u[1,0]+u[-1,0]+u[0,1]+u[0,-1]-4*u[0,0]))], op_name="heat_c")
# chains shard leading (row) dims only — the last spatial dim is the TPU
# lane dim; reuse the mesh's "x" axis for a 1D decomposition here
chain = ShardedChain(hop, k=4, mesh=mesh, dim_axes={0: "x"},
                     carry_map={"u": "out"}, fused_bwd=True, interpret=True)
uc = jax.device_put(u0, chain.input_shardings()["u"])
gc = jax.jit(jax.grad(lambda a: jnp.sum(chain({"u": a})["u"] ** 2)))(uc)
print("fused-chain fused-backward grad:", gc.shape, gc.sharding)
