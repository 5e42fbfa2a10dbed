# User flow: migrate a torch training loop onto the stencil op (the
# reference's core use case), then the same in TF with the compiled native op.
import numpy as np
import torch
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from pystencils_autodiff_tpu import fields, Assignment, AutoDiffOp

u, out, k = fields("u, out, k", 2)
op = AutoDiffOp([Assignment(out.center,
    u[0,0] + 0.1*k[0,0]*(u[1,0]+u[-1,0]+u[0,1]+u[0,-1]-4*u[0,0]))], op_name="demo_heat")

# --- torch native (generated C kernels, g++-compiled, no JAX in the loop) ---
apply = op.create_pytorch_op(native=True)
print("torch op inputs:", apply.input_names)
rng = np.random.default_rng(0)
u0 = torch.tensor(rng.standard_normal((24, 24)))
k_true = torch.tensor(1.0 + 0.5/(1+np.exp(-rng.standard_normal((24, 24)))))
with torch.no_grad():
    target = apply(k_true, u0)
k_hat = torch.ones((24, 24), dtype=torch.float64, requires_grad=True)
opt = torch.optim.Adam([k_hat], lr=0.05)
for i in range(300):
    opt.zero_grad()
    loss = (apply(k_hat, u0) - target).pow(2).mean()
    loss.backward()
    opt.step()
print(f"torch-native final loss: {loss.item():.3e}")
assert loss.item() < 1e-10
print("TORCH NATIVE OK")

# --- tensorflow native (compiled REGISTER_OP custom op) ---
import tensorflow as tf
from pystencils_autodiff_tpu.backends._tensorflow_native import create_tensorflow_op
tf_fn = create_tensorflow_op(op)
print("tf op inputs:", tf_fn.input_names)
k_var = tf.Variable(np.ones((24, 24)))
u_const = tf.constant(u0.numpy())
tgt = tf.constant(target.numpy())
opt_tf = tf.keras.optimizers.Adam(0.05)
for i in range(300):
    with tf.GradientTape() as tape:
        loss_tf = tf.reduce_mean((tf_fn(k_var, u_const) - tgt) ** 2)
    g = tape.gradient(loss_tf, [k_var])
    opt_tf.apply_gradients(zip(g, [k_var]))
print(f"tf-native final loss: {float(loss_tf):.3e}")
assert float(loss_tf) < 1e-9
# cross-check: torch and tf recovered the same kappa
dk = np.abs(k_hat.detach().numpy() - k_var.numpy()).max()
print(f"max |kappa_torch - kappa_tf| = {dk:.2e}")
print("TF NATIVE OK")

# probe: float32 torch native
apply32 = op.create_pytorch_op(native=True, dtype=np.float32)
o32 = apply32(k_true.float().requires_grad_(True), u0.float())
o32.sum().backward()
print("f32 native ok:", o32.dtype)
