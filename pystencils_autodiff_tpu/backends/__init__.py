"""Framework backends (reference parity: ``backends/__init__.py``
``AVAILABLE_BACKENDS``, SURVEY.md §2.1 #12).

* ``torch`` — torch.autograd.Function calling the JAX-lowered kernels
* ``torch_native`` — torch.autograd.Function calling generated+compiled C
* ``tensorflow`` — tf.custom_gradient + py_function over JAX kernels
* ``tensorflow_native`` — compiled TF custom-op library (REGISTER_OP)
* ``jax`` — the native path (``AutoDiffOp.jax_function``), lowering
  ``jnp`` | ``pallas`` | ``c_native``
"""

AVAILABLE_BACKENDS = [
    "jax",
    "torch",
    "torch_native",
    "tensorflow",
    "tensorflow_native",
]

__all__ = ["AVAILABLE_BACKENDS"]
