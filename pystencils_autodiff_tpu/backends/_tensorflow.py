"""TensorFlow shim backend: stencil ops as differentiable TF functions.

Parity with the reference's ``backends/_tensorflow.py`` (SURVEY.md §2.1 #9):
wraps the lowered kernels as TF ops via ``tf.py_function`` and pairs the
forward with the symbolically derived backward through
``tf.custom_gradient`` (TF2's replacement for the reference's
``tf.RegisterGradient`` + ``gradient_override_map`` TF1 machinery).

The backward path reuses ``jax.vjp`` of the custom_vjp op, so cotangent
interior masking and ghost-cell exactness are identical to the JAX path.
For the compiled-native variant see ``_tensorflow_native.py``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["tensorflow_function"]


def tensorflow_function(autodiff_op, lowering: str = "jnp", **kwargs):
    """Return ``f(*tensors) -> tensor(s)`` differentiable under
    ``tf.GradientTape``, inputs ordered by ``forward_input_fields``."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    f_jax = autodiff_op.jax_function(lowering=lowering, **kwargs)
    in_names = [f.name for f in autodiff_op.forward_input_fields]
    out_names = [f.name for f in autodiff_op.forward_output_fields]
    constant = {f.name for f in autodiff_op.constant_fields}
    multi = len(out_names) > 1

    @tf.custom_gradient
    def op(*tensors):
        state = {}

        def run_forward(*np_arrays):
            arrays = tuple(jnp.asarray(np.asarray(a)) for a in np_arrays)
            out, vjp_fn = jax.vjp(lambda *a: f_jax(*a), *arrays)
            state["vjp"] = vjp_fn
            outs = out if isinstance(out, tuple) else (out,)
            return [np.asarray(o) for o in outs]

        dtype = tensors[0].dtype
        outs = tf.py_function(run_forward, list(tensors),
                              [dtype] * len(out_names))
        shape = tensors[0].shape
        outs = [tf.ensure_shape(o, shape) for o in outs]

        def grad(*cotangents):
            def run_backward(*np_cots):
                cots = tuple(jnp.asarray(np.asarray(c)) for c in np_cots)
                grads = state["vjp"](cots if multi else cots[0])
                return [np.asarray(g) for g in grads]

            gs = tf.py_function(run_backward, list(cotangents),
                                [dtype] * len(in_names))
            out = []
            for n, g, t in zip(in_names, gs, tensors):
                out.append(None if n in constant else tf.ensure_shape(g, t.shape))
            return out

        return (outs if multi else outs[0]), grad

    op.input_names = in_names
    op.output_names = out_names
    return op
