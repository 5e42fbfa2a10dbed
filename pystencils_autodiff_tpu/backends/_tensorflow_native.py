"""TensorFlow native backend: compiled custom-op pair with registered
gradient (reference ``backends/_tensorflow_native.py``, SURVEY.md §2.1 #10,
call stack §3.4).

The forward and backward stencil kernels are compiled into one TF custom-op
library (astnodes.TensorflowModule → codegen/jit → ``tf.load_op_library``);
the backward op is registered as the gradient of the forward op.  Cotangent
interior masking (the exact-VJP boundary rule, ops/vjp.py) is applied with
pure TF ops, so the whole path is py_function-free and graph-compilable.
"""

from __future__ import annotations

import numpy as np

from ..adjoint_field import AdjointField
from .astnodes import TensorflowModule

__all__ = ["create_tensorflow_op"]


def create_tensorflow_op(autodiff_op, dtype=np.float64):
    """Return a differentiable TF function backed by compiled native ops."""
    import tensorflow as tf

    module = TensorflowModule(autodiff_op.op_name, autodiff_op, dtype=dtype)
    lib = module.compile()

    def snake(name):
        out = []
        for i, ch in enumerate(name):
            if ch.isupper() and i and (not name[i - 1].isupper()
                                       or (i + 1 < len(name) and name[i + 1].islower())):
                out.append("_")
            out.append(ch.lower())
        return "".join(out)

    fwd_fn = getattr(lib, snake(module.fwd_tf_name))
    bwd_fn = getattr(lib, snake(module.bwd_tf_name))

    in_names = [f.name for f in module.fwd_prog.input_fields]
    out_names = [f.name for f in module.fwd_prog.output_fields]
    bwd_in_fields = module.bwd_prog.input_fields
    grad_names = [f.corresponding_forward_field.name
                  for f in autodiff_op.backward_output_fields]
    constant = {f.name for f in autodiff_op.constant_fields}
    ghost = module.fwd_prog.ghost
    multi = len(out_names) > 1

    def interior_mask(shape_tensor, dtype):
        """1 on the forward interior, 0 on the ghost frame (TF ops)."""
        ones_shape = [int(s) for s in shape_tensor]
        interior = [s - lo - hi for s, (lo, hi) in zip(ones_shape, ghost)]
        pad = [[lo, hi] for (lo, hi) in ghost]
        return tf.pad(tf.ones(interior, dtype), pad)

    @tf.custom_gradient
    def op(*tensors):
        outs = fwd_fn(*tensors)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]

        def grad(*cotangents):
            cots = dict(zip(out_names, cotangents))
            bwd_args = []
            for f in bwd_in_fields:
                if isinstance(f, AdjointField):
                    primal = f.corresponding_forward_field.name
                    if primal in cots:
                        c = cots[primal]
                        bwd_args.append(c * interior_mask(c.shape, c.dtype))
                    else:  # accumulation prev starts at zero per step
                        bwd_args.append(tf.zeros_like(tensors[0]))
                else:
                    bwd_args.append(tensors[in_names.index(f.name)])
            grads_out = bwd_fn(*bwd_args)
            if not isinstance(grads_out, (list, tuple)):
                grads_out = [grads_out]
            by_name = dict(zip(grad_names, grads_out))
            result = []
            for n in in_names:
                if n in by_name and n not in constant:
                    result.append(by_name[n])
                else:
                    result.append(None)
            return result

        return (list(outs) if multi else outs[0]), grad

    op.input_names = in_names
    op.output_names = out_names
    op.module = module
    return op
