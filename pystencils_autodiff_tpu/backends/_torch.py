"""PyTorch backends: stencil ops as ``torch.autograd.Function``s.

Parity with the reference's ``backends/_pytorch.py`` (shim) and
``backends/_torch_native.py`` (SURVEY.md §2.1 #4/#5, call stack §3.3):

* ``native=False`` (default): forward/backward run the JAX-lowered kernels
  (jnp or Pallas — on TPU if attached) with host transfer at the torch
  boundary; the backward uses ``jax.vjp`` so all exact-VJP machinery
  (cotangent interior masking, ghost-padded adjoint) is reused.
* ``native=True``: forward/backward call the generated-and-g++-compiled C
  kernels directly on the tensors' memory — no JAX in the loop, the direct
  analog of the reference's compiled torch extension path.

torch is an optional dependency, imported lazily (the reference's
capability-gating pattern, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["create_autograd_function", "torch_dtype_to_numpy",
           "numpy_dtype_to_torch"]


def torch_dtype_to_numpy(dtype) -> np.dtype:
    """Reference parity helper (``backends/_pytorch.py``)."""
    return np.dtype(str(dtype).replace("torch.", ""))


def numpy_dtype_to_torch(dtype):
    import torch

    return getattr(torch, np.dtype(dtype).name)


def create_autograd_function(autodiff_op, native: bool = False,
                             lowering: str = "jnp", dtype=None, **kwargs):
    """Return ``apply(*tensors) -> tensor(s)`` participating in torch
    autograd, inputs ordered by ``autodiff_op.forward_input_fields``
    (also exposed as ``.input_names``)."""
    import torch

    in_names = [f.name for f in autodiff_op.forward_input_fields]
    out_names = [f.name for f in autodiff_op.forward_output_fields]
    constant = {f.name for f in autodiff_op.constant_fields}

    if native:
        from ._c_native import create_native_function_pair

        pair = create_native_function_pair(
            autodiff_op, dtype=dtype or np.float64)
        saved_names = [f.name for f in autodiff_op.saved_fields]

        class _NativeOp(torch.autograd.Function):
            @staticmethod
            def forward(ctx, *tensors):
                arrays = {n: t.detach().cpu().numpy()
                          for n, t in zip(in_names, tensors)}
                outs = pair.forward(**arrays)
                ctx.saved_arrays = {n: arrays[n] for n in saved_names}
                ctx.in_dtypes = [t.dtype for t in tensors]
                res = tuple(torch.from_numpy(outs[n]) for n in out_names)
                return res if len(res) > 1 else res[0]

            @staticmethod
            def backward(ctx, *grad_outputs):
                cots = {n: g.detach().cpu().numpy()
                        for n, g in zip(out_names, grad_outputs)}
                grads = pair.backward(cots, ctx.saved_arrays)
                out = []
                for n, dt in zip(in_names, ctx.in_dtypes):
                    if n in grads and n not in constant:
                        out.append(torch.from_numpy(
                            np.ascontiguousarray(grads[n])).to(dt))
                    else:
                        out.append(None)
                return tuple(out)

        fn_cls = _NativeOp
    else:
        import jax
        import jax.numpy as jnp

        f_jax = autodiff_op.jax_function(lowering=lowering, **kwargs)

        class _JaxOp(torch.autograd.Function):
            @staticmethod
            def forward(ctx, *tensors):
                arrays = tuple(jnp.asarray(t.detach().cpu().numpy())
                               for t in tensors)
                out, vjp_fn = jax.vjp(lambda *a: f_jax(*a), *arrays)
                ctx.vjp_fn = vjp_fn
                ctx.multi = isinstance(out, tuple)
                outs = out if ctx.multi else (out,)
                res = tuple(torch.from_numpy(np.asarray(o)) for o in outs)
                return res if len(res) > 1 else res[0]

            @staticmethod
            def backward(ctx, *grad_outputs):
                cots = tuple(jnp.asarray(g.detach().cpu().numpy())
                             for g in grad_outputs)
                grads = ctx.vjp_fn(cots if ctx.multi else cots[0])
                out = []
                for n, g in zip(in_names, grads):
                    out.append(None if n in constant
                               else torch.from_numpy(np.asarray(g)))
                return tuple(out)

        fn_cls = _JaxOp

    def apply(*tensors):
        return fn_cls.apply(*tensors)

    apply.input_names = in_names
    apply.output_names = out_names
    apply.function_class = fn_cls
    return apply
