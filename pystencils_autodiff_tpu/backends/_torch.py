"""PyTorch backends: stencil ops as ``torch.autograd.Function``s.

Parity with the reference's ``backends/_pytorch.py`` (shim) and
``backends/_torch_native.py`` (SURVEY.md §2.1 #4/#5, call stack §3.3):

* ``native=False`` (default): forward/backward run the JAX-lowered kernels
  (jnp or Pallas — on TPU if attached) with host transfer at the torch
  boundary; the backward uses ``jax.vjp`` so all exact-VJP machinery
  (cotangent interior masking, ghost-padded adjoint) is reused.
* ``native=True``: forward/backward call the generated kernels through a
  *compiled torch extension* (``TorchModule``: ``torch/extension.h`` +
  ``PYBIND11_MODULE``, tensors destructured to raw pointers in C++) — no
  JAX and no numpy copies in the loop, the direct rebuild of the
  reference's compiled torch extension path (SURVEY.md §3.3).  If the
  extension cannot build (no torch headers), falls back to the ctypes
  kernels with numpy views.

torch is an optional dependency, imported lazily (the reference's
capability-gating pattern, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["create_autograd_function", "TorchNativeFunctionPair",
           "torch_dtype_to_numpy", "numpy_dtype_to_torch"]


def torch_dtype_to_numpy(dtype) -> np.dtype:
    """Reference parity helper (``backends/_pytorch.py``)."""
    return np.dtype(str(dtype).replace("torch.", ""))


def numpy_dtype_to_torch(dtype):
    import torch

    return getattr(torch, np.dtype(dtype).name)


class TorchNativeFunctionPair:
    """Compiled torch-extension fwd+bwd kernels with exact-VJP glue in
    torch ops (the torch twin of ``_c_native.NativeFunctionPair``; the
    reference's compiled-extension call path, SURVEY.md §3.3).

    Tensors never leave torch: the extension destructures them to raw
    pointers in C++, and the interior cotangent mask is torch slicing.
    Falls back to ctypes+numpy kernels when the extension cannot build.
    """

    def __init__(self, op, dtype=np.float64, extension: bool = True):
        from ..adjoint_field import AdjointField
        from ..ops.common import forward_program, is_staged_backward
        from .astnodes import TorchModule

        self.op = op
        self.dtype = np.dtype(dtype)
        self.fwd_prog = forward_program(op)
        self._adjoint = AdjointField
        self.module = TorchModule(op.op_name, op, dtype=self.dtype)
        # external backward inputs across stages (staged TF_MAD: Jacobian
        # stage(s) then gather; intermediates flow stage-to-stage)
        inter = (set(op.backward_assignments.intermediate_fields)
                 if is_staged_backward(op) else set())
        seen, self._bwd_ext_inputs = set(), []
        for p in self.module.bwd_progs:
            for f in p.input_fields:
                if f not in inter and f not in seen:
                    seen.add(f)
                    self._bwd_ext_inputs.append(f)
        self.loaded = None
        if extension:
            try:
                self.loaded = self.module.compile(extension=True)
            except Exception as e:  # no torch headers / compiler issue
                import warnings

                warnings.warn(
                    f"torch extension build failed "
                    f"({type(e).__name__}: {str(e)[:200]}); falling back to "
                    f"the ctypes path (numpy copies at the boundary). Check "
                    f"is_extension to detect this programmatically.",
                    RuntimeWarning, stacklevel=2)
                self.loaded = None
        if self.loaded is None:
            self.loaded = self.module.compile(extension=False)
        self.is_extension = self.loaded.is_extension

    def _torch_dtype(self):
        import torch

        return getattr(torch, self.dtype.name)

    def forward(self, **tensors):
        dt = self._torch_dtype()
        tensors = {k: v.to(dt).contiguous() for k, v in tensors.items()}
        return self.loaded.call_forward(**tensors)

    __call__ = lambda self, **tensors: self.forward(**tensors)

    def backward(self, cotangents, saved=None):
        """Gradients of forward inputs given cotangents of outputs; applies
        the interior cotangent mask (exact VJP of interior-only writes,
        same as ops/vjp.py) with torch slicing."""
        import torch

        saved = saved or {}
        dt = self._torch_dtype()
        sl = self.fwd_prog.interior_slices()
        ref = next(iter(cotangents.values()))
        spatial = tuple(ref.shape[: self.fwd_prog.ndim])
        bwd_in = {}
        for f in self._bwd_ext_inputs:
            if isinstance(f, self._adjoint):
                primal = f.corresponding_forward_field
                if primal.name in cotangents:
                    cot = cotangents[primal.name].to(dt).contiguous()
                    masked = torch.zeros_like(cot)
                    masked[sl] = cot[sl]
                    bwd_in[f.name] = masked
                else:
                    # accumulation-previous adjoint starts at zero within
                    # one step (cross-step summation is the caller's loop)
                    bwd_in[f.name] = torch.zeros(
                        spatial + primal.index_shape, dtype=dt)
            else:
                bwd_in[f.name] = saved[f.name].to(dt).contiguous()
        grads = self.loaded.call_backward(**bwd_in)
        return {f.corresponding_forward_field.name: grads[f.name]
                for f in self.op.backward_output_fields}


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
        pair = TorchNativeFunctionPair(autodiff_op, dtype=dtype or np.float64)
        saved_names = [f.name for f in autodiff_op.saved_fields]

        class _NativeOp(torch.autograd.Function):
            @staticmethod
            def forward(ctx, *tensors):
                tensors = tuple(t.detach() for t in tensors)
                outs = pair.forward(**dict(zip(in_names, tensors)))
                # route saved primals through save_for_backward so autograd's
                # version counters catch in-place mutation between forward
                # and backward (advisor finding, round 2) and the tensors are
                # released after backward
                ctx.saved_input_names = [n for n in in_names
                                         if n in saved_names]
                ctx.save_for_backward(
                    *(t for n, t in zip(in_names, tensors)
                      if n in saved_names))
                ctx.in_dtypes = [t.dtype for t in tensors]
                res = tuple(outs[n] for n in out_names)
                return res if len(res) > 1 else res[0]

            @staticmethod
            def backward(ctx, *grad_outputs):
                cots = {n: g.detach()
                        for n, g in zip(out_names, grad_outputs)}
                saved = dict(zip(ctx.saved_input_names, ctx.saved_tensors))
                grads = pair.backward(cots, saved)
                out = []
                for n, dt in zip(in_names, ctx.in_dtypes):
                    if n in grads and n not in constant:
                        out.append(grads[n].to(dt))
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
