"""Generated-C CPU backend: the reference's native kernel path rebuilt.

Where the reference generates C/CUDA via pystencils and JIT-compiles it into
torch/TF extension modules (SURVEY.md §2.2), this backend generates C from a
``StencilProgram`` (codegen/c_printer.py), compiles it with g++
(codegen/jit.py) and calls it on numpy arrays through ctypes.  It serves as

* a JAX-independent correctness oracle and fast CPU execution path,
* the kernel substrate for the torch-native backend (backends/_torch.py
  ``native=True``), mirroring the reference's ``_torch_native.py``.

``extern "C"`` linkage; arrays are passed as raw pointers plus a shape
vector (the destructuring the reference does with
``DestructuringBindingsForFieldClass``, SURVEY.md §2.1 #7, is done on the
Python side here — JAX-world tensors are plain ndarrays, no framework
tensor class to unpack).
"""

from __future__ import annotations

import ctypes
from typing import Dict, Optional

import numpy as np

from ..adjoint_field import AdjointField
from ..codegen.c_printer import generate_c_source, kernel_symbol_name
from ..codegen.jit import compile_and_load
from ..ops.common import (StencilProgram, backward_programs, forward_program,
                          is_staged_backward)

__all__ = ["make_c_stencil", "create_native_function_pair", "NativeKernel"]

_PTR = {
    np.dtype("float64"): ctypes.POINTER(ctypes.c_double),
    np.dtype("float32"): ctypes.POINTER(ctypes.c_float),
}


def _wrap_source(program: StencilProgram, full_domain: bool, dtype) -> str:
    body = generate_c_source(program, full_domain, dtype=dtype)
    return 'extern "C" {\n' + body + "\n}\n"


class NativeKernel:
    """A compiled C kernel for one (program, domain-mode, dtype)."""

    def __init__(self, program: StencilProgram, full_domain: bool = False,
                 dtype=np.float64):
        self.program = program
        self.full_domain = full_domain
        self.dtype = np.dtype(dtype)
        source = _wrap_source(program, full_domain, self.dtype)
        self.source = source
        lib = compile_and_load(source, name_hint=program.name)
        self._fn = getattr(lib, kernel_symbol_name(program, full_domain))
        ptr = _PTR[self.dtype]
        n_in = len(program.input_fields)
        n_out = len(program.output_fields)
        self._fn.argtypes = [ptr] * (n_in + n_out) + [
            ctypes.POINTER(ctypes.c_longlong)]
        self._fn.restype = None

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        prog = self.program
        arrays = []
        spatial = None
        for f in prog.input_fields:
            a = np.ascontiguousarray(inputs[f.name], dtype=self.dtype)
            if spatial is None:
                spatial = a.shape[: f.spatial_dimensions]
            arrays.append(a)
        outs = []
        for f in prog.output_fields:
            if f in prog.accum_fields and f.name in inputs:
                o = np.array(inputs[f.name], dtype=self.dtype, copy=True)
            else:
                o = np.zeros(tuple(spatial) + f.index_shape, self.dtype)
            outs.append(o)
        shape = (ctypes.c_longlong * len(spatial))(*spatial)
        ptr = _PTR[self.dtype]
        self._fn(*[a.ctypes.data_as(ptr) for a in arrays],
                 *[o.ctypes.data_as(ptr) for o in outs],
                 shape)
        return dict(zip(prog.output_names, outs))


def make_c_stencil(program: StencilProgram, full_domain: bool = False,
                   dtype=None, adjoint_mask_ghost=None, **_ignored):
    """Lowering-registry adapter: numpy-calling stencil function.

    Note: unlike the jnp/pallas lowerings this is not jax-traceable — it is
    the standalone native path (reference kernel semantics).
    """
    kern = {}

    def fn(inputs):
        arrs = {k: np.asarray(v) for k, v in inputs.items()}
        if adjoint_mask_ghost is not None:
            for f in program.input_fields:
                if isinstance(f, AdjointField):
                    a = arrs[f.name]
                    sl = tuple(slice(lo, a.shape[d] - hi)
                               for d, (lo, hi) in enumerate(adjoint_mask_ghost))
                    m = np.zeros_like(a)
                    m[sl + (Ellipsis,)] = a[sl + (Ellipsis,)]
                    arrs[f.name] = m
        dt = np.dtype(dtype) if dtype else arrs[program.input_fields[0].name].dtype
        if dt not in kern:
            kern[dt] = NativeKernel(program, full_domain, dt)
        return kern[dt](arrs)

    fn.program = program
    fn.__name__ = f"c_{program.name}"
    return fn


class NativeFunctionPair:
    """Compiled fwd+bwd C kernels with exact-VJP glue on numpy
    (the ``AutoDiffAstPair``-compiled analog, SURVEY.md §3.2)."""

    def __init__(self, op, dtype=np.float64):
        self.op = op
        self.fwd_prog = forward_program(op)
        # staged backward (TF_MAD): one compiled C kernel per pass, chained
        self.bwd_progs = backward_programs(op)
        self.bwd_prog = self.bwd_progs[-1]
        self.dtype = np.dtype(dtype)
        self.forward_kernel = NativeKernel(self.fwd_prog, False, dtype)
        self.backward_kernels = [NativeKernel(p, True, dtype)
                                 for p in self.bwd_progs]
        self.backward_kernel = self.backward_kernels[-1]
        inter = (set(op.backward_assignments.intermediate_fields)
                 if is_staged_backward(op) else set())
        seen, self._bwd_ext_inputs = set(), []
        for p in self.bwd_progs:
            for f in p.input_fields:
                if f not in inter and f not in seen:
                    seen.add(f)
                    self._bwd_ext_inputs.append(f)

    def forward(self, **inputs) -> Dict[str, np.ndarray]:
        return self.forward_kernel(inputs)

    __call__ = lambda self, **inputs: self.forward(**inputs)

    def backward(self, cotangents: Dict[str, np.ndarray],
                 saved: Optional[Dict[str, np.ndarray]] = None
                 ) -> Dict[str, np.ndarray]:
        """Gradients of forward inputs given cotangents of outputs.

        Applies the interior cotangent mask (exact VJP of interior-only
        writes, same as ops/vjp.py) before the full-domain backward kernel.
        """
        saved = saved or {}
        bwd_in: Dict[str, np.ndarray] = {}
        sl = self.fwd_prog.interior_slices()
        for f in self._bwd_ext_inputs:
            if isinstance(f, AdjointField):
                primal = f.corresponding_forward_field.name
                if primal in cotangents:
                    cot = np.asarray(cotangents[primal], dtype=self.dtype)
                    masked = np.zeros_like(cot)
                    masked[sl] = cot[sl]
                    bwd_in[f.name] = masked
                else:
                    ref = next(iter(cotangents.values()))
                    bwd_in[f.name] = np.zeros(
                        ref.shape[:self.fwd_prog.ndim]
                        + f.corresponding_forward_field.index_shape, self.dtype)
            else:
                bwd_in[f.name] = saved[f.name]
        env = dict(bwd_in)
        for kern in self.backward_kernels:
            grads = kern(env)
            env.update(grads)
        return {f.corresponding_forward_field.name: grads[f.name]
                for f in self.op.backward_output_fields}


def create_native_function_pair(op, dtype=np.float64) -> NativeFunctionPair:
    return NativeFunctionPair(op, dtype=dtype)
