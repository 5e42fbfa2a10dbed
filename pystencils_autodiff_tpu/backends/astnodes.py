"""Framework binding modules: generated native translation units.

Parity with the reference's ``backends/astnodes.py`` (SURVEY.md §2.1 #6):
``TorchModule`` and ``TensorflowModule`` bundle generated kernel code with
framework glue and a ``.compile()`` that returns a loaded, callable module.

Differences from the reference, by design:

* ``TorchModule`` loads the kernels through ctypes and wraps them as
  ``call_forward`` / ``call_backward`` callables over torch CPU tensors
  (pybind11/torch-extension headers are not part of this environment; the
  destructuring the reference generates in C++ happens on the Python side).
* ``TensorflowModule`` generates a *real* TF custom-op translation unit
  (``REGISTER_OP`` + ``OpKernel`` + shape inference, jinja2-templated like
  the reference's ``JinjaCppFile``), compiles it with
  ``tf.sysconfig`` flags and loads it via ``tf.load_op_library`` —
  the direct rebuild of the reference's TF-native path (#10/#11).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import jinja2
import numpy as np

from ..codegen.c_printer import generate_c_source, kernel_symbol_name
from ..codegen.jit import compile_shared_library
from ..ops.common import backward_program, forward_program

__all__ = ["TorchModule", "TensorflowModule"]


def _camel(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_"))


class _CompiledKernels:
    """ctypes-loaded fwd(interior) + bwd(full) kernel pair."""

    def __init__(self, op, dtype):
        from ._c_native import NativeKernel

        self.fwd = NativeKernel(forward_program(op), False, dtype)
        self.bwd = NativeKernel(backward_program(op), True, dtype)


class TorchModule:
    """Generated native kernels wrapped for torch (reference ≈L30)."""

    def __init__(self, module_name: str, autodiff_op, dtype=np.float64):
        self.module_name = module_name
        self.op = autodiff_op
        self.dtype = np.dtype(dtype)
        fwdp = forward_program(autodiff_op)
        bwdp = backward_program(autodiff_op)
        self.sources = {
            "forward": generate_c_source(fwdp, False, dtype=self.dtype),
            "backward": generate_c_source(bwdp, True, dtype=self.dtype),
        }

    def compile(self):
        kernels = _CompiledKernels(self.op, self.dtype)
        module = self

        class _Loaded:
            def call_forward(self, **arrays):
                import torch

                np_in = {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                         else np.asarray(v) for k, v in arrays.items()}
                outs = kernels.fwd(np_in)
                import torch as _t
                return {k: _t.from_numpy(v) for k, v in outs.items()}

            def call_backward(self, **arrays):
                import torch

                np_in = {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                         else np.asarray(v) for k, v in arrays.items()}
                outs = kernels.bwd(np_in)
                return {k: torch.from_numpy(v) for k, v in outs.items()}

            sources = module.sources

        return _Loaded()


_TF_TEMPLATE = jinja2.Template('''\
// Auto-generated TensorFlow custom op module for {{ op_name }}
// (rebuild of the reference's TensorflowModule output: REGISTER_OP +
//  OpKernel wrappers around generated stencil kernels)
#include "tensorflow/core/framework/op.h"
#include "tensorflow/core/framework/op_kernel.h"
#include "tensorflow/core/framework/shape_inference.h"

using namespace tensorflow;

extern "C" {
{{ fwd_kernel_source }}
{{ bwd_kernel_source }}
}

{% for spec in ops %}
REGISTER_OP("{{ spec.tf_name }}")
{% for i in spec.inputs %}    .Input("{{ i }}: {{ tf_dtype }}")
{% endfor %}{% for o in spec.outputs %}    .Output("{{ o }}: {{ tf_dtype }}")
{% endfor %}    .SetShapeFn([](shape_inference::InferenceContext* c) {
{% for k in range(spec.outputs | length) %}        c->set_output({{ k }}, c->input(0));
{% endfor %}        return absl::OkStatus();
    });

class {{ spec.tf_name }}Op : public OpKernel {
 public:
  explicit {{ spec.tf_name }}Op(OpKernelConstruction* ctx) : OpKernel(ctx) {}
  void Compute(OpKernelContext* ctx) override {
    // tensor destructuring: flat<T>().data() + dim sizes
    // (reference: TensorflowTensorDestructuring, SURVEY.md #7)
{% for i in spec.inputs %}    const Tensor& t_{{ i }} = ctx->input({{ loop.index0 }});
{% endfor %}    const TensorShape& shp = t_{{ spec.inputs[0] }}.shape();
    long long shape[{{ ndim }}];
    for (int d = 0; d < {{ ndim }}; ++d) shape[d] = shp.dim_size(d);
{% for o in spec.outputs %}    Tensor* t_out_{{ o }} = nullptr;
    OP_REQUIRES_OK(ctx, ctx->allocate_output({{ loop.index0 }}, shp, &t_out_{{ o }}));
{% endfor %}    {{ spec.kernel }}(
{% for i in spec.inputs %}        t_{{ i }}.flat<{{ ctype }}>().data(),
{% endfor %}{% for o in spec.outputs %}        t_out_{{ o }}->flat<{{ ctype }}>().data(){{ "," if not loop.last }}
{% endfor %}        , shape);
  }
};
REGISTER_KERNEL_BUILDER(Name("{{ spec.tf_name }}").Device(DEVICE_CPU), {{ spec.tf_name }}Op);
{% endfor %}
''')


class TensorflowModule:
    """Generated TF custom-op library for an AutoDiffOp's kernel pair
    (reference ``TensorflowModule``, ≈L140)."""

    def __init__(self, module_name: str, autodiff_op, dtype=np.float64):
        self.module_name = module_name
        self.op = autodiff_op
        self.dtype = np.dtype(dtype)
        self.fwd_prog = forward_program(autodiff_op)
        self.bwd_prog = backward_program(autodiff_op)
        ctype = {"float64": "double", "float32": "float"}[self.dtype.name]
        tf_dtype = {"float64": "float64", "float32": "float32"}[self.dtype.name]
        uid = hashlib.sha256(
            (module_name + repr(sorted(f.name for f in autodiff_op.forward_input_fields))
             + self.dtype.name).encode()).hexdigest()[:8]
        base = _camel(module_name) + uid.capitalize()
        self.fwd_tf_name = base + "Fwd"
        self.bwd_tf_name = base + "Bwd"
        self.source = _TF_TEMPLATE.render(
            op_name=module_name,
            ndim=self.fwd_prog.ndim,
            ctype=ctype,
            tf_dtype=tf_dtype,
            fwd_kernel_source=generate_c_source(self.fwd_prog, False, self.dtype),
            bwd_kernel_source=generate_c_source(self.bwd_prog, True, self.dtype),
            ops=[
                {
                    "tf_name": self.fwd_tf_name,
                    "inputs": [f.name for f in self.fwd_prog.input_fields],
                    "outputs": [f.name for f in self.fwd_prog.output_fields],
                    "kernel": kernel_symbol_name(self.fwd_prog, False),
                },
                {
                    "tf_name": self.bwd_tf_name,
                    "inputs": [f.name for f in self.bwd_prog.input_fields],
                    "outputs": [f.name for f in self.bwd_prog.output_fields],
                    "kernel": kernel_symbol_name(self.bwd_prog, True),
                },
            ],
        )

    def compile(self):
        """g++ with tf.sysconfig flags → .so → tf.load_op_library."""
        import tensorflow as tf

        flags = [f for f in tf.sysconfig.get_compile_flags()
                 if not f.startswith("--std")]
        link = tf.sysconfig.get_link_flags()
        # no -march=native: TF's bundled Eigen AVX512-FP16 headers don't
        # compile under it with this g++; -O3 + default arch is fine for
        # the binding layer (the stencil loops still vectorise).
        base = ["-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17", "-x", "c++"]
        so = compile_shared_library(self.source,
                                    name_hint=f"tfop_{self.module_name}",
                                    extra_flags=flags + link,
                                    base_flags=base)
        return tf.load_op_library(str(so))
