"""Framework binding modules: generated native translation units.

Parity with the reference's ``backends/astnodes.py`` (SURVEY.md §2.1 #6):
``TorchModule`` and ``TensorflowModule`` bundle generated kernel code with
framework glue and a ``.compile()`` that returns a loaded, callable module.

Both binding layers are *real* compiled translation units:

* ``TorchModule`` generates a ``torch/extension.h`` + ``PYBIND11_MODULE``
  TU whose ``call_forward``/``call_backward`` destructure ``at::Tensor``
  args into raw pointers (``data_ptr<T>()``/``size(d)`` — the reference's
  ``PyTorchTensorDestructuring``, SURVEY.md §3.3) and invoke the generated
  stencil kernels zero-copy; ``.compile()`` builds it with g++ against
  torch's bundled headers/libs (torch ships its own pybind11) and imports
  the extension.  A ctypes fallback (``extension=False``) keeps the path
  alive without torch headers.
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

from ..adjoint_field import AdjointField
from ..codegen.c_printer import generate_c_source, kernel_symbol_name
from ..codegen.jit import compile_shared_library
from ..ops.common import backward_program, forward_program

__all__ = ["TorchModule", "TensorflowModule", "PybindModule"]


def _camel(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_"))


class _CompiledKernels:
    """ctypes-loaded fwd(interior) + bwd-stage(full) kernels."""

    def __init__(self, op, dtype):
        from ._c_native import NativeKernel
        from ..ops.common import backward_programs

        self.fwd = NativeKernel(forward_program(op), False, dtype)
        self._bwd_stages = [NativeKernel(p, True, dtype)
                            for p in backward_programs(op)]

    def bwd(self, arrays):
        env = dict(arrays)
        for kern in self._bwd_stages:
            outs = kern(env)
            env.update(outs)
        return outs


_TORCH_TEMPLATE = jinja2.Template('''\
// Auto-generated torch extension module for {{ op_name }}
// (the reference's TorchModule output: torch/extension.h + PYBIND11_MODULE
//  around generated stencil kernels, SURVEY.md §3.3)
#include <torch/extension.h>
#include <vector>

extern "C" {
{{ fwd_kernel_source }}
{{ bwd_kernel_source }}
}

{% for spec in kernels %}
std::vector<at::Tensor> {{ spec.pyname }}(std::vector<at::Tensor> inputs) {
  TORCH_CHECK(inputs.size() == {{ spec.inputs | length }},
              "{{ spec.pyname }}: expected {{ spec.inputs | length }} inputs");
  // tensor destructuring: contiguous + dtype check + data_ptr/size
  // (reference: PyTorchTensorDestructuring)
{% for i in spec.inputs %}  at::Tensor t_{{ loop.index0 }} = inputs[{{ loop.index0 }}].contiguous();
  TORCH_CHECK(t_{{ loop.index0 }}.scalar_type() == {{ at_type }},
              "{{ spec.pyname }}: input '{{ i.name }}' must be {{ at_type }}");
{% endfor %}  long long shape[{{ ndim }}];
  for (int d = 0; d < {{ ndim }}; ++d) shape[d] = t_0.size({{ 'd + ' + (spec.inputs[0].index_dims | string) if spec.inputs[0].index_major else 'd' }});
{% for o in spec.outputs %}{% if o.accum_pos is not none %}  at::Tensor out_{{ loop.index0 }} = t_{{ o.accum_pos }}.clone();
{% else %}  at::Tensor out_{{ loop.index0 }} = at::zeros({ {{ o.sizes }} }, t_0.options());
{% endif %}{% endfor %}  {{ spec.kernel }}(
{% for i in spec.inputs %}      t_{{ loop.index0 }}.data_ptr<{{ ctype }}>(),
{% endfor %}{% for o in spec.outputs %}      out_{{ loop.index0 }}.data_ptr<{{ ctype }}>(),
{% endfor %}      shape);
  return { {% for o in spec.outputs %}out_{{ loop.index0 }}{{ ", " if not loop.last }}{% endfor %} };
}
{% endfor %}

PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {
{% for spec in kernels %}  m.def("{{ spec.pyname }}", &{{ spec.pyname }}, "{{ spec.doc }}");
{% endfor %}}
''')


def _torch_kernel_spec(program, full_domain: bool, pyname: str, doc: str):
    """Template data for one kernel wrapper: input order, output allocation
    (zeros, or clone of the accum-previous input), storage-layout sizes."""
    in_names = [f.name for f in program.input_fields]
    inputs = [{"name": f.name,
               "index_dims": f.index_dimensions,
               "index_major": bool(getattr(f, "index_major", False))}
              for f in program.input_fields]
    outputs = []
    for f in program.output_fields:
        accum_pos = (in_names.index(f.name)
                     if f in program.accum_fields and f.name in in_names
                     else None)
        sp_dims = [f"shape[{d}]" for d in range(program.ndim)]
        idx_dims = [str(s) for s in f.index_shape]
        dims = (idx_dims + sp_dims if getattr(f, "index_major", False)
                else sp_dims + idx_dims)
        outputs.append({"sizes": ", ".join(dims), "accum_pos": accum_pos})
    return {"pyname": pyname, "doc": doc, "inputs": inputs,
            "outputs": outputs,
            "kernel": kernel_symbol_name(program, full_domain)}


class TorchModule:
    """Generated torch extension around the kernel pair (reference ≈L30).

    ``.compile()`` returns a loaded module exposing dict-based
    ``call_forward(**tensors)`` / ``call_backward(**tensors)`` (field-name
    keyed, program argument order handled internally).  With
    ``extension=True`` (default) these run through a real compiled
    ``PYBIND11_MODULE`` — tensors pass zero-copy as ``at::Tensor``; the
    ctypes fallback routes through numpy views.
    """

    def __init__(self, module_name: str, autodiff_op, dtype=np.float64):
        from ..ops.common import backward_programs

        self.module_name = module_name
        self.op = autodiff_op
        self.dtype = np.dtype(dtype)
        self.fwd_prog = forward_program(autodiff_op)
        # staged backward (TF_MAD materialised-Jacobian): one kernel per
        # pass, chained by the caller; single-pass ops have one stage
        self.bwd_progs = backward_programs(autodiff_op)
        self.bwd_prog = self.bwd_progs[-1]
        fwd_src = generate_c_source(self.fwd_prog, False, dtype=self.dtype)
        bwd_srcs = [generate_c_source(p, True, dtype=self.dtype)
                    for p in self.bwd_progs]
        self.sources = {"forward": fwd_src, "backward": "\n".join(bwd_srcs)}
        ctype = {"float64": "double", "float32": "float"}[self.dtype.name]
        at_type = {"float64": "at::kDouble", "float32": "at::kFloat"}[self.dtype.name]
        specs = [_torch_kernel_spec(self.fwd_prog, False, "call_forward",
                                    f"{module_name} forward stencil")]
        for i, p in enumerate(self.bwd_progs):
            specs.append(_torch_kernel_spec(
                p, True, f"call_backward_s{i}",
                f"{module_name} adjoint stencil pass {i}"))
        self.extension_source = _TORCH_TEMPLATE.render(
            op_name=module_name,
            ndim=self.fwd_prog.ndim,
            ctype=ctype,
            at_type=at_type,
            fwd_kernel_source=fwd_src,
            bwd_kernel_source=self.sources["backward"],
            kernels=specs,
        )

    def _compile_extension(self):
        """g++ against torch's bundled headers/pybind11 → import the .so."""
        import importlib.util
        import sysconfig

        import torch
        from torch.utils import cpp_extension as tce

        name = "pstorch_" + hashlib.sha256(
            self.extension_source.encode()).hexdigest()[:16]
        source = self.extension_source.replace("TORCH_EXTENSION_NAME", name)
        includes = [f"-I{p}" for p in tce.include_paths()]
        includes.append(f"-I{sysconfig.get_paths()['include']}")
        lib_dirs = tce.library_paths()
        links = [f"-L{d}" for d in lib_dirs]
        links += [f"-Wl,-rpath,{d}" for d in lib_dirs]
        # -l flags go AFTER the source (post_flags): GNU ld resolves
        # left-to-right, --no-as-needed keeps the DT_NEEDED entries even
        # though most symbols resolve lazily at import time.
        libs = ["-Wl,--no-as-needed",
                "-ltorch", "-ltorch_cpu", "-lc10", "-ltorch_python"]
        abi = int(getattr(torch._C, "_GLIBCXX_USE_CXX11_ABI", True))
        base = ["-O3", "-fPIC", "-shared", "-fopenmp", "-std=c++17",
                f"-D_GLIBCXX_USE_CXX11_ABI={abi}",
                f"-DTORCH_EXTENSION_NAME={name}", "-x", "c++"]
        so = compile_shared_library(source, name_hint=name,
                                    extra_flags=includes + links,
                                    base_flags=base, post_flags=libs)
        spec = importlib.util.spec_from_file_location(name, so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def compile(self, extension: bool = True):
        fwd_in = [f.name for f in self.fwd_prog.input_fields]
        fwd_out = [f.name for f in self.fwd_prog.output_fields]
        stage_sigs = [([f.name for f in p.input_fields],
                       [f.name for f in p.output_fields])
                      for p in self.bwd_progs]
        out_adj = {AdjointField(f).name for f in self.op.forward_output_fields}
        interior_sl = self.fwd_prog.interior_slices()
        module = self

        if extension:
            ext = self._compile_extension()

            class _Loaded:
                """Compiled torch extension; tensors pass zero-copy."""

                raw = ext
                sources = module.sources
                extension_source = module.extension_source
                is_extension = True
                n_backward_stages = len(stage_sigs)

                def call_forward(self, **tensors):
                    outs = ext.call_forward([tensors[n] for n in fwd_in])
                    return dict(zip(fwd_out, outs))

                def call_backward_stage(self, i, **tensors):
                    ins, outs_n = stage_sigs[i]
                    fn = getattr(ext, f"call_backward_s{i}")
                    outs = fn([tensors[n] for n in ins])
                    return dict(zip(outs_n, outs))

                def call_backward(self, **tensors):
                    """Chain all backward passes (one for single-pass ops;
                    Jacobian stage(s) then gather for TF_MAD), masking the
                    incoming output cotangents to the forward interior
                    first (the exact VJP of interior-only writes; the raw
                    stage kernels expect pre-masked cotangents)."""
                    import torch as _torch

                    env = dict(tensors)
                    for name in out_adj & env.keys():
                        masked = _torch.zeros_like(env[name])
                        masked[interior_sl] = env[name][interior_sl]
                        env[name] = masked
                    for i in range(len(stage_sigs)):
                        env.update(self.call_backward_stage(i, **env))
                    _, outs_n = stage_sigs[-1]
                    return {n: env[n] for n in outs_n}

            return _Loaded()

        kernels = _CompiledKernels(self.op, self.dtype)

        class _LoadedCtypes:
            """ctypes fallback: numpy views at the boundary."""

            sources = module.sources
            is_extension = False

            def call_forward(self, **arrays):
                import torch

                np_in = {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                         else np.asarray(v) for k, v in arrays.items()}
                outs = kernels.fwd(np_in)
                return {k: torch.from_numpy(v) for k, v in outs.items()}

            def call_backward(self, **arrays):
                import torch

                np_in = {k: v.detach().cpu().numpy() if hasattr(v, "detach")
                         else np.asarray(v) for k, v in arrays.items()}
                outs = kernels.bwd(np_in)
                return {k: torch.from_numpy(v) for k, v in outs.items()}

        return _LoadedCtypes()


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
                                    extra_flags=flags,
                                    base_flags=base, post_flags=link)
        return tf.load_op_library(str(so))


_PYBIND_TEMPLATE = jinja2.Template('''\
// Auto-generated plain extension module for {{ op_name }}
// (the reference's framework-free PybindModule variant, SURVEY.md §2.1 #6
//  ≈L270–L330, emitted against the CPython C API + buffer protocol since
//  pybind11 is not vendored here: any C-contiguous ndarray-like works)
#include <Python.h>

extern "C" {
{{ kernel_sources }}
}

{% for spec in specs %}
static PyObject* py_{{ spec.pyname }}(PyObject* self, PyObject* args) {
  (void)self;
  const int n_in = {{ spec.n_in }}, n_out = {{ spec.n_out }};
  Py_buffer views[{{ spec.n_in + spec.n_out }}];
  int acq = 0;
  long long shape[{{ ndim }}];
  if (PyTuple_GET_SIZE(args) != n_in + n_out) {
    PyErr_SetString(PyExc_TypeError,
                    "{{ spec.pyname }}: expected {{ spec.n_in }} input + "
                    "{{ spec.n_out }} output buffers");
    return NULL;
  }
  for (int i = 0; i < n_in + n_out; ++i) {
    int flags = PyBUF_C_CONTIGUOUS | PyBUF_FORMAT;
    if (i >= n_in) flags |= PyBUF_WRITABLE;
    if (PyObject_GetBuffer(PyTuple_GET_ITEM(args, i), &views[i], flags) != 0)
      goto fail;
    acq = i + 1;
    if (views[i].itemsize != (Py_ssize_t)sizeof({{ ctype }})) {
      PyErr_Format(PyExc_TypeError,
                   "{{ spec.pyname }}: argument %d has itemsize %zd, "
                   "expected %zd ({{ ctype }})", i, views[i].itemsize,
                   (Py_ssize_t)sizeof({{ ctype }}));
      goto fail;
    }
  }
  if (views[0].ndim < {{ ndim }}) {
    PyErr_SetString(PyExc_ValueError,
                    "{{ spec.pyname }}: first input has rank < {{ ndim }}");
    goto fail;
  }
  for (int d = 0; d < {{ ndim }}; ++d)
    shape[d] = (long long)views[0].shape[d];
  Py_BEGIN_ALLOW_THREADS
  {{ spec.kernel }}(
{%- for i in range(spec.n_in) %}(const {{ ctype }}*)views[{{ i }}].buf, {% endfor %}
{%- for i in range(spec.n_out) %}({{ ctype }}*)views[{{ spec.n_in + i }}].buf, {% endfor %}shape);
  Py_END_ALLOW_THREADS
  for (int i = 0; i < acq; ++i) PyBuffer_Release(&views[i]);
  Py_RETURN_NONE;
fail:
  for (int i = 0; i < acq; ++i) PyBuffer_Release(&views[i]);
  return NULL;
}
{% endfor %}

static PyMethodDef Methods[] = {
{% for spec in specs %}  {"{{ spec.pyname }}", py_{{ spec.pyname }}, METH_VARARGS,
   "{{ spec.doc }} (positional: inputs then preallocated outputs)"},
{% endfor %}  {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
  PyModuleDef_HEAD_INIT, "{{ init_name }}",
  "Generated stencil kernels for {{ op_name }}", -1, Methods,
  NULL, NULL, NULL, NULL
};

PyMODINIT_FUNC PyInit_{{ init_name }}(void) {
  return PyModule_Create(&moduledef);
}
''')


class PybindModule:
    """Plain compiled extension module around the kernel pair — the analog
    of the reference's framework-free ``PybindModule`` (SURVEY.md §2.1 #6
    ≈L270–L330): no torch/TF headers, just ``Python.h`` and the buffer
    protocol, so the compiled ``.so`` binds any C-contiguous ndarray-like
    zero-copy.  (The reference's ``CudaModule`` sibling has no file-level
    analog by design: the accelerator path here IS the Pallas lowering,
    ops/pallas_kernel.py.)

    ``.compile()`` imports the extension and returns a loaded wrapper with
    dict-based ``call_forward(**arrays)`` / ``call_backward(**arrays)``
    (field-name keyed; output allocation and backward-stage chaining are
    handled Python-side, raw positional kernels live on ``.raw``).
    """

    def __init__(self, module_name: str, autodiff_op, dtype=np.float64):
        from ..ops.common import backward_programs

        self.module_name = module_name
        self.op = autodiff_op
        self.dtype = np.dtype(dtype)
        self.fwd_prog = forward_program(autodiff_op)
        self.bwd_progs = backward_programs(autodiff_op)
        fwd_src = generate_c_source(self.fwd_prog, False, dtype=self.dtype)
        bwd_srcs = [generate_c_source(p, True, dtype=self.dtype)
                    for p in self.bwd_progs]
        self.sources = {"forward": fwd_src, "backward": "\n".join(bwd_srcs)}
        ctype = {"float64": "double", "float32": "float"}[self.dtype.name]

        def spec(prog, full_domain, pyname, doc):
            return {"pyname": pyname, "doc": doc,
                    "n_in": len(prog.input_fields),
                    "n_out": len(prog.output_fields),
                    "kernel": kernel_symbol_name(prog, full_domain)}

        self._specs = [spec(self.fwd_prog, False, "call_forward",
                            f"{module_name} forward stencil")]
        for i, p in enumerate(self.bwd_progs):
            self._specs.append(spec(p, True, f"call_backward_s{i}",
                                    f"{module_name} adjoint pass {i}"))
        self._init_name = "psext_" + hashlib.sha256(
            (module_name + fwd_src + self.sources["backward"]
             + self.dtype.name).encode()).hexdigest()[:16]
        self.extension_source = _PYBIND_TEMPLATE.render(
            op_name=module_name,
            ndim=self.fwd_prog.ndim,
            ctype=ctype,
            init_name=self._init_name,
            kernel_sources=fwd_src + "\n" + self.sources["backward"],
            specs=self._specs,
        )

    def _compile_extension(self):
        import importlib.util
        import sysconfig

        includes = [f"-I{sysconfig.get_paths()['include']}"]
        # no libpython link: extension symbols resolve from the running
        # interpreter at import time (standard ELF extension behaviour)
        so = compile_shared_library(self.extension_source,
                                    name_hint=self._init_name,
                                    extra_flags=includes)
        spec = importlib.util.spec_from_file_location(self._init_name, so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def compile(self):
        ext = self._compile_extension()
        module = self
        progs = [(self.fwd_prog, "call_forward")] + [
            (p, f"call_backward_s{i}")
            for i, p in enumerate(self.bwd_progs)]

        def run(prog, fn_name, arrays):
            """NativeKernel-style allocation, then one positional call."""
            ins, spatial = [], None
            for f in prog.input_fields:
                a = np.ascontiguousarray(arrays[f.name], dtype=module.dtype)
                if spatial is None:
                    spatial = a.shape[: f.spatial_dimensions]
                ins.append(a)
            outs = []
            for f in prog.output_fields:
                if f in prog.accum_fields and f.name in arrays:
                    o = np.array(arrays[f.name], dtype=module.dtype,
                                 copy=True)
                else:
                    o = np.zeros(tuple(spatial) + f.index_shape,
                                 module.dtype)
                outs.append(np.ascontiguousarray(o))
            getattr(ext, fn_name)(*ins, *outs)
            return dict(zip(prog.output_names, outs))

        out_adj = {AdjointField(f).name for f in self.op.forward_output_fields}
        sl = self.fwd_prog.interior_slices()

        class _Loaded:
            raw = ext
            sources = module.sources
            extension_source = module.extension_source
            is_extension = True
            n_backward_stages = len(module.bwd_progs)

            def call_forward(self, **arrays):
                return run(progs[0][0], progs[0][1], arrays)

            def call_backward_stage(self, i, **arrays):
                prog, fn_name = progs[1 + i]
                return run(prog, fn_name, arrays)

            def call_backward(self, **arrays):
                """Chain all backward passes, masking the incoming output
                cotangents to the forward interior first (the exact VJP of
                interior-only writes — same rule as ops/vjp.py and
                NativeFunctionPair.backward; the raw positional stage
                kernels expect pre-masked cotangents)."""
                env = dict(arrays)
                for name in out_adj & env.keys():
                    cot = np.asarray(env[name], dtype=module.dtype)
                    masked = np.zeros_like(cot)
                    masked[sl] = cot[sl]
                    env[name] = masked
                outs = None
                for i in range(len(module.bwd_progs)):
                    outs = self.call_backward_stage(i, **env)
                    env.update(outs)
                return outs

        return _Loaded()
