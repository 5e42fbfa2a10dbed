"""C code generation for stencil programs.

The native-code analog of the reference's codegen stack
(``framework_integration/astnodes.py`` + ``FrameworkIntegrationPrinter``,
SURVEY.md §2.1 #6/#7): a ``StencilProgram`` is printed as a C translation
unit — an OpenMP-parallel loop nest over the ghost-shrunk interior with one
statement per CSE step — later compiled by codegen/jit.py (the
``tensorflow_jit.py`` analog) and called through ctypes or wrapped as
torch/TF native ops by backends/.

Two domain modes mirror ops/common.py:

* ``interior``: write ``lo ≤ i < S−hi``; ghost frame pre-zeroed by memset.
* ``full``: write every cell; out-of-range reads are zero for adjoint
  fields and edge-clamped for primal fields (exact-VJP semantics).
"""

from __future__ import annotations

from typing import List

import numpy as np
import sympy as sp
from sympy.printing.c import C99CodePrinter

from ..field import Field
from ..ops.common import StencilProgram, is_adjoint

__all__ = ["generate_c_source", "kernel_symbol_name"]

_CTYPE = {
    np.dtype("float64"): "double",
    np.dtype("float32"): "float",
}


def kernel_symbol_name(program: StencilProgram, full_domain: bool) -> str:
    return f"{program.name}_{'full' if full_domain else 'interior'}"


class _StencilCPrinter(C99CodePrinter):
    """Prints Field.Access atoms as (clamped/zero-extended) array reads."""

    def __init__(self, program: StencilProgram, full_domain: bool, ctype: str):
        super().__init__()
        self.program = program
        self.full = full_domain
        self.ctype = ctype

    def _index_expr(self, acc) -> str:
        nd = self.program.ndim
        f = acc.field
        terms = []
        for d in range(nd):
            o = acc.offsets[d]
            idx = f"i{d}" + (f" + {o}" if o > 0 else f" - {-o}" if o < 0 else "")
            if self.full:
                # clamp into bounds; adjoint out-of-range handled by the
                # zero-test in _print_access
                idx = f"_clamp({idx}, 0, s{d} - 1)"
            terms.append(idx)
        lin = terms[0]
        for d in range(1, nd):
            lin = f"({lin}) * s{d} + {terms[d]}"
        if f.index_shape:
            stride = int(np.prod(f.index_shape))
            flat = 0
            for i, s in zip(acc.index, f.index_shape):
                flat = flat * s + i
            lin = f"({lin}) * {stride} + {flat}"
        return lin

    def _print_Symbol(self, expr):
        if isinstance(expr, Field.Access):
            f = expr.field
            read = f"{f.name}[{self._index_expr(expr)}]"
            if self.full and is_adjoint(f) and any(o != 0 for o in expr.offsets):
                nd = self.program.ndim
                checks = []
                for d in range(nd):
                    o = expr.offsets[d]
                    if o:
                        idx = f"i{d}" + (f" + {o}" if o > 0 else f" - {-o}")
                        checks.append(f"({idx}) >= 0 && ({idx}) < s{d}")
                cond = " && ".join(checks)
                return f"(({cond}) ? {read} : ({self.ctype})0)"
            return read
        name = expr.name
        return "".join(ch if ch.isalnum() or ch == "_" else "_" for ch in name)

    def _print_Float(self, expr):
        s = super()._print_Float(expr)
        return s + "f" if self.ctype == "float" else s

    def _print_Rational(self, expr):
        suffix = "f" if self.ctype == "float" else ""
        return f"(({self.ctype}){expr.p}{suffix} / ({self.ctype}){expr.q}{suffix})"

    def _print_Pow(self, expr):
        # integer powers → repeated multiplication (no libm powf in hot loop)
        if expr.exp.is_Integer and 0 < int(expr.exp) <= 4:
            base = self._print(sp.UnevaluatedExpr(expr.base)) \
                if not expr.base.is_Symbol else self._print(expr.base)
            b = f"({base})"
            return "*".join([b] * int(expr.exp))
        return super()._print_Pow(expr)


def generate_c_source(program: StencilProgram, full_domain: bool,
                      dtype=np.float64, openmp: bool = True) -> str:
    """Emit a self-contained C translation unit for the program."""
    for f in list(program.input_fields) + list(program.output_fields):
        if getattr(f, "index_major", False):
            # the generated loop nests linearize index dims TRAILING (AoS);
            # an index-major ('soa') array would be silently mis-indexed
            raise NotImplementedError(
                f"native C backends index AoS (trailing index dims) only; "
                f"field {f.name!r} uses layout='soa'. Rebuild the op with "
                f"the default layout for the C/torch/TF-native paths.")
    dtype = np.dtype(dtype)
    ctype = _CTYPE[dtype]
    printer = _StencilCPrinter(program, full_domain, ctype)
    nd = program.ndim
    name = kernel_symbol_name(program, full_domain)

    args = []
    for f in program.input_fields:
        args.append(f"const {ctype}* __restrict__ {f.name}")
    for f in program.output_fields:
        if f.name not in {g.name for g in program.input_fields}:
            args.append(f"{ctype}* __restrict__ {f.name}_out")
        else:
            args.append(f"{ctype}* __restrict__ {f.name}_out")
    args.append("const long long* shape")

    lines: List[str] = []
    lines.append("#include <string.h>")
    lines.append("#include <math.h>")
    lines.append("#define _clamp(x, lo, hi) ((x) < (lo) ? (lo) : ((x) > (hi) ? (hi) : (x)))")
    lines.append("")
    lines.append(f"void {name}({', '.join(args)})")
    lines.append("{")
    for d in range(nd):
        lines.append(f"    const long long s{d} = shape[{d}];")
    total = " * ".join(f"s{d}" for d in range(nd))
    idx_mult = {f.name: int(np.prod(f.index_shape)) if f.index_shape else 1
                for f in program.output_fields}
    if not full_domain:
        for f in program.output_fields:
            mult = f" * {idx_mult[f.name]}" if idx_mult[f.name] != 1 else ""
            lines.append(f"    memset({f.name}_out, 0, "
                         f"(size_t)({total}{mult}) * sizeof({ctype}));")

    # loop bounds
    bounds = []
    for d in range(nd):
        if full_domain:
            bounds.append((f"0", f"s{d}"))
        else:
            lo, hi = program.ghost[d]
            bounds.append((str(lo), f"s{d} - {hi}" if hi else f"s{d}"))

    indent = "    "
    if openmp and nd >= 2:
        lines.append(f"    #pragma omp parallel for collapse({min(nd, 2)}) schedule(static)")
    for d in range(nd):
        lo, hi = bounds[d]
        lines.append(f"{indent * (d + 1)}for (long long i{d} = {lo}; i{d} < {hi}; ++i{d}) {{")
    body_indent = indent * (nd + 1)

    # CSE subexpressions then main assignments
    for step in program.steps:
        rhs = printer.doprint(step.rhs)
        if step.is_main:
            acc = step.target
            out_printer_expr = printer._index_expr(acc)
            target = f"{acc.field.name}_out[{out_printer_expr}]"
            op_ = "+=" if step.is_accumulation else "="
            lines.append(f"{body_indent}{target} {op_} {rhs};")
        else:
            sym = printer.doprint(step.target)
            lines.append(f"{body_indent}const {ctype} {sym} = {rhs};")

    for d in reversed(range(nd)):
        lines.append(f"{indent * (d + 1)}}}")
    lines.append("}")
    lines.append("")
    return "\n".join(lines)
