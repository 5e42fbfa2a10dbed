"""Profiling / tracing helpers (SURVEY.md §5.1: jax.profiler traces +
roofline accounting — the observability the reference lacks)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax

__all__ = ["trace", "timed_region", "KernelStats"]


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).

    ``PYSTENCILS_ADTPU_TRACE_DIR`` overrides the default location.
    """
    logdir = logdir or os.environ.get("PYSTENCILS_ADTPU_TRACE_DIR",
                                      "/tmp/pystencils_adtpu_trace")
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed_region(name: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"[{name}] {time.perf_counter() - t0:.4f}s")


class KernelStats:
    """Roofline accounting for a stencil program on given shapes."""

    def __init__(self, program, spatial_shape, dtype_bytes: int = 4):
        import numpy as np

        self.program = program
        cells = int(np.prod(spatial_shape))
        n_in = len(program.input_fields)
        n_out = len(program.output_fields)
        self.min_bytes = cells * dtype_bytes * (n_in + n_out)
        self.cells = cells
        # flops: count Add/Mul atoms in the step RHSs (rough)
        import sympy as sp

        flops = 0
        for step in program.steps:
            flops += sum(1 for _ in sp.preorder_traversal(step.rhs)
                         if isinstance(_, (sp.Add, sp.Mul)))
        self.flops_per_cell = flops

    def report(self, seconds: float, peak_gbps: float) -> dict:
        gbps = self.min_bytes / seconds / 1e9
        return {
            "seconds": seconds,
            "gcells_per_s": self.cells / seconds / 1e9,
            "gbps_effective": gbps,
            "fraction_of_peak": gbps / peak_gbps,
            "arithmetic_intensity": self.flops_per_cell
            * self.cells / max(self.min_bytes, 1),
        }
