#!/usr/bin/env python
"""Headline benchmark: fwd + adjoint 2D Laplacian bandwidth vs HBM roofline.

BASELINE config #1 at production scale: iterated forward+gradient of the
5-point Laplacian on a grid chosen well above VMEM so the measurement is
genuine HBM traffic.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline is achieved bandwidth / (0.80 × HBM STREAM) — the BASELINE.json
north-star target (>=80% of v5e STREAM), so vs_baseline >= 1.0 means the
target is met.

Timing notes: completion is forced by host scalar fetch and the relay RTT
is subtracted (see pystencils_autodiff_tpu/utils/benchmark.py); iterations
are chained with data dependencies inside one jit so per-dispatch overhead
amortises away.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from pystencils_autodiff_tpu.models import laplacian_op
    from pystencils_autodiff_tpu.utils import fetch_timed, roofline_gbps, rtt_baseline

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        n = 8192          # 256 MB per array — far above 128 MB VMEM
        iters = 30
        dtype = jnp.float32
        lowering = "pallas"
    else:
        n = 1024
        iters = 10
        dtype = jnp.float32
        lowering = "jnp"

    op = laplacian_op(dtype="float32")
    f = op.jax_function(lowering=lowering)

    @jax.jit
    def fwd_adjoint_chain(x):
        # iterate value-and-grad with a data dependency between iterations
        def body(carry, _):
            x = carry
            g = jax.grad(lambda a: jnp.sum(f(a) * a))(x)
            return x + 1e-6 * g, None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype=dtype)

    rtt = rtt_baseline()
    total = fetch_timed(fwd_adjoint_chain, x)
    per_iter = max((total - rtt) / iters, 1e-9)

    # HBM traffic per iteration (theoretical minimum for this computation):
    #   fwd:  read x, write y            → 2 arrays
    #   bwd:  read ŷ(=x-dependent), write x̂ → 2 arrays
    #   update: read x, g; write x       → 3 arrays (counted: fused update)
    array_bytes = x.size * x.dtype.itemsize
    bytes_per_iter = 6 * array_bytes
    gbps = bytes_per_iter / per_iter / 1e9

    target = 0.80 * roofline_gbps()
    result = {
        "metric": f"fwd+adjoint 2D Laplacian bandwidth ({n}x{n} f32, "
                  f"{dev.device_kind if on_tpu else 'cpu'})",
        "value": round(gbps, 1),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 3),
    }
    print(json.dumps(result))
    print(f"# per-iter {per_iter*1e3:.3f} ms, rtt {rtt*1e3:.1f} ms, "
          f"total {total*1e3:.1f} ms, target {target:.0f} GB/s",
          file=sys.stderr)
    print("# note: time-stepped workloads exceed this via temporal blocking "
          "(ops.fused_time_chain): wave 61.6 Gcell/s at k=8, LBM 11.1 GLUPS "
          "at k=4 — see BENCH_NOTES.md",
          file=sys.stderr)


if __name__ == "__main__":
    main()
