#!/usr/bin/env python
"""Headline benchmark: iterated fwd+adjoint 2D Laplacian chain vs HBM roofline.

BASELINE config #1 at production scale: an iterated forward+gradient chain
of the 5-point Laplacian (explicit heat step) on a grid well above VMEM so
the measurement is genuine HBM traffic.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

The measured loop runs through ``ops.fused_chain_vjp`` — k time steps of
value AND gradient per kernel (temporal blocking of both directions; for
this linear op the adjoint chain is the transposed stencil chained forward,
built automatically).  "GB/s" counts the *sequential algorithm's* minimum
HBM traffic (4 arrays per step: state in/out + cotangent in/out), the
standard effective-bandwidth accounting for temporally blocked stencils —
per-step wall time is what's actually measured and is also reported.

vs_baseline is achieved bandwidth / (0.80 × HBM STREAM) — the BASELINE.json
north-star target (>=80% of v5e STREAM), so vs_baseline >= 1.0 means the
target is met.

Timing notes: completion is forced by host scalar fetch and the relay RTT
is subtracted (see pystencils_autodiff_tpu/utils/benchmark.py); chain calls
are linked by data dependencies inside one jit so per-dispatch overhead
amortises away.
"""

import json
import os
import sys

# a dead TPU relay makes jax.devices() hang in C land (observed
# 2026-08-17, multi-hour outage), which would hang the whole driver
# check: probe backend init in a subprocess (utils/relay.py — skipped
# when the env already pins CPU) and on timeout re-run pinned to CPU
# with an honest label.  Truthiness, not presence: an empty value means
# "not set" at both this check and the config pin below.
_FORCED_CPU = bool(os.environ.get("PYSTENCILS_ADTPU_BENCH_CPU"))
if __name__ == "__main__" and not _FORCED_CPU:
    from pystencils_autodiff_tpu.utils.relay import backend_alive

    if not backend_alive():
        print("# TPU backend unreachable (relay down?) — re-running the "
              "benchmark on CPU interpret mode; the GB/s value below is "
              "NOT a TPU measurement", file=sys.stderr)
        env = dict(os.environ, PYSTENCILS_ADTPU_BENCH_CPU="1",
                   JAX_PLATFORMS="cpu")
        os.execvpe(sys.executable,
                   [sys.executable, __file__, *sys.argv[1:]], env)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if _FORCED_CPU:
    jax.config.update("jax_platforms", "cpu")


def main():
    from pystencils_autodiff_tpu.models import heat_step_op
    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
    from pystencils_autodiff_tpu.utils import (fetch_timed, roofline_gbps,
                                               rtt_baseline)

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if on_tpu:
        n = 8192          # 256 MB per array — far above 128 MB VMEM
        calls = 8         # logical steps = k * calls
        interpret = False
    else:
        n = 512
        calls = 4
        interpret = True

    dtype = jnp.float32
    op = heat_step_op(dt=0.1)
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n, n), dtype=dtype)
    cu = jnp.ones((n, n), dtype)

    # measured-best chain depth: the on-device autotune sweep picks k (and
    # per-k tile, consulted automatically by the builder); first run pays
    # the sweep, later runs hit the persistent cache.  Round-3 sweeps
    # found k=4 (the chain turns VPU-bound past k≈4 while HBM savings
    # have flattened) — that stays the fallback if the sweep fails.
    k = 4
    if on_tpu:
        try:
            from pystencils_autodiff_tpu.utils import autotune_chain

            res = autotune_chain(op, {"u": "u_next"}, {"u": u},
                                 k_candidates=(2, 4, 8), vjp=True,
                                 periodic=True, calls=4, repeats=2)
            k = int(res.best["k"])
            print(f"# autotune: k={k}"
                  f"{' (cache hit)' if res.cached else ' (swept)'}",
                  file=sys.stderr)
        except Exception as e:  # sweep failure must not sink the bench
            print(f"# autotune sweep failed ({e!r}); fallback k={k}",
                  file=sys.stderr)

    chain = fused_chain_vjp(op, k, {"u": "u_next"}, periodic=True,
                            interpret=interpret)

    @jax.jit
    def fwd_adjoint_chain(u, cu):
        # k-step fused fwd+adjoint per call, data dependency between calls
        def body(carry, _):
            u, cu = carry
            st, cot0 = chain({"u": u}, {"u": cu})
            return (st["u"], cot0["u"]), None

        # full unroll: XLA copies every carried custom-call output once per
        # remaining scan iteration — unrolling completely makes the chain
        # outputs ordinary temporaries (zero carry copies, device-traced)
        (u, cu), _ = jax.lax.scan(body, (u, cu), None, length=calls,
                                  unroll=calls)
        return u, cu

    rtt = rtt_baseline()
    total = fetch_timed(fwd_adjoint_chain, u, cu)
    steps = k * calls
    per_step_rtt = max((total - rtt) / steps, 1e-9)

    # primary measurement: two-point slope — any constant per-call overhead
    # (RTT, dispatch, fetch) cancels in the difference, so it needs no
    # assumption that the tiny-kernel RTT baseline equals the big call's
    # constant overhead (post-outage relay RTT variance made RTT
    # subtraction read 30-40% fast on 2026-08-18; the slope matched the
    # session-2 device-trace-validated numbers)
    def make_fn(n_calls):
        @jax.jit
        def f(u, cu):
            def body(carry, _):
                st, cot0 = chain({"u": carry[0]}, {"u": carry[1]})
                return (st["u"], cot0["u"]), None

            (u2, cu2), _ = jax.lax.scan(body, (u, cu), None, length=n_calls,
                                        unroll=n_calls)
            return u2, cu2

        return lambda uu: f(uu, cu)

    from pystencils_autodiff_tpu.utils import slope_timed
    per_step_slope = slope_timed(make_fn, u, calls, 2 * calls) / k
    # slope is primary; fall back to RTT subtraction if relay noise made
    # the difference degenerate (nonpositive or wildly small)
    if per_step_slope > 0.25 * per_step_rtt:
        per_step = per_step_slope
    else:
        per_step = per_step_rtt

    # sequential minimum HBM traffic per fwd+adjoint step:
    #   fwd:  read u_t,      write u_{t+1}   → 2 arrays
    #   bwd:  read ĉ_{t+1},  write ĉ_t      → 2 arrays
    array_bytes = u.size * u.dtype.itemsize
    bytes_per_step = 4 * array_bytes
    gbps = bytes_per_step / per_step / 1e9

    target = 0.80 * roofline_gbps()
    result = {
        "metric": f"fwd+adjoint 2D Laplacian chain, effective bandwidth "
                  f"(fused k={k} value+gradient kernels, {n}x{n} f32, "
                  f"{dev.device_kind if on_tpu else 'cpu'}); "
                  f"per-step {per_step*1e3:.3f} ms",
        "value": round(gbps, 1),
        "unit": "GB/s effective (temporal blocking; sequential-min traffic "
                "4 arrays/step, actual HBM traffic ~1/k of that)",
        "vs_baseline": round(gbps / target, 3),
    }
    print(json.dumps(result))
    print(f"# per-step {per_step*1e3:.3f} ms (fwd+adjoint, two-point slope "
          f"primary), target {target:.0f} GB/s, steps {steps}",
          file=sys.stderr)
    print(f"# RTT-subtraction cross-check: {per_step_rtt*1e3:.3f} ms/step "
          f"-> {bytes_per_step / per_step_rtt / 1e9:.1f} GB/s "
          f"(rtt {rtt*1e3:.1f} ms, total {total*1e3:.1f} ms)",
          file=sys.stderr)
    print("# effective-bandwidth accounting: sequential min traffic "
          "(4 arrays/step) / measured per-step time; the fused chain "
          "moves ~1/k of that, which is how it beats single-kernel "
          "streaming — see BENCH_NOTES.md for raw unfused numbers",
          file=sys.stderr)


if __name__ == "__main__":
    main()
