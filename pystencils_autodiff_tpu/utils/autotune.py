"""On-device autotuning for fused-chain configurations.

The static tile picker (``ops/flatten.pick_chain_tile``) reasons about
VMEM footprints, but the *fastest* chain depth ``k`` is a hardware
property the build host cannot predict: past the HBM/VPU crossover a
deeper chain only adds halo-overlap compute (measured on the v5e: the
8192² heat value+gradient chain is fastest at k=4, not k=8 — BENCH_NOTES
round 3).  The reference leaves the analogous choice (CUDA block sizes,
OpenMP schedules) to hand-set kernel parameters; on TPU the honest answer
is to measure.

``autotune_chain`` sweeps candidate configurations ON THE LIVE DEVICE,
times each with the same methodology as ``bench.py`` (min-of-N with
forced materialisation, RTT subtracted, data-dependent calls fully
unrolled so XLA's scan-carry copies don't pollute the number), picks the
fastest, and persists the winner in a small JSON cache
(``$PYSTENCILS_ADTPU_TUNE_CACHE`` or ``~/.cache/pystencils_adtpu_tune.json``)
keyed by op, shape, dtype, device kind, and direction — so production
runs pay the sweep once per configuration per machine.

Compile crashes during the sweep are routed by the compile guard
(``ops/guard.py``) exactly as in production; a candidate whose every
variant fails is recorded as unusable and skipped on later runs.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

logger = logging.getLogger("pystencils_autodiff_tpu.autotune")

__all__ = ["autotune_chain", "autotune_stage_chain", "TuneResult",
           "best_config", "tuned_tile"]


# bumped whenever the measurement methodology changes incompatibly, so
# records taken under a superseded timer are never served (tv3: vjp
# timers keep BOTH chains live — tv2 sweep numbers dead-coded the
# cotangent twin for linear ops and read ~2x fast; tv2: two-point
# slope replaced min-of-N + RTT subtraction, which under-timed sub-ms rows)
_TIMER_VERSION = "tv3"


def _canonical_key(kind: str, direction: str, sig: str, spatial, dtype,
                   periodic: bool, device: str, interp: bool = False) -> str:
    """Candidate-set-independent cache key: the measured-best record every
    later chain BUILD consults (VERDICT round-3 next #6 — 'measured-best
    by default').  Distinct from the sweep keys, which stay keyed by the
    candidate tuples so differently-scoped sweeps never alias.  ``interp``
    partitions interpret-mode records from compiled ones so an
    interpret-mode sweep on a TPU-attached host can never feed tiles to
    real Mosaic builds (or vice versa)."""
    return (f"best|{kind}|{direction}|{sig}|{tuple(spatial)}|{dtype}|"
            f"periodic={periodic}|{device}|interp={bool(interp)}"
            f"|{_TIMER_VERSION}")


def stage_sig_of(stages, bcs) -> str:
    """Canonical signature of a stage sequence + normalized in-chain BCs —
    shared by ``autotune_stage_chain`` (store) and the ``fused_stage_chain``
    builders (consult) so winners reach default dispatch."""
    ss = "+".join(f"{op.op_name}{sorted(carry.items())}"
                  for op, carry in stages)
    bc_key = (repr(sorted((j, tuple(map(repr, bl)))
                          for j, bl in bcs.items())) if bcs else "None")
    return f"{ss}|bc={bc_key}"


def best_config(kind: str, direction: str, sig: str, spatial, dtype,
                periodic: bool, interp: bool = False):
    """The measured-best record for a chain configuration, or None.

    Returns ``{"k": ..., "tile_rows": ..., "per_k": {str(k): {...}}}`` —
    the overall winner plus the best tile per swept depth."""
    import jax
    import numpy as np

    try:
        device = jax.devices()[0].device_kind
    except Exception:
        device = "unknown"
    return _load_cache().get(_canonical_key(kind, direction, sig, spatial,
                                            str(np.dtype(dtype)), periodic,
                                            device, interp))


def tuned_tile(kind: str, direction: str, sig: str, spatial, dtype,
               periodic: bool, k: int, interp: bool = False):
    """Measured-best tile for a chain build at depth ``k`` (None when no
    sweep has recorded one).  Chain builders consult this automatically
    when the caller leaves ``tile_rows`` unset, so autotune winners reach
    production dispatch without the user re-plumbing them."""
    rec = best_config(kind, direction, sig, spatial, dtype, periodic, interp)
    if not rec:
        return None
    per_k = rec.get("per_k", {})
    ent = per_k.get(str(int(k)))
    tile = ent.get("tile_rows") if ent else None
    if tile is not None:
        logger.info("autotune: measured-best tile=%s for %s|%s k=%d at %s "
                    "(cache hit)", tile, kind, sig, k, tuple(spatial))
    return tile


def _cache_path() -> str:
    p = os.environ.get("PYSTENCILS_ADTPU_TUNE_CACHE")
    if p:
        return p
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "pystencils_adtpu_tune.json")


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _save_cache(cache: dict) -> None:
    try:
        path = _cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(cache, fh, indent=1, sort_keys=True)
    except Exception:  # best effort, like the guard registry
        pass


@dataclass
class TuneResult:
    """Outcome of an autotune sweep.

    ``best``: the winning ``{"k": ..., "tile_rows": ...}`` configuration.
    ``per_step_s``: its measured (or cached) per-step seconds; None when
    the winner came from the cache without a stored time.
    ``table``: ``{(k, tile_rows): per_step_s}`` for every candidate tried
    this call (empty on a cache hit).
    ``fn``: the chain callable built at the winning configuration.
    ``cached``: True when the winner was served from the persistent cache.
    """
    best: Dict[str, Optional[int]]
    per_step_s: Optional[float]
    fn: Callable
    cached: bool
    table: Dict[Tuple[int, Optional[int]], float] = field(default_factory=dict)


def _default_timer(chain_fn, state, k: int, calls: int, repeats: int,
                   vjp: bool) -> float:
    """Per-step seconds by the two-point slope over ``calls`` vs
    ``2·calls`` data-dependent chain invocations, each fully unrolled
    inside one jit (the bench.py / run_all.py methodology).

    The earlier min-of-N + RTT-subtraction here under-timed sub-ms
    rows whose total device work sits inside the RTT noise floor (the
    8192² heat vjp sweep recorded 0.282 ms/step against a 0.859 ms/step
    slope truth — 952 GB/s of implied real traffic, above the HBM
    roofline).  The slope cancels ANY constant per-call overhead; the
    Mosaic kernel compile is shared between the two jits, so the extra
    cost per candidate is only the doubled XLA glue trace."""
    import jax
    import jax.numpy as jnp

    from .benchmark import slope_timed

    names = sorted(state)

    def make(nc):
        if vjp:
            cots = {n: jnp.ones_like(state[n]) for n in names}

            @jax.jit
            def f(st):
                def body(carry, _):
                    new_state, cot0 = chain_fn(carry[0], carry[1])
                    return (new_state,
                            {n: cot0.get(n, carry[1][n])
                             for n in names}), None
                (st2, ct2), _ = jax.lax.scan(body, (st, cots), None,
                                             length=nc, unroll=nc)
                # BOTH chains must be live outputs: for linear ops the
                # cotangent twin is a SEPARATE kernel chain whose carry
                # feeds nothing live if only the state is returned — XLA
                # dead-codes it and the sweep times half the work (the
                # same trap run_all.py documents; fused two-phase /
                # twin-accum kernels were immune because one custom call
                # produces both outputs)
                return st2[names[0]], ct2[names[0]]
        else:
            @jax.jit
            def f(st):
                def body(carry, _):
                    return chain_fn(carry), None
                st2, _ = jax.lax.scan(body, st, None,
                                      length=nc, unroll=nc)
                return st2[names[0]]
        return f

    t = slope_timed(make, dict(state), calls, 2 * calls, repeats=repeats,
                    on_noise="raise")
    return max(t / k, 1e-12)


def _cheap_timer(chain_fn, state, k: int, calls: int, repeats: int,
                 vjp: bool) -> float:
    """Candidate-PRUNING timer: per-step seconds from a two-point slope
    over a DYNAMIC-length ``fori_loop`` of chain calls — ONE outer XLA
    compile per candidate instead of two fully-unrolled jits.

    Measured round 5: the unrolled slope timer costs ~10 min of relay
    round-trips per candidate at 8192² (the Mosaic kernel itself
    compiles in 3–23 s; the outer unrolled modules dominate).  The
    while-loop carry-copy overhead this timer picks up is common-mode
    across candidates of the SAME op/shape, so the RANKING it produces
    is sound; the sweep re-times only the winner with the honest
    unrolled timer before caching (``_run_sweep``)."""
    import jax
    import jax.numpy as jnp

    from .benchmark import fetch_timed

    names = sorted(state)
    if vjp:
        cots = {n: jnp.ones_like(state[n]) for n in names}

        @jax.jit
        def f(st, n):
            def body(_, carry):
                ns, c0 = chain_fn(carry[0], carry[1])
                return (ns, {m: c0.get(m, carry[1][m]) for m in names})
            st2, ct2 = jax.lax.fori_loop(0, n, body, (st, cots))
            # both chains live (see _default_timer): the while-loop
            # simplifier strips dead carry components, which silently
            # halves the timed work for linear twin-chain ops
            return st2[names[0]], ct2[names[0]]
    else:
        @jax.jit
        def f(st, n):
            return jax.lax.fori_loop(
                0, n, lambda _, c: chain_fn(c), st)[names[0]]

    n1, n2 = calls, 4 * calls
    t1 = fetch_timed(lambda s: f(s, n1), dict(state), repeats=repeats)
    t2 = fetch_timed(lambda s: f(s, n2), dict(state), repeats=repeats)
    return max(t2 - t1, 1e-9) / (k * (n2 - n1))


def autotune_chain(op, carry_map: Dict[str, str], state,
                   k_candidates: Sequence[int] = (2, 3, 4, 6, 8),
                   tile_candidates: Sequence[Optional[int]] = (None,),
                   vjp: bool = False, periodic: bool = False,
                   calls: int = 4, repeats: int = 3,
                   timer: Optional[Callable] = None,
                   use_cache: bool = True, force: bool = False,
                   sweep: str = "fast",
                   **chain_kwargs) -> TuneResult:
    """Pick the fastest fused-chain configuration for ``op`` on the live
    device and return it built, measured, and cached.

    ``state``: example state dict (concrete arrays) — fixes shapes/dtypes.
    ``vjp=False`` tunes the forward chain (``ops.fused_time_chain``);
    ``vjp=True`` tunes the fused value+gradient chain
    (``ops.adjoint_chain.fused_chain_vjp``, signature
    ``fn(state, cotangents)``).

    ``timer(chain_fn, state, k, calls, repeats, vjp) -> per_step_seconds``
    overrides the measurement (tests inject deterministic timers; the
    default is the bench.py methodology).  ``force=True`` re-measures even
    on a cache hit.  Extra ``chain_kwargs`` are passed to the chain
    builder for every candidate.

    ``sweep='fast'`` (default) bounds cold-sweep cost with the default
    timer: early-stop past the per-step minimum over ascending k and
    incremental partial persistence (resume after a relay outage) — see
    ``_run_sweep``.  ``sweep='full'`` measures every candidate; an
    injected ``timer`` always sweeps fully (deterministic tests).

    Candidates that fail to build (e.g. no viable tile for the shape) are
    skipped; if every candidate fails, the last error propagates.
    """
    import jax

    from ..ops.adjoint_chain import fused_chain_vjp
    from ..ops.time_chain import fused_time_chain

    names = sorted(state)
    arr0 = state[names[0]]
    spatial = tuple(arr0.shape)
    # canonical record is keyed by SPATIAL shape (what the chain builders
    # know at build time; index dims are part of the op signature)
    from ..ops.common import storage_spatial

    fby = {f.name: f for f in op.forward_input_fields}
    can_spatial = (storage_spatial(fby[names[0]], arr0)
                   if names[0] in fby else tuple(arr0.shape))
    try:
        device = jax.devices()[0].device_kind
    except Exception:
        device = "unknown"

    def build(k: int, tile: Optional[int]):
        if vjp:
            return fused_chain_vjp(op, k, carry_map, periodic=periodic,
                                   tile_rows=tile, **chain_kwargs)
        return fused_time_chain(op, k, carry_map, periodic=periodic,
                                tile_rows=tile, **chain_kwargs)

    extra = ""
    if chain_kwargs:
        extra = "|" + ",".join(f"{k}={chain_kwargs[k]!r}"
                               for k in sorted(chain_kwargs))
    # candidate sets are part of the key: a winner picked from (2,4) must
    # not be served to a caller sweeping (2,...,16), and builder kwargs
    # (vmem budget, dtype override) change what was measured
    direction = "vjp" if vjp else "fwd"
    key = (f"chain|{direction}|{op.op_name}|{spatial}|"
           f"{arr0.dtype}|periodic={periodic}|{device}"
           f"|k={tuple(k_candidates)}|tiles={tuple(tile_candidates)}"
           f"|{_TIMER_VERSION}" + extra)
    # interpret= partitions the canonical record by mode (see
    # _canonical_key); any OTHER builder kwarg changes what was measured
    # in ways the builders can't see, so it suppresses the record
    other_kwargs = {n: v for n, v in chain_kwargs.items()
                    if n != "interpret"}
    canonical = (None if other_kwargs else _canonical_key(
        "chain", direction, op.op_name, can_spatial, str(arr0.dtype),
        periodic, device, interp=bool(chain_kwargs.get("interpret"))))
    fast = timer is None and sweep == "fast"
    return _run_sweep(build, key, state, k_candidates, tile_candidates,
                      timer or _default_timer, vjp, calls, repeats,
                      use_cache, force, "autotune_chain",
                      canonical=canonical, early_stop=fast,
                      prune_timer=_cheap_timer if fast else None)


def _run_sweep(build, key: str, state, k_candidates, tile_candidates,
               timer, timer_flag: bool, calls: int, repeats: int,
               use_cache: bool, force: bool, what: str,
               canonical: Optional[str] = None,
               early_stop: bool = False,
               prune_timer: Optional[Callable] = None) -> TuneResult:
    """Shared sweep engine: cache-hit shortcut, (k, tile) loop with
    skip-on-failure, winner selection, persistence.  ``canonical``: the
    candidate-set-independent key that chain builds consult by default
    (see ``best_config``); the sweep stores the winner plus the best tile
    per depth there.

    Cold-sweep cost bounds (round 5, VERDICT r4 next #8 — a cold sweep
    compiled ~16 min of Mosaic variants):

    * ``early_stop`` (enabled by the callers when the default timer is
      used and ``sweep='fast'``): k-candidates are visited in the given
      (ascending) order; once a depth's best time is >10 % slower than
      the running best, deeper candidates are skipped — temporal-blocking
      cost is amortisation-then-overlap, monotone past the minimum, so
      the skipped compiles (the deepest = the most expensive) cannot win.
    * ``prune_timer``: a cheap RANKING timer used for candidates (one
      dynamic-length outer jit instead of two unrolled ones, ~3–4× less
      relay compile time per candidate); the winner alone is re-timed
      with the honest ``timer`` before being cached, so the persisted
      ``per_step_s`` stays tv2-comparable.
    * **Partial persistence**: every measured candidate is written to the
      cache (``key|partial``) immediately, so a sweep interrupted by a
      relay outage resumes where it stopped instead of recompiling
      everything; the partial record is replaced by the final one on
      completion.
    """
    cache = _load_cache() if use_cache else {}
    hit = cache.get(key)
    if hit and not force:
        k, tile = hit["k"], hit.get("tile_rows")
        logger.info("autotune cache hit for %s: k=%d tile=%s", key, k, tile)
        return TuneResult(best={"k": k, "tile_rows": tile},
                          per_step_s=hit.get("per_step_s"),
                          fn=build(k, tile), cached=True)

    partial_key = key + "|partial"
    table: Dict[Tuple[int, Optional[int]], float] = {}
    fns: Dict[Tuple[int, Optional[int]], Callable] = {}
    if use_cache and not force:
        for ck, t in cache.get(partial_key, {}).items():
            k_s, tile_s = ck.split(",", 1)
            table[(int(k_s), None if tile_s == "None" else int(tile_s))] = t
        if table:
            logger.info("autotune: resuming interrupted sweep for %s "
                        "(%d candidate(s) already measured)", key,
                        len(table))

    def save_partial():
        if use_cache:
            cache[partial_key] = {f"{k},{tile}": t
                                  for (k, tile), t in table.items()}
            _save_cache(cache)

    last_exc: Optional[BaseException] = None
    stop = False
    for k in k_candidates:
        k_best = float("inf")
        for tile in tile_candidates:
            if (k, tile) in table:  # resumed from a partial sweep
                k_best = min(k_best, table[(k, tile)])
                continue
            try:
                fn = build(k, tile)
                t = (prune_timer or timer)(fn, state, k, calls, repeats,
                                           timer_flag)
            except Exception as e:
                logger.warning("autotune: candidate k=%d tile=%s failed "
                               "(%s: %s)", k, tile, type(e).__name__,
                               str(e)[:120])
                last_exc = e
                continue
            table[(k, tile)] = t
            fns[(k, tile)] = fn
            k_best = min(k_best, t)
            save_partial()
            logger.info("autotune: k=%d tile=%s -> %.3f ms/step",
                        k, tile, t * 1e3)
        if early_stop and table and k_best < float("inf"):
            # a depth with NO successful measurement (transient failures,
            # no viable tile) must not count as a slow strike — stopping
            # there would persist a truncated winner (review finding)
            run_best = min(table.values())
            if k_best > run_best * 1.10:
                logger.info("autotune: early stop after k=%d (%.3f ms/step "
                            "is >10%% over the running best %.3f) — "
                            "skipping deeper candidates", k, k_best * 1e3,
                            run_best * 1e3)
                stop = True
        if stop:
            break
    if not table:
        raise last_exc if last_exc is not None else RuntimeError(
            f"{what}: no viable candidates")

    (best_k, best_tile), best_t = min(table.items(), key=lambda kv: kv[1])
    if prune_timer is not None:
        # the cached per_step_s must come from the HONEST timer (cheap
        # ranking numbers carry while-loop carry-copy overhead)
        try:
            win = fns.get((best_k, best_tile)) or build(best_k, best_tile)
            fns[(best_k, best_tile)] = win
            best_t = timer(win, state, best_k, calls, repeats, timer_flag)
            table[(best_k, best_tile)] = best_t
        except Exception as e:
            logger.warning("autotune: winner re-time failed (%s: %s); "
                           "keeping the ranking-timer value",
                           type(e).__name__, str(e)[:120])
    if use_cache:
        cache.pop(partial_key, None)
        cache[key] = {"k": best_k, "tile_rows": best_tile,
                      "per_step_s": best_t}
        if canonical:
            per_k: Dict[str, dict] = {}
            for (k, tile), t in table.items():
                cur = per_k.get(str(k))
                if cur is None or t < cur["per_step_s"]:
                    per_k[str(k)] = {"tile_rows": tile,
                                     "per_step_s": t}
            cache[canonical] = {"k": best_k, "tile_rows": best_tile,
                                "per_step_s": best_t, "per_k": per_k}
        _save_cache(cache)
    win = fns.get((best_k, best_tile)) or build(best_k, best_tile)
    return TuneResult(best={"k": best_k, "tile_rows": best_tile},
                      per_step_s=best_t, fn=win,
                      cached=False, table=table)


def _stage_timer(chain_fn, state, k: int, calls: int, repeats: int,
                 grad: bool) -> float:
    """Per-step seconds of ``calls`` data-dependent stage-chain cycles —
    value only, or value+gradient via ``jax.vjp`` of the chain (which
    runs the fused two-phase backward when the chain was built with
    ``fused_bwd=True``)."""
    import jax
    import jax.numpy as jnp

    from .benchmark import fetch_timed, rtt_baseline

    names = sorted(state)
    # carry only inexact fields through the scan: the kernel casts every
    # output plane to the chain dtype, so bool/int mask fields (and
    # dtype= overrides) would trip the scan carry-type check; masks are
    # chain-invariant, so holding them fixed is also semantically right
    live = [n for n in names
            if jnp.issubdtype(jnp.asarray(state[n]).dtype, jnp.inexact)]
    fixed = {n: state[n] for n in names if n not in live}

    def full(st):
        return {**fixed, **st}

    def recast(new, like):
        return {n: new[n].astype(like[n].dtype) for n in live}

    if grad:
        cots = {n: jnp.ones_like(state[n]) for n in live}

        @jax.jit
        def f(st):
            def body(carry, _):
                st_c, ct_c = carry

                def live_chain(s):
                    out = chain_fn(full(s))
                    return {n: out[n] for n in live}

                out, pull = jax.vjp(live_chain, st_c)
                (g,) = pull(recast(ct_c, out))
                return (recast(out, st_c), recast(g, ct_c)), None
            (st2, _), _ = jax.lax.scan(body, (st, cots), None,
                                       length=calls, unroll=calls)
            return st2[live[0]]
    else:
        @jax.jit
        def f(st):
            def body(carry, _):
                return recast(chain_fn(full(carry)), carry), None
            st2, _ = jax.lax.scan(body, st, None,
                                  length=calls, unroll=calls)
            return st2[live[0]]

    rtt = rtt_baseline()
    total = fetch_timed(f, {n: state[n] for n in live}, repeats=repeats)
    return max((total - rtt) / (k * calls), 1e-12)


def autotune_stage_chain(stages, state,
                         k_candidates: Sequence[int] = (2, 3, 4, 6, 8),
                         tile_candidates: Sequence[Optional[int]] = (None,),
                         fused_bwd: bool = False, periodic: bool = False,
                         boundary=None, calls: int = 4, repeats: int = 3,
                         timer: Optional[Callable] = None,
                         use_cache: bool = True, force: bool = False,
                         sweep: str = "fast",
                         **chain_kwargs) -> TuneResult:
    """``autotune_chain`` for heterogeneous stage sequences
    (``ops.fused_stage_chain``): sweep (k, tile_rows) on the live device
    and return the winning chain built and cached.

    ``stages``/``boundary`` follow ``fused_stage_chain``.  With
    ``fused_bwd=True`` each candidate is timed on its full
    value+gradient cost (``jax.vjp`` of the chain, i.e. the forward
    kernel plus the two-phase adjoint kernel) — the quantity a training
    loop actually pays.  ``timer(chain_fn, state, k, calls, repeats,
    grad) -> per_step_seconds`` overrides the measurement.
    """
    import jax

    from ..ops.stage_chain import fused_stage_chain

    names = sorted(state)
    arr0 = state[names[0]]
    spatial = tuple(arr0.shape)
    try:
        device = jax.devices()[0].device_kind
    except Exception:
        device = "unknown"

    def build(k: int, tile: Optional[int]):
        return fused_stage_chain(stages, k, periodic=periodic,
                                 tile_rows=tile, fused_bwd=fused_bwd,
                                 boundary=boundary, **chain_kwargs)

    from ..ops.chain_bc import normalize_chain_bcs
    from ..ops.common import storage_spatial
    from ..ops.stage_chain import _validate_stages

    progs0, _, sfields0, snames0 = _validate_stages(
        [(op, dict(c)) for op, c in stages])
    bcs0, _ = normalize_chain_bcs(
        boundary, sfields0, {n: f.index_shape for n, f in sfields0.items()},
        progs0[0].ndim, len(stages),
        next(iter(sfields0.values())).dtype)
    can_sig = stage_sig_of(stages, bcs0)
    n0 = snames0[0]
    can_spatial = (storage_spatial(sfields0[n0], state[n0])
                   if n0 in state else tuple(arr0.shape))

    stage_sig = "+".join(
        f"{op.op_name}{sorted(carry.items())}" for op, carry in stages)
    # canonical BC part: normalize first so spec spellings that parse to
    # the same ChainBC list ({'u': 'neumann'} vs {'u': ('neumann',)},
    # dict insertion order) share one cache entry
    if boundary:
        from ..ops.chain_bc import normalize_chain_bcs
        from ..ops.stage_chain import _validate_stages

        progs, _, sfields, _ = _validate_stages(
            [(op, dict(c)) for op, c in stages])
        bcs_n, _ = normalize_chain_bcs(
            boundary, sfields, {n: f.index_shape
                                for n, f in sfields.items()},
            progs[0].ndim, len(stages),
            next(iter(sfields.values())).dtype)
        bc_key = repr(sorted((j, tuple(map(repr, bl)))
                             for j, bl in bcs_n.items()))
    else:
        bc_key = "None"
    extra = ""
    if chain_kwargs:
        extra = "|" + ",".join(f"{k}={chain_kwargs[k]!r}"
                               for k in sorted(chain_kwargs))
    direction = "grad" if fused_bwd else "fwd"
    key = (f"stages|{direction}|{stage_sig}|{spatial}|"
           f"{arr0.dtype}|periodic={periodic}|bc={bc_key}|{device}"
           f"|k={tuple(k_candidates)}|tiles={tuple(tile_candidates)}"
           f"|{_TIMER_VERSION}" + extra)
    other_kwargs = {n: v for n, v in chain_kwargs.items()
                    if n != "interpret"}
    canonical = (None if other_kwargs else _canonical_key(
        "stages", direction, can_sig, can_spatial,
        str(arr0.dtype), periodic, device,
        interp=bool(chain_kwargs.get("interpret"))))
    return _run_sweep(build, key, state, k_candidates, tile_candidates,
                      timer or _stage_timer, fused_bwd, calls, repeats,
                      use_cache, force, "autotune_stage_chain",
                      canonical=canonical,
                      early_stop=(timer is None and sweep == "fast"))
