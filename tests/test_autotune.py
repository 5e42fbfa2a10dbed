"""Autotune sweep: candidate selection, persistence, failure routing.

The measurement itself is injected (deterministic fake timers) so these
run on CPU; the default timer's methodology is bench.py's and is
exercised on hardware by the TPU-marked test.
"""

import json

import jax
import jax.numpy as jnp
import pytest

from pystencils_autodiff_tpu.models import heat_step_op
from pystencils_autodiff_tpu.utils import autotune_chain


@pytest.fixture()
def tune_cache(tmp_path, monkeypatch):
    path = tmp_path / "tune.json"
    monkeypatch.setenv("PYSTENCILS_ADTPU_TUNE_CACHE", str(path))
    return path


def _state(n=32):
    return {"u": jax.random.normal(jax.random.PRNGKey(0), (n, n),
                                   jnp.float32)}


def fake_timer_table(times):
    def timer(chain_fn, state, k, calls, repeats, vjp):
        return times[k]
    return timer


def test_picks_fastest_candidate(tune_cache):
    op = heat_step_op(dt=0.1)
    state = _state()
    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4, 8),
                         periodic=True, interpret=True,
                         timer=fake_timer_table({2: 3e-3, 4: 1e-3, 8: 2e-3}))
    assert res.best == {"k": 4, "tile_rows": None}
    assert res.per_step_s == 1e-3
    assert not res.cached
    assert set(res.table) == {(2, None), (4, None), (8, None)}
    # the returned fn is the built chain at the winning config
    out = res.fn({"u": state["u"]})
    assert out["u"].shape == state["u"].shape


def test_cache_hit_skips_measurement(tune_cache):
    op = heat_step_op(dt=0.1)
    state = _state()
    autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                   periodic=True, interpret=True,
                   timer=fake_timer_table({2: 2e-3, 4: 1e-3}))
    assert tune_cache.exists()
    entry = next(iter(json.loads(tune_cache.read_text()).values()))
    assert entry["k"] == 4

    calls = []

    def counting_timer(chain_fn, state, k, c, r, vjp):
        calls.append(k)
        return 1.0

    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                         periodic=True, interpret=True, timer=counting_timer)
    assert res.cached and res.best["k"] == 4 and not calls
    # force=True re-measures
    res2 = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                          periodic=True, interpret=True,
                          timer=counting_timer, force=True)
    assert not res2.cached and calls == [2, 4]


def test_failed_candidates_are_skipped(tune_cache):
    op = heat_step_op(dt=0.1)
    state = _state()

    def flaky_timer(chain_fn, st, k, calls, repeats, vjp):
        if k == 2:
            raise RuntimeError("synthetic compile crash")
        return float(k)

    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4, 8),
                         periodic=True, interpret=True, timer=flaky_timer)
    assert res.best["k"] == 4
    assert (2, None) not in res.table


def test_all_failed_raises(tune_cache):
    op = heat_step_op(dt=0.1)

    def bad_timer(*a):
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        autotune_chain(op, {"u": "u_next"}, _state(), k_candidates=(2,),
                       periodic=True, interpret=True, timer=bad_timer)


def test_vjp_direction_tunes_fused_chain_vjp(tune_cache):
    op = heat_step_op(dt=0.1)
    state = _state()
    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                         vjp=True, periodic=True, interpret=True,
                         timer=fake_timer_table({2: 1e-3, 4: 2e-3}))
    assert res.best["k"] == 2
    st2, cot0 = res.fn({"u": state["u"]}, {"u": jnp.ones_like(state["u"])})
    assert st2["u"].shape == state["u"].shape
    assert cot0["u"].shape == state["u"].shape


def test_default_timer_runs_both_directions(tune_cache):
    """The real measurement path on CPU interpret kernels — guards the
    timer's scan plumbing (the fwd carry is the state dict itself)."""
    op = heat_step_op(dt=0.1)
    state = _state(16)
    res_f = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2,),
                           periodic=True, interpret=True, calls=2, repeats=1)
    assert res_f.per_step_s > 0
    res_b = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2,),
                           vjp=True, periodic=True, interpret=True,
                           calls=2, repeats=1)
    assert res_b.per_step_s > 0


@pytest.mark.tpu
def test_default_timer_on_hardware(tune_cache):
    """The real measurement path: sweep two depths on the live device."""
    op = heat_step_op(dt=0.1)
    n = 1024
    state = {"u": jax.random.normal(jax.random.PRNGKey(0), (n, n),
                                    jnp.float32)}
    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                         periodic=True, calls=2, repeats=2)
    assert res.best["k"] in (2, 4)
    assert res.per_step_s > 0
    out = res.fn({"u": state["u"]})
    assert bool(jnp.all(jnp.isfinite(out["u"])))


def test_cache_key_scopes_candidates_and_kwargs(tune_cache):
    """A winner tuned under one configuration must not be served for
    another: candidate sets and builder kwargs are part of the key."""
    op = heat_step_op(dt=0.1)
    state = _state()
    autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                   periodic=True, interpret=True,
                   timer=fake_timer_table({2: 2e-3, 4: 1e-3}))

    seen = []

    def spy_timer(chain_fn, st, k, c, r, vjp):
        seen.append(k)
        return {2: 2e-3, 4: 1e-3, 8: 5e-4}[k]

    # wider candidate set -> cache miss, re-measures, finds better k
    res = autotune_chain(op, {"u": "u_next"}, state,
                         k_candidates=(2, 4, 8), periodic=True,
                         interpret=True, timer=spy_timer)
    assert not res.cached and res.best["k"] == 8 and seen == [2, 4, 8]
    # different builder kwargs -> separate entry
    seen.clear()
    res2 = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4),
                          periodic=True, interpret=True,
                          vmem_limit_bytes=32 * 1024 * 1024,
                          timer=spy_timer)
    assert not res2.cached and seen == [2, 4]


# ---- stage-chain autotuning ------------------------------------------------

def test_stage_chain_picks_fastest_and_caches(tune_cache):
    """autotune_stage_chain sweeps fused_stage_chain configurations
    (here: a BC'd chain with the fused two-phase backward) and persists
    the winner keyed by stages + boundary + direction."""
    from pystencils_autodiff_tpu.utils import autotune_stage_chain

    op = heat_step_op(dt=0.1)
    state = _state()

    def timer(chain_fn, st, k, calls, repeats, grad):
        assert grad is True
        return {1: 2e-3, 2: 1e-3}[k]

    res = autotune_stage_chain(
        [(op, {"u": "u_next"})], state, k_candidates=(1, 2),
        fused_bwd=True, boundary={"u": "neumann"}, interpret=True,
        timer=timer)
    assert res.best == {"k": 2, "tile_rows": None} and not res.cached

    # the returned fn is the BC'd fused-bwd chain: differentiable
    g = jax.grad(lambda a: jnp.sum(res.fn({"u": a})["u"] ** 2))(state["u"])
    assert bool(jnp.all(jnp.isfinite(g)))

    # cache hit: no re-measurement
    res2 = autotune_stage_chain(
        [(op, {"u": "u_next"})], state, k_candidates=(1, 2),
        fused_bwd=True, boundary={"u": "neumann"}, interpret=True,
        timer=lambda *a: (_ for _ in ()).throw(AssertionError("re-measured")))
    assert res2.cached and res2.best["k"] == 2

    # a different boundary spec is a different key -> re-measures
    res3 = autotune_stage_chain(
        [(op, {"u": "u_next"})], state, k_candidates=(1, 2),
        fused_bwd=True, boundary={"u": ("dirichlet", 0.0)}, interpret=True,
        timer=timer)
    assert not res3.cached


def test_stage_chain_default_timer_runs_on_cpu(tune_cache):
    """The real _stage_timer path (jax.vjp of the chain, unrolled scan)
    executes in interpret mode — a smoke test that the measured quantity
    is buildable and finite."""
    from pystencils_autodiff_tpu.utils import autotune_stage_chain

    op = heat_step_op(dt=0.1)
    res = autotune_stage_chain(
        [(op, {"u": "u_next"})], _state(16), k_candidates=(1,),
        fused_bwd=False, periodic=True, interpret=True, calls=1, repeats=1)
    assert res.per_step_s > 0


def test_stage_chain_real_timer_with_bool_mask_and_dtype(tune_cache):
    """Regression (review finding): the real _stage_timer must handle
    state entries the chain does not round-trip in dtype — a bool
    obstacle mask with masked_dirichlet, and a dtype= override — without
    tripping the scan carry-type check."""
    from pystencils_autodiff_tpu.utils import autotune_stage_chain

    op = heat_step_op(dt=0.1)
    n = 16
    mask = jnp.zeros((n, n), bool).at[5:8, 5:8].set(True)
    state = {"u": _state(n)["u"].astype(jnp.float64),
             "m": mask,
             "val": jnp.ones((n, n), jnp.float64)}
    res = autotune_stage_chain(
        [(op, {"u": "u_next"})], state, k_candidates=(1,),
        fused_bwd=True, boundary={"u": ("masked_dirichlet", "m", "val")},
        interpret=True, calls=1, repeats=1)
    assert res.per_step_s > 0

    # dtype override over f32 state (forward timer path)
    res2 = autotune_stage_chain(
        [(op, {"u": "u_next"})], _state(n), k_candidates=(1,),
        periodic=True, interpret=True, dtype=jnp.bfloat16,
        calls=1, repeats=1)
    assert res2.per_step_s > 0


# ---- measured-best default dispatch (VERDICT round-3 next #6) --------------

def seq_timer(times):
    """Deterministic timer yielding ``times`` in sweep order (k-major,
    tile-minor) — lets a test make a specific (k, tile) win."""
    it = iter(times)
    return lambda *a: next(it)


def test_sweep_records_canonical_best(tune_cache):
    """A sweep persists a candidate-set-independent record (overall winner
    + best tile per depth) that ``best_config``/``tuned_tile`` serve,
    partitioned by interpret mode."""
    from pystencils_autodiff_tpu.utils.autotune import best_config, tuned_tile

    op = heat_step_op(dt=0.1)
    state = _state(32)
    autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2,),
                   tile_candidates=(8, 16), periodic=True, interpret=True,
                   timer=seq_timer([2e-3, 1e-3]))
    rec = best_config("chain", "fwd", op.op_name, (32, 32), jnp.float32,
                      True, interp=True)
    assert rec and rec["k"] == 2 and rec["tile_rows"] == 16
    assert tuned_tile("chain", "fwd", op.op_name, (32, 32), jnp.float32,
                      True, 2, interp=True) == 16
    # un-swept depth -> no tile; compiled-mode record stays separate
    assert tuned_tile("chain", "fwd", op.op_name, (32, 32), jnp.float32,
                      True, 4, interp=True) is None
    assert best_config("chain", "fwd", op.op_name, (32, 32), jnp.float32,
                       True, interp=False) is None


def test_chain_builds_consult_tuned_tile(tune_cache, caplog):
    """End-to-end measured-best dispatch: after a sweep, a PLAIN
    ``fused_time_chain``/``fused_chain_vjp`` build (no tile_rows set)
    picks up the recorded tile — key construction at the store site and
    the consult site must agree exactly — and stays bit-exact."""
    import logging

    from pystencils_autodiff_tpu.ops.adjoint_chain import fused_chain_vjp
    from pystencils_autodiff_tpu.ops.time_chain import fused_time_chain

    op = heat_step_op(dt=0.1)
    state = _state(32)
    cots = {"u": jnp.ones_like(state["u"])}
    ref_f = fused_time_chain(op, 2, {"u": "u_next"}, periodic=True,
                             interpret=True)(dict(state))
    ref_b = fused_chain_vjp(op, 2, {"u": "u_next"}, periodic=True,
                            interpret=True)(dict(state), dict(cots))

    autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2,),
                   tile_candidates=(16,), periodic=True, interpret=True,
                   timer=seq_timer([1e-3]))
    autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2,),
                   tile_candidates=(16,), vjp=True, periodic=True,
                   interpret=True, timer=seq_timer([1e-3]))

    with caplog.at_level(logging.INFO,
                         logger="pystencils_autodiff_tpu.autotune"):
        out_f = fused_time_chain(op, 2, {"u": "u_next"}, periodic=True,
                                 interpret=True)(dict(state))
        out_b = fused_chain_vjp(op, 2, {"u": "u_next"}, periodic=True,
                                interpret=True)(dict(state), dict(cots))
    hits = [r.getMessage() for r in caplog.records
            if "measured-best tile" in r.getMessage()]
    assert len(hits) >= 2, f"expected fwd+vjp cache hits, got {hits}"
    assert jnp.array_equal(out_f["u"], ref_f["u"])
    assert jnp.array_equal(out_b[0]["u"], ref_b[0]["u"])
    assert jnp.array_equal(out_b[1]["u"], ref_b[1]["u"])


def test_stage_chain_builds_consult_tuned_tile(tune_cache, caplog):
    """Same end-to-end guarantee for heterogeneous stage chains, both
    directions (forward kernel and the two-phase fused backward)."""
    import logging

    from pystencils_autodiff_tpu.ops.stage_chain import fused_stage_chain

    op = heat_step_op(dt=0.1)
    state = _state(32)
    stages = [(op, {"u": "u_next"})]

    def run(chain):
        val, pull = jax.vjp(lambda a: chain({"u": a})["u"], state["u"])
        return val, pull(jnp.ones_like(val))[0]

    ref_v, ref_g = run(fused_stage_chain(stages, 2, periodic=True,
                                         fused_bwd=True, interpret=True))

    from pystencils_autodiff_tpu.utils import autotune_stage_chain
    autotune_stage_chain(stages, state, k_candidates=(2,),
                         tile_candidates=(16,), periodic=True,
                         interpret=True, timer=seq_timer([1e-3]))
    autotune_stage_chain(stages, state, k_candidates=(2,),
                         tile_candidates=(16,), fused_bwd=True,
                         periodic=True, interpret=True,
                         timer=seq_timer([1e-3]))

    with caplog.at_level(logging.INFO,
                         logger="pystencils_autodiff_tpu.autotune"):
        out_v, out_g = run(fused_stage_chain(stages, 2, periodic=True,
                                             fused_bwd=True,
                                             interpret=True))
    hits = [r.getMessage() for r in caplog.records
            if "measured-best tile" in r.getMessage()]
    assert hits, "stage-chain build did not consult the tune cache"
    assert jnp.array_equal(out_v, ref_v)
    assert jnp.array_equal(out_g, ref_g)


def test_stage_chain_boundary_key_is_canonical(tune_cache):
    """Spec spellings that normalize identically share one cache entry."""
    from pystencils_autodiff_tpu.utils import autotune_stage_chain

    op = heat_step_op(dt=0.1)
    state = _state()

    def timer(chain_fn, st, k, calls, repeats, grad):
        return 1e-3

    autotune_stage_chain([(op, {"u": "u_next"})], state, k_candidates=(1,),
                         boundary={"u": "neumann"}, interpret=True,
                         timer=timer)
    res = autotune_stage_chain(
        [(op, {"u": "u_next"})], state, k_candidates=(1,),
        boundary={"u": [("neumann",)]}, interpret=True,
        timer=lambda *a: (_ for _ in ()).throw(
            AssertionError("re-measured despite canonical key")))
    assert res.cached


# ---- budgeted sweeps (VERDICT round-4 next #8) ------------------------------

def test_early_stop_skips_deeper_candidates(tune_cache, monkeypatch):
    """With the DEFAULT timer and sweep='fast', candidates are ranked by
    the cheap prune timer; a depth >10% slower than the running best
    stops the sweep — the deepest (most expensive) compiles are skipped
    when they cannot win — and the winner alone is re-timed with the
    honest timer."""
    from pystencils_autodiff_tpu.utils import autotune as at

    seen, finalized = [], []

    def fake_cheap(chain_fn, state, k, calls, repeats, vjp):
        seen.append(k)
        return {2: 1e-3, 4: 2e-3, 6: 5e-4, 8: 4e-4}[k]

    def fake_default(chain_fn, state, k, calls, repeats, vjp):
        finalized.append(k)
        return {2: 3e-3, 4: 2e-3, 6: 1.5e-3, 8: 5e-4}[k]

    monkeypatch.setattr(at, "_cheap_timer", fake_cheap)
    monkeypatch.setattr(at, "_default_timer", fake_default)
    op = heat_step_op(dt=0.1)
    res = autotune_chain(op, {"u": "u_next"}, _state(),
                         k_candidates=(2, 4, 6, 8), periodic=True,
                         interpret=True)
    # k=4 is >10% over k=2 -> stop; 6 and 8 never built/measured
    assert seen == [2, 4]
    assert res.best["k"] == 2
    # winner re-timed honestly; the cached per_step_s is the honest value
    assert finalized == [2]
    assert res.per_step_s == 3e-3

    # sweep='full' measures everything with the honest timer directly
    seen.clear()
    finalized.clear()
    res2 = autotune_chain(op, {"u": "u_next"}, _state(),
                          k_candidates=(2, 4, 6, 8), periodic=True,
                          interpret=True, sweep="full", force=True)
    assert seen == [] and finalized == [2, 4, 6, 8]
    assert res2.best["k"] == 8


def test_injected_timer_always_sweeps_fully(tune_cache):
    """Deterministic injected timers (tests) are exempt from early stop."""
    op = heat_step_op(dt=0.1)
    res = autotune_chain(op, {"u": "u_next"}, _state(),
                         k_candidates=(2, 4, 8), periodic=True,
                         interpret=True,
                         timer=fake_timer_table({2: 1e-3, 4: 9e-3,
                                                 8: 5e-4}))
    assert set(res.table) == {(2, None), (4, None), (8, None)}
    assert res.best["k"] == 8


def test_interrupted_sweep_resumes_from_partial(tune_cache):
    """Measured candidates are persisted incrementally: a sweep killed by
    a relay outage resumes instead of recompiling everything."""
    op = heat_step_op(dt=0.1)
    state = _state()

    class Boom(RuntimeError):
        pass

    def dies_at_8(chain_fn, st, k, calls, repeats, vjp):
        if k == 8:
            raise KeyboardInterrupt  # simulate the session dying
        return {2: 2e-3, 4: 1e-3}[k]

    with pytest.raises(KeyboardInterrupt):
        autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4, 8),
                       periodic=True, interpret=True, timer=dies_at_8)
    # partial record holds the two measured candidates
    partials = [v for kk, v in json.loads(tune_cache.read_text()).items()
                if kk.endswith("|partial")]
    assert partials and set(partials[0]) == {"2,None", "4,None"}

    seen = []

    def resume_timer(chain_fn, st, k, calls, repeats, vjp):
        seen.append(k)
        return 5e-4

    res = autotune_chain(op, {"u": "u_next"}, state, k_candidates=(2, 4, 8),
                         periodic=True, interpret=True, timer=resume_timer)
    assert seen == [8]  # only the unmeasured candidate re-ran
    assert res.best["k"] == 8
    # partial cleaned up, final record written
    reg = json.loads(tune_cache.read_text())
    assert not any(kk.endswith("|partial") for kk in reg)
