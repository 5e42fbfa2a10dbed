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
