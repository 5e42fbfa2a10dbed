"""Compile-pathology guard (ops/guard.py): crashing variants fall through
to exact fallbacks with a logged warning, offenders are remembered across
guard instances, and the pre-seeded heuristics match the recorded round-2
failures.  VERDICT round 2, next #4."""

import json
import logging

import pytest

from pystencils_autodiff_tpu.ops.guard import (CompileGuard, guard_variants,
                                               known_pathology)


@pytest.fixture
def guard_cache(tmp_path, monkeypatch):
    path = tmp_path / "guard.json"
    monkeypatch.setenv("PYSTENCILS_ADTPU_GUARD_CACHE", str(path))
    return path


def test_crash_falls_back_with_warning(guard_cache, caplog):
    calls = []

    def bad():
        def fn(x):
            raise RuntimeError("remote compiler HTTP 500")
        return fn

    def good():
        def fn(x):
            calls.append(x)
            return x * 2
        return fn

    with caplog.at_level(logging.WARNING,
                         logger="pystencils_autodiff_tpu.guard"):
        name, fn, result = guard_variants(
            [("fused", bad), ("sequential", good)], 21, signature="t1")
    assert name == "sequential" and result == 42
    assert any("falling back" in r.message for r in caplog.records)
    reg = json.loads(guard_cache.read_text())
    rec = reg["t1|fused"]
    # round-5 structured record: status + timestamp + error text, so a
    # recorded pathology is auditable and expirable (VERDICT r4 weak #2)
    assert rec["status"] == "crash"
    assert rec["when"] > 0
    assert "HTTP 500" in rec["error"]


def test_recorded_offender_skipped_next_time(guard_cache):
    order = []

    def make(name, fail):
        def build():
            def fn(x):
                order.append(name)
                if fail:
                    raise RuntimeError("boom")
                return x
            return fn
        return build

    guard_variants([("a", make("a", True)), ("b", make("b", False))],
                   1, signature="t2")
    order.clear()
    # a fresh guard (new process analog) must try the good variant FIRST
    name, _, _ = CompileGuard().run(
        [("a", make("a", False)), ("b", make("b", False))], 1,
        signature="t2")
    assert name == "b" and order == ["b"]


def test_known_offender_still_runs_as_last_resort(guard_cache):
    def make_ok(name):
        def build():
            return lambda x: (name, x)
        return build

    with pytest.raises(ZeroDivisionError):
        guard_variants([("a", lambda: (lambda x: 1 / 0)),
                        ("b", lambda: (lambda x: 1 / 0))], 1,
                       signature="t3x")
    # both recorded bad; a fresh run with only recorded-bad variants must
    # still try them (deferred, not dropped)
    name, _, res = CompileGuard().run([("a", make_ok("a"))], 5,
                                      signature="t3x")
    assert name == "a" and res == ("a", 5)


def test_known_pathology_heuristics():
    # the round-2 flat_chain_vjp_3d pre-seed is GONE: 3D two-phase chains
    # default to the plane-blocked kernel (ops/plane_adjoint.py); the
    # round-3 plane_twin_chain_3d pre-seed is GONE too (round-5 fresh AOT
    # probe: the 27-point twin at k=4/384^3 compiles in 92 s — the
    # recorded crash was a relay-era artifact)
    assert known_pathology("flat_chain_vjp_3d", cells=384 ** 3) is None
    assert known_pathology("plane_twin_chain_3d", cells=384 ** 3,
                           k=4) is None
    assert known_pathology("something_else", cells=10 ** 9) is None


# ---- stage-chain integration: guard engages on the hardware path ----------

def _heat_op():
    from pystencils_autodiff_tpu import Assignment, AutoDiffOp, fields

    u, u_next = fields("u, u_next", 2)
    return AutoDiffOp([Assignment(
        u_next[0, 0],
        u[0, 0] + 0.1 * (u[1, 0] + u[-1, 0] + u[0, 1] + u[0, -1]
                         - 4 * u[0, 0]))], op_name="heat2d_guard")


def test_stage_chain_fwd_guard_routes_vmem(guard_cache, monkeypatch, caplog):
    """A stage-chain kernel that crashes at the default VMEM budget must
    fall through to the vmem/2 variant (simulated remote HTTP 500)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pystencils_autodiff_tpu.ops import pallas_kernel
    from pystencils_autodiff_tpu.ops import stage_chain as sc

    monkeypatch.setattr(pallas_kernel, "_on_tpu", lambda: True)
    real_make = sc._make_stage_chain_kernel
    default_vmem = 100 * 1024 * 1024

    def fake_make(progs, carries, state_fields, state_names, kk, spatial,
                  dtype, interp, periodic, tile_rows=None,
                  vmem_limit_bytes=default_vmem, shard=None, bcs=None):
        if not interp and vmem_limit_bytes >= default_vmem:
            def kern(inputs):
                raise RuntimeError("remote compiler HTTP 500")
            return kern
        return real_make(progs, carries, state_fields, state_names, kk,
                         spatial, dtype, True, periodic,
                         tile_rows=tile_rows,
                         vmem_limit_bytes=vmem_limit_bytes, shard=shard,
                         bcs=bcs)

    monkeypatch.setattr(sc, "_make_stage_chain_kernel", fake_make)
    op = _heat_op()
    chain = sc.fused_stage_chain([(op, {"u": "u_next"})], 2)
    u0 = jax.random.normal(jax.random.PRNGKey(0), (32, 32), jnp.float64)
    with caplog.at_level(logging.WARNING,
                         logger="pystencils_autodiff_tpu.guard"):
        out = chain({"u": u0})["u"]
    assert any("falling back" in r.message for r in caplog.records)
    reg = json.loads(guard_cache.read_text())
    assert any(k.endswith("chain_k2")
               and isinstance(v, dict) and v["status"] == "crash"
               for k, v in reg.items())
    # the fallback is the same math: compare against interpret chain
    ref = sc.fused_stage_chain([(op, {"u": "u_next"})], 2,
                               interpret=True)({"u": u0})["u"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_stage_chain_bwd_guard_routes_vmem(guard_cache, monkeypatch):
    """The fused two-phase backward gets the same routing: a crashing
    vjp build falls through to a smaller VMEM budget, cotangents exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pystencils_autodiff_tpu.ops import pallas_kernel, stage_adjoint
    from pystencils_autodiff_tpu.ops import stage_chain as sc

    monkeypatch.setattr(pallas_kernel, "_on_tpu", lambda: True)
    real_make = sc._make_stage_chain_kernel
    default_vmem = 100 * 1024 * 1024

    def fwd_interp(progs, carries, state_fields, state_names, kk, spatial,
                   dtype, interp, periodic, **kw):
        return real_make(progs, carries, state_fields, state_names, kk,
                         spatial, dtype, True, periodic, **kw)

    monkeypatch.setattr(sc, "_make_stage_chain_kernel", fwd_interp)

    real_vjp = stage_adjoint.fused_stage_chain_vjp

    def fake_vjp(stages, k, periodic=False, interpret=None, tile_rows=None,
                 vmem_limit_bytes=default_vmem, shard=None, bcs=None,
                 extra_state=None):
        if vmem_limit_bytes >= default_vmem:
            def g(state, cots, bases=None):
                raise RuntimeError("remote compiler HTTP 500")
            return g
        return real_vjp(stages, k, periodic=periodic, interpret=True,
                        tile_rows=tile_rows,
                        vmem_limit_bytes=vmem_limit_bytes, shard=shard,
                        bcs=bcs, extra_state=extra_state)

    monkeypatch.setattr(stage_adjoint, "fused_stage_chain_vjp", fake_vjp)
    op = _heat_op()
    chain = sc.fused_stage_chain([(op, {"u": "u_next"})], 2, fused_bwd=True)
    u0 = jax.random.normal(jax.random.PRNGKey(1), (32, 32), jnp.float64)
    g = jax.grad(lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"])))(u0)
    reg = json.loads(guard_cache.read_text())
    assert any(k.endswith("stage_vjp")
               and isinstance(v, dict) and v["status"] == "crash"
               for k, v in reg.items())
    ref_chain = sc.fused_stage_chain([(op, {"u": "u_next"})], 2,
                                     interpret=True)
    g_ref = jax.grad(lambda a: jnp.sum(
        jnp.sin(ref_chain({"u": a})["u"])))(u0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-12, atol=1e-12)


def test_transient_backend_failure_not_persisted(guard_cache, caplog,
                                                 monkeypatch):
    """Relay transport errors (dropped connection mid-compile) must retry
    once and, if still failing, fall back WITHOUT recording a crash — a
    transient hiccup must not poison the variant's registry entry
    (observed 2026-08-18: one 'response body closed' during a benchmark
    disabled the healthy 256³ diff3d two-phase route persistently)."""
    import pystencils_autodiff_tpu.ops.guard as guard_mod

    monkeypatch.setattr(guard_mod.time, "sleep", lambda s: None)
    attempts = []

    def flaky():
        def fn(x):
            attempts.append(x)
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: read "
                "body: response body closed before all bytes were read")
        return fn

    def good():
        def fn(x):
            return x * 2
        return fn

    with caplog.at_level(logging.WARNING,
                         logger="pystencils_autodiff_tpu.guard"):
        name, fn, result = guard_variants(
            [("fused", flaky), ("sequential", good)], 21, signature="tr1")
    assert name == "sequential" and result == 42
    assert len(attempts) == 2  # retried the same variant once
    reg = json.loads(guard_cache.read_text()) if guard_cache.exists() else {}
    assert reg.get("tr1|fused") is None  # nothing persisted
    # a SECOND guard run tries the fused variant again (no skip)
    calls2 = []

    def now_healthy():
        def fn(x):
            calls2.append(x)
            return x + 1
        return fn

    name2, _, result2 = guard_variants(
        [("fused", now_healthy), ("sequential", good)], 1, signature="tr1")
    assert name2 == "fused" and result2 == 2


def test_transient_retry_succeeds(guard_cache, monkeypatch):
    """A variant that fails transiently once and then works is kept (and
    its compile time recorded), not skipped."""
    import pystencils_autodiff_tpu.ops.guard as guard_mod

    monkeypatch.setattr(guard_mod.time, "sleep", lambda s: None)
    state = {"n": 0}

    def flaky_then_ok():
        def fn(x):
            state["n"] += 1
            if state["n"] == 1:
                raise RuntimeError("connection reset by peer")
            return x * 3
        return fn

    name, fn, result = guard_variants(
        [("fused", flaky_then_ok)], 7, signature="tr2")
    assert name == "fused" and result == 21
    reg = json.loads(guard_cache.read_text())
    assert isinstance(reg.get("tr2|fused"), float)


def test_over_budget_build_is_abandoned(guard_cache):
    """A build (kernel construction + AOT Mosaic probe) that exceeds the
    budget is ABANDONED — the caller moves to the fallback within ~budget
    wall time instead of blocking until the compile finishes (observed
    2026-08-18: the in-process Timer only *marked* the timeout while the
    2048² BC'd cavity adjoint held the ladder 10+ min per variant)."""
    import threading
    import time as _time

    release = threading.Event()

    def hung_build():
        release.wait(30.0)  # stands in for a 10-minute remote compile
        def fn(x):
            return x - 1
        return fn

    def quick():
        def fn(x):
            return x + 1
        return fn

    guard = CompileGuard(budget_s=0.3)
    t0 = _time.monotonic()
    name, fn, result = guard.run(
        [("deep", hung_build), ("fallback", quick)], 5, signature="ab1")
    wall = _time.monotonic() - t0
    release.set()  # let the abandoned worker exit
    assert name == "fallback" and result == 6
    assert wall < 5.0  # bounded by the budget, not the compile
    reg = json.loads(guard_cache.read_text())
    assert reg["ab1|deep"]["status"] == "timeout"
    # and a later guard instance skips the offender outright
    name2, _, result2 = guard_variants(
        [("deep", hung_build), ("fallback", quick)], 1,
        signature="ab1", budget_s=0.3)
    assert name2 == "fallback" and result2 == 2


def test_stale_crash_record_is_reprobed(guard_cache, caplog):
    """A crash record older than the TTL is re-probed, not skipped — one
    congested relay session must not disable a healthy kernel's default
    route forever (round-4 diff3d 384³ plane_two_phase poisoning).  Legacy
    bare-string records (no timestamp) count as stale."""
    import time as _time

    guard_cache.write_text(json.dumps({
        # expired structured record
        "st1|fused": {"status": "crash", "when": _time.time() - 10 * 86400,
                      "error": "RuntimeError: remote compiler HTTP 500"},
        # legacy pre-round-5 record
        "st2|fused": "crash",
    }))

    def good():
        return lambda x: x * 2

    with caplog.at_level(logging.WARNING,
                         logger="pystencils_autodiff_tpu.guard"):
        name1, _, r1 = guard_variants(
            [("fused", good), ("sequential", good)], 3, signature="st1")
        name2, _, r2 = guard_variants(
            [("fused", good), ("sequential", good)], 4, signature="st2")
    assert name1 == "fused" and r1 == 6
    assert name2 == "fused" and r2 == 8
    assert sum("re-probing" in r.message for r in caplog.records) == 2
    # the successful re-probe replaces the stale record with an ok-record
    reg = json.loads(guard_cache.read_text())
    assert isinstance(reg["st1|fused"], float)
    assert isinstance(reg["st2|fused"], float)


def test_fresh_crash_record_still_skipped(guard_cache):
    """Records inside the TTL keep their skip-first semantics."""
    import time as _time

    guard_cache.write_text(json.dumps({
        "fr1|fused": {"status": "crash", "when": _time.time(),
                      "error": "RuntimeError: mosaic failed"}}))
    order = []

    def make(name):
        def build():
            def fn(x):
                order.append(name)
                return x
            return fn
        return build

    name, _, _ = guard_variants(
        [("fused", make("fused")), ("sequential", make("sequential"))],
        1, signature="fr1")
    assert name == "sequential" and order == ["sequential"]


def test_congestion_5xx_is_transient(guard_cache, monkeypatch):
    """Gateway-class 5xx from the congested compile relay (BENCH_NOTES
    round-4 session 3: queued compiles, bursty 5xx) retries then falls
    back WITHOUT a persistent crash record."""
    import pystencils_autodiff_tpu.ops.guard as guard_mod

    monkeypatch.setattr(guard_mod.time, "sleep", lambda s: None)

    for msg in ("HTTP/1.1 503 Service Unavailable",
                "remote_compile: 502 Bad Gateway",
                "HTTP 429 Too Many Requests"):
        def flaky(m=msg):
            def fn(x):
                raise RuntimeError(m)
            return fn

        def good():
            return lambda x: x * 2

        name, _, result = guard_variants(
            [("fused", flaky), ("sequential", good)], 21,
            signature=f"cg|{msg[:12]}")
        assert name == "sequential" and result == 42
    reg = json.loads(guard_cache.read_text()) if guard_cache.exists() else {}
    assert not any(isinstance(v, dict) and v.get("status") == "crash"
                   for v in reg.values()), reg


def test_stage_vjp_wide_pathology_seeded():
    """LBM-class (>=9-plane) two-phase adjoints at k>=4 and >=2048^2
    cells are pre-seeded offenders (recorded 2026-08-18: >600 s compile
    then a VMEM crash on the BC'd cavity chain); narrower, shallower, or
    smaller problems are not."""
    assert known_pathology("stage_vjp_wide", planes=10, k=4,
                           cells=2048 * 2048)
    assert known_pathology("stage_vjp_wide", planes=9, k=6,
                           cells=4096 * 4096)
    assert not known_pathology("stage_vjp_wide", planes=10, k=2,
                               cells=2048 * 2048)  # k=2 compiles (79 s)
    assert not known_pathology("stage_vjp_wide", planes=4, k=4,
                               cells=2048 * 2048)  # narrow chains fine
    assert not known_pathology("stage_vjp_wide", planes=10, k=4,
                               cells=1024 * 1024)  # small domains fine


def test_stage_vjp_segmented_fallback(guard_cache, monkeypatch):
    """When the monolithic k-deep two-phase TU fails at every VMEM budget,
    the guard falls through to the SEGMENTED fused backward (checkpointed
    kk-deep two-phase kernels) before sequential — the round-4 fix for
    wide chains whose one-TU adjoint exceeds the Mosaic compiler."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pystencils_autodiff_tpu.ops import pallas_kernel, stage_adjoint
    from pystencils_autodiff_tpu.ops import stage_chain as sc

    monkeypatch.setattr(pallas_kernel, "_on_tpu", lambda: True)
    real_make = sc._make_stage_chain_kernel

    def fwd_interp(progs, carries, state_fields, state_names, kk, spatial,
                   dtype, interp, periodic, **kw):
        return real_make(progs, carries, state_fields, state_names, kk,
                         spatial, dtype, True, periodic, **kw)

    monkeypatch.setattr(sc, "_make_stage_chain_kernel", fwd_interp)

    real_vjp = stage_adjoint.fused_stage_chain_vjp
    K = 2

    def fake_vjp(stages, kk, periodic=False, interpret=None,
                 tile_rows=None, vmem_limit_bytes=100 * 1024 * 1024,
                 shard=None, bcs=None, extra_state=None):
        if kk == K:  # the monolithic TU "exceeds the compiler"
            def g(state, cots, bases=None):
                raise RuntimeError("remote compiler HTTP 500")
            return g
        return real_vjp(stages, kk, periodic=periodic, interpret=True,
                        tile_rows=tile_rows,
                        vmem_limit_bytes=vmem_limit_bytes, shard=shard,
                        bcs=bcs, extra_state=extra_state)

    monkeypatch.setattr(stage_adjoint, "fused_stage_chain_vjp", fake_vjp)
    op = _heat_op()
    chain = sc.fused_stage_chain([(op, {"u": "u_next"})], K,
                                 fused_bwd=True)
    u0 = jax.random.normal(jax.random.PRNGKey(2), (32, 32), jnp.float64)
    g = jax.grad(lambda a: jnp.sum(jnp.sin(chain({"u": a})["u"])))(u0)
    reg = json.loads(guard_cache.read_text())
    assert any(k.endswith("|stage_vjp")
               and isinstance(v, dict) and v["status"] == "crash"
               for k, v in reg.items())
    assert any(k.endswith("stage_vjp_seg_k1") and isinstance(v, float)
               for k, v in reg.items()), reg
    ref_chain = sc.fused_stage_chain([(op, {"u": "u_next"})], K,
                                     interpret=True)
    g_ref = jax.grad(lambda a: jnp.sum(
        jnp.sin(ref_chain({"u": a})["u"])))(u0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-12, atol=1e-12)
