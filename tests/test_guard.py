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
    assert reg["t1|fused"] == "crash"


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
    assert known_pathology("flat_chain_vjp_3d", cells=384 ** 3)
    assert known_pathology("flat_chain_vjp_3d", cells=256 ** 3) is None
    assert known_pathology("something_else", cells=10 ** 9) is None
