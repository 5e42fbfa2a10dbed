"""Test configuration: CPU backend, float64, 8 virtual devices for sharding.

Mirrors the reference's capability-gated test strategy (SURVEY.md §4): the
whole suite runs on CPU (Pallas interpret mode, float64 oracle); TPU-only
tests skip unless a real TPU is attached.  The 8 virtual CPU devices let
shard_map/halo-exchange tests run "multi-chip" without a cluster.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; undo that for hermetic CPU tests.  Set
# PYSTENCILS_ADTPU_TPU_TESTS=1 to keep the TPU attached (runs the
# @pytest.mark.tpu tests natively; float64 tests still run on CPU arrays
# only if the op supports it — prefer the CPU run for the full suite).
if not os.environ.get("PYSTENCILS_ADTPU_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line(
        "markers", "slow: heavy interpret-mode sweep; skipped unless "
        "PYSTENCILS_ADTPU_SLOW_TESTS=1 (each slow case keeps a fast canary)")


def pytest_collection_modifyitems(config, items):
    try:
        has_tpu = any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        has_tpu = False
    if not has_tpu:
        skip = pytest.mark.skip(reason="no TPU attached; CPU-only run")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
    if not os.environ.get("PYSTENCILS_ADTPU_SLOW_TESTS"):
        skip_slow = pytest.mark.skip(
            reason="slow sweep; set PYSTENCILS_ADTPU_SLOW_TESTS=1")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip_slow)
