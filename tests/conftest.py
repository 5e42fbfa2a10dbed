"""Test configuration: CPU backend, float64, 8 virtual devices for sharding.

Mirrors the reference's capability-gated test strategy (SURVEY.md §4): the
whole suite runs on CPU (Pallas interpret mode, float64 oracle); TPU-only
tests skip unless a real TPU is attached.  The 8 virtual CPU devices let
shard_map/halo-exchange tests run "multi-chip" without a cluster.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if (not os.environ.get("PYSTENCILS_ADTPU_TPU_TESTS")
        and not os.environ.get("PYSTENCILS_ADTPU_XLA_FULL_OPT")
        and "--xla_backend_optimization_level" not in _flags):
    # the CPU oracle suite is XLA-COMPILE-bound (big unrolled
    # interpret-mode graphs, tiny domains): backend opt level 0 cuts the
    # serial suite ~32% — it is a compile-time knob, results are
    # identical; set PYSTENCILS_ADTPU_XLA_FULL_OPT=1 to restore
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags.strip()

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


# the ~20 slowest tests (interpret-mode trace-bound; full ranking in
# ROADMAP.md suite-budget note). PYSTENCILS_ADTPU_FAST_SUITE=1 skips them
# for a <5-min iteration lane; the DEFAULT run keeps them (full coverage).
_HEAVY = (
    "test_bounce_back_cavity_chain", "test_lbm_adjoint_chain",
    "test_sharded_chain_with_boundary", "test_cavity_gradient_wrt_lid",
    "test_fused_fwi_gradient_descends", "test_fused_backward_weno5_rk3",
    "test_cavity_gradient_pallas_matches_jnp",
    "test_fused_fwi_gradient_matches_sequential",
    "test_d2q9_soa_fused_chain", "test_mass_conservation_stationary_walls",
    "test_d2q9_soa_matches_aos", "test_lbm_timeloop_stable",
    "test_fused_backward_elastic", "test_frame_bc_in_chain",
    "test_weno5_rk3_gradient", "test_fused_lbm_chain",
    "test_d3q19_jnp_gradient_finite", "test_awkward_shapes_pad",
    "test_diffusion3d_chain_fused_bwd_grad", "test_equilibrium_is_fixed_point_3d",
    "test_wave_adjoint_chain", "test_fused_bwd_chain_gradients",
    "test_mass_momentum_conserved_3d", "test_awkward_shape_periodic",
    "test_weno5_rk3_chain", "test_elastic_stage_chain_sharded",
    "test_fused_backward_elastic_stages",
    "test_fused_bwd_bounce_back_cavity", "test_fused_bwd_bounce_back_f",
)


def pytest_collection_modifyitems(config, items):
    if os.environ.get("PYSTENCILS_ADTPU_FAST_SUITE"):
        skip_heavy = pytest.mark.skip(
            reason="fast lane (PYSTENCILS_ADTPU_FAST_SUITE=1)")
        for item in items:
            if any(h in item.name for h in _HEAVY):
                item.add_marker(skip_heavy)
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
