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


# The thorough tier: tests measured >= 3 s on the 1-core host (XLA-compile
# bound; regenerate with tools/regen_tiers.py from a `pytest --durations=0`
# report, see ROADMAP.md suite-budget note).  The DEFAULT run skips them to stay under the 5-minute budget that
# keeps a suite actually being run (VERDICT round 2, next #6); every skipped
# family keeps a faster canary in the default lane (e.g. the k=1 streaming
# bounce-back fused-bwd cavity stands in for the 78 s k=2 BGK one).  Set
# PYSTENCILS_ADTPU_FULL_SUITE=1 to run everything (CI full job does).
_THOROUGH = (
    "test_chain_bc.py::test_sharded_fused_bwd_bounce_back_cavity",
    "test_chain_bc.py::test_fused_bwd_bounce_back_cavity[2]",
    "test_chain_bc.py::test_fused_bwd_bounce_back_f_gradient",
    "test_sharded_uneven.py::test_sharded_chain_uneven_gradients",
    "test_chain_bc.py::test_bounce_back_cavity_chain[2]",
    "test_sharded_uneven.py::test_sharded_chain_uneven_fused_bwd",
    "test_sharded_uneven.py::test_sharded_stencil_uneven_gradients",
    "test_plane_adjoint.py::test_guard_routes_vmem_oom_to_lateral_chunks",
    "test_chain_bc.py::test_sponge_index_field_aos_and_soa",
    "test_chain_bc.py::test_sharded_chain_with_boundary",
    "test_plane_adjoint.py::test_plane_adjoint_lateral_chunks_exact[5-False]",
    "test_stage_chain.py::test_fused_backward_weno5_rk3",
    "test_random_stencils.py::test_random_two_stage_chain_fused_bwd[1]",
    "test_random_stencils.py::test_random_stencil_pallas_blocked_3d[0]",
    "test_chain_bc.py::test_fused_bwd_neumann_3d[shape1]",
    "test_stage_chain.py::test_weno5_rk3_gradient",
    "test_layouts.py::test_d2q9_soa_fused_chain",
    "test_lbm.py::test_lbm_timeloop_stable_and_differentiable",
    "test_chain_bc.py::test_fused_bwd_neumann_3d[shape0]",
    "test_layouts.py::test_d2q9_soa_matches_aos[pallas]",
    "test_fwi_fused.py::test_fused_fwi_gradient_descends",
    "test_random_stencils.py::test_random_two_stage_chain_fused_bwd[0]",
    "test_stage_chain.py::test_fused_backward_elastic[2-False]",
    "test_chain_bc.py::test_fused_bwd_neumann_wide_frame",
    "test_plane_adjoint.py::test_plane_adjoint_lateral_chunks_exact[2-False]",
    "test_lbm3d.py::test_d3q19_jnp_gradient_finite",
    "test_plane_adjoint.py::test_plane_adjoint_sharded_dim0_exact",
    "test_boundary_masked.py::test_cavity_gradient_pallas_matches_jnp",
    "test_boundary_masked.py::test_cavity_gradient_wrt_lid_velocity",
    "test_chain_bc.py::test_fused_bwd_bounce_back_soa_layout",
    "test_adjoint_chain.py::test_lbm_adjoint_chain[1-False]",
    "test_sharded_chain.py::test_fused_backward_elastic_stages[False]",
    "test_lbm.py::test_gradients_through_collision",
    "test_random_stencils.py::test_random_stencil_pallas_blocked[0]",
    "test_plane_adjoint.py::test_plane_adjoint_lateral_chunks_exact[5-True]",
    "test_random_stencils.py::test_random_stencil_pallas_blocked[2]",
    "test_chain_bc.py::test_fused_bwd_bounce_back_streaming_canary",
    "test_lbm3d.py::test_equilibrium_is_fixed_point_3d",
    "test_stage_chain.py::test_awkward_shapes_pad_on_bounded_domains[shape1]",
    "test_stage_chain.py::test_elastic_chain_gradients_exact[True]",
    "test_lbm3d.py::test_mass_momentum_conserved_3d",
    "test_layouts.py::test_d2q9_soa_matches_aos[jnp]",
    "test_time_chain.py::test_fused_bwd_chain_gradients[False]",
    "test_time_chain.py::test_roll_reads_wave_and_gradients[False]",
    "test_random_stencils.py::test_random_two_stage_chain_fused_bwd[2]",
    "test_chain_bc.py::test_sponge_fused_bwd_matches_sequential[3]",
    "test_time_chain.py::test_roll_reads_wave_and_gradients[True]",
    "test_graph_datahandling.py::test_graph_stages_mesh_boundary_fused_bwd_compose",
    "test_random_stencils.py::test_random_stencil_pallas_blocked[1]",
    "test_fwi_fused.py::test_fused_fwi_gradient_matches_sequential",
    "test_vjp.py::test_second_order_grad",
    "test_stage_chain.py::test_weno5_rk3_chain[1-True]",
    "test_random_stencils.py::test_random_stencil_pallas_blocked_3d[1]",
    "test_sharded_chain.py::test_elastic_stage_chain_sharded[False]",
    "test_time_chain.py::test_roll_reads_hoisted_coefficients",
    "test_time_chain.py::test_fused_chain_gradients_exact",
    "test_chain_bc.py::test_fused_bwd_neumann_with_masked_dirichlet",
    "test_vjp.py::test_variable_coefficient_diffusion",
    "test_random_stencils.py::test_random_stencil_gradients[2-4]",
    "test_plane_adjoint.py::test_aniso27_plane_two_phase[False]",
    "test_plane_adjoint.py::test_plane_adjoint_lateral_chunks_exact[2-True]",
    "test_chain_bc.py::test_sponge_fused_bwd_two_stage_wave",
    "test_stage_chain.py::test_awkward_shapes_pad_on_bounded_domains[shape0]",
    "test_time_chain.py::test_roll_reads_twin_vjp_matches_slice",
    "test_random_stencils.py::test_random_stencil_gradients[2-3]",
    "test_chain_bc.py::test_frame_bc_in_chain[neumann-<lambda>]",
    "test_stage_chain.py::test_fused_backward_elastic[2-True]",
    "test_time_chain.py::test_fused_lbm_chain",
    "test_stage_chain.py::test_elastic_chain_gradients_exact[False]",
    "test_stage_chain.py::test_fused_backward_elastic[1-False]",
    "test_stage_chain.py::test_weno5_rk3_chain[2-False]",
    "test_vjp.py::test_3d_stencil",
    "test_twin_adjoint.py::test_wave3d_like_plane_twin_accum[False]",
    "test_sharding.py::test_overlap_mode_matches_exactly[mesh_shape1-axes1-dims1]",
    "test_twin_adjoint.py::test_diffusion3d_plane_twin_accum_exact[2-False]",
    "test_vjp.py::test_multi_input_multi_output",
    "test_vjp.py::test_laplacian_2d_gradcheck",
    "test_time_chain.py::test_fused_bwd_chain_gradients[True]",
    "test_chain3d.py::test_diffusion3d_chain_fused_bwd_grad",
    "test_pallas.py::test_periodic_lbm_single_pass",
    "test_stage_chain.py::test_unmapped_state_stage_output_name_collision",
    "test_sharded_chain.py::test_fused_backward_elastic_stages[True]",
    "test_random_stencils.py::test_random_stencil_gradients[2-5]",
    "test_phasefield.py::test_cahn_hilliard_fused_stage_chain",
    "test_chain_bc.py::test_fused_bwd_pads_awkward_rows",
    "test_stage_chain.py::test_fused_backward_nonlinear_two_sweep[False]",
    "test_chain_bc.py::test_fused_bwd_masked_dirichlet_value_gradient",
    "test_random_stencils.py::test_random_stencil_modes_agree[0]",
    "test_boundary_masked.py::test_mass_conservation_stationary_walls",
    "test_lbm.py::test_mass_momentum_conserved_by_collision",
    "test_random_stencils.py::test_random_stencil_gradients[1-0]",
    "test_graph_datahandling.py::test_graph_compiles_to_sharded_execution",
    "test_plane_adjoint.py::test_diffusion3d_plane_two_phase[2-False]",
    "test_vjp.py::test_nonlinear_stencil",
    "test_compose.py::test_fused_pallas_blocked",
    "test_timeloop.py::test_time_constant_gradient_accumulates_across_steps",
    "test_pallas.py::test_periodic_lowering_matches_roll_oracle[jnp]",
    "test_pallas.py::test_blocked_pad_3d_odd_shape",
    "test_chain_bc.py::test_sponge_in_chain",
    "test_vjp.py::test_asymmetric_ghost_layers",
    "test_pallas.py::test_blocked_staggered_elastic",
    "test_adjoint_chain.py::test_frozen_coefficient_passthrough_cotangent",
    "test_chain_bc.py::test_fused_bwd_frame_dirichlet_matches_sequential",
    "test_sharded_chain.py::test_trivial_mesh_fast_path[False-False]",
    "test_pallas.py::test_blocked_pad_to_divisible_rows",
    "test_pallas.py::test_blocked_3d_and_vjp",
    "test_sharded_chain.py::test_trivial_mesh_fast_path[True-False]",
    "test_vjp.py::test_boundary_gradients_nonzero_and_exact",
    "test_twin_adjoint.py::test_wave_chain_under_grad",
    "test_sharded_chain.py::test_elastic_stage_chain_sharded[True]",
    "test_random_stencils.py::test_random_stencil_gradients[2-0]",
    "test_stage_chain.py::test_fused_backward_elastic[1-True]",
    "test_autotune.py::test_stage_chain_picks_fastest_and_caches",
    "test_time_chain.py::test_fused_op_composes_with_time_chain",
    "test_tfmad.py::test_batched_fields_via_vmap",
    "test_stage_chain.py::test_weno5_rk3_chain[2-True]",
    "test_time_chain.py::test_fused_wave_chain_with_carried_constant[True]",
    "test_sharded_chain.py::test_mixed_mesh_size1_axis[False]",
    "test_pallas.py::test_periodic_3d_falls_back_to_jnp",
    "test_chain_bc.py::test_sharded_fused_bwd_with_frame_bc[neumann-<lambda>]",
    "test_stage_chain.py::test_weno5_rk3_chain[1-False]",
    "test_stage_chain.py::test_awkward_shape_periodic_wrap_extend[shape1]",
    "test_sharded_chain.py::test_deep_halo_at_shard_extent[True]",
    "test_adjoint_chain.py::test_wave_adjoint_chain[4-False]",
    "test_vjp.py::test_vector_field_index_dims",
    "test_models.py::test_config2_diffusion3d[transposed]",
    "test_lbm.py::test_step_matches_oracle_interior",
    "test_sharded_chain.py::test_mixed_mesh_size1_axis[True]",
    "test_sharded_chain.py::test_fused_backward_matches_sequential[False]",
    "test_guard.py::test_stage_vjp_segmented_fallback",
    "test_sharded_chain.py::test_deep_halo_at_shard_extent[False]",
    "test_dd.py::test_dd_accumulate_in_kernels",
    "test_chain3d.py::test_aniso27_periodic_3d_linear_twin_chain",
    "test_stage_chain.py::test_elastic_two_sweep_chain[3-False]",
    "test_plane_adjoint.py::test_wave3d_two_field_carry",
    "test_random_stencils.py::test_random_stencil_gradients[2-2]",
    "test_plane_adjoint.py::test_linear_rolling_state_path",
    "test_chain_bc.py::test_fused_bwd_frame_bc_dim_subsets[spec1-<lambda>]",
    "test_stage_chain.py::test_awkward_shape_periodic_wrap_extend[shape0]",
    "test_serving.py::test_shape_polymorphic_export",
    "test_chain_bc.py::test_sponge_fused_bwd_matches_sequential[1]",
)


# Default-lane canaries that intentionally exceed the tier cut (one fast
# representative per gated family) — keep in sync with tools/regen_tiers.py
# KEEPERS.  They are exempt from the over-budget enforcement below.
_KEEPERS = {
    "test_fused_bwd_neumann_matches_sequential",
    "test_fwi_gradient_end_to_end",
    "test_random_chain_fused_bwd_with_bcs",
}

# Tier-budget enforcement (VERDICT round-3 next #7): the hardcoded
# _THOROUGH list decays silently — renamed tests fall back into the
# default lane, new slow tests are never caught.  Record every
# default-lane test that exceeds the budget and report loudly at the end;
# PYSTENCILS_ADTPU_ENFORCE_TIERS=1 (set in CI's default-lane job) turns
# the report into a failure so the lane budget can't rot again.
_TIER_BUDGET_S = float(os.environ.get("PYSTENCILS_ADTPU_TIER_BUDGET_S", "5"))
_over_budget = []


def pytest_runtest_logreport(report):
    if (report.when == "call"
            and report.duration >= _TIER_BUDGET_S
            and not os.environ.get("PYSTENCILS_ADTPU_FULL_SUITE")
            # the budget calibrates the hermetic CPU lane; TPU-lane runs
            # pay relay RTT + remote compiles per test and are not tiered
            and not os.environ.get("PYSTENCILS_ADTPU_TPU_TESTS")):
        short = report.nodeid.split("::")[-1].split("[")[0]
        if short not in _KEEPERS:
            _over_budget.append((report.duration, report.nodeid))


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if not _over_budget:
        return
    terminalreporter.section("tier budget", sep="=")
    terminalreporter.write_line(
        f"{len(_over_budget)} default-lane test(s) exceeded the "
        f"{_TIER_BUDGET_S:.0f}s tier budget — tag them _THOROUGH (run "
        f"tools/regen_tiers.py on fresh --durations=0 data) or add a "
        f"KEEPERS entry:")
    for t, nodeid in sorted(_over_budget, reverse=True):
        terminalreporter.write_line(f"  {t:7.1f}s  {nodeid}")


def pytest_sessionfinish(session, exitstatus):
    if _over_budget and os.environ.get("PYSTENCILS_ADTPU_ENFORCE_TIERS"):
        session.exitstatus = 1


def pytest_collection_modifyitems(config, items):
    if not os.environ.get("PYSTENCILS_ADTPU_FULL_SUITE"):
        skip_thorough = pytest.mark.skip(
            reason="thorough tier; set PYSTENCILS_ADTPU_FULL_SUITE=1")
        for item in items:
            if any(item.nodeid.endswith(e) for e in _THOROUGH):
                item.add_marker(skip_thorough)
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
