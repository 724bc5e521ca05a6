"""Test harness config: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), the JAX analogue of a fake
multi-node backend; float64 is enabled so parity tests against the
reference's numpy/math (float64) semantics can be bit-exact.
"""
import os

# Hard override: the session may pre-set JAX_PLATFORMS to a TPU platform,
# but tests must run on host CPU (true float64 + virtual 8-device mesh).
# jax may already be imported by a pytest plugin (baking env defaults into
# jax.config), so set both the env vars and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import sys

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

REFERENCE_PATH = "/root/reference"

# ---------------------------------------------------------------------------
# Slow-test marking. The full suite is the round/CI gate (~12 CPU-minutes);
# day-to-day iteration runs the <60s core via `pytest -m "not slow"`.
# Central table (by file, base test name -- parametrized variants included)
# rather than per-test decorators, so the budget is auditable in one place.
# Measured with --durations: everything >= ~4s lands here.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_cv2_stroke.py": {
        "test_host_oracle_bit_exact",
        "test_jnp_predicate_bit_exact",
        "test_dense_and_tiled_exact_stroke",
    },
    "test_query_grid.py": {
        "test_grid_matches_full_scan_knuffingen",
    },
    "test_env.py": {
        "test_observation_parity_vs_reference",
        "test_jit_and_vmap_consistency",
        "test_reset_step_smoke",
        "test_rgb_observation_parity",
    },
    "test_parallel.py": {
        "test_graft_dryrun",
        "test_sp_rasterize_bit_equal",
        "test_sp_packed_kernel_bit_equal",
        "test_sp_env_observation_bit_equal",
        "test_sp_exact_stroke_bit_equal",
        "test_sp_rank_format_bit_equal",
    },
    "test_vector.py": {
        "test_vmap_matches_single",
        "test_sharded_batch_runs",
        "test_auto_reset",
    },
    "test_multihost.py": {
        "test_two_process_sharded_step",
        "test_two_process_td3_chunk",
    },
    # NOTE: single entry per file -- a duplicate dict key silently
    # replaces the earlier set (this once unmarked the exact-stroke
    # kernel tests; guarded by test_misc.test_slow_table_no_dup_keys).
    "test_rasterize_pallas.py": {
        "test_exact_stroke_kernel_bit_equal",
        "test_env_dma_kernel_matches_reference",
        "test_env_check_segment_overflow",
        "test_segment_axis_alternate_matches_production",
        "test_wide_oversubscribed_budget_scales_with_blocks",
        "test_bit_equal_real_frame",
        "test_wide_frame_packed_lane_split",
        "test_max_visible_oversubscribed_short_first",
        "test_wide_frame_lane_split",
        "test_packed_batched_and_empty_env",
        "test_tall_heavy_frame",
        "test_batched_leading_dims",
        "test_equal_random",
        "test_compact_preserves_all_drawn",
        "test_packed_oversubscription_keeps_shorts",
        "test_packed_auto_cpu_dispatch",
        "test_packed_matches_per_layer",
        "test_segment_overflow_counts",
        "test_rank_kernel_rgb_equals_mask_composite",
        "test_rank_kernel_odd_height_and_budget",
    },
    "test_checkpoint.py": {
        "test_td3_state_roundtrip",
        "test_env_state_resume_mid_episode",
    },
    "test_train.py": {
        "test_td3_critic_target_math",
        "test_il_train_step_reduces_loss",
        "test_evaluate_harness_stanley",
        "test_replay_ring_and_sample",
        "test_evaluate_sequential_strict",
    },
    "test_td3_loop.py": {
        "test_fused_chunk",
        "test_sigma_per_episode",
        "test_float_obs_path_matches_uint8",
        "test_updates_per_step_zero_collect_only",
    },
    "test_car_parity.py": {
        "test_info_parity",
        "test_trajectory_parity",
        "test_uturn_parity",
    },
    "test_knuffingen.py": {
        "test_high_res_observation",
        "test_large_map_observation",
    },
    "test_models.py": {
        "test_encoder_combo_shapes",
        "test_temporal_conv_matches_torch",
        "test_actor_critic_shapes",
    },
    "test_gym_api.py": {"test_wrapped_stack_parity"},
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test; `-m 'not slow'` selects the fast core",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS.get(fname, ()):
            item.add_marker(pytest.mark.slow)


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "tinycarlo"))


@pytest.fixture(scope="session")
def reference():
    """Import the reference implementation as an oracle for parity tests."""
    if not has_reference():
        pytest.skip("reference implementation not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tinycarlo  # noqa: F401  (registers gym envs)

    return tinycarlo


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not available"
)

# Vendored copies of the reference maps (examples/maps/README.md): map-
# dependent tests run standalone; only tests importing the reference CODE
# as an oracle need the checkout (requires_reference).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIMPLE_LAYOUT_MAP = os.path.join(_REPO, "examples/maps/simple_layout.json")
KNUFFINGEN_MAP = os.path.join(_REPO, "examples/maps/knuffingen.json")
