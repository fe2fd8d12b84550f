"""Test environment: CPU backend with 8 virtual devices so sharding tests
run without TPU hardware; Pallas kernels run in interpreter mode.

The container's sitecustomize registers an 'axon' TPU backend and forces
it via jax config, so plain JAX_PLATFORMS=cpu is not enough — we override
through jax.config before any test imports run jax computations.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# test tiers: `-m "not heavy"` is the <3 min smoke subset for iteration;
# the full suite (~25 min on CPU) stays the default.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

HEAVY_MODULES = {
    "test_cli_e2e", "test_cli_parallel", "test_parallel", "test_train_e2e",
    "test_rasterize_grads", "test_cull_before_deform", "test_multicam",
}
HEAVY_TESTS = {
    ("test_rasterize_forward", "test_nonsquare_image_and_odd_size"),
    ("test_rasterize_forward", "test_full_resolution_two_key_path"),
    ("test_rasterize_forward", "test_behind_camera_culled"),
    ("test_deformation", "test_gradients_reach_grid_and_mlp"),
    ("test_tile_kernels", "test_forward_kernel_matches_jnp"),
    ("test_tile_kernels", "test_forward_kernel_high_opacity_early_exit"),
    ("test_tile_kernels", "test_backward_kernel_matches_jnp"),
    ("test_hexplane", "test_grid_gradients_flow"),
    ("test_pair_budget", "test_budget_overflow_reported_and_bounded"),
    ("test_pool", "test_capacity_overflow_reported"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        name = item.name.split("[")[0]
        if mod in HEAVY_MODULES or (mod, name) in HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)
