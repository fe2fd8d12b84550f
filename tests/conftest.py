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
