"""Test harness: force the CPU XLA backend with 8 virtual devices so
data-parallel sharding is exercised without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS=cpu from the environment; the
# config knob takes precedence.
jax.config.update("jax_platforms", "cpu")
