"""Test configuration: run the suite on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md §4). Must set XLA flags
before jax initializes a backend."""

import os

# Preserve the launch-time platform for subprocess chip tests (test_chip.py)
# before forcing this process onto the CPU mesh.
os.environ.setdefault("GT_ORIG_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config knob does take effect. Tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

