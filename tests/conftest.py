"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md section 4, level 5).

The environment's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so the platform must be re-pinned through
jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
