"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md section 4, level 5).

The environment's axon sitecustomize force-registers the TPU backend and
overrides JAX_PLATFORMS, so the platform must be re-pinned through
jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound on CPU (every e2e trainer jit-compiles its
# own step).  Backend opt level 0 cuts XLA CPU compile ~38% (measured:
# test_semi_2d::test_cct 133.7 -> 82.6 s) and only changes how fast the
# compiled code runs, not its numerics — parity/exactness tests are
# unaffected.  Tests only; production paths never see this flag.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
# (A persistent JAX_COMPILATION_CACHE_DIR was tried and is a no-op on
# the CPU backend in this jax build — the cache dir stays empty.)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
