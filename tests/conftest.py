"""Test configuration: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device code paths without TPU hardware.

NOTE: this environment's sitecustomize registers an `axon` TPU backend and pins
JAX_PLATFORMS=axon at interpreter start; plain env-var overrides do NOT work.
`jax.config.update("jax_platforms", "cpu")` after import is the reliable way to
force CPU (XLA_FLAGS must still be set before the CPU client initializes).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)  # match TPU f32 behavior in tests
