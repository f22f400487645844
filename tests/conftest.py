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

# Persistent compilation cache: the suite's wall time is dominated by
# full-model CPU compiles (dozens of distinct configs); caching them makes
# re-runs ~4x faster. Keyed on HLO, so source changes invalidate naturally.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
