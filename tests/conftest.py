"""Test configuration: force CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh (same XLA semantics, different speed).

The environment's sitecustomize imports jax with JAX_PLATFORMS=axon (a TPU
tunnel whose init is slow/flaky), so the env var is already locked in —
override through jax.config instead, before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: several tests jit large graphs (sweeps,
# raster interpret mode); cache makes repeat suite runs much faster
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS fallback above covers it
