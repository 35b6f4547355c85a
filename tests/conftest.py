"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding is exercised without a TPU pod via
xla_force_host_platform_device_count (SURVEY.md §4).

Note: env vars alone are not enough on hosts whose site customization
registers an accelerator plugin programmatically (it overrides JAX_PLATFORMS),
so the platform is also forced through jax.config before any backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Persistent XLA compile cache: the suite is compile-dominated (oracle-exact
# kernels trace large windowed scans), and caching cuts repeat wall time
# ~2.5x. Respects a pre-set dir (CI restores it via actions/cache).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "comfystereo_tpu",
                 "jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
