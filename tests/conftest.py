"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding is exercised without a TPU pod via
xla_force_host_platform_device_count (SURVEY.md §4).

Note: env vars alone are not enough on hosts whose site customization
registers an accelerator plugin programmatically (it overrides JAX_PLATFORMS),
so the platform is also forced through jax.config before any backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The suite is compile-dominated (hundreds of small programs; runtime is
# negligible at test shapes), so compile the CPU backend at optimization
# level 0: ~2x faster cold compiles, and every bit-exactness test still
# passes (the parity-sensitive expressions are already written in the
# oracle's own form, not left to fusion).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=0"
)
# Persistent XLA compile cache: OPT-IN only (set JAX_COMPILATION_CACHE_DIR
# yourself to use it). Round-3 measurement: merely enabling the cache makes
# the big interpret-mode kernel programs compile 7-12x SLOWER (8.5s -> 56-98s
# for one supersampled-polylines call; the cache-key serialization/hash of
# the huge traced module dominates, writes gated or not), so a default-on
# cache costs a cold suite run far more than warm-run reads save.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
