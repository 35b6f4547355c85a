"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-device sharding is exercised without a TPU pod via
xla_force_host_platform_device_count (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
