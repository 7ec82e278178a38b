"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Tests must run without a TPU; multi-chip sharding tests use the virtual
device mesh (xla_force_host_platform_device_count=8).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep test numerics deterministic and fast
os.environ.setdefault("JAX_ENABLE_X64", "0")
