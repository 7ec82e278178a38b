"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the axon TPU backend at interpreter
start (and presets JAX_PLATFORMS=axon), so plain env vars are not enough:
we must override the jax config after import but before backend init.
Tests must run without a TPU; multi-chip sharding tests use the virtual
device mesh (xla_force_host_platform_device_count=8).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize already imported jax anyway)

jax.config.update("jax_platforms", "cpu")
