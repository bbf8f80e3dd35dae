"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver dry-runs
the real multi-chip path separately). The environment pins
``JAX_PLATFORMS=axon`` (TPU plugin) which ignores the env-var override, so
the backend is forced via jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
