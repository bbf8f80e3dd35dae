"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver dry-runs
the real multi-chip path separately); kernels run in Pallas interpreter mode
on CPU automatically (see omniserve_tpu.ops.dispatch).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
