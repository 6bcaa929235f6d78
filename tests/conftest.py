"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual device mesh
(``xla_force_host_platform_device_count=8``) so the suite runs anywhere;
the driver separately dry-runs the real multi-chip path via
``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
