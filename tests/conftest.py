"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding (the TPU answer to the reference's torchrun/NCCL DDP,
/root/reference/pipeline/distributed_utils.py:73-100) is validated on a
virtual device mesh; flags must be set before jax initialises.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
