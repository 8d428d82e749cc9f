"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding (the TPU answer to the reference's torchrun/NCCL DDP,
/root/reference/pipeline/distributed_utils.py:73-100) is validated on a
virtual device mesh; flags must be set before jax initialises.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (the tunneled real TPU); tests must
# run on the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the sandbox has one CPU core, so XLA compiles
# dominate test wall-time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
