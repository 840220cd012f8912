"""Test configuration: force an 8-virtual-device CPU platform before JAX init.

This is the TPU-world answer to testing multi-chip sharding without a pod:
`--xla_force_host_platform_device_count=8` gives `jax.devices()` eight CPU
devices so `Mesh`/`pjit`/`shard_map` paths compile and execute for real.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU-tunnel sitecustomize force-selects "axon,cpu" via jax.config;
# override it back so the suite runs on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
