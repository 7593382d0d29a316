"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# this jax build ignores the XLA flag; set the config knob too (must happen
# before the backend initializes)
try:
    import jax

    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
