"""Test harness config: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

Set TPUDRACO_TEST_TPU=1 to keep whatever platform the site configures
(e.g. the real chip behind the axon tunnel) — slower, but exercises the
compiled Pallas kernels instead of interpret mode."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# keep the suite hermetic: never read/write the user-level routing cache
# (tests that exercise persistence opt in with a tmp_path override)
os.environ.setdefault("TPUDRACO_ROUTE_CACHE", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# this jax build ignores both env knobs above when a site hook (the axon
# plugin's sitecustomize) pins the platform; the config calls are what
# actually take effect (must happen before the backend initializes)
try:
    import jax

    if not os.environ.get("TPUDRACO_TEST_TPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # persistent compile cache: the suite is compile-heavy (x64 UV chain,
    # shard_map oracles); warm runs skip all of it
    _cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
