import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs multichip).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS from the environment; the config update below is the only
# reliable way to pin tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls so numpy oracles match bit-tight
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the heavyweight suites (joint RL, detector
# e2e, conv oracles) are compile-bound — warm reruns skip those minutes.
_cache = os.environ.get(
    "D3NET_TEST_JAX_CACHE", os.path.expanduser("~/.cache/jax_d3net_tests")
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
