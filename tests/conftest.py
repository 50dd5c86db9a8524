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
