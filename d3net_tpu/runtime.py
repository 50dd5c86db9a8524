"""Runtime knobs: persistent compilation cache + matmul precision policy."""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None, matmul_precision: str | None = None):
    """Call before first jax use in entry points (train/eval/bench).

    The axon TPU backend compiles remotely; large pipeline HLOs take
    minutes — the persistent cache makes warm starts instant.
    """
    import jax

    cache = cache_dir or os.environ.get(
        "D3NET_JAX_CACHE", os.path.expanduser("~/.cache/jax_d3net")
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)
