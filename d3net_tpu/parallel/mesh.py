"""Device mesh + sharding utilities (the distributed runtime).

The reference's entire distributed story is single-node data-parallel DDP
over NCCL (``scripts/train.py:264-280``, SURVEY §2.3).  The TPU-native
equivalent is one ``jax.sharding.Mesh`` with a ``dp`` axis: batches are
sharded on their leading axis, parameters are replicated, and XLA/GSPMD
inserts the gradient all-reduces (over ICI) and global metric means
automatically — there is no hand-written collective anywhere.

Multi-host falls out of the same program via ``jax.distributed.initialize``
plus per-host input sharding: call :func:`init_multihost` before any other
jax API, build the mesh over ``jax.devices()`` (global), and feed each
host's local batch shard through :func:`shard_host_batch`.  See
``docs/multihost.md`` for the launch recipe.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> dict:
    """Join a multi-host TPU pod slice (no-op when single-process).

    On Cloud TPU pods the three arguments auto-populate from the metadata
    server, so ``init_multihost()`` with no args is the common call; on
    other clusters pass them explicitly or via the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``).
    Must run before any other jax API touches the backend.

    Returns a summary dict (process index/count, local/global device counts).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address or (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_mesh(devices: Optional[Sequence] = None, axis: str = "dp",
              batch_size: Optional[int] = None) -> Mesh:
    """Data-parallel mesh over the available devices.

    When ``batch_size`` is given, the mesh is clamped to the largest
    device count that divides it (leading-axis sharding requires the
    global batch to split evenly); a batch of 2 on an 8-device host
    trains on 2 devices rather than failing to shard.
    """
    devs = list(devices if devices is not None else jax.devices())
    if batch_size is not None:
        n = len(devs)
        while n > 1 and batch_size % n:
            n -= 1
        devs = devs[:n]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """device_put a pytree with leading-axis sharding over the dp mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_host_batch(local_batch: Any, mesh: Mesh, axis: str = "dp") -> Any:
    """Assemble a global sharded batch from each host's LOCAL shard.

    Single-process this is exactly :func:`shard_batch`.  Multi-host, every
    process passes only its slice of the global batch (global_batch_size /
    process_count rows) and the result is a global jax.Array backed by each
    host's local devices — the pattern
    ``jax.make_array_from_process_local_data`` implements.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )
