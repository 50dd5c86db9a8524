"""Device mesh + sharding utilities (the distributed runtime).

The reference's entire distributed story is single-node data-parallel DDP
over NCCL (``scripts/train.py:264-280``, SURVEY §2.3).  The TPU-native
equivalent is one ``jax.sharding.Mesh`` with a ``dp`` axis: batches are
sharded on their leading axis, parameters are replicated, and XLA/GSPMD
inserts the gradient all-reduces (over ICI) and global metric means
automatically — there is no hand-written collective anywhere.

Multi-host falls out of the same program via ``jax.distributed.initialize``
plus per-host input sharding; nothing else changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "dp") -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


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
