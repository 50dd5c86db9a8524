"""Nearest-neighbor (chamfer-style) assignment between two point sets.

Parity target: ``lib/utils/nn_distance.py:nn_distance`` in the reference —
used for proposal→GT object assignment (l1 distance) and VoteNet-style loss
bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp


def nn_distance(pc1, pc2, l1: bool = False, mask2=None, big: float = 1e9):
    """For each point in pc1 find the nearest point in pc2 and vice versa.

    Args:
        pc1: (B, N, C)
        pc2: (B, M, C)
        l1: if True use sum-|diff| distance, else squared-l2 (matches the
            reference's ``l1smooth=False`` default path).
        mask2: optional (B, M) validity mask for pc2 entries; invalid entries
            get distance ``big`` so they are never selected.

    Returns:
        (dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M))
    """
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]  # (B, N, M, C)
    if l1:
        dist = jnp.abs(diff).sum(-1)
    else:
        dist = (diff**2).sum(-1)
    if mask2 is not None:
        dist = jnp.where(mask2[:, None, :], dist, big)
    idx1 = jnp.argmin(dist, axis=2)
    dist1 = jnp.min(dist, axis=2)
    idx2 = jnp.argmin(dist, axis=1)
    dist2 = jnp.min(dist, axis=1)
    return dist1, idx1, dist2, idx2
