"""Dense per-cluster ScoreNet (TPU-native redesign).

The reference re-voxelizes every proposal into a sparse grid of fullscale 14
and runs a small sparse U-Net over it (``model/pointgroup.py:125-178`` +
``score_net``).  At 14^3 = 2744 cells a cluster grid is tiny — on TPU the
right design is a **dense** 3D U-Net over (P, 14, 14, 14, C) batched grids:
every conv is a large MXU-tiled dense conv, no tables, no gathers.
Submanifold semantics are preserved by masking activations to the occupancy
pattern after every block (so features never dilate into empty cells,
matching sparse-conv behavior).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.blocks import MaskedBatchNorm


def _masked_bn(x, occ, train):
    """BN over occupied cells of (P, G, G, G, C)."""
    p = x.shape[0]
    c = x.shape[-1]
    flat = x.reshape(p, -1, c)
    m = occ.reshape(p, -1)
    out = MaskedBatchNorm()(flat, m, train)
    return out.reshape(x.shape)


class DenseResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, occ, train: bool):
        identity = x
        h = _masked_bn(x, occ, train)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), use_bias=False)(h)
        h = h * occ[..., None]
        h = _masked_bn(h, occ, train)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), use_bias=False)(h)
        h = h * occ[..., None]
        if identity.shape[-1] != self.out_channels:
            identity = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False)(identity)
            identity = identity * occ[..., None]
        return h + identity


class DenseUNet(nn.Module):
    """Two-level dense U-Net mirroring the reference ``cluster_blocks=[1,2]``."""

    planes: Sequence[int]
    block_reps: int = 2

    @nn.compact
    def __call__(self, x, occ, train: bool):
        for _ in range(self.block_reps):
            x = DenseResBlock(self.planes[0])(x, occ, train)
        if len(self.planes) > 1:
            identity = x
            # occupancy at the coarse level: any fine cell occupied
            occ2 = nn.max_pool(
                occ[..., None], (2, 2, 2), strides=(2, 2, 2)
            )[..., 0]
            h = _masked_bn(x, occ, train)
            h = nn.relu(h)
            h = nn.Conv(self.planes[1], (2, 2, 2), strides=(2, 2, 2), use_bias=False)(h)
            h = h * occ2[..., None]
            h = DenseUNet(self.planes[1:], self.block_reps)(h, occ2, train)
            h = _masked_bn(h, occ2, train)
            h = nn.relu(h)
            h = nn.ConvTranspose(
                self.planes[0], (2, 2, 2), strides=(2, 2, 2), use_bias=False
            )(h)
            h = h * occ[..., None]
            x = jnp.concatenate([identity, h], axis=-1)
            for _ in range(self.block_reps):
                x = DenseResBlock(self.planes[0])(x, occ, train)
        return x


class ScoreNet(nn.Module):
    """Cluster grids -> per-cluster scores + pooled features.

    Parity: ``score_net`` U-Net + ``roipool`` segment-max + ``score_linear``
    in the reference; the roipool is a masked max over occupied cells (equal
    to the reference's per-point max since every occupied cell holds >= 1
    point and per-point feats are gathered from their cell).
    """

    planes: Sequence[int]
    block_reps: int = 2

    @nn.compact
    def __call__(self, grids, occ, train: bool):
        """grids: (P, G, G, G, C); occ: (P, G, G, G) in {0,1}.

        Returns (scores (P,), pooled_feats (P, planes[0])).
        """
        h = DenseUNet(self.planes, self.block_reps)(grids, occ, train)
        h = _masked_bn(h, occ, train)
        h = nn.relu(h)
        p, c = h.shape[0], h.shape[-1]
        flat = h.reshape(p, -1, c)
        m = occ.reshape(p, -1, 1)
        pooled = jnp.max(jnp.where(m > 0, flat, -jnp.inf), axis=1)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        scores = nn.Dense(1)(pooled)[:, 0]
        return scores, pooled
