"""ENet 2D encoder (parity: ``model/enet.py`` / ``create_enet_for_3d``).

The reference uses a torch7-converted pretrained ENet and takes the
encoder's 128-channel feature map at 1/8 resolution as frozen multiview
features (``compute_multiview_features.py``).  This is a clean Flax ENet
encoder with the same stage layout (initial block, 5 down-bottlenecks at
1/4 with 64ch, 1 down + 8 mixed bottlenecks at 1/8 with 128ch) producing
(H/8, W/8, 128) maps.  Weights can be ported from the reference checkpoint
offline; untrained it still defines the capability surface and shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


class InitialBlock(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        conv = nn.Conv(13, (3, 3), strides=(2, 2))(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = jnp.concatenate([conv, pool], -1)  # 13 + 3 = 16
        out = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(out)
        return PReLU()(out)


class Bottleneck(nn.Module):
    out_channels: int
    downsample: bool = False
    dilation: int = 1
    asymmetric: bool = False
    projection_ratio: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.out_channels // self.projection_ratio
        identity = x
        stride = (2, 2) if self.downsample else (1, 1)

        h = nn.Conv(mid, (2, 2) if self.downsample else (1, 1), strides=stride,
                    use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
        h = PReLU()(h)
        if self.asymmetric:
            h = nn.Conv(mid, (5, 1), use_bias=False)(h)
            h = nn.Conv(mid, (1, 5), use_bias=False)(h)
        else:
            h = nn.Conv(mid, (3, 3), kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
        h = PReLU()(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if self.downsample:
            identity = nn.max_pool(identity, (2, 2), strides=(2, 2))
        if identity.shape[-1] != self.out_channels:
            pad = self.out_channels - identity.shape[-1]
            identity = jnp.pad(identity, ((0, 0),) * (identity.ndim - 1) + ((0, pad),))
        return PReLU()(h + identity)


class ENetEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/8, W/8, 128)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = InitialBlock()(x, train)                       # 1/2, 16
        h = Bottleneck(64, downsample=True, dropout=0.01)(h, train)  # 1/4
        for _ in range(4):
            h = Bottleneck(64, dropout=0.01)(h, train)
        h = Bottleneck(128, downsample=True)(h, train)     # 1/8
        for _ in range(2):
            h = Bottleneck(128)(h, train)
            h = Bottleneck(128, dilation=2)(h, train)
            h = Bottleneck(128, asymmetric=True)(h, train)
            h = Bottleneck(128, dilation=4)(h, train)
        return h
