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
    # torch pads the stride-2 3x3 conv (1,1) symmetrically, which samples
    # window centers 0,2,4,... — Flax SAME pads (0,1) and samples 1,3,5,...
    # ref_pad=True reproduces the torch grid (required for ported weights);
    # False keeps the legacy SAME behavior of the round-3 trained encoder.
    ref_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = ((1, 1), (1, 1)) if self.ref_pad else "SAME"
        conv = nn.Conv(13, (3, 3), strides=(2, 2), padding=pad)(x)
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
    # reference-exact conv details (``model/enet.py:303-322``): asym order
    # (1,5) no-bias then (5,1) with bias, and the regular 3x3 main conv
    # carries a bias.  The round-3 env-trained encoder used (5,1)+(1,5)
    # bias-free; keep that loadable via ref_exact=False.
    ref_exact: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.out_channels // self.projection_ratio
        identity = x
        stride = (2, 2) if self.downsample else (1, 1)

        # torch pads the 2x2 stride-2 downsample conv (0,0) — VALID; for the
        # 1x1 projection VALID == SAME
        h = nn.Conv(mid, (2, 2) if self.downsample else (1, 1), strides=stride,
                    padding="VALID", use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3)(h)
        h = PReLU()(h)
        if self.asymmetric and self.ref_exact:
            h = nn.Conv(mid, (1, 5), use_bias=False)(h)
            h = nn.Conv(mid, (5, 1))(h)
        elif self.asymmetric:
            h = nn.Conv(mid, (5, 1), use_bias=False)(h)
            h = nn.Conv(mid, (1, 5), use_bias=False)(h)
        else:
            h = nn.Conv(mid, (3, 3), kernel_dilation=(self.dilation, self.dilation),
                        use_bias=self.ref_exact)(h)
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
    """(B, H, W, 3) -> (B, H/8, W/8, 128).

    ``full=True`` is the reference-exact 22-bottleneck encoder layout
    (``model/enet.py:130-589`` minus the final classifier — what
    ``create_enet_for_3d`` keeps as fixed+trainable): stage1 down + 4 at
    64ch, then TWO repeats of [reg, dil2, asym5, dil4, reg, dil8, asym5,
    dil16] at 128ch after the stage2 downsample.  scannetv2_enet.pth
    weights drop into this layout via scripts/port_enet_weights.py.

    ``full=False`` (default) is the lighter env-trained variant used by
    the round-3 rendered-frame training (outputs/enet/enet_weights.pkl):
    one repeat of [reg, dil2, asym, dil4] twice with the legacy asym
    order — kept so existing artifacts stay loadable.
    """

    full: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = InitialBlock(ref_pad=self.full)(x, train)      # 1/2, 16
        fe = self.full
        h = Bottleneck(64, downsample=True, dropout=0.01, ref_exact=fe)(h, train)  # 1/4
        for _ in range(4):
            h = Bottleneck(64, dropout=0.01, ref_exact=fe)(h, train)
        h = Bottleneck(128, downsample=True, ref_exact=fe)(h, train)  # 1/8
        if self.full:
            for _ in range(2):
                for dil in (1, 2, -1, 4, 1, 8, -1, 16):
                    h = Bottleneck(128, dilation=max(dil, 1),
                                   asymmetric=dil < 0, ref_exact=True)(h, train)
        else:
            for _ in range(2):
                h = Bottleneck(128)(h, train)
                h = Bottleneck(128, dilation=2)(h, train)
                h = Bottleneck(128, asymmetric=True)(h, train)
                h = Bottleneck(128, dilation=4)(h, train)
        return h
