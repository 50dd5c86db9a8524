"""Sparse U-Net building blocks (Flax), mirroring the reference topology.

Parity targets: ``model/common.py`` in daveredrum/D3Net — ``ResidualBlock``,
``VGGBlock`` and the recursive ``UBlock`` (encoder stride-2 conv, decoder
transposed conv, skip concat, tail blocks).  Convolution itself is the
gather-matmul op from :mod:`d3net_tpu.ops.sparse_conv`; batch norm is a
masked variant computed over active voxels only (padded rows excluded).

Tensor layout: features (B, M_cap, C) per level; kernel maps per level come
from the host pipeline as a list of dicts (see ``LevelTables``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.ops import block_conv as bc
from d3net_tpu.ops import column_conv as cc
from d3net_tpu.ops import colres_conv as crc
from d3net_tpu.ops.sparse_conv import sparse_conv_t

# Per-level table dict keys (batched, static shapes), gather mode:
#   nbr  (B, M_l, 27)   submanifold table, INVALID = M_l cap
#   mask (B, M_l)       active-voxel mask (float or bool)
#   down (B, M_{l+1}, 8) stride-2 conv table into level l      (absent on last)
#   up   (B, M_l, 8)     transposed-conv table into level l+1  (absent on last)
# Block-dense mode (spec.conv_impl == "block", docs/perf_notes.md) instead:
#   vox2cell (B, M_l)        voxel -> block*512+cell, INVALID = nbcap*512
#   block_nbr (B, NB_l, 27)  block neighbor table, INVALID = NB_l cap
#   mask (B, M_l)            as above
#   block_child (B, NB_{l+1}, 8) / block_parent (B, NB_l) /
#   block_quad (B, NB_l)     stride-2 pair tables (absent on last level)
# Features flow as (B, NB+1, 512, C) block-dense tensors between convs;
# module/param structure is IDENTICAL across modes (weights interchange).
LevelTables = Dict[str, Any]

_batched_conv = jax.vmap(sparse_conv_t, in_axes=(0, 0, 0, None, None))

# batched row-space block convs with custom VJPs (block-dense form is
# transient inside both fwd and bwd — see ops/block_conv.py round-3 header)
_subm_rows_b = jax.vmap(bc.subm_conv_rows, in_axes=(0, None, 0, 0, 0))
_down_rows_b = jax.vmap(bc.down_conv_rows,
                        in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))
_up_rows_b = jax.vmap(bc.up_conv_rows,
                      in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))

# batched row-space z-column convs (ops/column_conv.py, round-4 gather-row
# redesign) — same row-space activation / row-space residual properties
_subm_col_b = jax.vmap(cc.subm_col_rows, in_axes=(0, None, 0, 0, 0, 0, 0))
_down_col_b = jax.vmap(cc.down_col_rows,
                       in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))
_up_col_b = jax.vmap(cc.up_col_rows,
                     in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0))


def block_occ(t: LevelTables):
    """(B, NB+1, 512) occupancy for a block-mode level table."""
    nbcap = t["block_nbr"].shape[1]
    return jax.vmap(bc.block_occupancy, in_axes=(0, 0, None))(
        t["vox2cell"], t["mask"].astype(bool), nbcap
    )


def subm_rows(x, t: LevelTables, w):
    """(B, cap, Cin) rows -> (B, cap, Cout): batched submanifold conv."""
    return _subm_rows_b(x, w, t["vox2cell"], t["mask"], t["block_nbr"])


def down_rows(x, t_f: LevelTables, t_c: LevelTables, w):
    """(B, capf, Cin) fine rows -> (B, capc, Cout) coarse rows."""
    return _down_rows_b(
        x, w, t_f["vox2cell"], t_f["mask"], t_f["block_child"],
        t_f["block_parent"], t_f["block_quad"], t_c["vox2cell"], t_c["mask"]
    )


def up_rows(x, t_f: LevelTables, t_c: LevelTables, w):
    """(B, capc, Cin) coarse rows -> (B, capf, Cout) fine rows."""
    return _up_rows_b(
        x, w, t_c["vox2cell"], t_c["mask"], t_f["block_child"],
        t_f["block_parent"], t_f["block_quad"], t_f["vox2cell"], t_f["mask"]
    )


def subm_cols(x, t: LevelTables, w):
    """(B, cap, Cin) rows -> (B, cap, Cout): batched z-column subm conv."""
    return _subm_col_b(x, w, t["vox2col"], t["mask"], t["col_nbr"],
                       t["col_zm"], t["col_zp"])


def down_cols(x, t_f: LevelTables, t_c: LevelTables, w):
    """(B, capf, Cin) fine rows -> (B, capc, Cout) coarse rows."""
    return _down_col_b(
        x, w, t_f["vox2col"], t_f["mask"], t_f["col_child"],
        t_f["col_parent"], t_f["col_quad"], t_c["vox2col"], t_c["mask"]
    )


def up_cols(x, t_f: LevelTables, t_c: LevelTables, w):
    """(B, capc, Cin) coarse rows -> (B, capf, Cout) fine rows."""
    return _up_col_b(
        x, w, t_c["vox2col"], t_c["mask"], t_f["col_child"],
        t_f["col_parent"], t_f["col_quad"], t_f["vox2col"], t_f["mask"]
    )


def _bn_any(bn: "MaskedBatchNorm", x, mask, train: bool):
    """Apply a MaskedBatchNorm to row (B,M,C) or block (B,NB+1,512,C) feats."""
    if x.ndim == 4:
        b = x.shape[0]
        c = x.shape[-1]
        flat = bn(x.reshape(b, -1, c), mask.reshape(b, -1), train)
        return flat.reshape(x.shape)
    return bn(x, mask, train)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active voxels of a (B, M, C) padded tensor.

    Matches torch BatchNorm1d semantics (eps 1e-4, momentum 0.1 — i.e.
    running = 0.9*running + 0.1*batch) as configured in the reference
    (``model/pointgroup.py:65-66``).  Under pjit with a sharded batch the
    statistics reductions become global automatically — strictly better
    than the reference's per-GPU unsynced BN.

    Column-resident mode (round 5): a 2-D input ``x (N1, 8C)`` with cell
    mask ``(N1, 8)`` computes the same per-channel statistics over occupied
    z-cells WITHOUT relayouting to (N1, 8, C) — channel sums fold an (8C,)
    lane reduction, and the affine applies via lane-tiled vectors.  Params
    and running stats stay (C,): checkpoints interchange with every other
    conv impl.
    """

    eps: float = 1e-4
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cols_mode = x.ndim == 2
        ncell = mask.shape[-1] if cols_mode else 1
        c = x.shape[-1] // ncell if cols_mode else x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if cols_mode:
            # m lanes: z-major [z0*C | z1*C | ...] matching the col layout
            m = jnp.repeat(mask.astype(x.dtype), c, axis=-1)   # (N1, 8C)
            if train:
                count = jnp.maximum(
                    mask.astype(jnp.float32).sum(), 1.0)
                xf = x.astype(jnp.float32) * m
                mean = xf.sum(axis=0).reshape(ncell, c).sum(0) / count
                mean_t = jnp.tile(mean, ncell)
                d = (x.astype(jnp.float32) - mean_t) * m
                var = (d * d).sum(axis=0).reshape(ncell, c).sum(0) / count
                if not self.is_initializing():
                    ra_mean.value = (1 - self.momentum) * ra_mean.value \
                        + self.momentum * mean
                    ra_var.value = (1 - self.momentum) * ra_var.value \
                        + self.momentum * var
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.eps) * scale
            out = (x.astype(jnp.float32) - jnp.tile(mean, ncell)) \
                * jnp.tile(inv, ncell) + jnp.tile(bias, ncell)
            return out.astype(x.dtype) * m

        m = mask.astype(x.dtype)[..., None]  # (B, M, 1)
        if train:
            count = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(axis=(0, 1)) / count
            var = (((xf - mean) ** 2) * m).sum(axis=(0, 1)) / count
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return (out.astype(x.dtype)) * m


class SubmConv(nn.Module):
    """Stride-1 sparse conv over a neighbor table (kernel folded into fan-in).

    ``nbr_t``/``flip_t`` route the backward through the transpose gather
    table (see ops.sparse_conv.sparse_conv_t); submanifold convs are
    self-transpose under kernel mirroring, so callers may omit them.
    """

    out_channels: int
    kernel_volume: int = 27

    @nn.compact
    def __call__(self, feats, nbr, nbr_t=None, flip_t: bool = True):
        # column-resident flat mode carries z-folded lanes (8C); the kernel
        # param keeps the per-voxel channel shape so checkpoints interchange
        colres = (isinstance(nbr, dict) and "zm" in nbr) or (
            isinstance(nbr, tuple) and isinstance(nbr[0], dict)
            and "zm" in nbr[0])
        cin = feats.shape[-1] // crc.COL if colres else feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_in", "normal"),
            (self.kernel_volume, cin, self.out_channels),
        )
        if isinstance(nbr, dict):
            t = nbr
            if "zm" in t:
                if self.kernel_volume == 1:
                    out = crc.proj_cc(feats, w[0])
                    occ = crc.occ_lanes(t, self.out_channels, out.dtype)
                    return out * occ
                assert self.kernel_volume == 27
                return crc.subm_cc(feats, w, t["nbr"], t["zm"], t["zp"],
                                   t["occ"])
            # block/column mode, row-space in/out; the block custom-VJP op
            # handles wide input channels (134-dim input conv) by chunking
            if self.kernel_volume == 1:
                out = jnp.einsum(
                    "bmc,cd->bmd", feats, w[0].astype(feats.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(feats.dtype)
                return out * t["mask"].astype(out.dtype)[..., None]
            assert self.kernel_volume == 27
            if "col_nbr" in t:
                return subm_cols(feats, t, w)
            return subm_rows(feats, t, w)
        if isinstance(nbr, tuple) and isinstance(nbr[0], dict):
            # block/column mode stride-2 pair: (t_fine, t_coarse, "down"|"up")
            t_f, t_c, direction = nbr
            assert self.kernel_volume == 8
            if "zm" in t_f:
                if direction == "down":
                    return crc.down_cc(feats, w, t_f["child"], t_f["parent"],
                                       t_f["quad"])
                return crc.up_cc(feats, w, t_f["child"], t_f["parent"],
                                 t_f["quad"])
            if "col_nbr" in t_f:
                if direction == "down":
                    return down_cols(feats, t_f, t_c, w)
                return up_cols(feats, t_f, t_c, w)
            if direction == "down":
                return down_rows(feats, t_f, t_c, w)
            return up_rows(feats, t_f, t_c, w)
        if nbr_t is None:
            nbr_t = nbr
        return _batched_conv(feats, nbr, nbr_t, w, flip_t)


class ResidualBlock(nn.Module):
    """(BN-ReLU-conv3)x2 + identity / 1x1 projection (pre-activation)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, nbr, mask, train: bool):
        # block mode (nbr is a level-table dict): x is ROW-space (B, cap, C)
        # end to end — BN/relu run on rows (17x smaller than block-dense)
        # and each conv is a rows->rows custom-VJP op, so the only saved
        # activations anywhere are row-sized (docs/perf_notes.md, round 3)
        identity = x
        h = _bn_any(MaskedBatchNorm(), x, mask, train)
        h = nn.relu(h)
        h = SubmConv(self.out_channels)(h, nbr)
        h = _bn_any(MaskedBatchNorm(), h, mask, train)
        h = nn.relu(h)
        h = SubmConv(self.out_channels)(h, nbr)
        # column-resident feats carry z-folded lanes (8C): compare true C
        colres = isinstance(nbr, dict) and "zm" in nbr
        cin_id = identity.shape[-1] // 8 if colres else identity.shape[-1]
        if cin_id != self.out_channels:
            identity = SubmConv(self.out_channels, kernel_volume=1)(
                identity,
                nbr if isinstance(nbr, dict) else nbr[..., 13:14],
            )
        return h + identity


class VGGBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, nbr, mask, train: bool):
        h = _bn_any(MaskedBatchNorm(), x, mask, train)
        h = nn.relu(h)
        return SubmConv(self.out_channels)(h, nbr)


class UBlock(nn.Module):
    """Recursive sparse U-Net level (parity: ``model/common.py:73-118``).

    ``planes[i]`` channels at level i; ``tables[i]`` the level's kernel maps.
    """

    planes: Sequence[int]
    block_reps: int = 2
    residual: bool = True
    remat: bool = True

    @nn.compact
    def __call__(self, x, tables: List[LevelTables], train: bool):
        t0 = tables[0]
        colres = "zm" in t0
        bm = "block_nbr" in t0 or "col_nbr" in t0 or colres
        block = ResidualBlock if self.residual else VGGBlock
        if self.remat and not bm:
            # gather mode: TPU activations with small channel dims pad 2-8x
            # in HBM (lane tiling); storing every block activation for
            # backward OOMs at 10^5 voxels. Recompute blocks in the backward.
            # Block mode needs no remat: its custom-VJP convs save only
            # row-space residuals, which fit easily.
            block = nn.remat(block, static_argnums=(4,))
        nbr0 = t0 if bm else t0["nbr"]
        mask0 = t0["occ"] if colres else t0["mask"]
        # explicit names: param paths stay identical whether or not the
        # block class is remat-wrapped (remat renames the class, and the two
        # conv modes differ in remat use — checkpoints must interchange)
        for r in range(self.block_reps):
            x = block(self.planes[0], name=f"blk{r}")(x, nbr0, mask0, train)

        if len(self.planes) > 1:
            t1 = tables[1]
            mask1 = t1["occ"] if colres else t1["mask"]
            identity = x
            h = _bn_any(MaskedBatchNorm(), x, mask0, train)
            h = nn.relu(h)
            if bm:
                h = SubmConv(self.planes[1], kernel_volume=8)(
                    h, (t0, t1, "down")
                )
            else:
                h = SubmConv(self.planes[1], kernel_volume=8)(
                    h, t0["down"], t0["up"], False
                )
            h = UBlock(self.planes[1:], self.block_reps, self.residual,
                       self.remat)(h, tables[1:], train)
            h = _bn_any(MaskedBatchNorm(), h, mask1, train)
            h = nn.relu(h)
            if bm:
                h = SubmConv(self.planes[0], kernel_volume=8)(
                    h, (t0, t1, "up")
                )
            else:
                h = SubmConv(self.planes[0], kernel_volume=8)(
                    h, t0["up"], t0["down"], False
                )
            if colres:
                x = crc.concat_cc(identity, h)
            else:
                x = jnp.concatenate([identity, h], axis=-1)
            for i in range(self.block_reps):
                x = block(self.planes[0], name=f"tail{i}")(x, nbr0, mask0,
                                                           train)
        return x
