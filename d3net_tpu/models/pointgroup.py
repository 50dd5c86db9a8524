"""PointGroup instance-segmentation detector, TPU-native.

Parity target: ``model/pointgroup.py`` in daveredrum/D3Net — sparse U-Net
backbone, semantic + offset heads, dual (original / offset-shifted)
clustering, per-cluster re-voxelization + ScoreNet, proposal thresholding
and batched (B, max_num_proposal, ·) outputs.

TPU-first redesign decisions (vs the reference):
- Clustering runs **on device at voxel level** (points of one 2cm voxel
  share sem/offset predictions by construction), removing the reference's
  GPU->CPU BFS round-trip (``model/pointgroup.py:294-305``); cluster/point
  statistics still use true point counts via per-voxel multiplicities.
- Cluster re-voxelization builds **dense** (P, 14^3) grids and the ScoreNet
  is a dense masked 3D U-Net (see :mod:`d3net_tpu.models.scorenet`).
- Proposal slots are fixed: ``clusters_per_pass`` per clustering pass,
  truncated to ``max_num_proposal`` by objectness (the reference truncates
  in arbitrary BFS order — score-ranked truncation is strictly better).
- Proposal semantic class is the majority vote over member points (the
  reference takes the first member's class).

Everything is static-shape; batch items are vmapped per-scene.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3net_tpu.models.blocks import MaskedBatchNorm, SubmConv, UBlock
from d3net_tpu.models.scorenet import ScoreNet
from d3net_tpu.ops.cluster import (
    compact_clusters,
    grid_cluster,
    grid_cluster_batched,
)
from d3net_tpu.ops import segment as seg
from d3net_tpu.utils.bbox import box_corners
from d3net_tpu.utils.nn_distance import nn_distance


def voxelize_feats(point_feats, p2v, num_voxels_cap: int, point_mask):
    """Scatter-mean point feats into voxels (voxelization_fp, mode 4)."""
    return seg.segment_mean(point_feats, p2v, num_voxels_cap, mask=point_mask)


_voxelize_feats_b = jax.vmap(voxelize_feats, in_axes=(0, 0, None, 0))


class PointGroup(nn.Module):
    """Detector. Config fields mirror conf/pointgroup.yaml names."""

    # model
    m: int = 16
    classes: int = 20
    blocks: Sequence[int] = (1, 2, 3, 4, 5, 6, 7)
    cluster_blocks: Sequence[int] = (1, 2)
    block_reps: int = 2
    block_residual: bool = True
    use_coords: bool = True
    max_num_proposal: int = 128
    # clustering
    cluster_radius: float = 0.03
    cluster_cell_size: float = 0.015
    cluster_ring: int = 2
    cluster_npoint_thre: int = 50
    cluster_prop_iters: int = 8
    clusters_per_pass: int = 128
    # scorenet
    score_fullscale: int = 14
    score_scale: float = 50.0
    # proposal thresholds (test.TEST_* in the reference config)
    test_score_thresh: float = 0.09
    test_npoint_thresh: int = 100
    # GT-proposal modes 4-6: clusters come from GT instance masks
    # (ref requires_gt_mask / _generate_gt_clusters, pipeline.py:320-323)
    requires_gt_mask: bool = False
    # activation dtype for the backbone + ScoreNet compute path
    # ("bfloat16" halves activation HBM — the lever that fits the flagship
    # 7-level/131k backward in 16GB).  Params, BN statistics, heads, losses
    # and all geometry stay float32; matmuls accumulate in float32 on the
    # MXU regardless (preferred_element_type).
    compute_dtype: Optional[str] = None
    # optional VoteNet-style bbox regression head (ref pred_bbox path,
    # model/pointgroup.py:94-106 + decode_bbox_prediction :181-214; the
    # reference ships it disabled — crop_bbox is the production path)
    pred_bbox: bool = False
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_bbox_class: int = 18

    def setup(self):
        planes = tuple(self.m * c for c in self.blocks)
        self.input_conv = SubmConv(self.m)
        self.unet = UBlock(planes, self.block_reps, self.block_residual)
        self.out_bn = MaskedBatchNorm()
        self.sem_seg = nn.Dense(self.classes)
        self.offset_fc1 = nn.Dense(self.m)
        self.offset_bn = MaskedBatchNorm()
        self.offset_fc2 = nn.Dense(3)
        score_planes = tuple(self.m * c for c in self.cluster_blocks)
        self.score_net = ScoreNet(score_planes, self.block_reps)
        if self.pred_bbox:
            self.bbox_fc1 = nn.Dense(self.m, use_bias=False)
            self.bbox_bn1 = MaskedBatchNorm()
            self.bbox_fc2 = nn.Dense(self.m, use_bias=False)
            self.bbox_bn2 = MaskedBatchNorm()
            out_dim = (3 + self.num_heading_bin * 2
                       + self.num_size_cluster * 4 + self.num_bbox_class)
            self.bbox_out = nn.Dense(out_dim)

    # ------------------------------------------------------------------
    def backbone(self, voxel_feats, tables, train: bool):
        t0 = tables[0]
        # the input features are data (no params upstream): stop_gradient
        # lets XLA DCE the input conv's dx branch in the backward — at
        # flagship width (134 channels) that transient alone is gigabytes
        voxel_feats = jax.lax.stop_gradient(voxel_feats)
        if "col2vox" in t0:
            # column-resident flat path (round 5, conv_impl: colres):
            # ONE rows->cols at the input, ONE cols->rows before the heads;
            # every level stays in flat (B*(ccap+1), 8C) column space
            from d3net_tpu.ops import colres_conv as crc

            caps = [t["mask"].shape[1] for t in tables]
            ccaps = [t["col_zm"].shape[1] for t in tables]
            fls = [
                crc.flatten_level(
                    t, caps[li],
                    ccaps[li + 1] if li + 1 < len(tables) else None,
                )
                for li, t in enumerate(tables)
            ]
            cols = crc.rows_to_cols_flat(voxel_feats, fls[0])
            cols = self.input_conv(cols, fls[0])
            cols = self.unet(cols, fls, train)
            h = crc.cols_to_rows_flat(cols, fls[0])
        elif "block_nbr" in t0 or "col_nbr" in t0:  # block/column conv paths
            # activations stay ROW-space end to end; blocks/conv3d form
            # exists only transiently inside each conv's fwd and custom-VJP
            # bwd (channel-chunked for the wide input conv)
            h = self.input_conv(voxel_feats, t0)
            h = self.unet(h, tables, train)
        else:
            h = self.input_conv(voxel_feats, t0["nbr"])
            h = self.unet(h, tables, train)
        h = self.out_bn(h, t0["mask"], train)
        return nn.relu(h)

    def heads(self, vfeats, vmask, train: bool):
        sem_scores = self.sem_seg(vfeats)
        h = self.offset_fc1(vfeats)
        h = self.offset_bn(h, vmask, train)
        h = nn.relu(h)
        offsets = self.offset_fc2(h)
        return sem_scores, offsets

    # ------------------------------------------------------------------
    def _cluster_batch(self, vxyz2, vsem, vvalid, vweight):
        """Dual-pass clustering at voxel level -> per-voxel member slots.

        Args: vxyz2 (B, 2, M, 3) original+shifted coords; vsem/vvalid/
        vweight (B, M).  Returns member (B, 2, M) int32 slots in
        [0, 2*clusters_per_pass) or -1, plus (B, 2P) slot mask and counts.

        Both passes (original + offset-shifted coords) AND all scenes run
        as ONE grid_cluster_batched invocation with the pass bit folded
        into the label key: two invocations in one scanned program
        kernel-fault the axon TPU worker (docs/tpu_scan_fault.md), and the
        flat batch avoids the 3x batched-gather tax on the propagation
        loop (447 ms of the r5 flagship forward, docs/perf_notes.md).

        Grouping is non-differentiable (the reference runs CPU BFS): without
        the stop_gradients, autodiff saves the sort permutations and banded
        masks as residuals — gigabytes of HBM.
        """
        vxyz2 = jax.lax.stop_gradient(vxyz2)
        vweight = jax.lax.stop_gradient(vweight)
        b, _, m, _ = vxyz2.shape
        coords2 = jnp.concatenate([vxyz2[:, 0], vxyz2[:, 1]], axis=1)
        sem2 = jnp.concatenate([vsem, vsem + 32], axis=1)       # pass bit
        valid2 = jnp.concatenate([vvalid, vvalid], axis=1)
        root2 = grid_cluster_batched(
            coords2, sem2, valid2,
            cell_size=self.cluster_cell_size,
            num_iters=self.cluster_prop_iters,
            radius=self.cluster_radius,
        )                                                       # (B, 2M)

        def per_scene(root2_1, vweight_1, vvalid_1):
            # components never span halves (pass bit) -> split + rebase
            roots = (root2_1[:m],
                     jnp.where(root2_1[m:] >= 0, root2_1[m:] - m, -1))
            members, masks, npts = [], [], []
            for root in roots:
                member, cmask, cnp = compact_clusters(
                    root,
                    vweight_1,
                    vvalid_1,
                    max_clusters=self.clusters_per_pass,
                    min_points=float(self.cluster_npoint_thre),
                )
                members.append(member)
                masks.append(cmask)
                npts.append(cnp)
            member = jnp.stack([
                members[0],
                jnp.where(members[1] >= 0,
                          members[1] + self.clusters_per_pass, -1),
            ])
            return member, jnp.concatenate(masks), jnp.concatenate(npts)

        return jax.vmap(per_scene)(root2, vweight, vvalid)

    def _cluster_stats(self, member_pt, point_xyz, point_mask):
        """Per-cluster mean/min/max/center/size over true member points.

        member_pt: (2, N) slots; point_xyz (N, 3); -> dict of (P, ...) arrays.
        Coordinates are processed separately: (2N, 3) temps pad their 3-wide
        lane dim 42.7x on TPU.
        """
        p_total = 2 * self.clusters_per_pass
        flat_m = member_pt.reshape(-1)
        ok = (flat_m >= 0) & jnp.concatenate([point_mask, point_mask])
        ids = jnp.where(ok, flat_m, p_total)
        means, mns, mxs = [], [], []
        for a in range(3):
            c = jnp.concatenate([point_xyz[:, a], point_xyz[:, a]])
            means.append(seg.segment_mean(c, ids, p_total))
            mns.append(seg.segment_min(c, ids, p_total))
            mxs.append(seg.segment_max(c, ids, p_total))
        mean = jnp.stack(means, -1)
        mn = jnp.stack(mns, -1)
        mx = jnp.stack(mxs, -1)
        npoint = seg.segment_count(ids, p_total, mask=ok)
        center = (mn + mx) * 0.5
        size = jnp.maximum(mx - mn, 0.0)
        return dict(mean=mean, min=mn, max=mx, center=center, size=size, npoint=npoint)

    def _build_grids(self, member_pt, point_xyz, point_feats, point_mask, stats, jitter_u):
        """Scatter member points into per-cluster dense G^3 grids (mode-4 mean).

        Parity: ``clusters_voxelization`` (``model/pointgroup.py:125-178``);
        jitter_u in [0,1)^3 per cluster places the free space (random in
        train, 0.5 fixed at eval).
        """
        g = self.score_fullscale
        p_total = 2 * self.clusters_per_pass
        flat_m = member_pt.reshape(-1)
        ok = (flat_m >= 0) & jnp.concatenate([point_mask, point_mask])
        cid = jnp.where(ok, flat_m, p_total)

        size = stats["size"]
        scale = 1.0 / jnp.maximum(jnp.max(size, axis=-1) / g, 1e-6) - 0.01
        scale = jnp.clip(scale, None, self.score_scale)  # (P,)
        rng_span = jnp.clip(g - size * scale[:, None] - 0.001, 0.0, None)
        offset = -(stats["min"] - stats["mean"]) * scale[:, None] + rng_span * jitter_u

        # per-coordinate to avoid (2N, 3) lane-padded temps
        cid_c = cid.clip(0, p_total - 1)
        sc = scale[cid_c]
        cells = []
        for a in range(3):
            xyz_a = jnp.concatenate([point_xyz[:, a], point_xyz[:, a]])
            rel_a = (xyz_a - stats["mean"][cid_c, a]) * sc + offset[cid_c, a]
            cells.append(jnp.clip(jnp.floor(rel_a).astype(jnp.int32), 0, g - 1))
        lin = ((cid * g + cells[0]) * g + cells[1]) * g + cells[2]
        lin = jnp.where(ok, lin, p_total * g * g * g)

        # mean-accumulate in f32 even under a bf16 compute dtype (cells can
        # hold thousands of points; bf16 running sums lose mantissa)
        feats2 = jnp.concatenate([point_feats, point_feats], axis=0).astype(
            jnp.float32
        )
        grid_feats = seg.segment_mean(feats2, lin, p_total * g * g * g, mask=ok)
        grid_feats = grid_feats.astype(point_feats.dtype)
        occ = seg.segment_count(lin, p_total * g * g * g, mask=ok) > 0
        c = point_feats.shape[-1]
        return (
            grid_feats.reshape(p_total, g, g, g, c),
            occ.reshape(p_total, g, g, g).astype(point_feats.dtype),
        )

    def _proposal_sem(self, member_pt, sem_pred_pt, point_mask):
        """Majority semantic class per cluster slot."""
        p_total = 2 * self.clusters_per_pass
        flat_m = member_pt.reshape(-1)
        ok = (flat_m >= 0) & jnp.concatenate([point_mask, point_mask])
        ids = jnp.where(ok, flat_m, p_total)
        onehot = jax.nn.one_hot(
            jnp.concatenate([sem_pred_pt, sem_pred_pt]), self.classes
        )
        votes = seg.segment_sum(onehot, ids, p_total, mask=ok)
        return jnp.argmax(votes, axis=-1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        batch: Dict[str, Any],
        train: bool = False,
        do_clustering: bool = True,
    ) -> Dict[str, Any]:
        point_xyz = batch["point_xyz"]          # (B, N, 3)
        point_feats = batch["point_feats"]      # (B, N, C)
        point_mask = batch["point_mask"]        # (B, N)
        p2v = batch["p2v"]                      # (B, N), INVALID = M0cap
        tables = batch["tables"]                # list of level dicts
        b, n = point_mask.shape
        m0cap = tables[0]["mask"].shape[1]

        if self.use_coords:
            point_feats = jnp.concatenate([point_feats, point_xyz], axis=-1)

        # --- voxelize + backbone -------------------------------------
        cd = jnp.bfloat16 if self.compute_dtype in ("bfloat16", "bf16") else None
        voxel_feats = _voxelize_feats_b(point_feats, p2v, m0cap, point_mask)
        if cd is not None:
            voxel_feats = voxel_feats.astype(cd)
        vfeats = self.backbone(voxel_feats, tables, train)  # (B, M0, m)
        vmask = tables[0]["mask"]

        sem_scores_v, offsets_v = self.heads(vfeats, vmask, train)
        # gather to points (padded p2v reads zeros)
        gather = jax.vmap(seg.gather_padded)
        sem_scores = gather(sem_scores_v, p2v)              # (B, N, classes)
        pt_offsets = gather(offsets_v, p2v)                 # (B, N, 3)
        pt_feats = gather(vfeats, p2v)                      # (B, N, m)

        out: Dict[str, Any] = {
            "semantic_scores": sem_scores,
            "pt_offsets": pt_offsets,
            "pt_feats": pt_feats,
        }
        if not do_clustering:
            return out

        if self.requires_gt_mask:
            # GT instances as proposals (modes 4-6): pass 0 carries the GT
            # membership, pass 1 is empty
            inst = batch["instance_ids"]
            p_cap = 2 * self.clusters_per_pass
            gt_member = jnp.where(
                point_mask & (inst >= 0) & (inst < p_cap), inst, -1
            ).astype(jnp.int32)
            member_pt = jnp.stack(
                [gt_member, jnp.full_like(gt_member, -1)], axis=1
            )                                               # (B, 2, N)
            counts = jax.vmap(
                lambda mm, pm: seg.segment_count(
                    jnp.where(mm >= 0, mm, p_cap), p_cap, mask=pm & (mm >= 0)
                )
            )(gt_member, point_mask)
            cluster_mask = counts >= float(self.cluster_npoint_thre)
        else:
            # --- clustering (voxel level) -----------------------------
            vxyz = jax.vmap(voxelize_feats, in_axes=(0, 0, None, 0))(
                point_xyz, p2v, m0cap, point_mask
            )
            vweight = jax.vmap(
                lambda ids, mask: seg.segment_count(ids, m0cap, mask=mask)
            )(p2v, point_mask)
            vsem_pred = jnp.argmax(sem_scores_v, axis=-1).astype(jnp.int32)
            vvalid = vmask.astype(bool) & (vsem_pred > 0)
            vshift = vxyz + offsets_v

            member_v, cluster_mask, _ = self._cluster_batch(
                jnp.stack([vxyz, vshift], axis=1), vsem_pred, vvalid, vweight
            )

            # point-level membership
            def to_points(member_1v, p2v_1, pm):
                mp = seg.gather_padded(member_1v[:, None].astype(jnp.int32), p2v_1)[:, 0]
                full = jnp.where(p2v_1 >= m0cap, -1, mp)
                return jnp.where(pm, full, -1)

            member_pt = jax.vmap(
                lambda mv, p2v_1, pm: jnp.stack(
                    [to_points(mv[0], p2v_1, pm), to_points(mv[1], p2v_1, pm)]
                )
            )(member_v, p2v, point_mask)                    # (B, 2, N)
        out["member_pt"] = member_pt
        out["cluster_mask_all"] = cluster_mask              # (B, P)

        stats = jax.vmap(self._cluster_stats)(member_pt, point_xyz, point_mask)
        out["cluster_npoint"] = stats["npoint"]
        out["cluster_center"] = stats["center"]
        out["cluster_size"] = stats["size"]

        # --- scorenet --------------------------------------------------
        p_total = 2 * self.clusters_per_pass
        if train:
            jitter_u = jax.random.uniform(
                self.make_rng("cluster_jitter"), (b, p_total, 3)
            )
        else:
            jitter_u = jnp.full((b, p_total, 3), 0.5)
        grids, occ = jax.vmap(self._build_grids)(
            member_pt, point_xyz, pt_feats, point_mask, stats, jitter_u
        )
        g = self.score_fullscale
        c = pt_feats.shape[-1]
        scores_flat, pooled_flat = self.score_net(
            grids.reshape(b * p_total, g, g, g, c),
            occ.reshape(b * p_total, g, g, g),
            train,
        )
        scores = scores_flat.reshape(b, p_total)
        pooled = pooled_flat.reshape(b, p_total, -1)
        out["proposal_scores_all"] = scores                 # (B, P) logits

        sem_pred_pt = jnp.argmax(sem_scores, axis=-1).astype(jnp.int32)
        cluster_sem = jax.vmap(self._proposal_sem)(member_pt, sem_pred_pt, point_mask)

        # --- proposal selection to max_num_proposal --------------------
        objness = jax.nn.sigmoid(scores)
        valid = (
            cluster_mask
            & (objness > self.test_score_thresh)
            & (stats["npoint"] > self.test_npoint_thresh)
        )
        rank = jnp.where(valid, objness, -1.0)
        _, top_idx = jax.lax.top_k(rank, self.max_num_proposal)  # (B, K)
        if train:
            perm = jax.vmap(jax.random.permutation, in_axes=(0, None))(
                jax.random.split(self.make_rng("proposal_shuffle"), b),
                self.max_num_proposal,
            )
            top_idx = jnp.take_along_axis(top_idx, perm, axis=1)

        take = lambda a: jnp.take_along_axis(
            a, top_idx.reshape(b, -1, *([1] * (a.ndim - 2))), axis=1
        )
        proposal_mask = jnp.take_along_axis(valid, top_idx, axis=1)
        center = take(stats["center"])
        size = take(stats["size"])
        out["proposal_slot"] = top_idx
        out["proposal_batch_mask"] = proposal_mask.astype(jnp.float32)
        out["proposal_feats_batched"] = (
            take(pooled).astype(jnp.float32) * proposal_mask[..., None]
        )
        out["proposal_center_batched"] = center * proposal_mask[..., None]
        out["proposal_size_batched"] = size * proposal_mask[..., None]
        out["proposal_bbox_batched"] = box_corners(center, size) * proposal_mask[
            ..., None, None
        ]
        out["proposal_sem_cls_batched"] = jnp.where(
            proposal_mask, jnp.take_along_axis(cluster_sem, top_idx, axis=1), 0
        )
        out["proposal_scores_batched"] = (
            jnp.take_along_axis(objness, top_idx, axis=1) * proposal_mask
        )

        if self.pred_bbox:
            # VoteNet-parameterized bbox regression on pooled cluster feats
            h = self.bbox_fc1(pooled)
            h = nn.relu(self.bbox_bn1(h, cluster_mask, train))
            h = self.bbox_fc2(h)
            h = nn.relu(self.bbox_bn2(h, cluster_mask, train))
            enc = self.bbox_out(h)                        # (B, P, D)
            nh, ns = self.num_heading_bin, self.num_size_cluster
            out["pred_center"] = stats["center"] + enc[..., :3]
            out["heading_scores"] = enc[..., 3 : 3 + nh]
            out["heading_residuals_normalized"] = enc[..., 3 + nh : 3 + 2 * nh]
            out["heading_residuals"] = (
                out["heading_residuals_normalized"] * (jnp.pi / nh)
            )
            out["size_scores"] = enc[..., 3 + 2 * nh : 3 + 2 * nh + ns]
            out["size_residuals_normalized"] = enc[
                ..., 3 + 2 * nh + ns : 3 + 2 * nh + 4 * ns
            ].reshape(enc.shape[:-1] + (ns, 3))
            out["sem_cls_scores"] = enc[..., 3 + 2 * nh + 4 * ns :]

        # GT object assignment (training/eval bookkeeping)
        if "center_label" in batch:
            _, ind1, _, _ = nn_distance(
                out["proposal_center_batched"],
                batch["center_label"],
                l1=True,
                mask2=batch.get("gt_box_mask"),
            )
            out["object_assignment"] = ind1
        return out
