"""Static-shape batch assembly (the reference's ``sparse_collate_fn`` role).

Host-side: scales/quantizes coords, voxelizes, builds per-level sparse-conv
kernel maps, computes per-point instance supervision, and pads everything to
the configured capacities.  Emits plain numpy dicts ready for device_put;
the device program never sees a dynamic shape.

Parity: ``lib/dataset/pipeline.py:917-995`` (collate + voxelize_idx) and
``_getInstanceInfo`` (``:711-772``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from d3net_tpu.data.synthetic import Scene
from d3net_tpu.ops.voxelize import build_unet_maps, voxelize


@dataclass
class BatchSpec:
    """Static capacities for one batch layout."""

    max_points: int = 250000            # data.max_num_point
    voxel_caps: Sequence[int] = ()      # per U-Net level; len = len(blocks)
    max_instances: int = 128            # data.max_num_instance
    scale: float = 50.0                 # data.scale (1/voxel_size)
    use_color: bool = False
    use_normal: bool = True
    use_multiview: bool = True
    multiview_dim: int = 128
    num_levels: int = 7

    def caps(self) -> List[int]:
        if self.voxel_caps:
            return list(self.voxel_caps)
        # default: halve per level, floor 1024, lane-aligned
        caps, c = [], self.max_points
        for _ in range(self.num_levels):
            caps.append(max(1024, c))
            c = c // 2
        return caps


def scene_features(scene: Scene, spec: BatchSpec) -> np.ndarray:
    feats = []
    if spec.use_color:
        feats.append(scene.rgb)
    if spec.use_normal:
        feats.append(scene.normal)
    if spec.use_multiview:
        mv = scene.multiview
        if mv is None:
            mv = np.zeros((len(scene.xyz), spec.multiview_dim), np.float32)
        feats.append(mv)
    if not feats:
        return np.zeros((len(scene.xyz), 0), np.float32)
    return np.concatenate(feats, axis=1).astype(np.float32)


def instance_info(scene: Scene, max_instances: int):
    """Per-point instance mean xyz + per-instance point counts and boxes."""
    n = len(scene.xyz)
    mean_xyz = np.zeros((n, 3), np.float32)
    num_point = np.zeros(max_instances, np.float32)
    centers = np.zeros((max_instances, 3), np.float32)
    sizes = np.zeros((max_instances, 3), np.float32)
    sem = np.zeros(max_instances, np.int32)
    mask = np.zeros(max_instances, bool)
    inst = scene.instance_ids
    for i in range(min(int(inst.max()) + 1 if len(inst) and inst.max() >= 0 else 0,
                       max_instances)):
        sel = inst == i
        cnt = sel.sum()
        if cnt == 0:
            continue
        pts = scene.xyz[sel]
        mean_xyz[sel] = pts.mean(0)
        num_point[i] = cnt
        mn, mx = pts.min(0), pts.max(0)
        centers[i] = (mn + mx) / 2
        sizes[i] = mx - mn
        sem[i] = scene.sem_labels[sel][0]
        mask[i] = True
    return mean_xyz, num_point, centers, sizes, sem, mask


def build_batch(scenes: List[Scene], spec: BatchSpec) -> Dict[str, np.ndarray]:
    """Assemble a fully padded batch dict from preprocessed scenes.

    Returns numpy arrays; ``tables`` is a list (one per U-Net level) of dicts
    of stacked arrays matching :class:`d3net_tpu.models.blocks.LevelTables`.
    """
    caps = spec.caps()
    np_cap = spec.max_points
    b = len(scenes)

    out: Dict[str, np.ndarray] = {}
    per_level: List[Dict[str, List[np.ndarray]]] = [
        {"nbr": [], "mask": [], "down": [], "up": []} for _ in caps
    ]

    def zeros(shape, dtype=np.float32):
        return np.zeros((b,) + shape, dtype)

    out["point_xyz"] = zeros((np_cap, 3))
    feat_dim = (
        3 * spec.use_color
        + 3 * spec.use_normal
        + spec.multiview_dim * spec.use_multiview
    )
    out["point_feats"] = zeros((np_cap, feat_dim))
    out["point_mask"] = zeros((np_cap,), bool)
    out["p2v"] = np.full((b, np_cap), caps[0], np.int32)
    out["sem_labels"] = np.full((b, np_cap), -1, np.int32)
    out["instance_ids"] = np.full((b, np_cap), -1, np.int32)
    out["instance_mean_xyz"] = zeros((np_cap, 3))
    out["instance_num_point"] = zeros((spec.max_instances,))
    out["center_label"] = zeros((spec.max_instances, 3))
    out["size_label"] = zeros((spec.max_instances, 3))
    out["sem_cls_label"] = zeros((spec.max_instances,), np.int32)
    out["gt_box_mask"] = zeros((spec.max_instances,), bool)

    for s_i, scene in enumerate(scenes):
        n = min(len(scene.xyz), np_cap)
        xyz = scene.xyz[:n]
        # quantize: shift to non-negative, scale, floor (reference scales x50)
        scaled = (xyz - xyz.min(0)) * spec.scale
        coords_int = np.floor(scaled).astype(np.int32)
        vc, p2v, _counts = voxelize(coords_int)
        # truncate voxels beyond cap; orphaned points -> INVALID
        p2v = np.where(p2v >= caps[0], caps[0], p2v).astype(np.int32)
        levels = build_unet_maps(vc, caps)

        out["point_xyz"][s_i, :n] = xyz
        out["point_feats"][s_i, :n] = scene_features(scene, spec)[:n]
        out["point_mask"][s_i, :n] = True
        out["p2v"][s_i, :n] = p2v
        out["sem_labels"][s_i, :n] = scene.sem_labels[:n]
        out["instance_ids"][s_i, :n] = np.where(
            scene.instance_ids[:n] >= spec.max_instances, -1, scene.instance_ids[:n]
        )
        mean_xyz, num_point, centers, sizes, sem, mask = instance_info(
            Scene(
                xyz=xyz,
                rgb=scene.rgb[:n],
                normal=scene.normal[:n],
                multiview=None,
                sem_labels=scene.sem_labels[:n],
                instance_ids=scene.instance_ids[:n],
                instance_bboxes=scene.instance_bboxes,
                scene_id=scene.scene_id,
            ),
            spec.max_instances,
        )
        out["instance_mean_xyz"][s_i, :n] = mean_xyz
        out["instance_num_point"][s_i] = num_point
        out["center_label"][s_i] = centers
        out["size_label"][s_i] = sizes
        out["sem_cls_label"][s_i] = sem
        out["gt_box_mask"][s_i] = mask

        for li, lv in enumerate(levels):
            per_level[li]["nbr"].append(lv.nbr)
            lvl_mask = np.zeros(caps[li], np.float32)
            lvl_mask[: lv.num_voxels] = 1.0
            per_level[li]["mask"].append(lvl_mask)
            if lv.down is not None:
                per_level[li]["down"].append(lv.down)
                per_level[li]["up"].append(lv.up)

    tables = []
    for li in range(len(caps)):
        t = {
            "nbr": np.stack(per_level[li]["nbr"]),
            "mask": np.stack(per_level[li]["mask"]),
        }
        if per_level[li]["down"]:
            t["down"] = np.stack(per_level[li]["down"])
            t["up"] = np.stack(per_level[li]["up"])
        tables.append(t)
    out["tables"] = tables
    return out
