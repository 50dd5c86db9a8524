"""Static-shape batch assembly (the reference's ``sparse_collate_fn`` role).

Host-side: scales/quantizes coords, voxelizes, builds per-level sparse-conv
kernel maps, computes per-point instance supervision, and pads everything to
the configured capacities.  Emits plain numpy dicts ready for device_put;
the device program never sees a dynamic shape.

Parity: ``lib/dataset/pipeline.py:917-995`` (collate + voxelize_idx) and
``_getInstanceInfo`` (``:711-772``).
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from d3net_tpu.data.synthetic import Scene
from d3net_tpu.ops.voxelize import (
    build_block_maps,
    build_column_maps,
    build_unet_maps,
    voxelize,
)


@dataclass
class BatchSpec:
    """Static capacities for one batch layout."""

    max_points: int = 250000            # data.max_num_point
    voxel_caps: Sequence[int] = ()      # per U-Net level; len = len(blocks)
    max_instances: int = 128            # data.max_num_instance
    scale: float = 50.0                 # data.scale (1/voxel_size)
    full_scale: float = 512.0           # data.full_scale[1] (crop window)
    use_color: bool = False
    use_normal: bool = True
    use_multiview: bool = True
    multiview_dim: int = 128
    num_levels: int = 7
    # "gather": per-voxel 27-neighbor tables + gather-matmul conv.
    # "block":  8^3 block-dense tables + conv3d (docs/perf_notes.md).
    # "column": z-folded column tables + banded matmuls — ~4-5x fewer
    #           random gather rows than "gather" with none of "block"'s
    #           block-dense inflation (docs/perf_notes.md round 4).
    conv_impl: str = "gather"
    block_caps: Sequence[int] = ()      # per-level block capacities
    column_caps: Sequence[int] = ()     # per-level column capacities

    def feat_dim(self) -> int:
        return (
            3 * self.use_color
            + 3 * self.use_normal
            + self.multiview_dim * self.use_multiview
        )

    def caps(self) -> List[int]:
        if self.voxel_caps:
            return list(self.voxel_caps)
        # default: halve per level, floor 1024, lane-aligned
        caps, c = [], self.max_points
        for _ in range(self.num_levels):
            caps.append(max(1024, c))
            c = c // 2
        return caps

    def nb_caps(self) -> List[int]:
        if self.block_caps:
            return list(self.block_caps)
        # ScanNet-statistics surfaces run ~30-90 voxels per occupied 8^3
        # block (measured, docs/perf_notes.md); cap//20 leaves >1.5x margin.
        # Rounded so nb_cap+1 is a 512-multiple: the block conv chunks
        # (nb_cap+1)-row tensors in 512-block steps, and an aligned count
        # makes that chunking slice-free (ops/block_conv.py).
        return [-(-(max(64, c // 20) + 1) // 512) * 512 - 1
                for c in self.caps()]

    def col_caps(self) -> List[int]:
        if self.column_caps:
            return list(self.column_caps)
        # ScanNet surfaces put ~1.3-2 voxels in an 8-cell z-column at the
        # fine levels (mostly horizontal supports); deeper levels get
        # z-denser as the grid coarsens, but their caps are small anyway.
        # Round-5 curriculum telemetry measured real scenes dropping
        # phantoms at BOTH cap//2 and 0.625*cap (up to 2.8k at L0 on 65k
        # scenes), so the default is sized to that measurement: 0.75*cap.
        # Every drop is still warned AND counted into CAP_STATS ->
        # metrics.jsonl (cap_level_overflow / cap_dropped_phantoms); set
        # explicit ``column_caps`` in the config to trade the linear
        # gather-time cost of cap rows against telemetry on real data.
        return [max(64, (c * 3) // 4) for c in self.caps()]


class CapStats:
    """Thread-safe counters for silent-truncation telemetry (SURVEY §7
    hard-part #3: a silently-saturating static cap is the failure mode the
    fixed-shape design must surface).  ``build_batch`` increments these;
    train/eval loops snapshot-and-reset per log interval so
    ``metrics.jsonl`` carries them (VERDICT r4 item 8)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.reset()

    def reset(self) -> Dict[str, int]:
        with self._lock:
            snap = dict(getattr(self, "_c", {}))
            self._c = {
                "cap_points_truncated": 0,   # points beyond max_points
                "cap_voxel_overflow": 0,     # voxels past caps[0] (p2v -> pad)
                "cap_level_overflow": 0,     # block/column voxels past caps
                "cap_dropped_phantoms": 0,   # phantom columns past col cap
                "batches": 0,
            }
        return snap

    def add(self, **kw: int) -> None:
        with self._lock:
            for k, v in kw.items():
                self._c[k] = self._c.get(k, 0) + int(v)

    def snapshot(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._c)


CAP_STATS = CapStats()


def scene_features(scene: Scene, spec: BatchSpec) -> np.ndarray:
    out = np.zeros((len(scene.xyz), spec.feat_dim()), np.float32)
    write_scene_features(scene, spec, out, len(scene.xyz))
    return out


def write_scene_features(scene: Scene, spec: BatchSpec, dst: np.ndarray,
                         n: int) -> None:
    """Write the [color|normal|multiview] feature block into ``dst[:n]``.

    Direct per-block slice writes — no intermediate concatenate/astype copy
    (those dominated host collate time at 131k points x 131 dims).
    """
    off = 0
    if spec.use_color:
        dst[:n, off:off + 3] = scene.rgb[:n]
        off += 3
    if spec.use_normal:
        dst[:n, off:off + 3] = scene.normal[:n]
        off += 3
    if spec.use_multiview:
        if scene.multiview is not None:
            dst[:n, off:off + spec.multiview_dim] = scene.multiview[:n]
        off += spec.multiview_dim


def instance_info(xyz: np.ndarray, sem_labels: np.ndarray,
                  instance_ids: np.ndarray, max_instances: int):
    """Per-point instance mean xyz + per-instance point counts and boxes.

    Vectorized via stable sort + ``ufunc.reduceat`` over instance segments
    (same outputs as the per-instance loop in the reference's
    ``_getInstanceInfo``, ``lib/dataset/pipeline.py:711-772``).
    """
    n = len(xyz)
    mean_xyz = np.zeros((n, 3), np.float32)
    num_point = np.zeros(max_instances, np.float32)
    centers = np.zeros((max_instances, 3), np.float32)
    sizes = np.zeros((max_instances, 3), np.float32)
    sem = np.zeros(max_instances, np.int32)
    mask = np.zeros(max_instances, bool)
    valid = (instance_ids >= 0) & (instance_ids < max_instances)
    ids = instance_ids[valid]
    if ids.size:
        order = np.argsort(ids, kind="stable")
        pts_s = xyz[valid][order]
        ids_s = ids[order]
        uniq, starts, counts = np.unique(
            ids_s, return_index=True, return_counts=True
        )
        sums = np.add.reduceat(pts_s, starts, axis=0)
        mins = np.minimum.reduceat(pts_s, starts, axis=0)
        maxs = np.maximum.reduceat(pts_s, starts, axis=0)
        means = (sums / counts[:, None]).astype(np.float32)
        num_point[uniq] = counts
        centers[uniq] = (mins + maxs) / 2
        sizes[uniq] = maxs - mins
        sem[uniq] = sem_labels[valid][order][starts]
        mask[uniq] = True
        means_full = np.zeros((max_instances, 3), np.float32)
        means_full[uniq] = means
        mean_xyz[valid] = means_full[ids]
    return mean_xyz, num_point, centers, sizes, sem, mask


def build_batch(scenes: List[Scene], spec: BatchSpec) -> Dict[str, np.ndarray]:
    """Assemble a fully padded batch dict from preprocessed scenes.

    Returns numpy arrays; ``tables`` is a list (one per U-Net level) of dicts
    of stacked arrays matching :class:`d3net_tpu.models.blocks.LevelTables`.
    """
    caps = spec.caps()
    np_cap = spec.max_points
    b = len(scenes)

    block_mode = spec.conv_impl == "block"
    # "colres" (round 5) shares the column tables and adds the col2vox
    # inverse map + per-cell occupancy for the column-resident conv path
    colres_mode = spec.conv_impl == "colres"
    column_mode = spec.conv_impl == "column" or colres_mode
    nb_caps = spec.nb_caps() if block_mode else []
    c_caps = spec.col_caps() if column_mode else []

    out: Dict[str, np.ndarray] = {}
    if block_mode:
        keys = ["vox2cell", "block_nbr", "mask", "block_child",
                "block_parent", "block_quad"]
    elif column_mode:
        keys = ["vox2col", "col_nbr", "col_zm", "col_zp", "mask",
                "col_child", "col_parent", "col_quad", "col_occ", "col2vox"]
    else:
        keys = ["nbr", "mask", "down", "up"]
    per_level: List[Dict[str, List[np.ndarray]]] = [
        {k: [] for k in keys} for _ in caps
    ]

    def zeros(shape, dtype=np.float32):
        return np.zeros((b,) + shape, dtype)

    out["point_xyz"] = zeros((np_cap, 3))
    out["point_feats"] = zeros((np_cap, spec.feat_dim()))
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
        if len(scene.xyz) > np_cap:
            CAP_STATS.add(cap_points_truncated=len(scene.xyz) - np_cap)
        xyz = scene.xyz[:n]
        # quantize: shift to non-negative, scale, floor (reference scales x50)
        scaled = (xyz - xyz.min(0)) * spec.scale
        coords_int = np.floor(scaled).astype(np.int32)
        vc, p2v, _counts = voxelize(coords_int)
        # truncate voxels beyond cap; orphaned points -> INVALID
        n_over = int((p2v >= caps[0]).sum())
        if n_over:
            CAP_STATS.add(cap_voxel_overflow=n_over)
        p2v = np.where(p2v >= caps[0], caps[0], p2v).astype(np.int32)
        if block_mode:
            levels, blocks = build_block_maps(vc, caps, nb_caps)
            for li, bm in enumerate(blocks):
                if bm.overflow_voxels:
                    # silent block-cap overflow would drop features (the pad
                    # block is kept all-zero) — make misconfiguration visible
                    logging.getLogger(__name__).warning(
                        "block cap overflow: scene %d level %d dropped %d "
                        "voxels (nb_cap=%d too small)",
                        s_i, li, bm.overflow_voxels, nb_caps[li],
                    )
                    CAP_STATS.add(cap_level_overflow=bm.overflow_voxels)
        elif column_mode:
            levels, blocks = build_column_maps(vc, caps, c_caps)
            for li, cm in enumerate(blocks):
                if cm.overflow_voxels:
                    logging.getLogger(__name__).warning(
                        "column cap overflow: scene %d level %d dropped %d "
                        "voxels (col_cap=%d too small)",
                        s_i, li, cm.overflow_voxels, c_caps[li],
                    )
                    CAP_STATS.add(cap_level_overflow=cm.overflow_voxels)
                if cm.dropped_phantoms:
                    # phantoms carry cross-z-boundary conv contributions;
                    # dropping them silently breaks exact weight interchange
                    # across conv impls (ADVICE r4) — warn like overflow
                    logging.getLogger(__name__).warning(
                        "column phantom overflow: scene %d level %d dropped "
                        "%d phantom columns (col_cap=%d too small)",
                        s_i, li, cm.dropped_phantoms, c_caps[li],
                    )
                    CAP_STATS.add(cap_dropped_phantoms=cm.dropped_phantoms)
        else:
            levels = build_unet_maps(vc, caps)
            blocks = None

        out["point_xyz"][s_i, :n] = xyz
        write_scene_features(scene, spec, out["point_feats"][s_i], n)
        out["point_mask"][s_i, :n] = True
        out["p2v"][s_i, :n] = p2v
        out["sem_labels"][s_i, :n] = scene.sem_labels[:n]
        out["instance_ids"][s_i, :n] = np.where(
            scene.instance_ids[:n] >= spec.max_instances, -1, scene.instance_ids[:n]
        )
        mean_xyz, num_point, centers, sizes, sem, mask = instance_info(
            xyz, scene.sem_labels[:n], scene.instance_ids[:n],
            spec.max_instances,
        )
        out["instance_mean_xyz"][s_i, :n] = mean_xyz
        out["instance_num_point"][s_i] = num_point
        out["center_label"][s_i] = centers
        out["size_label"][s_i] = sizes
        out["sem_cls_label"][s_i] = sem
        out["gt_box_mask"][s_i] = mask

        for li, lv in enumerate(levels):
            lvl_mask = np.zeros(caps[li], np.float32)
            lvl_mask[: lv.num_voxels] = 1.0
            per_level[li]["mask"].append(lvl_mask)
            if block_mode:
                bm = blocks[li]
                per_level[li]["vox2cell"].append(bm.vox2cell)
                per_level[li]["block_nbr"].append(bm.block_nbr)
                if bm.block_child is not None:
                    per_level[li]["block_child"].append(bm.block_child)
                    per_level[li]["block_parent"].append(bm.block_parent)
                    per_level[li]["block_quad"].append(bm.block_quad)
            elif column_mode:
                cm = blocks[li]
                per_level[li]["vox2col"].append(cm.vox2col)
                per_level[li]["col_nbr"].append(cm.col_nbr)
                per_level[li]["col_zm"].append(cm.col_zm)
                per_level[li]["col_zp"].append(cm.col_zp)
                if colres_mode:
                    per_level[li]["col_occ"].append(cm.col_occ)
                    per_level[li]["col2vox"].append(cm.col2vox)
                if cm.col_child is not None:
                    per_level[li]["col_child"].append(cm.col_child)
                    per_level[li]["col_parent"].append(cm.col_parent)
                    per_level[li]["col_quad"].append(cm.col_quad)
            else:
                per_level[li]["nbr"].append(lv.nbr)
                if lv.down is not None:
                    per_level[li]["down"].append(lv.down)
                    per_level[li]["up"].append(lv.up)

    tables = []
    for li in range(len(caps)):
        t = {k: np.stack(v) for k, v in per_level[li].items() if v}
        tables.append(t)
    out["tables"] = tables
    CAP_STATS.add(batches=1)
    return out
