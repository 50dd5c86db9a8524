"""Multiview 2D-feature back-projection (parity: reference
``lib/utils/projection.py`` + ``data/scannet/project_multiview_features.py``).

For each RGB-D frame: ENet features are computed on the color image
(reference: 128-d map at 1/8 resolution, 41x32 for 328x256 inputs); scene
points are projected into the frame (world -> camera via inverse pose,
camera -> pixel via intrinsics), kept when inside the image, in the depth
range, and **depth-consistent** (|point depth - depth_map| <= accuracy,
reference accuracy 0.05); each visible point takes the feature at its pixel
(feature-map stride 8) and features are max-pooled over frames
(``enet_feats_maxpool.hdf5`` parity).

Vectorized numpy over all points per frame — the reference's per-pixel
index maps and frustum plane tests collapse into one masked projection.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np


class ProjectionHelper:
    def __init__(self, intrinsic: np.ndarray, depth_min: float = 0.1,
                 depth_max: float = 4.0, image_dims: Tuple[int, int] = (328, 256),
                 accuracy: float = 0.05, feat_stride: int = 8):
        self.intrinsic = np.asarray(intrinsic, np.float64)
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.image_dims = image_dims  # (W, H)
        self.accuracy = accuracy
        self.feat_stride = feat_stride

    def project(self, xyz: np.ndarray, camera_to_world: np.ndarray,
                depth_map: Optional[np.ndarray]):
        """Project world points into one frame.

        Args:
            xyz: (N, 3) world coords.
            camera_to_world: (4, 4) pose.
            depth_map: (H, W) metric depth or None (skips consistency).

        Returns:
            (valid (N,) bool, px (N,) int, py (N,) int) pixel coords.
        """
        w2c = np.linalg.inv(camera_to_world)
        cam = xyz @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[:, 2]
        fx, fy = self.intrinsic[0, 0], self.intrinsic[1, 1]
        cx, cy = self.intrinsic[0, 2], self.intrinsic[1, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            px = np.round(cam[:, 0] * fx / z + cx).astype(np.int64)
            py = np.round(cam[:, 1] * fy / z + cy).astype(np.int64)
        wdim, hdim = self.image_dims
        valid = (
            (z >= self.depth_min) & (z <= self.depth_max)
            & (px >= 0) & (px < wdim) & (py >= 0) & (py < hdim)
        )
        if depth_map is not None:
            pxc = np.clip(px, 0, wdim - 1)
            pyc = np.clip(py, 0, hdim - 1)
            d = depth_map[pyc, pxc]
            valid &= (d > 0) & (np.abs(d - z) <= self.accuracy)
        return valid, np.clip(px, 0, wdim - 1), np.clip(py, 0, hdim - 1)

    def lift_features(self, xyz: np.ndarray, feat_map: np.ndarray,
                      camera_to_world: np.ndarray,
                      depth_map: Optional[np.ndarray]):
        """(N,3) points + (Hf, Wf, C) frame features -> (N, C) feats + valid."""
        valid, px, py = self.project(xyz, camera_to_world, depth_map)
        fx = np.clip(px // self.feat_stride, 0, feat_map.shape[1] - 1)
        fy = np.clip(py // self.feat_stride, 0, feat_map.shape[0] - 1)
        feats = feat_map[fy, fx]
        return np.where(valid[:, None], feats, -np.inf), valid


def project_multiview_features(
    xyz: np.ndarray,
    frames: Iterable[Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]],
    helper: ProjectionHelper,
    feat_dim: int = 128,
) -> np.ndarray:
    """Max-pool per-point features over frames (ref ``project_multiview_
    features.py:126-212``). frames yields (feat_map, pose, depth_map)."""
    agg = np.full((len(xyz), feat_dim), -np.inf, np.float32)
    seen = np.zeros(len(xyz), bool)
    for feat_map, pose, depth in frames:
        feats, valid = helper.lift_features(xyz, feat_map, pose, depth)
        agg = np.maximum(agg, feats.astype(np.float32))
        seen |= valid
    agg[~seen] = 0.0
    return agg


def write_multiview_hdf5(path: str, scene_feats: dict):
    """{scene_id: (N, 128)} -> HDF5 (enet_feats_maxpool.hdf5 layout)."""
    import h5py

    with h5py.File(path, "w") as f:
        for scene_id, feats in scene_feats.items():
            f.create_dataset(scene_id, data=feats, compression="gzip")


def read_multiview_hdf5(path: str, scene_id: str) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f[scene_id])
