"""Synthetic ScanNet-like scenes for tests and benchmarking.

The environment ships no ScanNet data; these scenes mimic its statistics
(rooms of a few meters, 2cm surface sampling, axis-aligned instances on a
floor plane) so the full pipeline — voxelization, U-Net, clustering,
ScoreNet, losses, eval — runs end-to-end with meaningful supervision.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class Scene:
    """One scene in the canonical preprocessed format (prepare_scannet parity:
    xyz + rgb + normal mesh, sem_labels, instance_ids, instance bboxes)."""

    xyz: np.ndarray            # (N, 3) float32 meters
    rgb: np.ndarray            # (N, 3) float32 in [-1, 1]
    normal: np.ndarray         # (N, 3) float32
    multiview: Optional[np.ndarray]  # (N, 128) float32 or None
    sem_labels: np.ndarray     # (N,) int32, -1 = unannotated
    instance_ids: np.ndarray   # (N,) int32, -1 = none
    instance_bboxes: np.ndarray  # (I, 8): cx cy cz dx dy dz sem_label objid
    scene_id: str = "synthetic"


def _box_surface(rng, center, size, n):
    """Sample n points on the surface of an axis-aligned box."""
    face = rng.integers(0, 6, n)
    u = rng.uniform(-0.5, 0.5, (n, 3))
    axis = face // 2
    side = (face % 2).astype(np.float64) - 0.5
    u[np.arange(n), axis] = side
    return center + u * size


def make_scene(
    seed: int = 0,
    num_instances: int = 8,
    points_per_instance: int = 3000,
    floor_points: int = 8000,
    room: float = 6.0,
    num_classes: int = 20,
    noise: float = 0.005,
    with_multiview: bool = False,
    density: Optional[float] = None,
    size_range=(0.3, 1.2),
) -> Scene:
    """``density`` (points/m^2 of box surface) overrides points_per_instance;
    ScanNet's ~2cm sampling corresponds to density ~2500-4000."""
    rng = np.random.default_rng(seed)
    pts, sems, insts = [], [], []
    bboxes = []
    for i in range(num_instances):
        cls = int(rng.integers(2, num_classes))  # 0/1 = wall/floor
        size = rng.uniform(size_range[0], size_range[1], 3)
        center = np.array(
            [rng.uniform(1, room - 1), rng.uniform(1, room - 1), size[2] / 2]
        )
        if density is not None:
            a, b, c = size
            area = 2 * (a * b + b * c + c * a)
            n_pts = max(100, int(area * density))
        else:
            n_pts = points_per_instance
        p = _box_surface(rng, center, size, n_pts)
        p += rng.normal(scale=noise, size=p.shape)
        pts.append(p)
        sems.append(np.full(len(p), cls))
        insts.append(np.full(len(p), i))
        bboxes.append([*center, *size, cls, i])
    floor = np.column_stack(
        [
            rng.uniform(0, room, floor_points),
            rng.uniform(0, room, floor_points),
            rng.normal(0, noise, floor_points),
        ]
    )
    pts.append(floor)
    sems.append(np.ones(floor_points))  # class 1 = floor
    insts.append(np.full(floor_points, -1))

    xyz = np.concatenate(pts).astype(np.float32)
    sem = np.concatenate(sems).astype(np.int32)
    inst = np.concatenate(insts).astype(np.int32)
    n = len(xyz)
    rgb = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True) + 1e-8
    mv = rng.normal(size=(n, 128)).astype(np.float32) if with_multiview else None
    return Scene(
        xyz=xyz,
        rgb=rgb,
        normal=normal,
        multiview=mv,
        sem_labels=sem,
        instance_ids=inst,
        instance_bboxes=np.asarray(bboxes, np.float32).reshape(-1, 8),
        scene_id=f"synthetic_{seed:04d}",
    )
