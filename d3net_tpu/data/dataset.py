"""Scene datasets + host-side batch iterator (the input pipeline).

Parity: ``lib/dataset/pipeline.py`` (PipelineDataset + DataLoader workers).
Sources provide preprocessed scenes; the iterator applies augmentation
(jitter/flip/rotz/elastic — ``_augment`` + elastic in the reference),
assembles static-shape batches via :mod:`d3net_tpu.data.collate`, and
prefetches batches on a background thread so host work overlaps device
compute (the reference used 8 torch DataLoader workers for the same job).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import replace
from typing import Iterator, List, Optional, Sequence

import numpy as np

from d3net_tpu.data.collate import BatchSpec, build_batch
from d3net_tpu.data.synthetic import Scene, make_scene
from d3net_tpu.utils import transform as T


class SyntheticScenes:
    """Deterministic synthetic scene list (this env ships no ScanNet)."""

    def __init__(self, num_scenes: int = 64, split: str = "train", **scene_kw):
        base = 0 if split == "train" else 10_000
        self.scenes = [make_scene(seed=base + i, **scene_kw) for i in range(num_scenes)]

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i) -> Scene:
        return self.scenes[i]


class NpzScenes:
    """ScanNet scenes preprocessed by scripts/prepare_scannet.py (npz files).

    ``multiview_hdf5`` attaches per-point ENet features produced by
    ``scripts/compute_multiview_features.py`` (the reference looks scenes up
    in ``enet_feats_maxpool.hdf5`` the same way,
    ``lib/dataset/pipeline.py:774-802``).
    """

    def __init__(self, paths: Sequence[str], multiview_hdf5: Optional[str] = None):
        self.paths = list(paths)
        self.multiview_hdf5 = multiview_hdf5

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i) -> Scene:
        d = np.load(self.paths[i], allow_pickle=False)
        scene_id = str(d.get("scene_id", "scan"))
        mv = d["multiview"] if "multiview" in d else None
        if self.multiview_hdf5:
            from d3net_tpu.data.multiview import read_multiview_hdf5

            mv = read_multiview_hdf5(self.multiview_hdf5, scene_id)
        return Scene(
            xyz=d["xyz"],
            rgb=d["rgb"],
            normal=d["normal"],
            multiview=mv,
            sem_labels=d["sem_labels"],
            instance_ids=d["instance_ids"],
            instance_bboxes=d["instance_bboxes"],
            scene_id=scene_id,
        )


class MultiviewAttached:
    """Wrap any scene source, swapping in HDF5 multiview features by
    scene_id (output of scripts/compute_multiview_features.py)."""

    def __init__(self, scenes, hdf5_path: str):
        self.scenes = scenes
        self.hdf5_path = hdf5_path

    def __len__(self):
        return len(self.scenes)

    def __getitem__(self, i) -> Scene:
        from d3net_tpu.data.multiview import read_multiview_hdf5

        s = self.scenes[i]
        return replace(
            s, multiview=read_multiview_hdf5(self.hdf5_path, s.scene_id)
        )


def augment_scene(scene: Scene, rng: np.random.Generator, *, jitter=True,
                  flip=True, rot=True, elastic=False, scale=50.0) -> Scene:
    m = np.eye(3)
    if jitter:
        m = m @ T.jitter_matrix(rng)
    if flip:
        m = m @ T.flip_matrix(rng, 0, random=True)
    if rot:
        m = m @ T.random_rotz_matrix(rng)
    xyz = (scene.xyz @ m.T).astype(np.float32)
    if elastic:
        s = xyz * scale
        s = T.elastic(s, 6 * 1, 40 * 0.1, rng)
        s = T.elastic(s, 20 * 1, 160 * 0.4, rng)
        xyz = (s / scale).astype(np.float32)
    normal = (scene.normal @ np.linalg.inv(m).T).astype(np.float32)
    bboxes = scene.instance_bboxes
    if bboxes is not None and len(bboxes):
        # GT boxes must ride the same linear map or grounding targets
        # (ref_box_corner_label) and spatial-relation descriptions are built
        # in raw space against augmented geometry (the reference rotates its
        # aligned boxes alongside the points, lib/dataset/pipeline.py).
        # center maps exactly; the AABB of a linearly-mapped box has extents
        # |m| @ d.  Elastic is a non-linear warp applied after this — the
        # box stays the linear image (close: elastic is zero-mean and
        # small-magnitude relative to box sizes).
        bboxes = bboxes.copy()
        bboxes[:, :3] = (bboxes[:, :3] @ m.T).astype(np.float32)
        bboxes[:, 3:6] = (bboxes[:, 3:6] @ np.abs(m).T).astype(np.float32)
    return replace(scene, xyz=xyz, normal=normal, instance_bboxes=bboxes)


def subset_scene(scene: Scene, keep: np.ndarray) -> Scene:
    """Point-wise subset of a scene (boolean mask or index array)."""
    return replace(
        scene,
        xyz=scene.xyz[keep],
        rgb=scene.rgb[keep] if scene.rgb is not None else None,
        normal=scene.normal[keep] if scene.normal is not None else None,
        multiview=scene.multiview[keep] if scene.multiview is not None else None,
        sem_labels=scene.sem_labels[keep],
        instance_ids=scene.instance_ids[keep],
    )


def crop_scene(scene: Scene, max_points: int, scale: float, full_scale: float,
               rng: np.random.Generator) -> Scene:
    """Random spatial crop to <= max_points points (ref ``lib/utils/pc.py:
    29-50`` via ``lib/dataset/pipeline.py:159-166``): shrink a scaled-coords
    window at a random offset instead of biased head-truncation."""
    scaled = (scene.xyz - scene.xyz.min(0)) * scale
    _, keep = T.crop(scaled, max_points, full_scale, rng)
    if keep.all():
        return scene
    return subset_scene(scene, keep)


class BatchIterator:
    """Shuffled, augmented, prefetched static-shape batches."""

    def __init__(
        self,
        scenes,
        spec: BatchSpec,
        batch_size: int,
        *,
        shuffle: bool = True,
        augment: bool = True,
        elastic: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        workers: int = 1,
        drop_last: bool = True,
        return_scenes: bool = False,
    ):
        self.scenes = scenes
        self.spec = spec
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.elastic = elastic
        self.seed = seed
        self.prefetch = prefetch
        self.workers = max(1, int(workers))
        self.drop_last = drop_last
        self.return_scenes = return_scenes
        self.epoch = 0

    def __len__(self):
        n = len(self.scenes)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _build_one(self, order: np.ndarray, b: int):
        """Build batch ``b`` of the epoch (deterministic per-batch rng, so
        multi-worker builds are order-independent and reproducible)."""
        rng = np.random.default_rng(
            (self.seed + 1) * 1_000_003 + self.epoch * 131_071 + b
        )
        idx = order[b * self.batch_size : (b + 1) * self.batch_size]
        scenes = []
        for i in idx:
            s = self.scenes[int(i)]
            if self.augment:
                s = augment_scene(
                    s, rng, elastic=self.elastic, scale=self.spec.scale
                )
                if len(s.xyz) > self.spec.max_points:
                    s = crop_scene(
                        s, self.spec.max_points, self.spec.scale,
                        self.spec.full_scale, rng,
                    )
            scenes.append(s)
        batch = build_batch(scenes, self.spec)
        return (batch, scenes) if self.return_scenes else batch

    def _epoch_batches(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.scenes))
        if self.shuffle:
            rng.shuffle(order)
        for b in range(len(self)):
            yield self._build_one(order, b)

    def _epoch_batches_parallel(self) -> Iterator[dict]:
        """num_workers-style parallel batch building (reference used 8
        DataLoader workers, ``conf/pointgroup.yaml num_workers``); threads
        suffice because the hot collate work (numpy + cc kernels) releases
        the GIL."""
        from concurrent.futures import ThreadPoolExecutor

        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.scenes))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        inflight = self.workers + max(1, self.prefetch)
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            futs = {b: ex.submit(self._build_one, order, b)
                    for b in range(min(inflight, nb))}
            nxt = len(futs)
            for b in range(nb):
                yield futs.pop(b).result()
                if nxt < nb:
                    futs[nxt] = ex.submit(self._build_one, order, nxt)
                    nxt += 1

    def __iter__(self) -> Iterator[dict]:
        if self.workers > 1:
            yield from self._epoch_batches_parallel()
        elif self.prefetch <= 0:
            yield from self._epoch_batches()
        else:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            done = object()

            def worker():
                try:
                    for item in self._epoch_batches():
                        q.put(item)
                finally:
                    q.put(done)

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is done:
                    break
                yield item
        self.epoch += 1
