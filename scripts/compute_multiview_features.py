"""Offline multiview feature extraction: frames -> ENet -> back-projection
-> per-point 128-d max-pooled features -> HDF5.

Combines the reference's two offline stages into one CLI
(``data/scannet/compute_multiview_features.py:84-124`` computes per-frame
ENet maps; ``project_multiview_features.py:85-212`` back-projects them onto
scene points and max-pools over frames into ``enet_feats_maxpool.hdf5``).

ENet weights: the reference loads a torch7-converted pretrained ENet
(``scannetv2_enet.pth``).  That artifact is not available in this
environment, so the DOCUMENTED DECISION is: ``--weights`` accepts a pickled
flax params tree (ported offline from any ENet checkpoint); without it the
encoder runs with a fixed-seed initialization, acting as a deterministic
random-projection feature extractor — the 3D pipeline downstream is
identical either way, and real weights drop in without code changes.

Usage:
  # ScanNet layout (extracted .sens frames + prepare_scannet npz scenes):
  python scripts/compute_multiview_features.py \
      --frames <frames_root> --scenes <npz_dir>/*.npz --output feats.hdf5

  # No-data demo/e2e validation on synthetic rendered frames:
  python scripts/compute_multiview_features.py --synthetic 4 --output feats.hdf5
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from d3net_tpu import runtime as _rt
_rt.setup()


def make_encoder(weights_path=None, image_hw=(256, 328), seed: int = 0):
    """Returns (apply_fn: (F,H,W,3)->(F,H/8,W/8,128), params)."""
    import jax
    import jax.numpy as jnp

    from d3net_tpu.models.enet import ENetEncoder

    model = ENetEncoder()
    if weights_path:
        with open(weights_path, "rb") as f:
            variables = pickle.load(f)
        print(f"loaded ENet weights from {weights_path}")
    else:
        dummy = jnp.zeros((1, image_hw[0], image_hw[1], 3))
        variables = model.init(jax.random.key(seed), dummy, train=False)
        print("no --weights given: fixed-seed ENet (random-projection features)")

    @jax.jit
    def apply_fn(frames):
        return model.apply(variables, frames, train=False)

    return apply_fn, variables


def features_for_scene(xyz, frames, apply_fn, image_wh, intrinsic,
                       batch_frames: int = 8, accuracy: float = 0.05,
                       depth_max: float = 4.0):
    """frames iterable of (color, depth, pose) -> (N, 128) max-pooled feats.

    ``depth_max`` 4.0m matches the reference's ScanNet frames; synthetic
    orbit cameras sit farther out, so the synthetic path widens it to the
    renderer's far plane (8m)."""
    from d3net_tpu.data.multiview import ProjectionHelper, \
        project_multiview_features

    helper = ProjectionHelper(
        intrinsic, image_dims=image_wh, accuracy=accuracy, feat_stride=8,
        depth_max=depth_max,
    )

    def featurized():
        buf = []
        for color, depth, pose in frames:
            buf.append((color, depth, pose))
            if len(buf) == batch_frames:
                yield from _flush(buf)
                buf = []
        if buf:
            yield from _flush(buf)

    def _flush(buf):
        stack = np.stack([c for c, _, _ in buf]).astype(np.float32)
        maps = np.asarray(apply_fn(stack))
        for m, (_, depth, pose) in zip(maps, buf):
            yield m, pose, depth

    return project_multiview_features(xyz, featurized(), helper, feat_dim=128)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", help="extracted-sens root (scene_id subdirs)")
    ap.add_argument("--scenes", nargs="*", default=[],
                    help="prepare_scannet npz files (xyz source)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="render N synthetic scenes instead of reading data")
    ap.add_argument("--config",
                    help="training config: render features for exactly the "
                         "train+val synthetic scenes that config uses "
                         "(matching geometry params and scene_ids), so the "
                         "HDF5 drops into data.multiview_hdf5")
    ap.add_argument("--output", required=True, help="output HDF5 path")
    ap.add_argument("--weights", help="pickled flax ENet params")
    ap.add_argument("--max-frames", type=int, default=50)
    ap.add_argument("--width", type=int, default=328)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from d3net_tpu.data.frames import (
        ScanNetFrames, default_intrinsic, render_scene_frames,
    )
    from d3net_tpu.data.multiview import write_multiview_hdf5

    apply_fn, _ = make_encoder(args.weights, (args.height, args.width))
    intrinsic = default_intrinsic(args.width, args.height)
    out = {}

    if args.synthetic or args.config:
        if args.config:
            # exactly the scenes the training config's dataloaders build
            # (same geometry kwargs + split seed bases), so scene_ids AND
            # point counts line up with MultiviewAttached lookups
            from d3net_tpu.config import load
            from d3net_tpu.data.dataset import SyntheticScenes

            cfg = load(args.config)
            syn = cfg.data.synthetic
            kw = dict(
                num_instances=syn.num_instances,
                points_per_instance=syn.get("points_per_instance", 3000),
                floor_points=syn.floor_points, room=syn.room,
                density=syn.get("density"),
                size_range=tuple(syn.get("size_range", (0.3, 1.2))),
            )
            n_val = int(syn.get("num_val_scenes", 0)
                        or max(2, syn.num_scenes // 8))
            scene_list = list(SyntheticScenes(syn.num_scenes, "train", **kw).scenes)
            scene_list += list(SyntheticScenes(n_val, "val", **kw).scenes)
        else:
            from d3net_tpu.data.synthetic import make_scene

            scene_list = [make_scene(seed=i) for i in range(args.synthetic)]

        for scene in scene_list:
            colors, depths, poses = render_scene_frames(
                scene, n_frames=min(args.max_frames, 8),
                width=args.width, height=args.height,
            )
            frames = list(zip(colors, depths, poses))
            out[scene.scene_id] = features_for_scene(
                scene.xyz, frames, apply_fn, (args.width, args.height),
                intrinsic, depth_max=8.0,
            )
            print(f"{scene.scene_id}: {out[scene.scene_id].shape}")
    else:
        paths = [p for pat in args.scenes for p in sorted(glob.glob(pat))]
        if not paths or not args.frames:
            ap.error("need --frames and --scenes (or --synthetic N)")
        for path in paths:
            d = np.load(path)
            scene_id = str(d.get("scene_id", os.path.basename(path)[:-4]))
            reader = ScanNetFrames(args.frames, scene_id, args.max_frames)
            intr_file = os.path.join(
                args.frames, scene_id, "intrinsic", "intrinsic_color.txt"
            )
            intr = np.loadtxt(intr_file) if os.path.exists(intr_file) else intrinsic
            out[scene_id] = features_for_scene(
                d["xyz"], reader, apply_fn, (args.width, args.height), intr
            )
            print(f"{scene_id}: {out[scene_id].shape}")

    write_multiview_hdf5(args.output, out)
    print(f"wrote {len(out)} scenes to {args.output}")


if __name__ == "__main__":
    main()
