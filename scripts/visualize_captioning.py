"""Qualitative dense-captioning dumps (parity: reference
``scripts/visualize_captioning.py``): per scene, write the point cloud as
PLY, predicted boxes as box-edge PLYs, and a captions.txt with one line per
kept proposal.

Usage: python scripts/visualize_captioning.py --folder <run_dir> [--scenes N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def box_edges_ply(path, corners_list, colors=None):
    """Write box wireframes as a PLY point cloud sampled along edges."""
    from d3net_tpu.utils.ply import write_ply_points

    pts, cols = [], []
    edges = [
        (0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    for bi, corners in enumerate(corners_list):
        color = colors[bi] if colors is not None else (255, 0, 0)
        for a, b in edges:
            for t in np.linspace(0, 1, 20):
                pts.append(corners[a] * (1 - t) + corners[b] * t)
                cols.append(color)
    if pts:
        write_ply_points(path, np.asarray(pts), np.asarray(cols))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", required=True)
    parser.add_argument("--scenes", type=int, default=4)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import functools
    import jax
    import jax.numpy as jnp

    from d3net_tpu import config as cfg_lib
    from d3net_tpu.eval.cli import _setup
    from d3net_tpu.eval.caption_eval import decode_captions
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import shard_batch
    from d3net_tpu.utils.ply import write_ply_points

    cfg = cfg_lib.load(os.path.join(args.folder, "config.yaml"))
    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, args.folder)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, method=PipelineNet.run_detector))
    spk_fn = jax.jit(functools.partial(
        model.apply, variables, mode="eval", method=PipelineNet.run_speaker))

    out_dir = os.path.join(args.folder, "vis_captioning")
    os.makedirs(out_dir, exist_ok=True)
    done = 0
    for batch_np, scenes in val_it:
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        det = det_fn(batch)
        data = {**det, "glove_embeddings": jnp.asarray(emb)}
        data = spk_fn(data)
        ids = np.asarray(data["lang_cap"])
        corners = np.asarray(det["proposal_bbox_batched"])
        masks = np.asarray(det["proposal_batch_mask"])
        for i, scene in enumerate(scenes):
            sdir = os.path.join(out_dir, scene.scene_id)
            os.makedirs(sdir, exist_ok=True)
            rgb255 = ((scene.rgb + 1) * 127.5).clip(0, 255)
            write_ply_points(os.path.join(sdir, "scene.ply"), scene.xyz, rgb255)
            keep = np.where(masks[i] > 0)[0]
            box_edges_ply(os.path.join(sdir, "pred_boxes.ply"), corners[i, keep])
            caps = decode_captions(ids[i], vocab)
            with open(os.path.join(sdir, "captions.txt"), "w") as f:
                for j in keep:
                    f.write(f"proposal {j}: {caps[j]}\n")
            done += 1
            if done >= args.scenes:
                print(f"wrote {done} scenes to {out_dir}")
                return
    print(f"wrote {done} scenes to {out_dir}")


if __name__ == "__main__":
    main()
