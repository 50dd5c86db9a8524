"""Qualitative grounding dumps (parity: reference
``scripts/visualize_grounding.py``): per description, write scene PLY,
GT box (green) and predicted box (red) wireframes, and the query text.

Usage: python scripts/visualize_grounding.py --folder <run_dir> [--scenes N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from d3net_tpu.data.language import build_lang_batch
    from d3net_tpu.eval.cli import _setup
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import shard_batch
    from d3net_tpu.train.pipeline_loop import lang_rows
    from d3net_tpu.utils.ply import write_ply_points
    from scripts.visualize_captioning import box_edges_ply

    cfg = cfg_lib.load(os.path.join(args.folder, "config.yaml"))
    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, args.folder)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, method=PipelineNet.run_detector))
    lis_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, rng=None,
        method=PipelineNet.run_listener), static_argnames=("chunk_size",))

    out_dir = os.path.join(args.folder, "vis_grounding")
    os.makedirs(out_dir, exist_ok=True)
    rng_np = np.random.default_rng(0)
    done = 0
    for batch_np, scenes in val_it:
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        det = det_fn(batch)
        lang_np = build_lang_batch(scenes, vocab, chunk, cfg.data.max_spk_len,
                                   rng_np, val_it.spec.max_instances)
        lang = lang_rows(lang_np, emb)
        word_embs = lang["glove_embeddings"][lang["lang_ids"]]
        data = lis_fn({**det, **lang}, word_embs, lang["lang_len"],
                      chunk_size=chunk)
        conf = np.asarray(data["cluster_ref"]).reshape(len(scenes), chunk, -1)
        corners = np.asarray(det["proposal_bbox_batched"])
        masks = np.asarray(det["proposal_batch_mask"])
        for i, scene in enumerate(scenes):
            sdir = os.path.join(out_dir, scene.scene_id)
            os.makedirs(sdir, exist_ok=True)
            rgb255 = ((scene.rgb + 1) * 127.5).clip(0, 255)
            write_ply_points(os.path.join(sdir, "scene.ply"), scene.xyz, rgb255)
            with open(os.path.join(sdir, "queries.txt"), "w") as f:
                for c in range(chunk):
                    if lang_np["annotated"][i, c] <= 0:
                        continue
                    text = " ".join(vocab.decode(lang_np["lang_ids"][i, c]))
                    scores = np.where(masks[i] > 0, conf[i, c], -1e30)
                    pick = int(scores.argmax())
                    box_edges_ply(
                        os.path.join(sdir, f"query{c}_pred.ply"),
                        [corners[i, pick]], [(255, 0, 0)],
                    )
                    box_edges_ply(
                        os.path.join(sdir, f"query{c}_gt.ply"),
                        [lang_np["ref_box_corner_label"][i, c]], [(0, 255, 0)],
                    )
                    f.write(f"query {c}: {text} -> proposal {pick}\n")
            done += 1
            if done >= args.scenes:
                print(f"wrote {done} scenes to {out_dir}")
                return
    print(f"wrote {done} scenes to {out_dir}")


if __name__ == "__main__":
    main()
