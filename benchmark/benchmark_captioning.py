"""ScanRefer hidden-test captioning submission (parity: reference
``benchmark/benchmark_captioning.py``): caption every kept proposal after
NMS and dump {scene_id: [{caption, box, sem_prob, obj_prob}]} JSON.

Usage: python benchmark/benchmark_captioning.py --folder <run_dir> --out pred.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from d3net_tpu import config as cfg_lib
    from d3net_tpu.eval.caption_eval import decode_captions
    from d3net_tpu.eval.cli import _setup
    from d3net_tpu.eval.detection import parse_predictions
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import shard_batch

    cfg = cfg_lib.load(os.path.join(args.folder, "config.yaml"))
    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, args.folder)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, method=PipelineNet.run_detector))
    spk_fn = jax.jit(functools.partial(
        model.apply, variables, mode="eval", method=PipelineNet.run_speaker))

    submission = {}
    for batch_np, scenes in val_it:
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        det = det_fn(batch)
        data = spk_fn({**det, "glove_embeddings": jnp.asarray(emb)})
        ids = np.asarray(data["lang_cap"])
        corners = np.asarray(det["proposal_bbox_batched"])
        sem = np.asarray(det["proposal_sem_cls_batched"])
        prob = np.asarray(det["proposal_scores_batched"])
        mask = np.asarray(det["proposal_batch_mask"])
        for i, scene in enumerate(scenes):
            caps = decode_captions(ids[i], vocab)
            preds = parse_predictions(
                corners[i : i + 1], sem[i : i + 1], prob[i : i + 1],
                mask[i : i + 1], nms_iou=cfg.test.TEST_NMS_THRESH,
                conf_thresh=cfg.test.TEST_SCORE_THRESH,
            )[0]
            entries = []
            for cls, box, score in preds:
                j = int(np.argmin(
                    np.abs(corners[i] - box).sum(axis=(1, 2))
                ))
                entries.append({
                    "caption": caps[j],
                    "box": box.tolist(),
                    "sem_cls": int(cls),
                    "obj_prob": float(score),
                })
            submission[scene.scene_id] = entries
    out_path = args.out or os.path.join(args.folder, "benchmark_captioning.json")
    json.dump(submission, open(out_path, "w"))
    print(f"wrote {len(submission)} scenes to {out_path}")


if __name__ == "__main__":
    main()
