"""ScanRefer hidden-test grounding submission (parity: reference
``benchmark/benchmark_grounding.py``): for every description pick the
argmax-confidence proposal box and dump submission JSON.

Usage: python benchmark/benchmark_grounding.py --folder <run_dir> --out pred.json
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
    from d3net_tpu.data.language import build_lang_batch
    from d3net_tpu.eval.cli import _setup
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import shard_batch
    from d3net_tpu.train.pipeline_loop import lang_rows

    cfg = cfg_lib.load(os.path.join(args.folder, "config.yaml"))
    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, args.folder)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, method=PipelineNet.run_detector))
    lis_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, rng=None,
        method=PipelineNet.run_listener), static_argnames=("chunk_size",))

    rng_np = np.random.default_rng(0)
    submission = []
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
        mask = np.asarray(det["proposal_batch_mask"])
        for i, scene in enumerate(scenes):
            for c in range(chunk):
                if lang_np["annotated"][i, c] <= 0:
                    continue
                scores = np.where(mask[i] > 0, conf[i, c], -1e30)
                pick = int(scores.argmax())
                submission.append({
                    "scene_id": scene.scene_id,
                    "object_id": int(lang_np["ref_box_label"][i, c].argmax()),
                    "bbox": corners[i, pick].tolist(),
                })
    out_path = args.out or os.path.join(args.folder, "benchmark_grounding.json")
    json.dump(submission, open(out_path, "w"))
    print(f"wrote {len(submission)} entries to {out_path}")


if __name__ == "__main__":
    main()
