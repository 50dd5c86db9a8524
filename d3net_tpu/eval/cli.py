"""Standalone eval entry points for scripts/eval.py --task captioning|grounding.

Parity: ``scripts/eval.py:eval_captioning/eval_grounding`` in the reference
— reload the run dir's config + checkpoint, run the task protocol over the
val split, print and persist metrics (the run dir stays self-describing).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _setup(cfg, run_dir):
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from d3net_tpu.train.loop import Checkpointer, make_dataloaders, spec_from_cfg
    from d3net_tpu.train.pipeline_loop import build_vocab, lang_rows, \
        pipeline_from_cfg
    from d3net_tpu.train.trainer import TrainState, make_optimizer
    from d3net_tpu.data.collate import build_batch
    from d3net_tpu.data.language import build_lang_batch

    vocab, emb = build_vocab(cfg)
    model = pipeline_from_cfg(cfg, vocab)
    spec = spec_from_cfg(cfg, infer=True)
    _, val_it = make_dataloaders(cfg, spec, return_scenes=True)
    chunk = int(cfg.data.num_des_per_scene)
    mesh = make_mesh()

    first_scenes = [val_it.scenes[i % len(val_it.scenes)]
                    for i in range(cfg.data.batch_size)]
    first = shard_batch(jax.tree.map(jnp.asarray, build_batch(first_scenes, spec)), mesh)
    rng_np = np.random.default_rng(0)
    first_lang = lang_rows(
        build_lang_batch(first_scenes, vocab, chunk, cfg.data.max_spk_len,
                         rng_np, spec.max_instances), emb)
    init_rngs = {k: jax.random.key(i) for i, k in enumerate(
        ("params", "cluster_jitter", "proposal_shuffle", "target_sampling",
         "copy_paste", "dropout"))}
    variables = jax.jit(
        lambda b, l: model.init(init_rngs, b, l, train=True, chunk_size=chunk)
    )(first, first_lang)

    tx = make_optimizer(lr=1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx,
    )
    state = replicate(state, mesh)
    ckpt = Checkpointer(run_dir, "loss", "min")
    restored = ckpt.restore_weights(state)
    if restored is None:
        print("WARNING: no checkpoint found, evaluating random weights")
        ckpt_info = {"kind": "none", "step": -1}
    else:
        state = restored
        ckpt_info = dict(ckpt.restored_from or {})
        print(f"evaluating {ckpt_info.get('kind')} checkpoint "
              f"(step {ckpt_info.get('step')})")
    return model, state, val_it, vocab, emb, chunk, mesh, ckpt_info


def eval_captioning_cli(cfg, run_dir) -> Dict[str, float]:
    from d3net_tpu.train.pipeline_loop import run_pipeline_validation

    model, state, val_it, vocab, emb, chunk, mesh, ckpt_info = _setup(cfg, run_dir)
    metrics = run_pipeline_validation(
        cfg, model, state, val_it, vocab, emb, chunk, mesh, mode=1
    )
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(run_dir, "eval_captioning.json"), "w") as f:
        json.dump({**metrics, "checkpoint": ckpt_info}, f)
    return metrics


def eval_grounding_cli(cfg, run_dir) -> Dict[str, float]:
    from d3net_tpu.train.pipeline_loop import run_pipeline_validation

    model, state, val_it, vocab, emb, chunk, mesh, ckpt_info = _setup(cfg, run_dir)
    metrics = {}
    for rep in range(int(cfg.eval.get("repeat", 1))):
        m = run_pipeline_validation(
            cfg, model, state, val_it, vocab, emb, chunk, mesh, mode=2
        )
        for k, v in m.items():
            metrics.setdefault(k, []).append(v)
    metrics = {k: float(np.mean(v)) for k, v in metrics.items()}
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(run_dir, "eval_grounding.json"), "w") as f:
        json.dump({**metrics, "checkpoint": ckpt_info}, f)
    return metrics


NYU20_CLASS_IDX = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]


def eval_scannet_cli(cfg, run_dir) -> None:
    """ScanNet-benchmark prediction dump (parity: ``PointGroup.test``,
    ``model/pointgroup.py:543-625``): per scene write semantic class ids
    (NYU space) and instance masks after mask-IoU NMS, in the official
    txt tree layout, plus in-memory semantic/instance metrics on the
    synthetic val split."""
    import functools

    from d3net_tpu.eval.segmentation import (
        InstanceEvaluator, semantic_confusion, semantic_iou)
    from d3net_tpu.models.pipeline import PipelineNet
    from d3net_tpu.parallel.mesh import shard_batch
    from d3net_tpu.utils.nms import nms_matrix

    model, state, val_it, vocab, emb, chunk, mesh, ckpt_info = _setup(cfg, run_dir)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    det_fn = jax.jit(functools.partial(
        model.apply, variables, train=False, method=PipelineNet.run_detector))

    pred_root = os.path.join(run_dir, "split_pred", "val")
    sem_dir = os.path.join(pred_root, "semantic")
    inst_dir = os.path.join(pred_root, "instance")
    mask_dir = os.path.join(inst_dir, "predicted_masks")
    for d in (sem_dir, inst_dir, mask_dir):
        os.makedirs(d, exist_ok=True)

    conf = np.zeros((20, 20), np.int64)
    inst_eval = InstanceEvaluator()
    for batch_np, scenes in val_it:
        batch = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
        out = jax.device_get(det_fn(batch))
        sem_pred = np.asarray(out["semantic_scores"]).argmax(-1)
        member = np.asarray(out["member_pt"])           # (B, 2, N)
        scores = 1 / (1 + np.exp(-np.asarray(out["proposal_scores_all"])))
        cmask = np.asarray(out["cluster_mask_all"])
        npoint = np.asarray(out["cluster_npoint"])
        pmask = np.asarray(batch_np["point_mask"])
        for i, scene in enumerate(scenes):
            n = int(pmask[i].sum())
            sp = sem_pred[i, :n]
            np.savetxt(os.path.join(sem_dir, f"{scene.scene_id}.txt"),
                       np.asarray(NYU20_CLASS_IDX)[sp], fmt="%d")
            conf += semantic_confusion(sp, batch_np["sem_labels"][i, :n], 20)

            # proposal point masks + threshold + matrix NMS (ref :577-601)
            keep = np.where(
                cmask[i] & (scores[i] > cfg.test.TEST_SCORE_THRESH)
                & (npoint[i] > cfg.test.TEST_NPOINT_THRESH))[0]
            masks = np.stack(
                [((member[i, 0, :n] == s) | (member[i, 1, :n] == s)) for s in keep]
            ) if len(keep) else np.zeros((0, n), bool)
            preds = []
            if len(keep):
                mf = masks.astype(np.float32)
                inter = mf @ mf.T
                sz = mf.sum(1)
                ious = inter / np.maximum(sz[:, None] + sz[None] - inter, 1e-6)
                pick = nms_matrix(ious, scores[i, keep], cfg.test.TEST_NMS_THRESH)
                with open(os.path.join(inst_dir, f"{scene.scene_id}.txt"), "w") as f:
                    for rank, pi in enumerate(pick):
                        slot = keep[pi]
                        mask = masks[pi]
                        cls_counts = np.bincount(sp[mask], minlength=20)
                        cls = int(cls_counts.argmax())
                        mpath = f"predicted_masks/{scene.scene_id}_{rank:03d}.txt"
                        f.write(f"{mpath} {NYU20_CLASS_IDX[cls]} "
                                f"{scores[i, slot]:.4f}\n")
                        np.savetxt(os.path.join(inst_dir, mpath),
                                   mask.astype(np.int32), fmt="%d")
                        preds.append((mask, cls, float(scores[i, slot])))
            inst_eval.add_scene(preds, batch_np["instance_ids"][i, :n],
                                batch_np["sem_labels"][i, :n])

    metrics = {**semantic_iou(conf), **inst_eval.compute()}
    metrics.pop("per_class_iou", None)
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(run_dir, "eval_scannet.json"), "w") as f:
        json.dump({**metrics, "checkpoint": ckpt_info}, f)
    return metrics
