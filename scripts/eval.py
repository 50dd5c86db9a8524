"""Evaluation entry point (CLI parity: reference scripts/eval.py).

Usage: python scripts/eval.py --folder <run_dir> --task detection|captioning|grounding
Reloads the run dir's snapshotted config, restores the latest checkpoint,
and runs the task's eval protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from d3net_tpu import runtime as _rt
_rt.setup()
from d3net_tpu import config as cfg_lib


def eval_detection(cfg, run_dir):
    import jax

    from d3net_tpu.eval.detection import (
        APCalculator,
        parse_groundtruths,
        parse_predictions,
    )
    from d3net_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from d3net_tpu.train.loop import (
        Checkpointer,
        detector_from_cfg,
        make_dataloaders,
        spec_from_cfg,
    )
    from d3net_tpu.train.trainer import create_train_state, jit_eval_step, make_optimizer

    spec = spec_from_cfg(cfg, infer=True)
    model = detector_from_cfg(cfg)
    _, val_it = make_dataloaders(cfg, spec)
    mesh = make_mesh()
    tx = make_optimizer(lr=cfg.train.optim.lr)

    first = shard_batch(next(iter(val_it)), mesh)
    val_it.epoch = 0
    state = create_train_state(model, first, jax.random.key(0), tx)
    state = replicate(state, mesh)
    ckpt = Checkpointer(run_dir, "total_loss", "min")
    restored = ckpt.restore_weights(state)
    if restored is None:
        print("WARNING: no checkpoint found, evaluating random weights")
        ckpt_info = {"kind": "none", "step": -1}
    else:
        state = restored
        ckpt_info = dict(ckpt.restored_from or {})
        print(f"evaluating {ckpt_info.get('kind')} checkpoint "
              f"(step {ckpt_info.get('step')})")

    eval_step = jit_eval_step(model)
    calcs = {t: APCalculator(t) for t in (0.25, 0.5)}
    for batch_np in val_it:
        batch = shard_batch(batch_np, mesh)
        out, _ = eval_step(state, batch)
        out = jax.device_get(out)
        preds = parse_predictions(
            np.asarray(out["proposal_bbox_batched"]),
            np.asarray(out["proposal_sem_cls_batched"]),
            np.asarray(out["proposal_scores_batched"]),
            np.asarray(out["proposal_batch_mask"]),
            nms_iou=0.25,
            conf_thresh=cfg.test.TEST_SCORE_THRESH,
        )
        gts = parse_groundtruths(
            batch_np["center_label"],
            batch_np["size_label"],
            batch_np["sem_cls_label"],
            batch_np["gt_box_mask"],
        )
        for c in calcs.values():
            c.step(preds, gts)
    results = {}
    for t, c in calcs.items():
        m = c.compute_metrics()
        results[f"mAP@{t}"] = m["mAP"]
        results[f"AR@{t}"] = m["AR"]
        results[f"per_class@{t}"] = {
            k: v for k, v in m.items() if k.startswith(("AP_", "Recall_"))
        }
    print(json.dumps(results, indent=2))
    # stamp which checkpoint produced this eval at dump time only, keeping
    # the returned metric dict clean (same pattern as d3net_tpu/eval/cli.py)
    with open(os.path.join(run_dir, "eval_detection.json"), "w") as f:
        json.dump({**results, "checkpoint": ckpt_info}, f)
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", required=True)
    parser.add_argument(
        "--task", required=True,
        choices=["detection", "captioning", "grounding", "scannet"],
    )
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override a dotted config key for this eval only, e.g. "
             "--set eval.min_iou_threshold=0.25 (the reference's eval.py "
             "similarly mutates fields by hand, scripts/eval.py:43-44)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfg_path = os.path.join(args.folder, "config.yaml")
    cfg = cfg_lib.load(cfg_path)
    for kv in args.set:
        key, _, val = kv.partition("=")
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node[p]
        old = node.get(parts[-1])
        for cast in (int, float):
            try:
                val = cast(val)
                break
            except ValueError:
                continue
        if isinstance(val, str) and val.lower() in ("true", "false"):
            val = val.lower() == "true"
        node[parts[-1]] = val
        print(f"config override: {key} = {val!r} (was {old!r})")

    if args.task == "detection":
        eval_detection(cfg, args.folder)
    elif args.task == "scannet":
        from d3net_tpu.eval.cli import eval_scannet_cli

        eval_scannet_cli(cfg, args.folder)
    elif args.task == "captioning":
        from d3net_tpu.eval.cli import eval_captioning_cli

        eval_captioning_cli(cfg, args.folder)
    else:
        from d3net_tpu.eval.cli import eval_grounding_cli

        eval_grounding_cli(cfg, args.folder)


if __name__ == "__main__":
    main()
