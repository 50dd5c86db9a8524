"""Training entry point (CLI parity: reference scripts/train.py).

Usage: python scripts/train.py --config conf/pointgroup.yaml [--debug]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d3net_tpu import runtime as _rt
_rt.setup()
from d3net_tpu import config as cfg_lib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="task yaml (merged over conf/path.yaml)")
    parser.add_argument("--folder", default=None, help="resume/run dir name")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    base = os.path.join(os.path.dirname(args.config), "path.yaml")
    paths = [p for p in [base] if os.path.exists(p)] + [args.config]
    cfg = cfg_lib.load(*paths)

    exp = args.folder or cfg.general.experiment
    run_dir = os.path.join(cfg.general.output_root, exp)

    task_mode = (
        int(not cfg.model.no_detection),
        int(not cfg.model.no_captioning),
        int(not cfg.model.no_grounding),
    )
    if task_mode == (1, 0, 0):
        if cfg.tpu.get("steps_per_dispatch"):
            from d3net_tpu.train.loop import run_detector_training_scan

            run_detector_training_scan(cfg, run_dir, max_steps=args.max_steps)
        else:
            from d3net_tpu.train.loop import run_detector_training

            run_detector_training(cfg, run_dir, max_steps=args.max_steps)
    else:
        from d3net_tpu.train.pipeline_loop import run_pipeline_training

        run_pipeline_training(cfg, run_dir, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
