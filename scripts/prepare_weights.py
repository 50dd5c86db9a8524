"""Weight surgery for the stage-wise curriculum (parity: reference
``scripts/prepare_weights.py``): load a run's checkpoint and dump each
submodule's parameters to ``pretrained/<name>.pkl`` for later loading with
``model.pretrained_{detector,speaker,listener}`` config keys.

Usage: python scripts/prepare_weights.py --folder <run_dir> --name <tag>
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True, help="run dir with ckpt/")
    p.add_argument("--name", required=True, help="output tag")
    p.add_argument("--out", default="pretrained")
    p.add_argument("--which", choices=["best", "last"], default="best",
                   help="pinned-best checkpoint (default) or the latest")
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    jax.config.update("jax_platforms", "cpu")

    # the stage curriculum hands off the *best* checkpoint (reference keeps
    # a pinned best model.ckpt, scripts/train.py:252-262); fall back to the
    # rotating last-N dir when no best was ever recorded
    best_dir = os.path.abspath(os.path.join(args.folder, "ckpt_best"))
    mgr = None
    if args.which == "best" and os.path.isdir(best_dir):
        mgr = ocp.CheckpointManager(best_dir)
        if mgr.latest_step() is None:
            mgr = None
    if mgr is None:
        mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(args.folder, "ckpt")))
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint in {args.folder}"
    restored = mgr.restore(step)
    params = restored["params"]
    batch_stats = restored.get("batch_stats", {})

    os.makedirs(args.out, exist_ok=True)
    if not any(s in params for s in ("detector", "speaker", "listener")):
        # detector-only runs (mode 0) train a bare PointGroup: the whole
        # tree IS the detector submodule
        params = {"detector": params}
        batch_stats = {"detector": batch_stats}
    for sub in ("detector", "speaker", "listener"):
        if sub not in params:
            continue
        payload = {
            "params": jax.device_get(params[sub]),
            "batch_stats": jax.device_get(batch_stats.get(sub, {})),
        }
        path = os.path.join(args.out, f"{args.name}_{sub}.pkl")
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        n = sum(x.size for x in jax.tree_util.tree_leaves(payload["params"]))
        print(f"wrote {path} ({n/1e6:.2f}M params)")


if __name__ == "__main__":
    main()
