"""Train the ENet 2D encoder on synthetic frame semantics.

The reference's multiview features come from an ENet pretrained on ScanNet
2D semantic frames (``scannetv2_enet.pth``, used frozen by
``data/scannet/compute_multiview_features.py:84-124``).  That torch7
artifact does not exist in this environment, so this script reproduces the
*capability*: it renders RGB frames + per-pixel semantic labels from
synthetic scenes (``data/frames.py``), trains ``ENetEncoder`` + a 1x1
classifier head with cross-entropy at 1/8 resolution, and saves the
encoder variables as the pickle tree that
``scripts/compute_multiview_features.py --weights`` consumes — after which
the 128-d multiview channel carries learned 2D semantics instead of a
random projection.

Usage:
  python scripts/train_enet.py --scenes 16 --frames 8 --steps 400 \
      --output outputs/enet/enet_weights.pkl
  python scripts/compute_multiview_features.py --synthetic 4 \
      --weights outputs/enet/enet_weights.pkl --output feats.hdf5
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from d3net_tpu import runtime as _rt
_rt.setup()


def build_frame_dataset(num_scenes: int, frames_per_scene: int,
                        height: int, width: int, seed: int = 0):
    """Render (N, H, W, 3) colors + (N, H/8, W/8) labels (-1 = unlabeled).

    Labels are taken at the feature-map resolution by center-pixel sampling
    (the encoder output is 1/8 of the input); empty pixels carry -1 and are
    masked out of the loss.
    """
    from d3net_tpu.data.frames import default_intrinsic, orbit_poses, render_frame
    from d3net_tpu.data.synthetic import make_scene

    colors, labels = [], []
    for s in range(num_scenes):
        scene = make_scene(seed=seed + s, num_instances=10, density=2500.0,
                           floor_points=15000, room=6.0)
        intrinsic = default_intrinsic(width, height)
        poses = orbit_poses(scene.xyz, frames_per_scene)
        for pose in poses:
            c, _, sem = render_frame(scene, pose, intrinsic, width, height,
                                     with_semantics=True)
            colors.append(c)
            labels.append(sem[4::8, 4::8])
    return np.stack(colors).astype(np.float32), np.stack(labels)


def train(colors: np.ndarray, labels: np.ndarray, num_classes: int,
          steps: int, batch: int, lr: float, seed: int = 0,
          log_every: int = 20):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from d3net_tpu.models.enet import ENetEncoder

    class ENetSemantic(nn.Module):
        classes: int

        @nn.compact
        def __call__(self, x, train: bool = True):
            feats = ENetEncoder()(x, train=train)
            return nn.Conv(self.classes, (1, 1), name="classifier")(feats)

    model = ENetSemantic(num_classes)
    rng = jax.random.key(seed)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.asarray(colors[:1]), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, imgs, labs, drng):
        logits, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=True,
            rngs={"dropout": drng}, mutable=["batch_stats"])
        valid = (labs >= 0)
        labs_safe = jnp.maximum(labs, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labs_safe)
        n = jnp.maximum(valid.sum(), 1)
        loss = jnp.where(valid, ce, 0.0).sum() / n
        acc = jnp.where(valid, jnp.argmax(logits, -1) == labs_safe, False
                        ).sum() / n
        return loss, (mut["batch_stats"], acc)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, imgs, labs, drng):
        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, imgs, labs, drng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, acc

    n = len(colors)
    rng_np = np.random.default_rng(seed)
    history = []
    t0 = time.time()
    for i in range(steps):
        idx = rng_np.integers(0, n, size=batch)
        params, batch_stats, opt_state, loss, acc = step_fn(
            params, batch_stats, opt_state,
            jnp.asarray(colors[idx]), jnp.asarray(labels[idx]),
            jax.random.fold_in(jax.random.key(seed + 1), i))
        if i % log_every == 0 or i == steps - 1:
            loss, acc = float(loss), float(acc)
            history.append({"step": i, "loss": loss, "acc": acc})
            print(f"step {i} loss {loss:.4f} pix_acc {acc:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, batch_stats, history


def extract_encoder_variables(params, batch_stats):
    """ENetSemantic variables -> plain ENetEncoder variables tree
    (the format ``compute_multiview_features.make_encoder`` loads)."""
    return {"params": params["ENetEncoder_0"],
            "batch_stats": batch_stats["ENetEncoder_0"]}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--frames", type=int, default=8, help="frames per scene")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=328)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output", required=True,
                    help="encoder variables pickle for --weights")
    args = ap.parse_args(argv)

    print(f"rendering {args.scenes} scenes x {args.frames} frames "
          f"at {args.height}x{args.width}...", flush=True)
    colors, labels = build_frame_dataset(
        args.scenes, args.frames, args.height, args.width, seed=args.seed)
    cov = float((labels >= 0).mean())
    print(f"dataset: {colors.shape}, label coverage {cov:.2f}")

    params, batch_stats, history = train(
        colors, labels, args.classes, args.steps, args.batch, args.lr,
        seed=args.seed)

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(extract_encoder_variables(params, batch_stats), f)
    print(f"saved encoder weights to {args.output} "
          f"(final pix_acc {history[-1]['acc']:.3f})")


if __name__ == "__main__":
    main()
