"""Training orchestration: epochs, validation, checkpointing, logging.

Parity targets: Lightning Trainer wiring in ``scripts/train.py:247-344`` of
the reference — TensorBoard logging, ModelCheckpoint(monitor=...) best/last
semantics, resume from last checkpoint, config snapshot in the run dir.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from d3net_tpu.config import Config, save as save_cfg
from d3net_tpu.data.collate import BatchSpec
from d3net_tpu.data.dataset import BatchIterator, SyntheticScenes
from d3net_tpu.models.pointgroup import PointGroup
from d3net_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from d3net_tpu.train.migrate import migrate_legacy_block_names
from d3net_tpu.train.trainer import (
    TrainState,
    create_train_state,
    jit_eval_step,
    jit_train_step,
    make_optimizer,
)


def run_fingerprint(cfg: Optional[Config] = None) -> Dict[str, str]:
    """Provenance stamp for run artifacts: git SHA + config hash + time."""
    import hashlib
    import subprocess

    sha = "unknown"
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        pass
    out = {"git_sha": sha,
           "time": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if cfg is not None:
        try:
            blob = json.dumps(cfg.to_dict(), sort_keys=True, default=str)
            out["config_hash"] = hashlib.sha256(blob.encode()).hexdigest()[:16]
        except Exception:
            pass
    return out


def write_run_meta(run_dir: str, cfg: Optional[Config] = None) -> None:
    with open(os.path.join(run_dir, "run_meta.json"), "w") as f:
        json.dump(run_fingerprint(cfg), f, indent=2)


class MetricLogger:
    """JSONL + (optional) TensorBoard scalar logging.

    One training history per file: call :meth:`begin` after checkpoint
    restore — if the existing ``metrics.jsonl`` already contains steps past
    the restored step (a divergent older history), it is rotated away
    instead of interleaved (run-provenance contract).
    """

    def __init__(self, run_dir: str):
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._tb = None
        try:
            import tensorflow as tf  # noqa

            self._tb = tf.summary.create_file_writer(os.path.join(run_dir, "tb"))
        except Exception:
            pass

    def begin(self, start_step: int) -> None:
        """Rotate an existing log whose history extends past start_step."""
        if not os.path.exists(self.path):
            return
        last = -1
        try:
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        last = max(last, int(json.loads(line).get("step", -1)))
        except Exception:
            return
        if last > start_step:
            dst = f"{self.path}.upto{last}"
            i = 0
            while os.path.exists(dst):
                i += 1
                dst = f"{self.path}.upto{last}.{i}"
            os.rename(self.path, dst)
            print(f"rotated stale metrics history (last step {last} > "
                  f"restored {start_step}) -> {os.path.basename(dst)}")

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        rec = {"step": int(step), **{f"{prefix}/{k}": float(v) for k, v in scalars.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix}/{k}", float(v), step=step)
                self._tb.flush()


class Checkpointer:
    """Best + last checkpoints with the reference's monitor semantics.

    Parity: Lightning ``ModelCheckpoint(monitor, save_last=True)`` keeps the
    best ``model.ckpt`` *and* ``last.ckpt`` (reference
    ``scripts/train.py:252-262``).  Here ``ckpt/`` rotates the last 3 epochs
    while ``ckpt_best/`` pins the single best step — it is saved only on
    monitor improvement and never garbage-collected, so a long run cannot
    rotate its best step away.  The best value survives resume via
    ``best.json``.
    """

    def __init__(self, run_dir: str, monitor: str, mode: str = "min"):
        self.restored_from: Optional[Dict] = None  # set by restore_weights
        root = os.path.abspath(run_dir)
        self.mgr = ocp.CheckpointManager(
            os.path.join(root, "ckpt"),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        self.best_mgr = ocp.CheckpointManager(
            os.path.join(root, "ckpt_best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )
        self._best_meta = os.path.join(root, "ckpt_best", "best.json")
        self.monitor = monitor
        self.mode = mode
        self.best = np.inf if mode == "min" else -np.inf
        self.best_step: Optional[int] = None
        if os.path.exists(self._best_meta):
            try:
                with open(self._best_meta) as f:
                    meta = json.load(f)
                self.best = float(meta["value"])
                self.best_step = int(meta["step"])
            except Exception:
                pass

    def is_better(self, value: float) -> bool:
        return value < self.best if self.mode == "min" else value > self.best

    @staticmethod
    def _payload(state: TrainState):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    def save(self, step: int, state: TrainState, metrics: Dict[str, float]):
        value = metrics.get(self.monitor)
        payload = self._payload(state)
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        if value is not None and self.is_better(value):
            self.best = float(value)
            self.best_step = step
            self.best_mgr.save(step, args=ocp.args.StandardSave(payload))
            self.best_mgr.wait_until_finished()
            with open(self._best_meta, "w") as f:
                json.dump({"step": step, "value": self.best,
                           "monitor": self.monitor, "mode": self.mode}, f)
        self.mgr.wait_until_finished()

    def _restore(self, mgr, state: TrainState) -> Optional[TrainState]:
        step = mgr.latest_step()
        if step is None:
            return None
        template = self._payload(state)
        try:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        except Exception:
            # legacy checkpoint (pre-round-3 auto block names): raw restore,
            # migrate paths, then require an exact structure match
            raw = migrate_legacy_block_names(mgr.restore(step))
            jax.tree.map(lambda a, b: None, template, raw)  # structure check
            restored = jax.tree.map(
                lambda t, r: jnp.asarray(r, getattr(t, "dtype", None)),
                template, raw)
            print(f"migrated legacy checkpoint param names (step {step})")
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def restore_last(self, state: TrainState) -> Optional[TrainState]:
        return self._restore(self.mgr, state)

    def restore_best(self, state: TrainState) -> Optional[TrainState]:
        return self._restore(self.best_mgr, state)

    def restore_weights(self, state: TrainState,
                        prefer_best: bool = True) -> Optional[TrainState]:
        """Params/batch_stats-only restore for eval paths.

        Raw (template-free) orbax restore, so it works whatever optimizer
        the run used (e.g. frozen-submodule ``multi_transform`` opt_states
        don't match a plain optimizer's tree and fail a structured restore).
        """
        mgrs = [("best", self.best_mgr), ("last", self.mgr)] \
            if prefer_best else [("last", self.mgr)]
        for kind, mgr in mgrs:
            step = mgr.latest_step()
            if step is None:
                continue
            raw = migrate_legacy_block_names(mgr.restore(step))
            self.restored_from = {"kind": kind, "step": int(step)}
            return state.replace(
                params=raw["params"],
                batch_stats=raw.get("batch_stats", {}),
                step=raw["step"],
            )
        return None


def detector_from_cfg(cfg: Config) -> PointGroup:
    return PointGroup(
        m=cfg.model.m,
        classes=cfg.data.classes,
        blocks=tuple(cfg.model.blocks),
        cluster_blocks=tuple(cfg.model.cluster_blocks),
        block_reps=cfg.model.block_reps,
        block_residual=cfg.model.block_residual,
        use_coords=cfg.model.use_coords,
        max_num_proposal=cfg.model.max_num_proposal,
        cluster_radius=cfg.cluster.cluster_radius,
        cluster_cell_size=cfg.tpu.cluster_cell_size,
        cluster_ring=cfg.tpu.cluster_ring,
        cluster_npoint_thre=cfg.cluster.cluster_npoint_thre,
        cluster_prop_iters=cfg.tpu.cluster_prop_iters,
        clusters_per_pass=cfg.tpu.clusters_per_pass,
        score_fullscale=cfg.train.score_fullscale,
        score_scale=cfg.train.score_scale,
        test_score_thresh=cfg.test.TEST_SCORE_THRESH,
        test_npoint_thresh=cfg.test.TEST_NPOINT_THRESH,
        compute_dtype=cfg.tpu.get("activation_dtype"),
    )


def spec_from_cfg(cfg: Config, infer: bool = False) -> BatchSpec:
    """Batch layout from config.

    ``infer=True`` selects ``tpu.conv_impl_infer`` (falling back to
    ``tpu.conv_impl``): inference/eval runs the z-column conv (fastest
    measured forward) while training stays on the gather conv, whose
    backward is the only one the remote TPU compiler accepts at flagship
    scale (docs/perf_notes.md round 4).  Weights interchange across conv
    implementations (tests/test_column_conv.py, test_block_conv.py).
    """
    conv_impl = cfg.tpu.get("conv_impl", "gather") or "gather"
    if infer:
        conv_impl = cfg.tpu.get("conv_impl_infer") or conv_impl
    return BatchSpec(
        max_points=cfg.data.max_num_point,
        voxel_caps=list(cfg.tpu.voxel_caps),
        max_instances=cfg.data.max_num_instance,
        scale=cfg.data.scale,
        full_scale=float(cfg.data.full_scale[1]) if cfg.data.get("full_scale")
        else 512.0,
        use_color=cfg.model.use_color,
        use_normal=cfg.model.use_normal,
        use_multiview=cfg.model.use_multiview,
        num_levels=len(cfg.model.blocks),
        conv_impl=conv_impl,
        block_caps=list(cfg.tpu.get("block_caps") or ()),
        column_caps=list(cfg.tpu.get("column_caps") or ()),
    )


def make_dataloaders(cfg: Config, spec: BatchSpec, return_scenes: bool = False):
    syn = cfg.data.synthetic
    kw = dict(
        num_instances=syn.num_instances,
        points_per_instance=syn.get("points_per_instance", 3000),
        floor_points=syn.floor_points,
        room=syn.room,
        with_multiview=bool(cfg.model.use_multiview),
        density=syn.get("density"),
        size_range=tuple(syn.get("size_range", (0.3, 1.2))),
    )
    train_scenes = SyntheticScenes(syn.num_scenes, "train", **kw)
    n_val = int(
        os.environ.get("D3NET_VAL_SCENES", 0)
        or syn.get("num_val_scenes", 0)
        or max(2, syn.num_scenes // 8)
    )
    val_scenes = SyntheticScenes(n_val, "val", **kw)
    mv_h5 = cfg.data.get("multiview_hdf5")
    if mv_h5:
        from d3net_tpu.data.dataset import MultiviewAttached

        train_scenes = MultiviewAttached(train_scenes, mv_h5)
        val_scenes = MultiviewAttached(val_scenes, mv_h5)
    tr = cfg.data.transform
    workers = int(cfg.data.get("num_workers", 1) or 1)
    train_it = BatchIterator(
        train_scenes, spec, cfg.data.batch_size,
        shuffle=True, augment=bool(tr.jitter or tr.flip or tr.rot),
        elastic=bool(cfg.data.get("elastic", False)), seed=cfg.general.manual_seed,
        return_scenes=return_scenes, workers=workers,
    )
    val_it = BatchIterator(
        val_scenes, spec, cfg.data.batch_size,
        shuffle=False, augment=False, seed=0, drop_last=False,
        return_scenes=return_scenes, workers=workers,
    )
    return train_it, val_it


def run_detector_training(cfg: Config, run_dir: str, max_steps: Optional[int] = None):
    os.makedirs(run_dir, exist_ok=True)
    save_cfg(cfg, os.path.join(run_dir, "config.yaml"))
    logger = MetricLogger(run_dir)
    ckpt = Checkpointer(run_dir, cfg.general.monitor.replace("val_loss/", ""),
                        cfg.general.monitor_mode)

    spec = spec_from_cfg(cfg)
    model = detector_from_cfg(cfg)
    train_it, val_it = make_dataloaders(cfg, spec)
    steps_per_epoch = max(1, len(train_it))

    mesh = make_mesh(batch_size=int(cfg.data.batch_size))
    tx = make_optimizer(
        lr=cfg.train.optim.lr,
        optim=cfg.train.optim.classname,
        weight_decay=cfg.train.optim.weight_decay,
        momentum=cfg.train.optim.momentum,
        step_epoch=cfg.train.step_epoch,
        multiplier=cfg.train.multiplier,
        steps_per_epoch=steps_per_epoch,
    )

    first = shard_batch(next(iter(train_it)), mesh)
    train_it.epoch = 0  # don't consume the epoch counter on warmup
    state = create_train_state(model, first, jax.random.key(cfg.general.manual_seed), tx)
    state = replicate(state, mesh)
    restored = ckpt.restore_last(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    write_run_meta(run_dir, cfg)
    logger.begin(int(state.step))

    lw = tuple(cfg.train.loss_weight[:4])
    train_step = jit_train_step(model, loss_weight=lw)
    eval_step = jit_eval_step(model)
    # prepare_epochs (ref conf cluster.prepare_epochs): train semantic +
    # offset heads only (no clustering/ScoreNet) for the first N epochs
    prepare_epochs = int(cfg.cluster.get("prepare_epochs", -1) or -1)
    if prepare_epochs > 0:
        prep_train_step = jit_train_step(model, loss_weight=lw,
                                         do_clustering=False)
        prep_eval_step = jit_eval_step(model, do_clustering=False)
    rng = jax.random.key(cfg.general.manual_seed + 1)

    profile_at = int(cfg.get("log", {}).get("profile_step", 0) or 0) if hasattr(cfg.get("log", {}), "get") else 0

    # Device-batch caching: uploading ~80MB/batch over the tunneled TPU
    # dominates step time, so batches live in HBM.  With augmentation ON
    # the first ``tpu.augment_variants`` epochs are cached as independent
    # augmented copies (the loader is epoch-seeded) and later epochs cycle
    # them — the reference never trains unaugmented
    # (``lib/dataset/pipeline.py:679-697``), and a handful of resident
    # variants recovers most of that diversity without per-epoch uploads.
    cache_batches = bool(cfg.tpu.get("cache_batches", False))
    n_var = 1
    if cache_batches and train_it.augment:
        n_var = max(1, int(cfg.tpu.get("augment_variants", 2)))
    variant_epochs: list = []
    val_batches = []
    val_batches_done = False

    step = int(state.step)
    for epoch in range(cfg.train.epochs):
        t_epoch = time.time()
        in_prepare = prepare_epochs > 0 and epoch < prepare_epochs
        epoch_train_step = prep_train_step if in_prepare else train_step
        epoch_eval_step = prep_eval_step if in_prepare else eval_step
        caching_this_epoch = cache_batches and len(variant_epochs) < n_var
        if cache_batches and not caching_this_epoch:
            batches = variant_epochs[epoch % n_var]
        else:
            batches = train_it
            if caching_this_epoch:
                variant_epochs.append([])
        for item in batches:
            if isinstance(item, dict):
                batch = shard_batch(item, mesh)
                if caching_this_epoch:
                    variant_epochs[-1].append(batch)
            else:
                batch = item
            if profile_at and step == profile_at:
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
            t0 = time.time()
            state, metrics = epoch_train_step(state, batch, rng)
            step += 1
            if profile_at and step == profile_at + 3:
                jax.block_until_ready(metrics["total_loss"])
                jax.profiler.stop_trace()
                print(f"profile written to {run_dir}/profile")
            if step % cfg.train.log_every_n_steps == 0:
                metrics = jax.device_get(metrics)
                metrics["iter_time"] = time.time() - t0
                # silent-truncation telemetry (SURVEY §7 hard-part #3):
                # host cap counters since the last log line
                from d3net_tpu.data.collate import CAP_STATS

                for k, v in CAP_STATS.reset().items():
                    if k != "batches":
                        metrics[k] = v
                logger.log(step, metrics, "train")
                print(
                    f"epoch {epoch} step {step} "
                    + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items())
                )
            if max_steps and step >= max_steps:
                break

        # validation (device-cached like the train batches)
        check_every = int(cfg.train.get("check_val_every_n_epoch", 1) or 1)
        if (epoch + 1) % check_every != 0 and not (max_steps and step >= max_steps):
            print(f"epoch {epoch} took {time.time()-t_epoch:.1f}s (val skipped)")
            continue
        val_metrics: Dict[str, list] = {}
        if cache_batches and val_batches:
            val_iterable = val_batches
        else:
            val_iterable = val_it
        for item in val_iterable:
            if isinstance(item, dict):
                batch = shard_batch(item, mesh)
                if cache_batches and not val_batches_done:
                    val_batches.append(batch)
            else:
                batch = item
            _, losses = epoch_eval_step(state, batch)
            for k, v in jax.device_get(losses).items():
                val_metrics.setdefault(k, []).append(float(v))
        val_batches_done = bool(val_batches)
        agg = {k: float(np.mean(v)) for k, v in val_metrics.items()}
        logger.log(step, agg, "val")
        print(f"epoch {epoch} VAL " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
        ckpt.save(step, state, agg)

        print(f"epoch {epoch} took {time.time()-t_epoch:.1f}s")
        if max_steps and step >= max_steps:
            break
    return state


def run_detector_training_scan(cfg: Config, run_dir: str,
                               max_steps: Optional[int] = None):
    """Scan-based detector training: many optimizer steps per dispatch.

    Batches are stacked per epoch and a ``lax.scan`` runs
    ``tpu.steps_per_dispatch`` train steps inside a single XLA execution,
    cycling through the stacked batches. On the tunneled TPU (payload
    re-shipped per dispatch) this amortizes the I/O across the whole scan;
    on real hardware it simply minimizes dispatch overhead.  Augmentation
    is served by cycling ``tpu.augment_variants`` pre-built augmented
    epoch copies, one per dispatch (see comment below).
    """
    import functools

    from d3net_tpu.train.trainer import detector_train_step

    os.makedirs(run_dir, exist_ok=True)
    save_cfg(cfg, os.path.join(run_dir, "config.yaml"))
    logger = MetricLogger(run_dir)
    ckpt = Checkpointer(run_dir, cfg.general.monitor.replace("val_loss/", ""),
                        cfg.general.monitor_mode)

    spec = spec_from_cfg(cfg)
    model = detector_from_cfg(cfg)
    train_it, val_it = make_dataloaders(cfg, spec)
    mesh = make_mesh(batch_size=int(cfg.data.batch_size))

    # Device-batch caching vs augmentation (reference trains with the full
    # augmentation suite, ``lib/dataset/pipeline.py:679-697``): pre-build
    # ``tpu.augment_variants`` independently-augmented copies of the epoch
    # (epoch-seeded loader) and cycle one per dispatch.  Static shapes make
    # every variant share the one compiled program; with a single variant
    # it stays device-resident, otherwise variants are re-uploaded per
    # dispatch (the tunneled runtime re-ships the payload anyway).
    tr = cfg.data.transform
    aug_on = bool(tr.jitter or tr.flip or tr.rot)
    n_var = max(1, int(cfg.tpu.get("augment_variants", 4))) if aug_on else 1
    train_it.augment = aug_on
    # ALL augmented variants live in one device-resident stack and the scan
    # cycles through them (i % nb): re-uploading a variant per dispatch cost
    # ~GBs of tunnel I/O per dispatch at flagship scale (round-5 fix)
    batches = []
    for e in range(n_var):
        train_it.epoch = e
        batches.extend(list(train_it))
    nb = len(batches)
    stacked_np = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    if str(cfg.tpu.get("activation_dtype", "")) in ("bfloat16", "bf16"):
        # point_feats is the resident-memory whale (f32 (nb,B,cap,134) =
        # 2.2GB at flagship nb=8) and the model casts it to bf16 at the
        # voxelize step anyway; storing it bf16 halves that (the r5
        # flagship scan program OOMed HBM by 256MB without this)
        import ml_dtypes

        stacked_np["point_feats"] = stacked_np["point_feats"].astype(
            ml_dtypes.bfloat16)
    variants = [shard_batch(stacked_np, mesh)]
    n_var = 1

    tx = make_optimizer(
        lr=cfg.train.optim.lr, optim=cfg.train.optim.classname,
        weight_decay=cfg.train.optim.weight_decay,
        step_epoch=cfg.train.step_epoch, multiplier=cfg.train.multiplier,
        steps_per_epoch=nb,
    )
    first = jax.tree.map(lambda x: jnp.asarray(x[0]), variants[0])
    state = create_train_state(model, first, jax.random.key(cfg.general.manual_seed), tx)
    state = replicate(state, mesh)
    restored = ckpt.restore_last(state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)}")
    write_run_meta(run_dir, cfg)
    logger.begin(int(state.step))

    lw = tuple(cfg.train.loss_weight[:4])
    spd = int(cfg.tpu.get("steps_per_dispatch", 64))

    # donate the incoming state: without it two full train states (params +
    # Adam moments) coexist across the dispatch boundary — the r5 flagship
    # program fit HBM for dispatch 1 and OOMed on dispatch 2 exactly there
    @functools.partial(jax.jit, donate_argnums=(0,))
    def dispatch(state, stacked, rng):
        def body(st, i):
            batch = jax.tree.map(lambda x: x[i % nb], stacked)
            st, m = detector_train_step(
                model, st, batch, jax.random.fold_in(rng, i),
                loss_weight=lw,
            )
            keep = {k: m[k] for k in
                    ("total_loss", "semantic_loss", "offset_norm_loss",
                     "offset_dir_loss", "score_loss", "gt_iou_mean")}
            return st, keep
        return jax.lax.scan(body, state, jnp.arange(spd))

    eval_step = jit_eval_step(model)
    rng = jax.random.key(cfg.general.manual_seed + 1)
    step = int(state.step)
    total = max_steps or (cfg.train.epochs * nb)
    dispatch_i = 0
    val_batches: list = []
    while step < total:
        t0 = time.time()
        var = variants[dispatch_i % n_var]
        if n_var > 1:
            var = shard_batch(var, mesh)
        dispatch_i += 1
        state, metrics = dispatch(state, var, jax.random.fold_in(rng, step))
        metrics = jax.device_get(metrics)
        dt = time.time() - t0
        step += spd
        last = {k: float(v[-1]) for k, v in metrics.items()}
        last["steps_per_sec"] = spd / dt
        logger.log(step, last, "train")
        print(f"step {step} " + " ".join(f"{k}={v:.4f}" for k, v in last.items()))

        # quick val + checkpoint every dispatch (ONE device-resident val
        # batch: a fresh upload per dispatch churned ~0.5GB of HBM each
        # time and nudged the flagship program past capacity)
        if not val_batches:
            val_batches.append(shard_batch(next(iter(val_it)), mesh))
        val_metrics: Dict[str, list] = {}
        _, losses = eval_step(state, val_batches[0])
        for k, v in jax.device_get(losses).items():
            val_metrics.setdefault(k, []).append(float(v))
        agg = {k: float(np.mean(v)) for k, v in val_metrics.items()}
        logger.log(step, agg, "val")
        print(f"step {step} VAL " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
        ckpt.save(step, state, agg)
    return state
