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
    spec = spec_from_cfg(cfg)
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
    restored = ckpt.restore_last(state)
    if restored is None:
        print("WARNING: no checkpoint found, evaluating random weights")
    else:
        state = restored
    return model, state, val_it, vocab, emb, chunk, mesh


def eval_captioning_cli(cfg, run_dir) -> Dict[str, float]:
    from d3net_tpu.train.pipeline_loop import run_pipeline_validation

    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, run_dir)
    metrics = run_pipeline_validation(
        cfg, model, state, val_it, vocab, emb, chunk, mesh, mode=1
    )
    print(json.dumps(metrics, indent=2))
    with open(os.path.join(run_dir, "eval_captioning.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def eval_grounding_cli(cfg, run_dir) -> Dict[str, float]:
    from d3net_tpu.train.pipeline_loop import run_pipeline_validation

    model, state, val_it, vocab, emb, chunk, mesh = _setup(cfg, run_dir)
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
        json.dump(metrics, f)
    return metrics
