"""Train state, optimizer, and jitted train/eval steps for the detector.

Parity targets: ``PipelineNet.configure_optimizers`` (AdamW + StepLR) and
``training_step`` mode 0 (``model/pipeline.py:134-150``).  The step is one
jit: voxel scatter -> sparse U-Net -> heads -> clustering -> ScoreNet ->
losses -> grads -> optax update; under a dp-sharded batch GSPMD inserts the
gradient all-reduce (NCCL all-reduce parity) automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from d3net_tpu.train.losses import detector_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def make_optimizer(
    lr: float = 0.002,
    optim: str = "AdamW",
    weight_decay: float = 0.0001,
    momentum: float = 0.9,
    step_epoch: int = 480,
    multiplier: float = 0.5,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    """AdamW/Adam/SGD with the reference's StepLR(step_epoch, multiplier)."""
    sched = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(1, step_epoch * steps_per_epoch),
        decay_rate=multiplier,
        staircase=True,
    )
    if optim == "AdamW":
        return optax.adamw(sched, weight_decay=weight_decay)
    if optim == "Adam":
        return optax.adam(sched)
    if optim == "SGD":
        return optax.sgd(sched, momentum=momentum)
    raise ValueError(f"unknown optimizer {optim}")


def create_train_state(model, batch, rng, tx) -> TrainState:
    init = jax.jit(
        lambda r, b: model.init(
            {"params": r, "cluster_jitter": r, "proposal_shuffle": r},
            b,
            train=True,
        )
    )
    variables = init(rng, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def detector_train_step(
    model,
    state: TrainState,
    batch: Dict,
    rng,
    *,
    loss_weight=(1.0, 1.0, 1.0, 1.0),
    do_clustering: bool = True,
    mean_size_arr=None,
) -> Tuple[TrainState, Dict]:
    """One optimization step. Wrap with jax.jit(static 'model', donate state)."""
    r1, r2 = jax.random.split(jax.random.fold_in(rng, state.step))

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            train=True,
            do_clustering=do_clustering,
            rngs={"cluster_jitter": r1, "proposal_shuffle": r2},
            mutable=["batch_stats"],
        )
        losses = detector_loss(
            out, batch, loss_weight=loss_weight, with_score=do_clustering,
            mean_size_arr=mean_size_arr,
        )
        return losses["total_loss"], (losses, mutated["batch_stats"])

    (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_bs)
    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def detector_eval_step(model, state: TrainState, batch: Dict,
                       do_clustering: bool = True) -> Tuple[Dict, Dict]:
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch,
        train=False,
        do_clustering=do_clustering,
    )
    losses = detector_loss(out, batch, with_score=do_clustering)
    return out, losses


def jit_train_step(model, **kw):
    return jax.jit(
        functools.partial(detector_train_step, model, **kw), donate_argnums=(0,)
    )


def jit_eval_step(model, **kw):
    return jax.jit(functools.partial(detector_eval_step, model, **kw))
