"""Checkpointer best-pinning semantics (parity: Lightning ModelCheckpoint
keeps the best model.ckpt + last.ckpt, reference scripts/train.py:252-262).

The rotating last-N manager must never garbage-collect the best step; the
pinned best survives arbitrarily many worse epochs and a process restart.
"""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from d3net_tpu.train.loop import Checkpointer
from d3net_tpu.train.trainer import TrainState


def _state(value: float) -> TrainState:
    tx = optax.sgd(1e-3)
    params = {"w": jnp.full((4,), value, jnp.float32)}
    return TrainState(
        step=jnp.asarray(int(value * 10), jnp.int32),
        params=params,
        batch_stats={},
        opt_state=tx.init(params),
        tx=tx,
    )


def test_best_survives_rotation(tmp_path):
    run = str(tmp_path / "run")
    ck = Checkpointer(run, monitor="total_loss", mode="min")
    # best arrives early (step 10, loss 1.0), then 5 worse epochs rotate
    # the last-3 window far past it
    ck.save(10, _state(1.0), {"total_loss": 1.0})
    for i, loss in enumerate([3.0, 2.5, 2.4, 2.2, 2.1]):
        ck.save(20 + i * 10, _state(loss), {"total_loss": loss})
    assert ck.best_step == 10 and ck.best == 1.0
    assert ck.mgr.latest_step() == 60
    assert 10 not in ck.mgr.all_steps()  # rotated away from last-N...
    assert ck.best_mgr.latest_step() == 10  # ...but pinned as best

    restored = ck.restore_best(_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)
    last = ck.restore_last(_state(0.0))
    np.testing.assert_allclose(np.asarray(last.params["w"]), 2.1)

    # best value survives a restart (best.json)
    ck2 = Checkpointer(run, monitor="total_loss", mode="min")
    assert ck2.best == 1.0 and ck2.best_step == 10
    ck2.save(70, _state(1.5), {"total_loss": 1.5})
    assert ck2.best_mgr.latest_step() == 10  # 1.5 is not an improvement


def test_best_mode_max(tmp_path):
    ck = Checkpointer(str(tmp_path / "r"), monitor="cider", mode="max")
    ck.save(1, _state(0.2), {"cider": 0.2})
    ck.save(2, _state(0.5), {"cider": 0.5})
    ck.save(3, _state(0.3), {"cider": 0.3})
    assert ck.best_step == 2 and ck.best == 0.5
    assert ck.best_mgr.latest_step() == 2
