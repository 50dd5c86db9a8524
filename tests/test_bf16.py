"""bf16 activation policy: flagship memory lever (params/losses stay f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3net_tpu.data.collate import BatchSpec, build_batch
from d3net_tpu.data.synthetic import make_scene
from d3net_tpu.models.pointgroup import PointGroup
from d3net_tpu.train.trainer import (
    create_train_state, detector_train_step, make_optimizer,
)

pytestmark = pytest.mark.slow  # compile-heavy (r4 VERDICT #9)


def _batch():
    scenes = [make_scene(seed=i, num_instances=4, points_per_instance=500,
                         floor_points=1200) for i in range(2)]
    spec = BatchSpec(max_points=4096, voxel_caps=[4096, 2048],
                     max_instances=8, use_multiview=False, num_levels=2)
    return jax.tree.map(jnp.asarray, build_batch(scenes, spec))


KW = dict(m=8, blocks=(1, 2), cluster_blocks=(1, 2), clusters_per_pass=16,
          max_num_proposal=16, cluster_npoint_thre=10, test_npoint_thresh=10)


def test_bf16_forward_close_to_f32():
    batch = _batch()
    mf = PointGroup(**KW)
    mb = PointGroup(compute_dtype="bfloat16", **KW)
    vf = mf.init({"params": jax.random.key(0)}, batch, train=False)
    out_f = mf.apply(vf, batch, train=False)
    out_b = mb.apply(vf, batch, train=False)  # same params, bf16 compute
    # losses/heads stay f32
    assert out_b["semantic_scores"].dtype == jnp.float32
    assert out_b["pt_offsets"].dtype == jnp.float32
    assert out_b["proposal_scores_all"].dtype == jnp.float32
    assert out_b["proposal_feats_batched"].dtype == jnp.float32
    # semantic predictions mostly agree between precisions
    pf = np.asarray(jnp.argmax(out_f["semantic_scores"], -1))
    pb = np.asarray(jnp.argmax(out_b["semantic_scores"], -1))
    mask = np.asarray(batch["point_mask"])
    agree = (pf == pb)[mask > 0].mean()
    assert agree > 0.95, agree


def test_bf16_train_step_finite_and_learns():
    batch = _batch()
    model = PointGroup(compute_dtype="bfloat16", **KW)
    state = create_train_state(model, batch, jax.random.key(0),
                               make_optimizer(lr=1e-3))
    # params remain f32 under the bf16 compute path
    dtypes = {x.dtype for x in jax.tree.leaves(state.params)}
    assert dtypes == {jnp.float32.dtype}
    losses = []
    for i in range(3):
        state, m = detector_train_step(model, state, batch, jax.random.key(i))
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
