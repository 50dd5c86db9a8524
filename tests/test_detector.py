import numpy as np
import jax
import jax.numpy as jnp
import pytest

from d3net_tpu.data.collate import BatchSpec, build_batch
from d3net_tpu.data.synthetic import make_scene
from d3net_tpu.models.pointgroup import PointGroup
from d3net_tpu.train.losses import (
    cross_entropy_ignore,
    detector_loss,
    get_segmented_scores,
    point_set_iou,
)


def small_setup(b=2, train=False):
    scenes = [
        make_scene(seed=i, num_instances=3, density=3000.0, size_range=(0.25, 0.5), floor_points=1000, room=4.0)
        for i in range(b)
    ]
    spec = BatchSpec(
        max_points=3072,
        voxel_caps=[3072, 1536, 768],
        max_instances=8,
        use_multiview=False,
        use_normal=True,
    )
    batch = build_batch(scenes, spec)
    batch = {k: (jax.tree.map(jnp.asarray, v) if k == "tables" else jnp.asarray(v)) for k, v in batch.items()}
    model = PointGroup(
        m=8,
        blocks=(1, 2, 3),
        cluster_blocks=(1, 2),
        clusters_per_pass=16,
        max_num_proposal=8,
        cluster_npoint_thre=30,
        test_npoint_thresh=30,
        test_score_thresh=0.0,
        cluster_ring=1,
        cluster_cell_size=0.03,
        cluster_prop_iters=4,
    )
    rngs = {"params": jax.random.key(0)}
    if train:
        rngs.update(
            cluster_jitter=jax.random.key(1), proposal_shuffle=jax.random.key(2)
        )
    variables = jax.jit(lambda r, b: model.init(r, b, train=train))(rngs, batch)
    return model, variables, batch, scenes


@pytest.fixture(scope="module")
def setup_eval():
    return small_setup(train=False)


def test_forward_shapes_and_masks(setup_eval):
    model, variables, batch, scenes = setup_eval
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    b, n = batch["point_mask"].shape
    assert out["semantic_scores"].shape == (b, n, 20)
    assert out["pt_offsets"].shape == (b, n, 3)
    assert bool(jnp.isfinite(out["semantic_scores"]).all())
    p = 2 * model.clusters_per_pass
    assert out["member_pt"].shape == (b, 2, n)
    assert out["proposal_scores_all"].shape == (b, p)
    k = model.max_num_proposal
    assert out["proposal_feats_batched"].shape == (b, k, model.m)
    assert out["proposal_bbox_batched"].shape == (b, k, 8, 3)
    assert out["object_assignment"].shape == (b, k)
    # members only on valid points
    member = np.asarray(out["member_pt"])
    pm = np.asarray(batch["point_mask"])
    assert (member[:, :, ~pm[0]][0] == -1).all()
    # proposal mask implies finite boxes
    mask = np.asarray(out["proposal_batch_mask"]) > 0
    sizes = np.asarray(out["proposal_size_batched"])
    assert (sizes[mask] >= 0).all()


def test_untrained_clusters_follow_gt_when_sem_given(setup_eval):
    # sanity: clustering machinery itself separates GT instances when fed
    # ground-truth semantics via the loss-side IoU matrix
    model, variables, batch, scenes = setup_eval
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    p = 2 * model.clusters_per_pass
    iou = point_set_iou(
        out["member_pt"][0],
        batch["instance_ids"][0],
        batch["point_mask"][0],
        p,
        batch["instance_num_point"].shape[1],
        batch["instance_num_point"][0],
    )
    assert iou.shape == (p, 8)
    assert bool(jnp.isfinite(iou).all())
    assert float(iou.max()) <= 1.0 + 1e-5


def test_detector_loss_finite(setup_eval):
    model, variables, batch, _ = setup_eval
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    losses = detector_loss(out, batch)
    for k, v in losses.items():
        assert bool(jnp.isfinite(v)), k
    assert float(losses["semantic_loss"]) > 0
    # untrained semantic CE should be near log(20)
    assert abs(float(losses["semantic_loss"]) - np.log(20)) < 1.5


@pytest.mark.slow
def test_train_mode_with_rngs():
    model, variables, batch, _ = small_setup(train=True)
    out, new_state = jax.jit(
        lambda v, b: model.apply(
            v, b, train=True,
            rngs={"cluster_jitter": jax.random.key(3), "proposal_shuffle": jax.random.key(4)},
            mutable=["batch_stats"],
        )
    )(variables, batch)
    assert "batch_stats" in new_state
    losses = detector_loss(out, batch)
    assert bool(jnp.isfinite(losses["total_loss"]))


@pytest.mark.slow
def test_gradients_flow():
    model, variables, batch, _ = small_setup(train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=True,
            rngs={"cluster_jitter": jax.random.key(3), "proposal_shuffle": jax.random.key(4)},
            mutable=["batch_stats"],
        )
        return detector_loss(out, batch)["total_loss"]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0


def test_segmented_scores_golden():
    x = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0, 0.1, 0.9])
    got = np.asarray(get_segmented_scores(x, 0.75, 0.25))
    want = np.asarray([0.0, 0.0, 0.5, 0.5 * 2 - 0.5, 1.0, 0.0, 1.0])
    # linear: k=2, b=-0.5 -> 0.5->0.5, 0.75->1.0 boundary (not > fg)
    np.testing.assert_allclose(got, [0.0, 0.0, 0.5, 1.0, 1.0, 0.0, 1.0], atol=1e-6)


def test_cross_entropy_ignore():
    logits = jnp.asarray([[[10.0, 0.0], [0.0, 10.0], [5.0, 5.0]]])
    labels = jnp.asarray([[0, 1, -1]])
    mask = jnp.ones((1, 3), bool)
    ce = float(cross_entropy_ignore(logits, labels, -1, mask))
    assert ce < 1e-3  # both valid labels perfectly predicted, ignore skipped


def test_grid_conv_gradients_match_autodiff():
    """Flat grid-conv transpose-table backward == naive autodiff."""
    import jax
    from d3net_tpu.models.scorenet import GridConv, flat_grid_tables
    from d3net_tpu.ops.sparse_conv import sparse_conv

    g, p, cin, cout = 4, 3, 5, 6
    tables = flat_grid_tables(g, p)
    nbr = jnp.asarray(tables["nbr"])
    nbr_t = jnp.asarray(tables["nbr_t"])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(p, g**3, cin)).astype(np.float32))
    mod = GridConv(cout)
    vs = mod.init(jax.random.key(0), x, nbr, nbr_t)
    w = vs["params"]["kernel"]
    cot = jnp.asarray(rng.normal(size=(p, g**3, cout)).astype(np.float32))

    def loss_tables(x, w):
        return (mod.apply({"params": {"kernel": w}}, x, nbr, nbr_t) * cot).sum()

    def loss_naive(x, w):
        # unflattened per-grid naive conv
        from d3net_tpu.models.scorenet import grid_tables

        base, _, _ = grid_tables(g)
        outs = [sparse_conv(x[i], jnp.asarray(base), w) for i in range(p)]
        return (jnp.stack(outs) * cot).sum()

    gx_t, gw_t = jax.grad(loss_tables, argnums=(0, 1))(x, w)
    gx_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_n), atol=1e-4)


@pytest.mark.slow
def test_dense_scorenet_masks_empty_cells_and_handles_odd_grids():
    """Dense conv3d ScoreNet: submanifold masking + odd-extent down path."""
    import jax

    from d3net_tpu.models.scorenet import ScoreNet

    rng = np.random.default_rng(0)
    for g in (7, 14):  # odd grid exercises the ghost-cell pad path
        p, c = 4, 6
        grids = jnp.asarray(rng.normal(size=(p, g, g, g, c)).astype(np.float32))
        occ = jnp.asarray((rng.random((p, g, g, g)) < 0.3).astype(np.float32))
        grids = grids * occ[..., None]
        sn = ScoreNet(planes=(8, 16), block_reps=1)
        vs = sn.init({"params": jax.random.key(0)}, grids, occ, False)
        scores, pooled = sn.apply(vs, grids, occ, False)
        assert scores.shape == (p,) and pooled.shape == (p, 8)
        assert np.isfinite(np.asarray(scores)).all()
        assert np.isfinite(np.asarray(pooled)).all()
        # gradients flow and are finite
        gr = jax.grad(lambda v: sn.apply(v, grids, occ, False)[0].sum())(vs)
        flat = jax.tree_util.tree_leaves(gr)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_dense_scorenet_empty_occupancy_is_benign():
    """All-empty grids produce zero pooled feats and finite scores."""
    import jax

    from d3net_tpu.models.scorenet import ScoreNet

    p, g, c = 2, 6, 5
    grids = jnp.zeros((p, g, g, g, c))
    occ = jnp.zeros((p, g, g, g))
    sn = ScoreNet(planes=(8, 16), block_reps=1)
    vs = sn.init({"params": jax.random.key(0)}, grids, occ, False)
    scores, pooled = sn.apply(vs, grids, occ, False)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(pooled) == 0).all()
