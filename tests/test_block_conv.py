"""Block-dense conv (ops/block_conv.py) vs gather-matmul conv oracles.

The two implementations must agree exactly (same weights, same voxel set):
submanifold conv's sum over occupied neighbors == dense conv over blocks
whose empty cells hold zeros, masked back to occupancy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3net_tpu.ops import block_conv as bc
from d3net_tpu.ops.sparse_conv import sparse_conv
from d3net_tpu.ops.voxelize import (
    build_block_maps,
    build_unet_maps,
    downsample_level,
)

jax.config.update("jax_default_matmul_precision", "highest")


def _scene(seed=0, m=300, extent=24):
    rng = np.random.default_rng(seed)
    pts = rng.integers(0, extent, (m * 2, 3))
    coords = np.unique(pts, axis=0).astype(np.int32)[:m]
    return coords, rng


CAPS = [512, 384]
NB_CAPS = [128, 64]


def _setup(seed=0, cin=5, cmid=7):
    coords, rng = _scene(seed)
    m = len(coords)
    levels_g = build_unet_maps(coords, CAPS)
    _, blocks = build_block_maps(coords, CAPS, NB_CAPS)
    feats = np.zeros((CAPS[0], cin), np.float32)
    feats[:m] = rng.normal(size=(m, cin))
    w27 = rng.normal(size=(27, cin, cmid)).astype(np.float32) * 0.3
    valid = np.zeros(CAPS[0], bool)
    valid[:m] = True
    return coords, m, levels_g, blocks, feats, w27, valid, rng


def test_subm_conv_matches_gather():
    coords, m, levels_g, blocks, feats, w27, valid, _ = _setup()
    ref = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].nbr),
                    jnp.asarray(w27))
    )
    b0 = blocks[0]
    dense = bc.rows_to_blocks(jnp.asarray(feats), jnp.asarray(b0.vox2cell),
                              jnp.asarray(valid), NB_CAPS[0])
    occ = bc.block_occupancy(jnp.asarray(b0.vox2cell), jnp.asarray(valid),
                             NB_CAPS[0])
    out = bc.subm_conv(dense, occ, jnp.asarray(b0.block_nbr),
                       jnp.asarray(w27))
    got = np.asarray(bc.blocks_to_rows(out, jnp.asarray(b0.vox2cell)))
    np.testing.assert_allclose(got[:m], ref[:m], atol=2e-5)
    assert (got[m:] == 0).all()


def test_down_and_up_conv_match_gather():
    coords, m, levels_g, blocks, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    w8 = rng.normal(size=(8, cin, 6)).astype(np.float32) * 0.3
    coarse, _ = downsample_level(coords)
    mc = len(coarse)

    # down: gather table semantics (coarse rows, fine inputs)
    ref_dn = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].down),
                    jnp.asarray(w8))
    )
    b0, b1 = blocks[0], blocks[1]
    dense_f = bc.rows_to_blocks(jnp.asarray(feats), jnp.asarray(b0.vox2cell),
                                jnp.asarray(valid), NB_CAPS[0])
    valid_c = np.zeros(CAPS[1], bool)
    valid_c[:mc] = True
    occ_c = bc.block_occupancy(jnp.asarray(b1.vox2cell), jnp.asarray(valid_c),
                               NB_CAPS[1])
    out_c = bc.down_conv(dense_f, jnp.asarray(b0.block_child), occ_c,
                         jnp.asarray(w8))
    got_dn = np.asarray(bc.blocks_to_rows(out_c, jnp.asarray(b1.vox2cell)))
    np.testing.assert_allclose(got_dn[:mc], ref_dn[:mc], atol=2e-5)

    # up: transposed table semantics (fine rows, coarse inputs)
    cfeats = np.zeros((CAPS[1], cin), np.float32)
    cfeats[:mc] = rng.normal(size=(mc, cin))
    ref_up = np.asarray(
        sparse_conv(jnp.asarray(cfeats), jnp.asarray(levels_g[0].up),
                    jnp.asarray(w8))
    )
    dense_c = bc.rows_to_blocks(jnp.asarray(cfeats), jnp.asarray(b1.vox2cell),
                                jnp.asarray(valid_c), NB_CAPS[1])
    occ_f = bc.block_occupancy(jnp.asarray(b0.vox2cell), jnp.asarray(valid),
                               NB_CAPS[0])
    out_f = bc.up_conv(dense_c, jnp.asarray(b0.block_parent),
                       jnp.asarray(b0.block_quad), occ_f, jnp.asarray(w8))
    got_up = np.asarray(bc.blocks_to_rows(out_f, jnp.asarray(b0.vox2cell)))
    np.testing.assert_allclose(got_up[:m], ref_up[:m], atol=2e-5)


@pytest.mark.slow
def test_unet_block_mode_matches_gather_mode():
    """Full UBlock: identical params, both table kinds, equal row outputs."""
    from d3net_tpu.models.blocks import UBlock

    coords, m, levels_g, blocks, feats, _, valid, rng = _setup(cin=6)
    coarse, _ = downsample_level(coords)
    mc = len(coarse)

    def stack1(a):
        return a[None]

    mask0 = valid.astype(np.float32)
    mask1 = np.zeros(CAPS[1], np.float32)
    mask1[:mc] = 1.0
    tg = [
        {"nbr": stack1(levels_g[0].nbr), "mask": stack1(mask0),
         "down": stack1(levels_g[0].down), "up": stack1(levels_g[0].up)},
        {"nbr": stack1(levels_g[1].nbr), "mask": stack1(mask1)},
    ]
    b0, b1 = blocks[0], blocks[1]
    tb = [
        {"vox2cell": stack1(b0.vox2cell), "block_nbr": stack1(b0.block_nbr),
         "mask": stack1(mask0), "block_child": stack1(b0.block_child),
         "block_parent": stack1(b0.block_parent),
         "block_quad": stack1(b0.block_quad)},
        {"vox2cell": stack1(b1.vox2cell), "block_nbr": stack1(b1.block_nbr),
         "mask": stack1(mask1)},
    ]
    tg = jax.tree.map(jnp.asarray, tg)
    tb = jax.tree.map(jnp.asarray, tb)

    net = UBlock(planes=(6, 8), block_reps=1, remat=False)
    x_rows = jnp.asarray(feats)[None]
    vs = net.init(jax.random.key(0), x_rows, tg, False)
    ref = np.asarray(net.apply(vs, x_rows, tg, False))[0]

    # block mode carries row-space activations end to end
    got = np.asarray(net.apply(vs, x_rows, tb, False))[0]
    np.testing.assert_allclose(got[:m], ref[:m], atol=3e-5)


def test_subm_conv_rows_grads_match_gather():
    """Custom VJP vs autodiff through the gather conv: dx and dw agree."""
    coords, m, levels_g, blocks, feats, w27, valid, _ = _setup()
    b0 = blocks[0]
    validf = valid.astype(np.float32)
    cot = np.random.default_rng(1).normal(
        size=(CAPS[0], w27.shape[-1])).astype(np.float32)
    cot[~valid] = 0.0  # pad rows carry no cotangent in real use

    def loss_gather(f, w):
        out = sparse_conv(f, jnp.asarray(levels_g[0].nbr), w)
        return (out * cot).sum()

    def loss_block(f, w):
        out = bc.subm_conv_rows(f, w, jnp.asarray(b0.vox2cell),
                                jnp.asarray(validf),
                                jnp.asarray(b0.block_nbr))
        return (out * cot).sum()

    gx_ref, gw_ref = jax.grad(loss_gather, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    gx, gw = jax.grad(loss_block, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


@pytest.mark.slow
def test_down_up_conv_rows_grads_match_gather():
    coords, m, levels_g, blocks, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    cout = 6
    w8 = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    b0, b1 = blocks[0], blocks[1]
    validf = valid.astype(np.float32)
    valid_c = np.zeros(CAPS[1], np.float32)
    valid_c[:mc] = 1.0
    tab = (jnp.asarray(b0.vox2cell), jnp.asarray(validf),
           jnp.asarray(b0.block_child), jnp.asarray(b0.block_parent),
           jnp.asarray(b0.block_quad), jnp.asarray(b1.vox2cell),
           jnp.asarray(valid_c))

    # down
    cot_c = rng.normal(size=(CAPS[1], cout)).astype(np.float32)
    cot_c[valid_c == 0] = 0.0

    def loss_g_dn(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].down), w)
                * cot_c).sum()

    def loss_b_dn(f, w):
        return (bc.down_conv_rows(f, w, *tab) * cot_c).sum()

    gx_ref, gw_ref = jax.grad(loss_g_dn, (0, 1))(jnp.asarray(feats),
                                                 jnp.asarray(w8))
    gx, gw = jax.grad(loss_b_dn, (0, 1))(jnp.asarray(feats), jnp.asarray(w8))
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)

    # up
    cfeats = np.zeros((CAPS[1], cin), np.float32)
    cfeats[:mc] = rng.normal(size=(mc, cin))
    cot_f = rng.normal(size=(CAPS[0], cout)).astype(np.float32)
    cot_f[~valid] = 0.0
    tab_up = (jnp.asarray(b1.vox2cell), jnp.asarray(valid_c),
              jnp.asarray(b0.block_child), jnp.asarray(b0.block_parent),
              jnp.asarray(b0.block_quad), jnp.asarray(b0.vox2cell),
              jnp.asarray(validf))

    def loss_g_up(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].up), w) * cot_f).sum()

    def loss_b_up(f, w):
        return (bc.up_conv_rows(f, w, *tab_up) * cot_f).sum()

    gx_ref, gw_ref = jax.grad(loss_g_up, (0, 1))(jnp.asarray(cfeats),
                                                 jnp.asarray(w8))
    gx, gw = jax.grad(loss_b_up, (0, 1))(jnp.asarray(cfeats),
                                         jnp.asarray(w8))
    np.testing.assert_allclose(np.asarray(gx)[:mc], np.asarray(gx_ref)[:mc],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


@pytest.mark.slow
def test_subm_conv_rows_wide_cin_chunks():
    """Input-channel chunking (cin > _CCHUNK) stays exact, fwd and grads."""
    coords, m, levels_g, blocks, _, _, valid, rng = _setup()
    cin = bc._CCHUNK + 9
    feats = np.zeros((CAPS[0], cin), np.float32)
    feats[:m] = rng.normal(size=(m, cin))
    w = rng.normal(size=(27, cin, 4)).astype(np.float32) * 0.1
    b0 = blocks[0]
    validf = valid.astype(np.float32)
    cot = rng.normal(size=(CAPS[0], 4)).astype(np.float32)
    cot[~valid] = 0.0

    def loss_gather(f, w_):
        return (sparse_conv(f, jnp.asarray(levels_g[0].nbr), w_) * cot).sum()

    def loss_block(f, w_):
        return (bc.subm_conv_rows(f, w_, jnp.asarray(b0.vox2cell),
                                  jnp.asarray(validf),
                                  jnp.asarray(b0.block_nbr)) * cot).sum()

    (v_ref, (gx_ref, gw_ref)) = jax.value_and_grad(loss_gather, (0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    (v, (gx, gw)) = jax.value_and_grad(loss_block, (0, 1))(
        jnp.asarray(feats), jnp.asarray(w))
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=5e-4)


@pytest.mark.slow
def test_unet_train_grads_block_vs_gather():
    """Full UBlock under jax.grad: block-mode custom VJPs match gather AD."""
    from d3net_tpu.models.blocks import UBlock

    coords, m, levels_g, blocks, feats, _, valid, rng = _setup(cin=6)
    coarse, _ = downsample_level(coords)
    mc = len(coarse)

    def stack1(a):
        return a[None]

    mask0 = valid.astype(np.float32)
    mask1 = np.zeros(CAPS[1], np.float32)
    mask1[:mc] = 1.0
    tg = [
        {"nbr": stack1(levels_g[0].nbr), "mask": stack1(mask0),
         "down": stack1(levels_g[0].down), "up": stack1(levels_g[0].up)},
        {"nbr": stack1(levels_g[1].nbr), "mask": stack1(mask1)},
    ]
    b0, b1 = blocks[0], blocks[1]
    tb = [
        {"vox2cell": stack1(b0.vox2cell), "block_nbr": stack1(b0.block_nbr),
         "mask": stack1(mask0), "block_child": stack1(b0.block_child),
         "block_parent": stack1(b0.block_parent),
         "block_quad": stack1(b0.block_quad)},
        {"vox2cell": stack1(b1.vox2cell), "block_nbr": stack1(b1.block_nbr),
         "mask": stack1(mask1)},
    ]
    tg = jax.tree.map(jnp.asarray, tg)
    tb = jax.tree.map(jnp.asarray, tb)

    net = UBlock(planes=(6, 8), block_reps=1, remat=False)
    x_rows = jnp.asarray(feats)[None]
    vs = net.init(jax.random.key(0), x_rows, tg, False)
    cot = rng.normal(size=(CAPS[0], 6)).astype(np.float32)
    cot[~valid] = 0.0

    def loss(params, tables):
        out = net.apply({"params": params}, x_rows, tables, True,
                        mutable=["batch_stats"])[0]
        return (out[0] * cot).sum()

    g_ref = jax.grad(loss)(vs["params"], tg)
    g_blk = jax.grad(loss)(vs["params"], tb)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_blk = dict(jax.tree_util.tree_leaves_with_path(g_blk))
    assert len(flat_ref) == len(flat_blk)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_blk[path]), np.asarray(leaf), atol=2e-3,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_detector_end_to_end_block_vs_gather():
    """Full PointGroup forward agrees across conv_impl with shared params."""
    from d3net_tpu.data.collate import BatchSpec, build_batch
    from d3net_tpu.data.synthetic import make_scene
    from d3net_tpu.models.pointgroup import PointGroup

    scenes = [
        make_scene(seed=i, num_instances=3, density=3000.0,
                   size_range=(0.25, 0.5), floor_points=1000, room=4.0)
        for i in range(2)
    ]
    kw = dict(max_points=3072, voxel_caps=[3072, 1536, 768], max_instances=8,
              use_multiview=False, use_normal=True)
    bg = build_batch(scenes, BatchSpec(**kw))
    bb = build_batch(scenes, BatchSpec(conv_impl="block", **kw))
    bg = jax.tree.map(jnp.asarray, bg)
    bb = jax.tree.map(jnp.asarray, bb)
    model = PointGroup(
        m=8, blocks=(1, 2, 3), cluster_blocks=(1, 2), clusters_per_pass=16,
        max_num_proposal=8, cluster_npoint_thre=30, test_npoint_thresh=30,
        test_score_thresh=0.0, cluster_ring=1, cluster_cell_size=0.03,
        cluster_prop_iters=4,
    )
    vs = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(bg)
    out_g = jax.jit(lambda v, b: model.apply(v, b, train=False))(vs, bg)
    out_b = jax.jit(lambda v, b: model.apply(v, b, train=False))(vs, bb)
    np.testing.assert_allclose(
        np.asarray(out_b["semantic_scores"]), np.asarray(out_g["semantic_scores"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_b["pt_offsets"]), np.asarray(out_g["pt_offsets"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_b["proposal_scores_all"]),
        np.asarray(out_g["proposal_scores_all"]), atol=1e-3,
    )
