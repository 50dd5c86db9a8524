"""Z-column conv (ops/column_conv.py) vs gather-matmul conv oracles.

Same contract as tests/test_block_conv.py: identical weights + voxel set
must produce identical outputs and gradients across conv implementations
(the column path folds z into lanes and handles z taps via the shared
band matrices — block_conv._band_w2_*).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3net_tpu.ops import column_conv as cc
from d3net_tpu.ops.sparse_conv import sparse_conv
from d3net_tpu.ops.voxelize import (
    build_column_maps,
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
C_CAPS = [1024, 512]


def _setup(seed=0, cin=5, cmid=7):
    coords, rng = _scene(seed)
    m = len(coords)
    levels_g = build_unet_maps(coords, CAPS)
    _, cols = build_column_maps(coords, CAPS, C_CAPS)
    assert all(c.overflow_voxels == 0 for c in cols), "raise C_CAPS"
    assert all(c.dropped_phantoms == 0 for c in cols), "raise C_CAPS"
    feats = np.zeros((CAPS[0], cin), np.float32)
    feats[:m] = rng.normal(size=(m, cin))
    w27 = rng.normal(size=(27, cin, cmid)).astype(np.float32) * 0.3
    valid = np.zeros(CAPS[0], bool)
    valid[:m] = True
    return coords, m, levels_g, cols, feats, w27, valid, rng


def test_subm_col_rows_matches_gather():
    coords, m, levels_g, cols, feats, w27, valid, _ = _setup()
    ref = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].nbr),
                    jnp.asarray(w27))
    )
    c0 = cols[0]
    got = np.asarray(cc.subm_col_rows(
        jnp.asarray(feats), jnp.asarray(w27), jnp.asarray(c0.vox2col),
        jnp.asarray(valid.astype(np.float32)), jnp.asarray(c0.col_nbr),
        jnp.asarray(c0.col_zm), jnp.asarray(c0.col_zp),
    ))
    np.testing.assert_allclose(got[:m], ref[:m], atol=2e-5)
    assert (got[m:] == 0).all()


def test_down_and_up_col_rows_match_gather():
    coords, m, levels_g, cols, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    cout = 6
    w8 = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    c0, c1 = cols[0], cols[1]
    validf = valid.astype(np.float32)
    valid_c = np.zeros(CAPS[1], np.float32)
    valid_c[:mc] = 1.0

    ref_dn = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].down),
                    jnp.asarray(w8))
    )
    got_dn = np.asarray(cc.down_col_rows(
        jnp.asarray(feats), jnp.asarray(w8), jnp.asarray(c0.vox2col),
        jnp.asarray(validf), jnp.asarray(c0.col_child),
        jnp.asarray(c0.col_parent), jnp.asarray(c0.col_quad),
        jnp.asarray(c1.vox2col), jnp.asarray(valid_c),
    ))
    np.testing.assert_allclose(got_dn[:mc], ref_dn[:mc], atol=2e-5)
    assert (got_dn[mc:] == 0).all()

    cfeats = np.zeros((CAPS[1], cin), np.float32)
    cfeats[:mc] = rng.normal(size=(mc, cin))
    ref_up = np.asarray(
        sparse_conv(jnp.asarray(cfeats), jnp.asarray(levels_g[0].up),
                    jnp.asarray(w8))
    )
    got_up = np.asarray(cc.up_col_rows(
        jnp.asarray(cfeats), jnp.asarray(w8), jnp.asarray(c1.vox2col),
        jnp.asarray(valid_c), jnp.asarray(c0.col_child),
        jnp.asarray(c0.col_parent), jnp.asarray(c0.col_quad),
        jnp.asarray(c0.vox2col), jnp.asarray(validf),
    ))
    np.testing.assert_allclose(got_up[:m], ref_up[:m], atol=2e-5)
    assert (got_up[m:] == 0).all()


def test_subm_col_rows_grads_match_gather():
    """Custom VJP vs autodiff through the gather conv: dx and dw agree."""
    coords, m, levels_g, cols, feats, w27, valid, _ = _setup()
    c0 = cols[0]
    validf = valid.astype(np.float32)
    cot = np.random.default_rng(1).normal(
        size=(CAPS[0], w27.shape[-1])).astype(np.float32)
    cot[~valid] = 0.0

    def loss_gather(f, w):
        out = sparse_conv(f, jnp.asarray(levels_g[0].nbr), w)
        return (out * cot).sum()

    def loss_col(f, w):
        out = cc.subm_col_rows(
            f, w, jnp.asarray(c0.vox2col), jnp.asarray(validf),
            jnp.asarray(c0.col_nbr), jnp.asarray(c0.col_zm),
            jnp.asarray(c0.col_zp))
        return (out * cot).sum()

    gx_ref, gw_ref = jax.grad(loss_gather, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    gx, gw = jax.grad(loss_col, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


def test_down_up_col_rows_grads_match_gather():
    coords, m, levels_g, cols, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    cout = 6
    w8 = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    c0, c1 = cols[0], cols[1]
    validf = valid.astype(np.float32)
    valid_c = np.zeros(CAPS[1], np.float32)
    valid_c[:mc] = 1.0
    tab = (jnp.asarray(c0.vox2col), jnp.asarray(validf),
           jnp.asarray(c0.col_child), jnp.asarray(c0.col_parent),
           jnp.asarray(c0.col_quad), jnp.asarray(c1.vox2col),
           jnp.asarray(valid_c))

    cot_c = rng.normal(size=(CAPS[1], cout)).astype(np.float32)
    cot_c[valid_c == 0] = 0.0

    def loss_g_dn(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].down), w)
                * cot_c).sum()

    def loss_c_dn(f, w):
        return (cc.down_col_rows(f, w, *tab) * cot_c).sum()

    gx_ref, gw_ref = jax.grad(loss_g_dn, (0, 1))(jnp.asarray(feats),
                                                 jnp.asarray(w8))
    gx, gw = jax.grad(loss_c_dn, (0, 1))(jnp.asarray(feats), jnp.asarray(w8))
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)

    cfeats = np.zeros((CAPS[1], cin), np.float32)
    cfeats[:mc] = rng.normal(size=(mc, cin))
    cot_f = rng.normal(size=(CAPS[0], cout)).astype(np.float32)
    cot_f[~valid] = 0.0
    tab_up = (jnp.asarray(c1.vox2col), jnp.asarray(valid_c),
              jnp.asarray(c0.col_child), jnp.asarray(c0.col_parent),
              jnp.asarray(c0.col_quad), jnp.asarray(c0.vox2col),
              jnp.asarray(validf))

    def loss_g_up(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].up), w) * cot_f).sum()

    def loss_c_up(f, w):
        return (cc.up_col_rows(f, w, *tab_up) * cot_f).sum()

    gx_ref, gw_ref = jax.grad(loss_g_up, (0, 1))(jnp.asarray(cfeats),
                                                 jnp.asarray(w8))
    gx, gw = jax.grad(loss_c_up, (0, 1))(jnp.asarray(cfeats),
                                         jnp.asarray(w8))
    np.testing.assert_allclose(np.asarray(gx)[:mc], np.asarray(gx_ref)[:mc],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


@pytest.mark.slow
def test_unet_train_grads_column_vs_gather():
    """Full UBlock under jax.grad: column custom VJPs match gather AD."""
    from d3net_tpu.models.blocks import UBlock

    coords, m, levels_g, cols, feats, _, valid, rng = _setup(cin=6)
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
    c0, c1 = cols[0], cols[1]
    tc = [
        {"vox2col": stack1(c0.vox2col), "col_nbr": stack1(c0.col_nbr),
         "col_zm": stack1(c0.col_zm), "col_zp": stack1(c0.col_zp),
         "mask": stack1(mask0), "col_child": stack1(c0.col_child),
         "col_parent": stack1(c0.col_parent),
         "col_quad": stack1(c0.col_quad)},
        {"vox2col": stack1(c1.vox2col), "col_nbr": stack1(c1.col_nbr),
         "col_zm": stack1(c1.col_zm), "col_zp": stack1(c1.col_zp),
         "mask": stack1(mask1)},
    ]
    tg = jax.tree.map(jnp.asarray, tg)
    tc = jax.tree.map(jnp.asarray, tc)

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
    g_col = jax.grad(loss)(vs["params"], tc)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_col = dict(jax.tree_util.tree_leaves_with_path(g_col))
    assert len(flat_ref) == len(flat_col)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_col[path]), np.asarray(leaf), atol=2e-3,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_detector_end_to_end_column_vs_gather():
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
    bc_ = build_batch(scenes, BatchSpec(conv_impl="column", **kw))
    bg = jax.tree.map(jnp.asarray, bg)
    bc_ = jax.tree.map(jnp.asarray, bc_)
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
    out_c = jax.jit(lambda v, b: model.apply(v, b, train=False))(vs, bc_)
    np.testing.assert_allclose(
        np.asarray(out_c["semantic_scores"]),
        np.asarray(out_g["semantic_scores"]), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_c["pt_offsets"]), np.asarray(out_g["pt_offsets"]),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_c["proposal_scores_all"]),
        np.asarray(out_g["proposal_scores_all"]), atol=1e-3,
    )
