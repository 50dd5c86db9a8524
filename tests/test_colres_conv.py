"""Column-resident flat conv (ops/colres_conv.py) vs gather-conv oracles.

Same contract as tests/test_column_conv.py: identical weights + voxel set
must produce identical outputs and gradients across conv implementations.
The colres path additionally stays in flat column space (one rows->cols at
the input, one cols->rows at the output), so the oracle wraps each op in
the conversions before comparing row-space values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3net_tpu.ops import colres_conv as crc
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


def _batched(a):
    return jnp.asarray(a)[None]


def _flat_tables(cols, caps=CAPS, c_caps=C_CAPS):
    """Single-scene batched level dicts -> flat colres tables."""
    fls = []
    for li, cm in enumerate(cols):
        mask = np.zeros(caps[li], np.float32)
        mask[: caps[li]] = 0.0
        t = {
            "col_nbr": _batched(cm.col_nbr),
            "col_zm": _batched(cm.col_zm),
            "col_zp": _batched(cm.col_zp),
            "col_occ": _batched(cm.col_occ),
            "col2vox": _batched(cm.col2vox),
            "vox2col": _batched(cm.vox2col),
            "mask": _batched(mask),
        }
        if cm.col_child is not None:
            t["col_child"] = _batched(cm.col_child)
            t["col_parent"] = _batched(cm.col_parent)
            t["col_quad"] = _batched(cm.col_quad)
        nxt = c_caps[li + 1] if li + 1 < len(cols) else None
        fls.append(crc.flatten_level(t, caps[li], nxt))
    return fls


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
    fls = _flat_tables(cols)
    return coords, m, levels_g, cols, fls, feats, w27, valid, rng


def _subm_rows(feats_rows, fl, w):
    """rows -> subm_cc -> rows wrapper (the oracle's row-space view)."""
    cols = crc.rows_to_cols_flat(feats_rows[None], fl)
    out = crc.subm_cc(cols, w, fl["nbr"], fl["zm"], fl["zp"], fl["occ"])
    return crc.cols_to_rows_flat(out, fl)[0]


def test_subm_cc_matches_gather():
    coords, m, levels_g, cols, fls, feats, w27, valid, _ = _setup()
    ref = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].nbr),
                    jnp.asarray(w27))
    )
    got = np.asarray(_subm_rows(jnp.asarray(feats), fls[0],
                                jnp.asarray(w27)))
    np.testing.assert_allclose(got[:m], ref[:m], atol=2e-5)


def test_rows_cols_roundtrip_and_occ():
    _, m, _, cols, fls, feats, _, valid, _ = _setup()
    fl = fls[0]
    c = crc.rows_to_cols_flat(jnp.asarray(feats)[None], fl)
    back = np.asarray(crc.cols_to_rows_flat(c, fl))[0]
    np.testing.assert_array_equal(back[:m], feats[:m])
    # unoccupied cells are zero despite the monotone col2vox fill
    occ = np.asarray(fl["occ"]).reshape(-1)
    cells = np.asarray(c).reshape(-1, feats.shape[1])
    assert (cells[occ == 0] == 0).all()


def test_down_up_cc_match_gather():
    coords, m, levels_g, cols, fls, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    cout = 6
    w8 = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3)
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    fl0, fl1 = fls[0], fls[1]

    ref_dn = np.asarray(
        sparse_conv(jnp.asarray(feats), jnp.asarray(levels_g[0].down), w8)
    )
    cols_f = crc.rows_to_cols_flat(jnp.asarray(feats)[None], fl0)
    got_dn_cols = crc.down_cc(cols_f, w8, fl0["child"], fl0["parent"],
                              fl0["quad"])
    got_dn = np.asarray(crc.cols_to_rows_flat(got_dn_cols, fl1))[0]
    np.testing.assert_allclose(got_dn[:mc], ref_dn[:mc], atol=2e-5)

    cfeats = np.zeros((CAPS[1], cin), np.float32)
    cfeats[:mc] = rng.normal(size=(mc, cin))
    ref_up = np.asarray(
        sparse_conv(jnp.asarray(cfeats), jnp.asarray(levels_g[0].up), w8)
    )
    cols_c = crc.rows_to_cols_flat(jnp.asarray(cfeats)[None], fl1)
    got_up_cols = crc.up_cc(cols_c, w8, fl0["child"], fl0["parent"],
                            fl0["quad"])
    got_up = np.asarray(crc.cols_to_rows_flat(got_up_cols, fl0))[0]
    np.testing.assert_allclose(got_up[:m], ref_up[:m], atol=2e-5)


def test_subm_cc_grads_match_gather():
    """Custom VJP vs autodiff through the gather conv: dx and dw agree."""
    coords, m, levels_g, cols, fls, feats, w27, valid, _ = _setup()
    fl = fls[0]
    cot = np.random.default_rng(1).normal(
        size=(CAPS[0], w27.shape[-1])).astype(np.float32)
    cot[~valid] = 0.0

    def loss_gather(f, w):
        out = sparse_conv(f, jnp.asarray(levels_g[0].nbr), w)
        return (out * cot).sum()

    def loss_colres(f, w):
        return (_subm_rows(f, fl, w) * cot).sum()

    gx_ref, gw_ref = jax.grad(loss_gather, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    gx, gw = jax.grad(loss_colres, argnums=(0, 1))(
        jnp.asarray(feats), jnp.asarray(w27))
    np.testing.assert_allclose(np.asarray(gx)[:m], np.asarray(gx_ref)[:m],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


def test_down_up_cc_grads_match_gather():
    coords, m, levels_g, cols, fls, feats, _, valid, rng = _setup()
    cin = feats.shape[1]
    cout = 6
    w8 = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.3
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    fl0, fl1 = fls[0], fls[1]
    valid_c = np.zeros(CAPS[1], bool)
    valid_c[:mc] = True

    cot_c = rng.normal(size=(CAPS[1], cout)).astype(np.float32)
    cot_c[~valid_c] = 0.0

    def loss_g_dn(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].down), w)
                * cot_c).sum()

    def loss_c_dn(f, w):
        cf = crc.rows_to_cols_flat(f[None], fl0)
        out = crc.down_cc(cf, w, fl0["child"], fl0["parent"], fl0["quad"])
        return (crc.cols_to_rows_flat(out, fl1)[0] * cot_c).sum()

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

    def loss_g_up(f, w):
        return (sparse_conv(f, jnp.asarray(levels_g[0].up), w) * cot_f).sum()

    def loss_c_up(f, w):
        cc_ = crc.rows_to_cols_flat(f[None], fl1)
        out = crc.up_cc(cc_, w, fl0["child"], fl0["parent"], fl0["quad"])
        return (crc.cols_to_rows_flat(out, fl0)[0] * cot_f).sum()

    gx_ref, gw_ref = jax.grad(loss_g_up, (0, 1))(jnp.asarray(cfeats),
                                                 jnp.asarray(w8))
    gx, gw = jax.grad(loss_c_up, (0, 1))(jnp.asarray(cfeats),
                                         jnp.asarray(w8))
    np.testing.assert_allclose(np.asarray(gx)[:mc], np.asarray(gx_ref)[:mc],
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=3e-4)


def test_concat_and_proj_cc():
    """Column-space concat/1x1 equal their row-space counterparts."""
    _, m, _, cols, fls, feats, _, valid, rng = _setup(cin=5)
    fl = fls[0]
    f2 = np.zeros((CAPS[0], 3), np.float32)
    f2[:m] = rng.normal(size=(m, 3))
    ca = crc.rows_to_cols_flat(jnp.asarray(feats)[None], fl)
    cb = crc.rows_to_cols_flat(jnp.asarray(f2)[None], fl)
    cat = crc.concat_cc(ca, cb)
    back = np.asarray(crc.cols_to_rows_flat(cat, fl))[0]
    np.testing.assert_allclose(
        back[:m], np.concatenate([feats, f2], -1)[:m], atol=1e-6)

    w1 = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    pr = crc.proj_cc(ca, w1)
    back = np.asarray(crc.cols_to_rows_flat(pr, fl))[0]
    np.testing.assert_allclose(back[:m], feats[:m] @ np.asarray(w1),
                               atol=1e-5)


@pytest.mark.slow
def test_unet_train_grads_colres_vs_gather():
    """Full UBlock under jax.grad: colres custom VJPs match gather AD."""
    from d3net_tpu.models.blocks import UBlock

    coords, m, levels_g, cols, fls, feats, _, valid, rng = _setup(cin=6)
    coarse, _ = downsample_level(coords)
    mc = len(coarse)

    def stack1(a):
        return jnp.asarray(a)[None]

    mask0 = valid.astype(np.float32)
    mask1 = np.zeros(CAPS[1], np.float32)
    mask1[:mc] = 1.0
    tg = [
        {"nbr": stack1(levels_g[0].nbr), "mask": stack1(mask0),
         "down": stack1(levels_g[0].down), "up": stack1(levels_g[0].up)},
        {"nbr": stack1(levels_g[1].nbr), "mask": stack1(mask1)},
    ]
    tg = jax.tree.map(jnp.asarray, tg)

    net = UBlock(planes=(6, 8), block_reps=1, remat=False)
    x_rows = jnp.asarray(feats)[None]
    vs = net.init(jax.random.key(0), x_rows, tg, False)
    cot = rng.normal(size=(CAPS[0], 6)).astype(np.float32)
    cot[~valid] = 0.0

    def loss_g(params):
        out = net.apply({"params": params}, x_rows, tg, True,
                        mutable=["batch_stats"])[0]
        return (out[0] * cot).sum()

    def loss_c(params):
        cols_in = crc.rows_to_cols_flat(x_rows, fls[0])
        out = net.apply({"params": params}, cols_in, fls, True,
                        mutable=["batch_stats"])[0]
        rows = crc.cols_to_rows_flat(out, fls[0])
        return (rows[0] * cot).sum()

    g_ref = jax.grad(loss_g)(vs["params"])
    g_col = jax.grad(loss_c)(vs["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_col = dict(jax.tree_util.tree_leaves_with_path(g_col))
    assert len(flat_ref) == len(flat_col)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_col[path]), np.asarray(leaf), atol=2e-3,
            err_msg=str(path),
        )


@pytest.mark.slow
def test_detector_end_to_end_colres_vs_gather():
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
    bc_ = build_batch(scenes, BatchSpec(conv_impl="colres", **kw))
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
