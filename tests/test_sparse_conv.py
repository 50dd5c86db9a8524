import numpy as np
import jax
import jax.numpy as jnp

from d3net_tpu.ops.voxelize import (
    build_unet_maps,
    downsample_level,
    submanifold_table,
    upsample_table,
)
from d3net_tpu.ops.sparse_conv import sparse_conv, sparse_upconv_onehot


def _dense_from_sparse(coords, feats, grid):
    dense = np.zeros(grid + (feats.shape[1],), np.float32)
    dense[coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    return dense


def test_submanifold_conv_matches_dense_conv():
    rng = np.random.default_rng(0)
    grid = (7, 7, 7)
    coords = np.unique(rng.integers(1, 6, size=(60, 3)), axis=0)
    m = len(coords)
    cin, cout = 5, 4
    feats = rng.normal(size=(m, cin)).astype(np.float32)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

    nbr = submanifold_table(coords)
    got = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w)))

    # dense oracle: lax 3D conv, then sample active sites
    dense = _dense_from_sparse(coords, feats, grid)
    # weight (27, cin, cout) -> (3,3,3, cin, cout), lexicographic offsets
    wk = w.reshape(3, 3, 3, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None],  # NHWDC
        jnp.asarray(wk),
        window_strides=(1, 1, 1),
        padding="SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )[0]
    want = np.asarray(out)[coords[:, 0], coords[:, 1], coords[:, 2]]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_strided_downconv_matches_dense():
    rng = np.random.default_rng(1)
    grid = (8, 8, 8)
    coords = np.unique(rng.integers(0, 8, size=(100, 3)), axis=0)
    m = len(coords)
    cin, cout = 3, 6
    feats = rng.normal(size=(m, cin)).astype(np.float32)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1

    coarse, down = downsample_level(coords)
    got = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(down), jnp.asarray(w)))

    dense = _dense_from_sparse(coords, feats, grid)
    wk = w.reshape(2, 2, 2, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense)[None],
        jnp.asarray(wk),
        window_strides=(2, 2, 2),
        padding="VALID",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )[0]
    want = np.asarray(out)[coarse[:, 0], coarse[:, 1], coarse[:, 2]]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upconv_oracle():
    rng = np.random.default_rng(2)
    coords = np.unique(rng.integers(0, 8, size=(100, 3)), axis=0)
    coarse, _ = downsample_level(coords)
    mc = len(coarse)
    cin, cout = 4, 3
    feats_c = rng.normal(size=(mc, cin)).astype(np.float32)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1

    up = upsample_table(coords, coarse)
    got = np.asarray(sparse_conv(jnp.asarray(feats_c), jnp.asarray(up), jnp.asarray(w)))

    clookup = {tuple(c): i for i, c in enumerate(coarse)}
    want = np.zeros((len(coords), cout), np.float32)
    for f, fc in enumerate(coords):
        parent = clookup[tuple(fc // 2)]
        off = fc - (fc // 2) * 2
        k = off[0] * 4 + off[1] * 2 + off[2]
        want[f] = feats_c[parent] @ w[k]
    np.testing.assert_allclose(got, want, atol=1e-5)

    # one-gather specialization agrees
    parent = np.array([clookup[tuple(fc // 2)] for fc in coords], np.int32)
    off = coords - (coords // 2) * 2
    off_id = (off[:, 0] * 4 + off[:, 1] * 2 + off[:, 2]).astype(np.int32)
    got2 = np.asarray(
        sparse_upconv_onehot(
            jnp.asarray(feats_c), jnp.asarray(parent), jnp.asarray(off_id), jnp.asarray(w)
        )
    )
    np.testing.assert_allclose(got2, want, atol=1e-5)


def test_conv_with_padding_and_invalid_entries():
    rng = np.random.default_rng(3)
    coords = np.unique(rng.integers(0, 5, size=(40, 3)), axis=0)
    cap = 64
    levels = build_unet_maps(coords, [cap])
    lv = levels[0]
    m = lv.num_voxels
    cin, cout = 3, 2
    feats = np.zeros((cap, cin), np.float32)
    feats[:m] = rng.normal(size=(m, cin))
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)

    got = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(lv.nbr), jnp.asarray(w)))
    # padded output rows are exactly zero (all-INVALID tables)
    np.testing.assert_array_equal(got[m:], 0.0)
    # active rows match the unpadded computation
    nbr_small = submanifold_table(coords)
    want = np.asarray(
        sparse_conv(jnp.asarray(feats[:m]), jnp.asarray(nbr_small), jnp.asarray(w))
    )
    np.testing.assert_allclose(got[:m], want, atol=1e-5)


def test_custom_vjp_matches_autodiff():
    """sparse_conv_t backward (transpose-table gather) == naive autodiff."""
    from d3net_tpu.ops.sparse_conv import sparse_conv_t
    import jax

    rng = np.random.default_rng(7)
    coords = np.unique(rng.integers(0, 6, size=(70, 3)), axis=0)
    m = len(coords)
    cin, cout = 4, 5
    feats = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    nbr = jnp.asarray(submanifold_table(coords))
    cot = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def loss_naive(f, ww):
        return (sparse_conv(f, nbr, ww) * cot).sum()

    def loss_t(f, ww):
        return (sparse_conv_t(f, nbr, nbr, ww, True) * cot).sum()

    gf_n, gw_n = jax.grad(loss_naive, argnums=(0, 1))(feats, w)
    gf_t, gw_t = jax.grad(loss_t, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_n), atol=1e-4)

    # strided pair: down conv with up-table transpose
    coarse, down = downsample_level(coords)
    up = upsample_table(coords, coarse)
    mc = len(coarse)
    w2 = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.1)
    cot2 = jnp.asarray(rng.normal(size=(mc, cout)).astype(np.float32))
    downj, upj = jnp.asarray(down), jnp.asarray(up)

    def dn_naive(f, ww):
        return (sparse_conv(f, downj, ww) * cot2).sum()

    def dn_t(f, ww):
        return (sparse_conv_t(f, downj, upj, ww, False) * cot2).sum()

    gf_n, gw_n = jax.grad(dn_naive, argnums=(0, 1))(feats, w2)
    gf_t, gw_t = jax.grad(dn_t, argnums=(0, 1))(feats, w2)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_n), atol=1e-4)

    # up conv with down-table transpose
    featsc = jnp.asarray(rng.normal(size=(mc, cin)).astype(np.float32))
    cot3 = jnp.asarray(rng.normal(size=(m, cout)).astype(np.float32))

    def up_naive(f, ww):
        return (sparse_conv(f, upj, ww) * cot3).sum()

    def up_t(f, ww):
        return (sparse_conv_t(f, upj, downj, ww, False) * cot3).sum()

    gf_n, gw_n = jax.grad(up_naive, argnums=(0, 1))(featsc, w2)
    gf_t, gw_t = jax.grad(up_t, argnums=(0, 1))(featsc, w2)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_n), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_n), atol=1e-4)


def test_chunked_path_matches_unchunked(monkeypatch):
    import d3net_tpu.ops.sparse_conv as SC

    rng = np.random.default_rng(9)
    coords = np.unique(rng.integers(0, 10, size=(400, 3)), axis=0)
    m = len(coords)
    # pad to a multiple of a small chunk to force the lax.map path
    monkeypatch.setattr(SC, "_CHUNK", 64)
    cap = ((m + 63) // 64) * 64 * 2
    levels = build_unet_maps(coords, [cap])
    nbr = jnp.asarray(levels[0].nbr)
    cin, cout = 6, 7
    feats = np.zeros((cap, cin), np.float32)
    feats[:m] = rng.normal(size=(m, cin))
    w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1)
    fj = jnp.asarray(feats)
    got = np.asarray(SC.sparse_conv(fj, nbr, w))
    monkeypatch.setattr(SC, "_CHUNK", 1 << 30)  # force unchunked
    want = np.asarray(SC.sparse_conv(fj, nbr, w))
    np.testing.assert_allclose(got, want, atol=1e-5)
