import numpy as np

from d3net_tpu.ops.voxelize import (
    build_unet_maps,
    downsample_level,
    submanifold_table,
    upsample_table,
    voxelize,
)


def test_voxelize_dedup_and_p2v():
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0], [1, 0, 0], [2, 2, 2]])
    vc, p2v, counts = voxelize(coords)
    assert len(vc) == 3
    # same input coord -> same voxel
    assert p2v[0] == p2v[2]
    assert p2v[1] == p2v[3]
    assert p2v[0] != p2v[1]
    # counts align with voxel ids
    for v in range(3):
        assert counts[v] == (p2v == v).sum()
    # representative coords match
    for i, v in enumerate(p2v):
        np.testing.assert_array_equal(vc[v], coords[i])


def test_voxelize_negative_coords():
    coords = np.array([[-1, -2, -3], [-1, -2, -3], [0, 0, 0]])
    vc, p2v, counts = voxelize(coords)
    assert len(vc) == 2
    assert p2v[0] == p2v[1]


def test_submanifold_table_oracle():
    rng = np.random.default_rng(0)
    coords = np.unique(rng.integers(0, 6, size=(80, 3)), axis=0)
    m = len(coords)
    nbr = submanifold_table(coords)
    assert nbr.shape == (m, 27)
    lookup = {tuple(c): i for i, c in enumerate(coords)}
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    for i, c in enumerate(coords):
        for k, o in enumerate(offs):
            want = lookup.get((c[0] + o[0], c[1] + o[1], c[2] + o[2]), m)
            assert nbr[i, k] == want, (i, k, o)
    # center offset is self
    assert (nbr[:, 13] == np.arange(m)).all()


def test_downsample_and_upsample_tables():
    rng = np.random.default_rng(1)
    coords = np.unique(rng.integers(0, 8, size=(120, 3)), axis=0)
    m = len(coords)
    coarse, down = downsample_level(coords)
    # every coarse coord is floor(fine/2) of some fine voxel
    want_coarse = np.unique(coords // 2, axis=0)
    np.testing.assert_array_equal(coarse, want_coarse)
    lookup = {tuple(c): i for i, c in enumerate(coords)}
    offs = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    for p, cc in enumerate(coarse):
        for k, o in enumerate(offs):
            q = (2 * cc[0] + o[0], 2 * cc[1] + o[1], 2 * cc[2] + o[2])
            assert down[p, k] == lookup.get(q, m)

    up = upsample_table(coords, coarse)
    mc = len(coarse)
    clookup = {tuple(c): i for i, c in enumerate(coarse)}
    for f, fc in enumerate(coords):
        valid = up[f][up[f] < mc]
        assert len(valid) == 1  # exactly one parent
        off = fc - (fc // 2) * 2
        k = off[0] * 4 + off[1] * 2 + off[2]
        assert up[f, k] == clookup[tuple(fc // 2)]


def test_build_unet_maps_static_shapes():
    rng = np.random.default_rng(2)
    coords = np.unique(rng.integers(0, 16, size=(300, 3)), axis=0)
    caps = [512, 256, 128]
    levels = build_unet_maps(coords, caps)
    assert len(levels) == 3
    for li, (lv, cap) in enumerate(zip(levels, caps)):
        assert lv.coords.shape == (cap, 3)
        assert lv.nbr.shape == (cap, 27)
        assert lv.nbr.max() <= cap
        # padded rows point at the zero row
        assert (lv.nbr[lv.num_voxels :] == cap).all()
        if li + 1 < len(caps):
            assert lv.down.shape == (caps[li + 1], 8)
            assert lv.down.max() <= cap
            assert lv.up.shape == (cap, 8)
            assert lv.up.max() <= caps[li + 1]


def test_build_unet_maps_coarse_consistency():
    rng = np.random.default_rng(3)
    coords = np.unique(rng.integers(0, 16, size=(200, 3)), axis=0)
    levels = build_unet_maps(coords, [512, 256])
    l0, l1 = levels
    want_coarse = np.unique(coords // 2, axis=0)
    assert l1.num_voxels == len(want_coarse)
    np.testing.assert_array_equal(l1.coords[: l1.num_voxels], want_coarse)
