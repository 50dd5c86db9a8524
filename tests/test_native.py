"""C++ host kernels must be byte-identical to the numpy reference path."""
import numpy as np
import pytest

from d3net_tpu.ops import native


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_matches_numpy():
    # force the numpy path by calling the internals with native disabled
    import d3net_tpu.ops.voxelize as V

    rng = np.random.default_rng(0)
    coords = rng.integers(-5, 40, size=(5000, 3)).astype(np.int32)

    orig = native.available
    try:
        native.available = lambda: False
        vc_np, p2v_np, cnt_np = V.voxelize(coords)
        nbr_np = V.submanifold_table(vc_np)
        coarse_np, down_np = V.downsample_level(vc_np)
        up_np = V.upsample_table(vc_np, coarse_np)
    finally:
        native.available = orig

    vc_c, p2v_c, cnt_c = native.voxelize(coords)
    np.testing.assert_array_equal(vc_np, vc_c)
    np.testing.assert_array_equal(p2v_np, p2v_c)
    np.testing.assert_array_equal(cnt_np, cnt_c)
    np.testing.assert_array_equal(nbr_np, native.submanifold_table(vc_np))
    coarse_c, down_c = native.downsample_level(vc_np)
    np.testing.assert_array_equal(coarse_np, coarse_c)
    np.testing.assert_array_equal(down_np, down_c)
    np.testing.assert_array_equal(up_np, native.upsample_table(vc_np, coarse_np))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_column_maps_byte_identical():
    """C++ column-map builder (d3_column_level/d3_column_pair) matches the
    numpy build_column_maps byte-for-byte across levels, including the
    monotone col2vox fill and phantom ordering."""
    import d3net_tpu.ops.voxelize as V

    rng = np.random.default_rng(7)
    pts = rng.integers(0, 40, (4000, 3))
    coords = np.unique(pts, axis=0).astype(np.int32)
    caps = [4096, 2048, 1024]
    ccaps = [4096, 2048, 1024]

    orig = native.available
    try:
        native.available = lambda: False
        _, cols_np = V.build_column_maps(coords, caps, ccaps)
    finally:
        native.available = orig
    _, cols_c = V.build_column_maps(coords, caps, ccaps)

    fields = ("vox2col", "col_nbr", "col_zm", "col_zp", "col_occ",
              "col2vox", "col_child", "col_parent", "col_quad")
    for li, (a, b) in enumerate(zip(cols_np, cols_c)):
        for f in fields:
            x, y = getattr(a, f), getattr(b, f)
            if x is None:
                assert y is None, (li, f)
                continue
            np.testing.assert_array_equal(x, y, err_msg=f"level {li} {f}")
        assert a.num_cols == b.num_cols
        assert a.overflow_voxels == b.overflow_voxels
        assert a.dropped_phantoms == b.dropped_phantoms
