import numpy as np
import jax.numpy as jnp

from d3net_tpu.ops.cluster import compact_clusters, grid_cluster, pair_searchsorted


def _blob(rng, center, n, scale=0.01):
    return center + rng.normal(scale=scale, size=(n, 3))


def test_pair_searchsorted():
    hi = jnp.asarray([0, 0, 1, 1, 1, 3], jnp.int32)
    lo = jnp.asarray([0, 5, 0, 2, 9, 1], jnp.int32)
    q = pair_searchsorted(hi, lo, jnp.asarray([1, 0, 4, 1], jnp.int32), jnp.asarray([2, 6, 0, 3], jnp.int32))
    np.testing.assert_array_equal(np.asarray(q), [3, 2, 6, 4])


def test_two_separated_blobs_two_clusters():
    rng = np.random.default_rng(0)
    a = _blob(rng, np.array([0.0, 0, 0]), 40)
    b = _blob(rng, np.array([1.0, 1, 0]), 40)
    coords = np.concatenate([a, b]).astype(np.float32)
    sem = np.full(80, 3, np.int32)
    valid = np.ones(80, bool)
    root = np.asarray(
        grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid))
    )
    # blob a = one component, blob b = another
    assert len(np.unique(root[:40])) == 1
    assert len(np.unique(root[40:])) == 1
    assert root[0] != root[40]


def test_same_position_different_label_not_merged():
    rng = np.random.default_rng(1)
    a = _blob(rng, np.array([0.0, 0, 0]), 30)
    coords = np.concatenate([a, a]).astype(np.float32)
    sem = np.concatenate([np.full(30, 2), np.full(30, 7)]).astype(np.int32)
    valid = np.ones(60, bool)
    root = np.asarray(grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid)))
    assert root[0] != root[30]
    assert len(np.unique(root[:30])) == 1
    assert len(np.unique(root[30:])) == 1


def test_chain_connectivity_long_diameter():
    # a line of points spaced 2cm apart must form ONE component
    n = 200
    coords = np.zeros((n, 3), np.float32)
    coords[:, 0] = np.arange(n) * 0.02
    sem = np.full(n, 5, np.int32)
    valid = np.ones(n, bool)
    root = np.asarray(
        grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid), num_iters=10)
    )
    assert len(np.unique(root)) == 1


def test_invalid_points_excluded():
    rng = np.random.default_rng(2)
    coords = _blob(rng, np.zeros(3), 50).astype(np.float32)
    sem = np.full(50, 1, np.int32)
    valid = np.ones(50, bool)
    valid[25:] = False
    root = np.asarray(grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid)))
    assert (root[25:] == -1).all()
    assert (root[:25] >= 0).all()


def test_far_points_not_connected():
    coords = np.array([[0, 0, 0], [0.5, 0, 0]], np.float32)  # 50cm apart
    sem = np.full(2, 1, np.int32)
    root = np.asarray(
        grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(np.ones(2, bool)))
    )
    assert root[0] != root[1]


def test_compact_clusters_topk_and_threshold():
    rng = np.random.default_rng(3)
    a = _blob(rng, np.array([0.0, 0, 0]), 60)
    b = _blob(rng, np.array([2.0, 0, 0]), 30)
    c = _blob(rng, np.array([4.0, 0, 0]), 5)  # below threshold
    coords = np.concatenate([a, b, c]).astype(np.float32)
    n = len(coords)
    sem = np.full(n, 4, np.int32)
    valid = np.ones(n, bool)
    root = grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid))
    member, mask, npoint = compact_clusters(
        root, jnp.ones(n), jnp.asarray(valid), max_clusters=8, min_points=10
    )
    member, mask, npoint = map(np.asarray, (member, mask, npoint))
    assert mask.sum() == 2
    # biggest cluster first
    assert npoint[0] == 60 and npoint[1] == 30
    assert (member[:60] == member[0]).all() and member[0] >= 0
    assert (member[60:90] == member[60]).all() and member[60] >= 0
    assert (member[90:] == -1).all()  # small cluster dropped


def test_weighted_counts():
    rng = np.random.default_rng(4)
    a = _blob(rng, np.zeros(3), 10)
    coords = a.astype(np.float32)
    sem = np.full(10, 1, np.int32)
    valid = np.ones(10, bool)
    w = np.full(10, 7.0, np.float32)  # each voxel holds 7 points
    root = grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid), weights=jnp.asarray(w))
    member, mask, npoint = compact_clusters(
        root, jnp.asarray(w), jnp.asarray(valid), max_clusters=4, min_points=50
    )
    assert np.asarray(mask).sum() == 1
    assert np.asarray(npoint)[0] == 70.0


def test_pass_bit_folding_no_cross_half_merge():
    """Dual-pass trick: labels >= 32 (pass bit) never merge with < 32.

    Mirrors PointGroup._cluster folding orig/shifted passes into one
    grid_cluster call over concatenated points (models/pointgroup.py).
    """
    rng = np.random.default_rng(7)
    blob = _blob(rng, np.zeros(3), 40).astype(np.float32)
    # identical coords in both halves; only the pass bit differs
    coords = np.concatenate([blob, blob])
    sem = np.concatenate([np.full(40, 5), np.full(40, 5 + 32)]).astype(np.int32)
    valid = np.ones(80, bool)
    root = np.asarray(
        grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid))
    )
    first, second = root[:40], root[40:]
    assert (first >= 0).all() and (second >= 0).all()
    assert len(set(first)) == 1 and len(set(second)) == 1
    # components never span the pass boundary
    assert first[0] < 40 <= second[0]


def test_morton_order_preserves_roots_as_point_indices():
    """root[p] == p exactly at roots (compact_clusters relies on it)."""
    rng = np.random.default_rng(8)
    coords = np.concatenate(
        [_blob(rng, np.zeros(3), 25), _blob(rng, np.ones(3), 25)]
    ).astype(np.float32)
    sem = np.full(50, 2, np.int32)
    valid = np.ones(50, bool)
    root = np.asarray(
        grid_cluster(jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid))
    )
    roots = set(root[root >= 0])
    for r in roots:
        assert root[r] == r


def test_worst_case_recall_at_scale():
    """VERDICT r3 #9: split-instance rate at 131k-voxel scale.

    Worst case for the banded ladder: one LARGE connected instance (a
    dense floor-scale plane — neighbors straddle high-level Morton
    boundaries, so same-component pairs can be >256 ranks apart in curve
    1) interleaved in Morton order with tens of thousands of same-label
    clutter points that inflate rank distances but must NOT connect
    (placed > radius away).  Ground truth: the plane is ONE component.
    The dual-curve design (axis-permuted translated curve 2) must keep
    the split-instance rate at zero; ballquery meanActive semantics is
    the reference's analogue (conf/pointgroup.yaml:157-159).
    """
    rng = np.random.default_rng(7)
    # plane: 90k points on a 4m x 4m sheet, 1.5cm jitter, grid pitch 1.3cm
    side = 300
    g = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1)
    plane = np.zeros((side * side, 3), np.float32)
    plane[:, :2] = g.reshape(-1, 2) * 0.0133
    plane[:, 2] = 0.5
    plane += rng.normal(scale=0.002, size=plane.shape).astype(np.float32)
    # clutter: 40k same-label points in a slab well above the plane
    # (z >= 0.7 > radius + cell diagonal away: never legally connected)
    n_clut = 40_000
    clut = np.stack([
        rng.uniform(0, 4, n_clut), rng.uniform(0, 4, n_clut),
        rng.uniform(0.7, 3.0, n_clut),
    ], 1).astype(np.float32)
    coords = np.concatenate([plane, clut])
    n_plane = len(plane)
    sem = np.full(len(coords), 4, np.int32)
    valid = np.ones(len(coords), bool)
    root = np.asarray(grid_cluster(
        jnp.asarray(coords), jnp.asarray(sem), jnp.asarray(valid),
        num_iters=16,
    ))
    plane_roots, counts = np.unique(root[:n_plane], return_counts=True)
    split_rate = 1.0 - counts.max() / n_plane
    # no plane point may merge with clutter
    assert not np.isin(plane_roots, np.unique(root[n_plane:])).any()
    # the instance must survive essentially unsplit
    assert split_rate < 0.01, (
        f"split rate {split_rate:.4f}, {len(plane_roots)} fragments")
