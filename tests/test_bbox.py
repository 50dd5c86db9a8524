import numpy as np
import jax.numpy as jnp

from d3net_tpu.utils.bbox import (
    aabb_giou_minmax,
    aabb_iou_corners,
    aabb_iou_minmax,
    box_corners,
    center_size_to_minmax,
    corners_to_minmax,
    pairwise_iou_matrix,
)
from d3net_tpu.utils.nn_distance import nn_distance
from d3net_tpu.utils.nms import nms_3d_same_class, nms_matrix


def test_box_corners_roundtrip():
    c = np.array([[1.0, 2.0, 3.0]])
    s = np.array([[2.0, 4.0, 6.0]])
    corners = box_corners(c, s)
    assert corners.shape == (1, 8, 3)
    mn, mx = corners_to_minmax(corners)
    np.testing.assert_allclose(mn, [[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(mx, [[2.0, 4.0, 6.0]])


def test_iou_known_values():
    # unit cube vs itself = 1; shifted by half along x -> 1/3
    mn1, mx1 = np.zeros(3), np.ones(3)
    assert np.isclose(aabb_iou_minmax(mn1, mx1, mn1, mx1), 1.0, atol=1e-6)
    mn2, mx2 = np.array([0.5, 0, 0]), np.array([1.5, 1, 1])
    got = aabb_iou_minmax(mn1, mx1, mn2, mx2)
    assert np.isclose(got, 0.5 / 1.5, atol=1e-6)
    # disjoint
    mn3, mx3 = np.array([5.0, 5, 5]), np.array([6.0, 6, 6])
    assert np.isclose(aabb_iou_minmax(mn1, mx1, mn3, mx3), 0.0, atol=1e-8)


def test_giou_known_values():
    mn1, mx1 = np.zeros(3), np.ones(3)
    # identical boxes: giou == iou == 1
    assert np.isclose(aabb_giou_minmax(mn1, mx1, mn1, mx1), 1.0, atol=1e-6)
    # disjoint unit cubes one apart along x: iou 0, hull 3x1x1, union 2
    mn2, mx2 = np.array([2.0, 0, 0]), np.array([3.0, 1, 1])
    got = aabb_giou_minmax(mn1, mx1, mn2, mx2)
    assert np.isclose(got, 0.0 - (3 - 2) / 3, atol=1e-5)


def test_iou_corners_matches_minmax_random():
    rng = np.random.default_rng(0)
    c1 = rng.normal(size=(64, 3))
    s1 = rng.uniform(0.2, 2.0, size=(64, 3))
    c2 = c1 + rng.normal(scale=0.3, size=(64, 3))
    s2 = rng.uniform(0.2, 2.0, size=(64, 3))
    got = aabb_iou_corners(box_corners(c1, s1), box_corners(c2, s2))
    mn1, mx1 = center_size_to_minmax(c1, s1)
    mn2, mx2 = center_size_to_minmax(c2, s2)
    want = aabb_iou_minmax(mn1, mx1, mn2, mx2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # jnp path agrees
    got_j = aabb_iou_corners(jnp.asarray(box_corners(c1, s1)), jnp.asarray(box_corners(c2, s2)))
    np.testing.assert_allclose(np.asarray(got_j), want, atol=1e-5)


def test_pairwise_matrix_diag():
    rng = np.random.default_rng(1)
    c = rng.normal(size=(10, 3))
    s = rng.uniform(0.5, 1.5, size=(10, 3))
    mn, mx = center_size_to_minmax(c, s)
    m = pairwise_iou_matrix(mn, mx, mn, mx)
    np.testing.assert_allclose(np.diag(m), np.ones(10), atol=1e-6)


def test_nn_distance_l1_and_l2():
    pc1 = jnp.asarray([[[0.0, 0, 0], [2.0, 0, 0]]])
    pc2 = jnp.asarray([[[0.5, 0, 0], [10.0, 0, 0], [1.9, 0, 0]]])
    d1, i1, d2, i2 = nn_distance(pc1, pc2, l1=True)
    np.testing.assert_array_equal(np.asarray(i1), [[0, 2]])
    np.testing.assert_allclose(np.asarray(d1), [[0.5, 0.1]], atol=1e-6)
    d1, i1, _, _ = nn_distance(pc1, pc2, l1=False)
    np.testing.assert_allclose(np.asarray(d1), [[0.25, 0.01]], atol=1e-6)
    # mask out the best match
    mask2 = jnp.asarray([[True, True, False]])
    _, i1m, _, _ = nn_distance(pc1, pc2, l1=True, mask2=mask2)
    np.testing.assert_array_equal(np.asarray(i1m), [[0, 0]])


def test_nms_matrix_greedy():
    ious = np.array([[1.0, 0.9, 0.0], [0.9, 1.0, 0.0], [0.0, 0.0, 1.0]])
    scores = np.array([0.9, 0.8, 0.5])
    kept = nms_matrix(ious, scores, 0.5)
    np.testing.assert_array_equal(sorted(kept), [0, 2])


def test_nms_3d_same_class_only_suppresses_same_class():
    boxes = np.array(
        [
            [0, 0, 0, 1, 1, 1],
            [0.05, 0, 0, 1.05, 1, 1],  # overlaps box 0
            [0.05, 0, 0, 1.05, 1, 1],  # overlaps box 0 but different class
        ],
        dtype=np.float64,
    )
    scores = np.array([0.9, 0.8, 0.7])
    classes = np.array([0, 0, 1])
    kept = nms_3d_same_class(boxes, scores, classes, 0.5)
    np.testing.assert_array_equal(sorted(kept), [0, 2])
