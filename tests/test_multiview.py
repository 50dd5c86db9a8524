import numpy as np
import jax
import jax.numpy as jnp

from d3net_tpu.data.multiview import (
    ProjectionHelper,
    project_multiview_features,
)


def _pinhole():
    intr = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    return ProjectionHelper(intr, 0.1, 10.0, image_dims=(64, 64), accuracy=0.05,
                            feat_stride=8)


def test_projection_center_point():
    h = _pinhole()
    # camera at origin looking down +z (identity pose); point on the axis
    xyz = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 20.0], [5.0, 0.0, 2.0]])
    pose = np.eye(4)
    valid, px, py = h.project(xyz, pose, None)
    assert valid[0] and px[0] == 32 and py[0] == 32
    assert not valid[1]  # beyond depth_max
    assert not valid[2]  # out of image


def test_depth_consistency():
    h = _pinhole()
    xyz = np.array([[0.0, 0.0, 2.0]])
    pose = np.eye(4)
    depth = np.full((64, 64), 2.0, np.float32)
    valid, _, _ = h.project(xyz, pose, depth)
    assert valid[0]
    depth_occluded = np.full((64, 64), 1.0, np.float32)  # occluder in front
    valid, _, _ = h.project(xyz, pose, depth_occluded)
    assert not valid[0]


def test_multiview_maxpool_aggregation():
    h = _pinhole()
    xyz = np.array([[0.0, 0.0, 2.0], [100.0, 100.0, 100.0]])  # second invisible
    pose = np.eye(4)
    fm1 = np.full((8, 8, 4), 1.0, np.float32)
    fm2 = np.full((8, 8, 4), 3.0, np.float32)
    feats = project_multiview_features(
        xyz, [(fm1, pose, None), (fm2, pose, None)], h, feat_dim=4
    )
    np.testing.assert_allclose(feats[0], 3.0)   # max over frames
    np.testing.assert_allclose(feats[1], 0.0)   # never seen -> zeros


def test_enet_encoder_shapes():
    from d3net_tpu.models.enet import ENetEncoder

    m = ENetEncoder()
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.key(0), x, train=False)
    out = m.apply(vs, x, train=False)
    assert out.shape == (1, 8, 8, 128)
